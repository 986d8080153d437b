"""Driver-window fidelity contracts (VERDICT r6 #7): the rotation
discipline — 25 pinned flagships + 25 slots that must be filled
exclusively with queries that never earned a driver row in any round
before the rotation was set — is enforceable from the repo's own
CORRECTNESS_r0*.json artifacts, so a future rotation cannot silently
re-run already-rowed queries and waste driver evidence slots."""

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PINNED = [
    "cdc_dedup_latest", "cdc_append", "cdc_chunked_dedup",
    "cdc_no_pkey_dedup", "cdc_schema_align_union",
    "jdbc_snapshot_override", "incremental_snapshot_users",
    "csv_roundtrip_nation", "sync_actions_contract", "merge_upsert_dedup",
    "manifest_contract", "state_offsets_roundtrip", "column_filter_outputs",
    "schema_changes_route", "envelope_roundtrip",
    "streaming_bounded_dedup", "multi_table_sync_dedup",
    "binary_encode_modes", "snapshot_mode_never_chain",
    "exact_dedup_docs", "minhash_lsh_pairs", "embedding_dup_pairs",
    "embedding_ivf_ann", "multimodal_meta", "q1_pricing_summary",
]


def _window():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.DRIVER_WINDOW, mod.ROTATION_BASE_ROUND


def _last_rowed_before(round_no):
    """name -> latest round (< round_no) with a driver row."""
    last = {}
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r[0-9]*.json")):
        rnd = int(os.path.basename(f)[len("CORRECTNESS_r"):-len(".json")])
        if rnd < round_no:
            for k in json.load(open(f)):
                last[k] = max(last.get(k, 0), rnd)
    return last


def test_window_is_50_pinned_plus_rotation():
    window, _ = _window()
    assert len(window) == 50
    assert len(set(window)) == 50, "duplicate slots waste driver evidence"
    assert window[:25] == PINNED, \
        "the 25 flagship slots are pinned across rounds"


def test_rotation_slots_never_rowed_then_stalest():
    """Rotation contract as of ROTATION_BASE_ROUND: every query that has
    never earned a driver row before the base round MUST occupy a
    rotation slot (first-ever evidence beats any re-run), and the
    remaining slots must be filled with the STALEST already-rowed
    queries — smallest last-rowed round, ties broken by name — so
    driver evidence refreshes oldest-first.  Pinned flagships are
    excluded from the staleness pool (they re-row every round)."""
    from python_cdc_component_spark.queries import QUERIES
    window, base_round = _window()
    rotation = window[25:]
    last = _last_rowed_before(base_round)

    never = sorted(q for q in QUERIES if q not in last)
    missing = set(never) - set(rotation)
    assert not missing, (
        f"never-rowed queries (as of r{base_round}) left out of the "
        f"rotation: {sorted(missing)}")

    filler = [q for q in rotation if q in last]
    n_fill = len(filler)
    pool = sorted(
        ((last[q], q) for q in QUERIES
         if q in last and q not in PINNED),
    )
    expected = {q for _, q in pool[:n_fill]}
    # Allow any filler whose staleness ties the cutoff round (the
    # alphabetical tie-break inside one round tier is a convention,
    # not evidence) — but never a fresher round than the cutoff.
    cutoff = pool[n_fill - 1][0] if n_fill else 0
    too_fresh = [q for q in filler
                 if q not in expected and last[q] > cutoff]
    assert not too_fresh, (
        f"rotation filler fresher than the r{cutoff} staleness cutoff: "
        f"{sorted((last[q], q) for q in too_fresh)}")


def test_window_queries_all_registered_with_oracles():
    from python_cdc_component_spark.queries import ORACLES, QUERIES
    window, _ = _window()
    missing_q = [n for n in window if n not in QUERIES]
    missing_o = [n for n in window if n not in ORACLES]
    assert not missing_q, f"window names without queries: {missing_q}"
    assert not missing_o, f"window names without oracles: {missing_o}"
