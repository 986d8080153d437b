"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``python_cdc_component_spark`` (see SURVEY.md §7
build plan); this module is only the thin driver-facing surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from python_cdc_component_spark.queries import QUERIES, ORACLES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core
    operation — window-dedup compaction of a CDC event stream (latest
    event per PK, SURVEY §2 W1)."""
    return QUERIES["cdc_dedup_latest"](spark, "/root/testdata/sf0.001")


# The driver's hard CORRECTNESS gate checks the FIRST 50 entries of
# queries() in insertion order.  Curate that window for maximum distinct
# SURVEY-§2 + LLM-pipeline coverage: CDC core, the full source/sink
# lifecycle (S2-S8, K1-K5, P3/P4/P7, F8/F10, T1/T3/T6/T8), the UDF
# surface (§2.10), and one flagship per LLM-pipeline operator family.
# Everything else still runs under scripts/check_oracle.py + pytest.
# Round-13 rotation (eighth rotation; the full-course discipline
# closed in r10 — every registered query has held a green driver row).
# The 25 flagship slots stay pinned.  Rotation contract
# (tests/test_r7_window.py): queries never rowed before the base round
# MUST occupy rotation slots (this round: the r13 addition), and the
# remaining slots re-verify the STALEST queries — smallest last-rowed
# round, ties broken by name — so driver evidence keeps refreshing
# oldest-first (scripts/rotation_candidates.py computes both lists;
# this window is its verbatim output).
ROTATION_BASE_ROUND = 13    # rotation = never-rowed before r13 + stalest
DRIVER_WINDOW = [
    # pinned flagships: CDC core + lifecycle essentials
    "cdc_dedup_latest", "cdc_append", "cdc_chunked_dedup",
    "cdc_no_pkey_dedup", "cdc_schema_align_union",
    "jdbc_snapshot_override", "incremental_snapshot_users",
    "csv_roundtrip_nation", "sync_actions_contract", "merge_upsert_dedup",
    "manifest_contract", "state_offsets_roundtrip", "column_filter_outputs",
    "schema_changes_route", "envelope_roundtrip",
    "streaming_bounded_dedup", "multi_table_sync_dedup",
    "binary_encode_modes", "snapshot_mode_never_chain",
    # pinned flagships: LLM pipeline
    "exact_dedup_docs", "minhash_lsh_pairs", "embedding_dup_pairs",
    "embedding_ivf_ann", "multimodal_meta", "q1_pricing_summary",
    # rotated in (first-ever driver rows): the two round-13 additions
    # — index-fed NEAR(±w) proximity retrieval from the positional
    # postings (VERDICT r12 #2), and the hybrid RRF probe served
    # entirely from the two CDC-maintained indexes via one fused
    # drain (fused-fleet side states, VERDICT r12 #3)
    "lexical_index_near_sync", "hybrid_index_rrf_sync",
    # rotated in (staleness refresh): the 23 stalest driver rows — the
    # whole r5 tier (21, incl. dsir_select_docs, displaced twice by
    # never-rowed additions — it goes first) plus the
    # alphabetically-first 2 of the r6 tier
    # (scripts/rotation_candidates.py verbatim; the second r13
    # addition displaced ccnet_ppl_buckets)
    "dsir_select_docs", "dup_canonical_best", "embedding_ann_recall",
    "embedding_kmeans", "embedding_pq_ann_recall", "exact_substr_spans",
    "hopping_window_agg", "knn_join_ivf", "ngram_decontaminate",
    "q11_important_stock", "q18_large_volume_customers",
    "q21_late_supplier_blame", "q2_min_cost_supplier",
    "q9_nation_year_profit", "resample_interpolate",
    "semantic_dedup_pairs", "simhash_near_pairs",
    "streaming_lsh_dedup_pairs", "variant_shred_events",
    "vocab_drift_jsd", "zorder_layout_stats", "ann_index_probe",
    "bpe_merges",
]


def _window_order(d: dict) -> dict:
    head = {n: d[n] for n in DRIVER_WINDOW if n in d}
    tail = {n: v for n, v in d.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    beyond-reference LLM-pipeline operators)."""
    return _window_order(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same column aliases."""
    return _window_order(dict(ORACLES))
