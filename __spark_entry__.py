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
# Round-6 rotation (VERDICT r5 #5): the 25 flagship slots stay pinned;
# the other 25 rotate to queries that have NEVER earned a driver row in
# any round (plus cdc_current_state/udtf_json_kv back through per the
# verdict). The rotated-out r05 batch (embedding_kmeans,
# semantic_dedup_pairs, streaming_lsh_dedup_pairs, TPC-H tail, ...) all
# earned green r05 rows and stay covered by the 192-query self gate.
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
    # rotated in (first-ever driver rows): event analytics
    "event_funnel_stages", "cohort_retention", "event_transition_matrix",
    # rotated in: dup-graph + erasure + split lifecycle
    "khop_dup_neighbors", "gdpr_forget_keys", "leakage_safe_split",
    "cdc_time_travel",
    # rotated in: LM-scoring / mixture family
    "ccnet_ppl_buckets", "temperature_mix_weights", "doremi_mix_weights",
    # rotated in: quality family
    "quality_classifier_score", "quality_keep_calibrated",
    "gopher_quality_filter",
    # rotated in: curation / serving order / stats
    "pmi_collocations", "winsorize_values", "train_shuffle_order",
    "kcenter_diverse_select", "tfidf_top_terms",
    # rotated in: ANN index probe + sketch + BPE
    "ann_index_probe", "hll_distinct_contract", "bpe_merges",
    # rotated in: format surface
    "xml_roundtrip_events",
    # back through per the verdict: T7 soft delete + UDF surface
    "cdc_current_state", "udtf_json_kv", "grouped_centroids_pandas",
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
