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
# Round-7 rotation (VERDICT r6 #1): the 25 flagship slots stay pinned;
# the other 25 rotate — exclusively queries that have NEVER earned a
# driver row in any round (computed from CORRECTNESS_r01..r06 ∪ vs
# queries(); contract-tested in tests/test_r7_window.py against
# ROTATION_BASE_ROUND below). The rotated-out r06 batch (event
# analytics, quality family, mixtures, ...) all earned green r06 rows
# and stay covered by the 194-query self gate + pytest.
ROTATION_BASE_ROUND = 7     # rotation slots never rowed in rounds < 7
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
    # rotated in (first-ever driver rows): dedup / fingerprint family
    "containment_dup_pairs", "winnowing_fingerprints",
    "lsh_incremental_pairs", "minhash_jaccard_accuracy",
    "embedding_hyperplane_lsh_pairs",
    # rotated in: ANN / multimodal / tokenize
    "knn_join_kmeans", "multimodal_features", "bpe_encode_tokens",
    # rotated in: sketches
    "countmin_heavy_hitters", "approx_quantile_contract",
    # rotated in: CDC lifecycle tail
    "scd2_intervals", "snapshot_diff_events",
    # rotated in: format surface
    "jsonl_roundtrip_events", "orc_roundtrip_events",
    # rotated in: event analytics tail
    "funnel_time_to_convert", "session_window_agg",
    "interval_join_clicks_buys",
    # rotated in: curation / sampling / text
    "corpus_audit_by_source", "stratified_sample_docs",
    "text_normalize", "doc_chunk_split",
    # rotated in: relational tail
    "lateral_topk_per_customer", "q7_nation_volume",
    "q8_market_share", "q22_dormant_customers",
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
