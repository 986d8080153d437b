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
# Round-8 rotation (VERDICT r7 #2, third rotation): the 25 flagship
# slots stay pinned; the other 25 rotate — exclusively queries that
# have NEVER earned a driver row in any round (computed from
# CORRECTNESS_r01..r07 ∪ vs queries(); contract-tested in
# tests/test_r7_window.py against ROTATION_BASE_ROUND below). Leads
# with the 5 round-7 newcomers per the verdict; the rotated-out r07
# batch all earned green r07 rows and stays covered by the full
# hostile self gate + pytest. ~26 queries remain never-rowed — one
# more rotation from full coverage.
ROTATION_BASE_ROUND = 8     # rotation slots never rowed in rounds < 8
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
    # rotated in (first-ever driver rows): the 5 round-7 newcomers
    "hybrid_dedup_keep", "streaming_dedup_groups",
    "curation_pipeline_keep", "curation_funnel_counts",
    "lsh_incremental_verified_pairs",
    # rotated in: dedup / ANN family closure
    "lsh_dup_groups", "semantic_dup_groups",
    "embedding_int8_ann_recall",
    # rotated in: curation / quality / training pipeline
    "decontaminate_train_docs", "quality_filter_chain",
    "char_entropy_quality", "train_split_assign",
    "training_mix_caps", "pack_sequences",
    # rotated in: text analysis
    "vocab_topk", "repetition_stats",
    # rotated in: event analytics / profiling
    "events_anomaly_zscore", "events_hourly_heatmap",
    "value_histogram_bins", "profile_orders",
    # rotated in: relational surface tail
    "grouping_sets_orders", "range_join_value_bands",
    "relational_division", "q15_top_supplier",
    "q16_parts_supplier_relationship",
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
