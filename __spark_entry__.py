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
# Round-9 rotation (VERDICT r8 #2, fourth rotation): the 25 flagship
# slots stay pinned; the other 25 rotate — exclusively queries that
# have NEVER earned a driver row in any round (computed from
# CORRECTNESS_r01..r08 vs queries(); contract-tested in
# tests/test_r7_window.py against ROTATION_BASE_ROUND below). Leads
# with dedup_groups_cdc_sync and the two r8 curation newcomers per
# the verdict; the rotated-out r08 batch all earned green r08 rows
# and stays covered by the full hostile self gate + pytest. 4 queries
# remain never-rowed (q10_returned_revenue, greatest_least_scalar,
# bitwise_aggs, rank_fractions) — the trivial round-10 tail.
ROTATION_BASE_ROUND = 9     # rotation slots never rowed in rounds < 9
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
    # rotated in (first-ever driver rows): the r8 newcomers the
    # verdict directed — the CDC-fed dedup-groups end-to-end and the
    # two curation additions
    "dedup_groups_cdc_sync", "boilerplate_ngrams", "domain_cap_keep",
    # rotated in: curation / sampling / feature export
    "quality_weighted_sample", "source_overlap_matrix",
    "topk_sample_per_group", "multi_eval_decontaminate",
    "user_feature_export", "doc_feature_join",
    # rotated in: window / aggregate surface
    "first_last_window", "argmax_per_group", "range_frame_running_sum",
    "string_agg_per_group", "null_semantics",
    "conditional_ratio_promo", "unpivot_lineitem_measures",
    # rotated in: scan / join strategy surface
    "disjunctive_pushdown", "bucketed_join_revenue",
    # rotated in: TPC-H relational tail
    "q10_returned_items", "q12_priority_by_quantity_band",
    "q13_customer_distribution", "q14_promo_revenue",
    "q17_small_quantity_revenue", "q19_discounted_revenue",
    "q20_potential_promotion",
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
