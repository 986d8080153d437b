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
# The driver's CORRECTNESS gate checks the FIRST 50 entries.  Round-5
# rotation (VERDICT r4 #6): ~25 flagship slots stay pinned; the other 25
# rotate through queries that never had a driver row (r04 window: CDC
# core + lifecycle + LLM batch 1 — all 50 green, still covered by the
# 142-query self gate every round).
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
    # rotated in (no r04 row): round-4/5 cluster family
    # (semantic_dup_groups rotated back out for session-5 additions —
    # family still covered by semantic_dedup_pairs + the self gate)
    "embedding_kmeans", "semantic_dedup_pairs",
    "cdc_pg_dedup_latest",
    # rotated in: TPC-H tail (q3/q5/q6 earned rows in r01-r03 and
    # rotate back out for the round-5 additions)
    "q9_nation_year_profit", "q18_large_volume_customers",
    "q21_late_supplier_blame",
    # rotated in: windows suite (window_functions_suite/rollup_orders
    # earned rows in r01-r03, rotated back out)
    "hopping_window_agg",
    # rotated in: text/sketch/evaluation operators (countmin rotated
    # back out for session-5 — sketch family stays self-gated)
    "embedding_ann_recall", "simhash_near_pairs",
    # rotated in: format surface + the CDC→OLAP maintained-view flagship
    "all_datatypes_decode", "cdc_incremental_mv",
    # rotated in: round-5 second-session additions (never had a row;
    # ccnet/xml rotated back out — ppl family covered by
    # bigram_perplexity, format family by variant + all_datatypes)
    "dsir_select_docs", "exact_substr_spans",
    "variant_shred_events",
    # rotated in: session-3 additions — TPC-H tail + curation staples
    # (q16/q20 rotated back out, tail represented by q2/q11)
    "q2_min_cost_supplier", "q11_important_stock",
    "ngram_decontaminate", "dup_canonical_best", "bigram_perplexity",
    # rotated in: session-4/5 additions (never had a row) — streaming
    # LSH index, PQ-ANN, Z-order layout, time-series resample, drift
    # monitor, k-NN join
    "streaming_lsh_dedup_pairs", "embedding_pq_ann_recall",
    "zorder_layout_stats", "resample_interpolate", "vocab_drift_jsd",
    "knn_join_ivf",
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
