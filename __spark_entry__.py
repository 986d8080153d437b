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
DRIVER_WINDOW = [
    # CDC core (S1, W1-W3, J1/J2, P2/P5, T4/T5/T7/T9, §2.7, F1-F5)
    "cdc_dedup_latest", "cdc_dedup_composite_key", "cdc_current_state",
    "cdc_append", "cdc_chunked_dedup", "cdc_no_pkey_dedup",
    "cdc_schema_align_union", "cdc_scalar_funcs",
    # source/sink lifecycle
    "jdbc_snapshot_override", "jdbc_metadata_schema",
    "incremental_snapshot_users", "snapshot_backfill_region",
    "csv_roundtrip_nation", "sync_actions_contract", "merge_upsert_dedup",
    "manifest_contract", "state_offsets_roundtrip", "column_filter_outputs",
    "json_stringify_orders", "schema_changes_route", "envelope_roundtrip",
    "streaming_bounded_dedup", "multi_table_sync_dedup",
    # UDF surface (§2.10) + F9 binary modes
    "embedding_topk_pandas", "grouped_agg_pandas_median", "udtf_json_kv",
    "binary_encode_modes",
    # LLM-pipeline flagships
    "exact_dedup_docs", "minhash_signatures", "minhash_lsh_pairs",
    "simhash_docs", "ngram_jaccard_pairs", "embedding_dup_pairs",
    "embedding_topk", "embedding_ivf_ann", "segment_dedup_docs",
    "bloom_dedup_incremental", "pii_redact", "unigram_perplexity",
    "text_langid", "text_quality", "multimodal_meta", "multimodal_frames",
    "dup_components", "dedup_pipeline_summary",
    # one representative per remaining operator family
    "events_windowed_agg", "sessionize_events", "asof_join_events",
    "q1_pricing_summary", "snapshot_mode_never_chain",
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
