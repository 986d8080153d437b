"""python_cdc_component_spark — a PySpark-native CDC / analytics engine.

A brand-new engine with the query and data-processing capabilities of
keboola/python-cdc-component (reference at /root/reference), re-expressed
Spark-first:

- the reference's DuckDB SQL dedup/compaction pipeline (reference
  ``db_components/db_common/staging.py``) becomes declarative DataFrame
  window / anti-join plans optimized by Catalyst;
- the Debezium bounded-stream consumption (reference
  ``debezium_core/src/main/java/keboola/cdc/debezium/``) becomes
  Structured Streaming with ``Trigger.AvailableNow`` + ``foreachBatch``;
- the JDBC metadata / 7-base-type catalog (reference
  ``db_components/db_common/metadata.py``, ``table_schema.py``) becomes a
  ``StructType``-based schema registry with explicit merge rules;
- beyond-reference: large-scale training-data operators (dedup families,
  similarity search, text analysis, multimodal column plumbing) under
  ``operators.llm``.

Everything here is built on the public Apache Spark / PySpark API only.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import python_cdc_component_spark`
    cheap — pyspark loads only when an engine symbol is touched)."""
    from importlib import import_module
    _API = {
        "get_spark": ".session",
        "sync": ".engine", "SyncConfig": ".engine",
        "plan_table": ".engine", "to_output_columns": ".engine",
        "bounded_sync": ".streaming.bounded",
        "BoundedStreamConfig": ".streaming.bounded",
        "read_event_stream": ".streaming.bounded",
        "dedup_latest": ".operators.dedup",
        "chunked_dedup": ".operators.dedup",
        "asof_join": ".operators.asof",
        "salted_join": ".operators.joins",
        "union_epochs": ".operators.schema_align",
        "align_to_schema": ".operators.schema_align",
        "merge_schemas": ".model.schema",
        "SchemaRegistry": ".model.schema",
        "TableSchema": ".model.schema",
        "RunState": ".sinks.state",
        "QUERIES": ".queries", "ORACLES": ".queries",
    }
    if name in _API:
        return getattr(import_module(_API[name], __name__), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
