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
