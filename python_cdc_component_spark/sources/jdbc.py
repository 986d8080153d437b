"""JDBC snapshot source + metadata scan (S2/S3/S5/S8).

Parity targets:
- S2 initial snapshot: Debezium ``snapshot.mode`` full-SELECT phase with
  ``snapshot.max.threads`` / ``snapshot.fetch.size`` parallelism
  (reference ``mysql_extractor.py:154-156``; mode selection
  ``ex_mysql_cdc/src/component.py:575-592``) → ``spark.read.jdbc`` with
  ``numPartitions``/``partitionColumn`` range splits;
- S3 per-table snapshot statement override
  (``mysql_extractor.py:175-179``) → subquery pushdown via ``dbtable``;
- S5 JDBC metadata scan (``db_connection.py:111-200`` →
  ``metadata.py:13-49``) → ``information_schema`` queries through the
  same JDBC reader, yielding TableSchema.

Integration-tested against the embedded Derby engine that ships with
Spark (``tests/test_jdbc_integration.py``: full snapshot, partitioned
range read, statement override); driver correctness uses the
file-backed source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..model.schema import TableSchema
from ..model.types import jdbc_type_to_base, base_type_to_spark

from pyspark.sql import types as T

DEFAULT_FETCH_SIZE = 10240   # reference snapshot.fetch.size, configuration.py:162
DEFAULT_NUM_PARTITIONS = 2   # reference snapshot.max.threads, configuration.py:163


def snapshot_read(spark: SparkSession, url: str, table: str,
                  properties: dict | None = None,
                  partition_column: str | None = None,
                  lower_bound: int | None = None,
                  upper_bound: int | None = None,
                  num_partitions: int = DEFAULT_NUM_PARTITIONS,
                  statement_override: str | None = None) -> DataFrame:
    """S2/S3: snapshot a source table. With a numeric ``partition_column``
    Spark issues ``num_partitions`` range-bounded SELECTs in parallel
    (the scale path: at 100 TB sources, size partitions so each fetch is
    ~100-500 MB). ``statement_override`` replaces the table with a
    subquery, pushed to the source like the reference's
    ``snapshot.select.statement.overrides``."""
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("fetchsize", str(DEFAULT_FETCH_SIZE)))
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if statement_override:
        reader = reader.option("dbtable", f"({statement_override}) snapshot_src")
    else:
        reader = reader.option("dbtable", table)
    if partition_column is not None:
        reader = (reader
                  .option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions)))
    return reader.load()


_INFO_SCHEMA_QUERY = """
SELECT c.table_schema, c.table_name, c.column_name, c.data_type,
       c.character_maximum_length, c.numeric_precision, c.numeric_scale,
       c.is_nullable,
       CASE WHEN k.column_name IS NOT NULL THEN 1 ELSE 0 END AS is_pk
FROM information_schema.columns c
LEFT JOIN information_schema.key_column_usage k
  ON  k.table_schema = c.table_schema
  AND k.table_name   = c.table_name
  AND k.column_name  = c.column_name
  AND k.constraint_name = 'PRIMARY'
WHERE c.table_schema = '{schema}'
ORDER BY c.table_name, c.ordinal_position
"""


def read_information_schema(spark: SparkSession, url: str, schema: str,
                            properties: dict | None = None) -> DataFrame:
    """S5: one metadata scan per source schema (columns + PK flags),
    replacing per-table JDBC DatabaseMetaData round-trips with a single
    set-based query."""
    q = _INFO_SCHEMA_QUERY.format(schema=schema)
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("dbtable", f"({q}) info"))
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def rows_to_table_schema(rows: list, table_name: str) -> TableSchema:
    """Assemble a TableSchema from metadata rows (reference
    ``metadata.py:13-49``). ``rows``: (column_name, data_type,
    char_len, num_precision, num_scale, is_nullable, is_pk)."""
    fields, pks = [], []
    for (col, dtype, char_len, prec, scale, nullable, is_pk) in rows:
        base = jdbc_type_to_base(dtype, char_len)
        spark_t = base_type_to_spark(base, prec, scale)
        fields.append(T.StructField(col, spark_t, str(nullable).upper() != "NO"))
        if is_pk:
            pks.append(col)
    return TableSchema(name=table_name, struct=T.StructType(fields),
                       primary_keys=pks)
