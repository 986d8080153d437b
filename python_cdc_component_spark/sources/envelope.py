"""Kafka-Connect envelope parsing (S1/F5).

Parity target: the reference consumes Debezium JSON change events shaped
``{schema: {name, fields[]}, payload: {...}}`` and extracts the table
identity from ``schema.name`` (stripping the ``.Value`` suffix) and the
row payload (reference ``DbChangeConsumer.java:164-199``
``extractTableNameAndPayload``, ``:201-229`` ``extractSchemaFields``).

Spark-first: ``from_json`` with an explicit envelope ``StructType`` —
the whole parse stays in the JVM (no per-row Python), and Catalyst
prunes unreferenced payload fields out of the JSON parser via
schema-of-use pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def envelope_schema(payload: T.StructType) -> T.StructType:
    """Envelope StructType for a given payload schema."""
    return T.StructType([
        T.StructField("schema", T.StructType([
            T.StructField("name", T.StringType()),
        ])),
        T.StructField("payload", payload),
    ])


def table_from_schema_name(name: Column) -> Column:
    """``db.table.Value`` → ``db_table`` (strip the ``.Value`` suffix,
    normalize dots — reference ``DbChangeConsumer.java:188-199`` +
    ``DedupeDbConverter.java:26`` name normalization)."""
    stripped = F.regexp_replace(name, r"\.Value$", "")
    return F.regexp_replace(stripped, r"\.", "_")


def parse_envelope(df: DataFrame, json_col: str,
                   payload: T.StructType) -> DataFrame:
    """Parse envelope JSON strings into ``(_table, payload.*)`` columns.

    Unparseable rows (tombstones — NULL/malformed JSON, P8) yield NULL
    structs and are dropped, matching the reference's tombstone skip
    (``ExtractNewRecordStateSchemaChanges.java:155-165``).
    """
    parsed = df.withColumn("__env", F.from_json(F.col(json_col),
                                                envelope_schema(payload)))
    out = (parsed
           .filter(F.col("__env").isNotNull()
                   & F.col("__env.payload").isNotNull())
           .select(
               table_from_schema_name(F.col("__env.schema.name"))
                .alias("_table"),
               F.col("__env.payload.*")))
    return out
