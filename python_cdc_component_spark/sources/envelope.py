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

from ..model.types import wire_type_to_spark

_TS_LOGICAL = ("org.apache.kafka.connect.data.Timestamp",
               "io.debezium.time.Timestamp")
_DATE_LOGICAL = ("org.apache.kafka.connect.data.Date",
                 "io.debezium.time.Date")


def connect_fields_to_struct(fields: list[dict]) -> T.StructType:
    """Kafka-Connect schema field list (the ``schema.fields`` array of a
    Debezium envelope / the reference's ``initialSchema.json`` shape,
    ``AbstractDbConverter.java:148-202`` SchemaElement) → the payload
    StructType at the WIRE layer.

    Logical temporal types travel as integers on the wire (Timestamp =
    epoch-millis int64, Date = epoch-days int32), so they parse as
    integers here; ``decode_logical`` applies the logical conversions
    after parsing.  ``orderEvent`` fields are engine-added bookkeeping
    (reference ``AbstractDbConverter.java:150`` orderEvent flag), never
    part of the wire payload."""
    out = []
    for f in fields:
        if f.get("orderEvent"):
            continue
        name, wire = f.get("name"), f["type"]
        if wire == "int64" and name in _TS_LOGICAL:
            dt: T.DataType = T.LongType()
        elif wire == "int32" and name in _DATE_LOGICAL:
            dt = T.IntegerType()
        else:
            dt = wire_type_to_spark(wire, name)
        out.append(T.StructField(f["field"], dt, f.get("optional", True)))
    return T.StructType(out)


def decode_logical(df: DataFrame, fields: list[dict]) -> DataFrame:
    """Apply Kafka-Connect logical-type decodes after the wire parse:
    epoch-millis → timestamp, epoch-days → date (the int64/int32 branch
    of ``SchemaElement.dbType``, AbstractDbConverter.java:166-180)."""
    for f in fields:
        name, col = f.get("name"), f["field"]
        if col not in df.columns:
            continue
        if f["type"] == "int64" and name in _TS_LOGICAL:
            df = df.withColumn(col, F.timestamp_millis(F.col(col)))
        elif f["type"] == "int32" and name in _DATE_LOGICAL:
            df = df.withColumn(
                col, F.date_add(F.lit("1970-01-01").cast("date"),
                                F.col(col)))
    return df


def missing_columns(payload: dict, fields: list[dict]) -> list[str]:
    """Payload keys absent from the schema — the drift probe the
    reference runs per event (``AbstractDbConverter.isMissingAnyColumn``,
    the trigger for ``adjustSchema`` + chunk rotation)."""
    known = {f["field"] for f in fields}
    return [k for k in payload if k not in known]


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
