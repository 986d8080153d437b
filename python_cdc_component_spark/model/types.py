"""The three-layer type system, mapped to Spark types.

Parity target (SURVEY §1.2):
(a) Debezium/Kafka-Connect wire types → column types, reference
    ``AbstractDbConverter.java:166-202`` (``SchemaElement.dbType``);
(b) JDBC source types → 7-value base-type enum, reference
    ``db_components/db_common/table_schema.py:7-15`` plus per-DB maps
    (``mysql_extractor.py:23-60``, ``postgres_extractor.py:21-52``);
(c) staging types: everything TEXT except the order column BIGINT,
    reference ``staging.py:376-391`` — on Spark we keep real types and
    only fall back to strings where the reference's output contract does
    (decimals-as-string, binary per handling mode, nested JSON as text).
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import types as T


class BaseType(str, Enum):
    """Reference ``table_schema.py:7-15`` BaseTypeConverter values."""

    STRING = "STRING"
    INTEGER = "INTEGER"
    NUMERIC = "NUMERIC"
    FLOAT = "FLOAT"
    BOOLEAN = "BOOLEAN"
    DATE = "DATE"
    TIMESTAMP = "TIMESTAMP"


# STRING length cap mirrors reference ex_mysql_cdc/src/component.py:427-447.
MAX_STRING_LENGTH = 16777216


def base_type_to_spark(base: BaseType, precision: int | None = None,
                       scale: int | None = None) -> T.DataType:
    if base is BaseType.STRING:
        return T.StringType()
    if base is BaseType.INTEGER:
        return T.LongType()
    if base is BaseType.NUMERIC:
        return T.DecimalType(precision or 38, scale or 0)
    if base is BaseType.FLOAT:
        return T.DoubleType()
    if base is BaseType.BOOLEAN:
        return T.BooleanType()
    if base is BaseType.DATE:
        return T.DateType()
    if base is BaseType.TIMESTAMP:
        return T.TimestampType()
    raise ValueError(f"unknown base type {base}")


# (wire `type`, logical `name` or None) → Spark type, per
# AbstractDbConverter.java:166-202. Logical names are the Debezium /
# Kafka-Connect class names carried in the schema block.
_WIRE_MAP: dict[tuple[str, str | None], T.DataType] = {
    ("int", None): T.IntegerType(),
    ("int8", None): T.IntegerType(),
    ("int16", None): T.IntegerType(),
    ("int32", None): T.IntegerType(),
    ("int32", "io.debezium.time.Date"): T.DateType(),
    ("int32", "org.apache.kafka.connect.data.Date"): T.DateType(),
    ("int64", None): T.LongType(),
    ("int64", "org.apache.kafka.connect.data.Timestamp"): T.TimestampType(),
    ("int64", "io.debezium.time.Timestamp"): T.TimestampType(),
    ("float", None): T.FloatType(),
    ("float32", None): T.FloatType(),
    ("float64", None): T.DoubleType(),
    ("double", None): T.DoubleType(),
    ("boolean", None): T.BooleanType(),
    ("string", None): T.StringType(),
    ("string", "io.debezium.data.Uuid"): T.StringType(),
    ("string", "io.debezium.time.ZonedTimestamp"): T.TimestampType(),
    ("string", "io.debezium.time.Interval"): T.StringType(),
    # binary pre-encoded hex/base64 per binary.handling.mode
    # (mysql_extractor.py:159) → stays a string on the wire.
    ("bytes", None): T.StringType(),
    # nested data is stringified JSON, never decomposed
    # (AbstractDbConverter.java:194).
    ("array", None): T.StringType(),
    ("struct", None): T.StringType(),
}


def wire_type_to_spark(wire_type: str, logical_name: str | None = None) -> T.DataType:
    """Map a Kafka-Connect wire type (+ optional logical name) to Spark."""
    key = (wire_type, logical_name)
    if key in _WIRE_MAP:
        return _WIRE_MAP[key]
    if (wire_type, None) in _WIRE_MAP:
        return _WIRE_MAP[(wire_type, None)]
    return T.StringType()


# JDBC type-name → base type. Union of the MySQL map
# (mysql_extractor.py:23-60; note bit(1)→BOOLEAN at :54-57) and the
# Postgres map (postgres_extractor.py:21-52); unmapped → STRING.
_JDBC_BASE: dict[str, BaseType] = {
    # integers
    "int": BaseType.INTEGER, "integer": BaseType.INTEGER,
    "tinyint": BaseType.INTEGER, "smallint": BaseType.INTEGER,
    "mediumint": BaseType.INTEGER, "bigint": BaseType.INTEGER,
    "serial": BaseType.INTEGER, "bigserial": BaseType.INTEGER,
    "smallserial": BaseType.INTEGER, "int2": BaseType.INTEGER,
    "int4": BaseType.INTEGER, "int8": BaseType.INTEGER,
    "year": BaseType.INTEGER,
    # numerics / floats
    "decimal": BaseType.NUMERIC, "numeric": BaseType.NUMERIC,
    "float": BaseType.FLOAT, "double": BaseType.FLOAT,
    "double precision": BaseType.FLOAT, "real": BaseType.FLOAT,
    "float4": BaseType.FLOAT, "float8": BaseType.FLOAT,
    # boolean
    "boolean": BaseType.BOOLEAN, "bool": BaseType.BOOLEAN,
    # temporal
    "date": BaseType.DATE,
    "datetime": BaseType.TIMESTAMP, "timestamp": BaseType.TIMESTAMP,
    "timestamptz": BaseType.TIMESTAMP,
    "timestamp with time zone": BaseType.TIMESTAMP,
    "timestamp without time zone": BaseType.TIMESTAMP,
    # strings and everything exotic
    "char": BaseType.STRING, "varchar": BaseType.STRING,
    "text": BaseType.STRING, "tinytext": BaseType.STRING,
    "mediumtext": BaseType.STRING, "longtext": BaseType.STRING,
    "character varying": BaseType.STRING, "character": BaseType.STRING,
    "uuid": BaseType.STRING, "json": BaseType.STRING,
    "jsonb": BaseType.STRING, "xml": BaseType.STRING,
    "enum": BaseType.STRING, "set": BaseType.STRING,
    "time": BaseType.STRING, "timetz": BaseType.STRING,
    "interval": BaseType.STRING,
}


def jdbc_type_to_base(type_name: str, column_length: int | None = None) -> BaseType:
    """JDBC type name → base type; ``bit(1)`` → BOOLEAN like the
    reference (mysql_extractor.py:54-57), other bit widths → STRING."""
    t = type_name.strip().lower()
    if t.startswith("bit"):
        return BaseType.BOOLEAN if (column_length or 1) == 1 else BaseType.STRING
    base = t.split("(")[0].strip()
    return _JDBC_BASE.get(base, BaseType.STRING)
