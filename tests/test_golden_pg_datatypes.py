"""PG all-datatypes byte golden: the reference's full Postgres
type-mapping egress (``ex_postgres_cdc/tests/functional/
all-datatypes-chained/``), replayed from the source workload
(``sql_test_traits/all_datatypes.sql``) through Spark types + the CSV
sink, byte-compared with both stage goldens.

Pins the observed egress contracts per PG type family:

- DECIMAL/NUMERIC(5,2) keep scale textually (``5.00``); REAL/DOUBLE
  print shortest-form floats (``7.0``);
- MONEY decodes as a double in SNAPSHOT events (``12.0``) but as a
  scale-2 decimal in STREAMED events (``14.00``) — the two stages pin
  both flavors of that Debezium quirk;
- CHAR(n) arrives space-padded to n, written unquoted;
- BYTEA → base64; BIT(n) → base64 of the bit-string VALUE in
  little-endian bytes (B'1010000000' = 640 = 0x0280 → ``gAI=``);
- TIMESTAMP → naive ``yyyy-MM-dd HH:mm:ss``; TIMESTAMPTZ normalizes
  to UTC with ``+00``; DATE → ISO; TIME → millis-of-day int; TIMETZ →
  UTC-normalized ``HH:mm:ssZ`` string;
- INTERVAL → Debezium MicroDuration micros (month = 30.4375 days,
  year = 12 months);
- BOOLEAN → ``true``/``false`` (unlike MySQL's TINYINT(1) 1/0);
- POINT → Debezium Point struct JSON {"x","y","wkb","srid":null};
  LINE/LSEG/BOX/PATH/POLYGON/CIRCLE/TSVECTOR/TSQUERY are dropped from
  the egress entirely (absent from the expected manifest);
- INET/CIDR/MACADDR/UUID/XML/JSON/JSONB verbatim; INTEGER[] →
  ``[1,2,3]``; INT4RANGE → ``[1,10)``.
"""

import base64
import datetime
import os
import struct
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_cdc_component_spark.sinks.csv_sink import write_csv

GOLD = ("/root/reference/db_components/ex_postgres_cdc/tests/functional/"
        "all-datatypes-chained/{stage}/expected/data/out/tables/"
        "inventory_all_data_types.csv")


def _point_wkb_b64(x: float, y: float) -> str:
    """Little-endian WKB for POINT(x y), as Debezium's Point.wkb."""
    return base64.b64encode(
        b"\x01\x01\x00\x00\x00" + struct.pack("<dd", x, y)).decode()


def _bits_b64(bitstring: str) -> str:
    """Debezium Bits: the bit-string value in little-endian bytes."""
    v = int(bitstring, 2)
    n = (len(bitstring) + 7) // 8
    return base64.b64encode(v.to_bytes(n, "little")).decode()


def _interval_micros(y, mo, d, h, mi, s) -> int:
    """Debezium MicroDuration: month = 30.4375 days, year = 12 months."""
    days = (y * 12 + mo) * 30.4375 + d
    return int((days * 86400 + h * 3600 + mi * 60 + s) * 1_000_000)


B64_DEADBEEF = base64.b64encode(bytes.fromhex("deadbeef")).decode()


def _payload(i: int, *, tz_off: int, money, smallint=None):
    """Row i (1-based) of the workload: every column derives from i by
    the fixture's arithmetic progression. ``money``'s Python type per
    stage pins the snapshot-double vs streamed-decimal quirk."""
    ts = datetime.datetime(2003 + i, 9 + i, 18 + i, 9 + i, 22 + i, 53 + i)
    ts_utc = ts.replace(tzinfo=datetime.timezone(
        datetime.timedelta(hours=tz_off))).astimezone(
        datetime.timezone.utc)
    time_ms = ((9 + i) * 3600 + (22 + i) * 60 + (53 + i)) * 1000
    timetz = ts_utc.strftime("%H:%M:%SZ")
    chars = "abcdefg"
    return (
        i,                                       # id (serial)
        smallint if smallint is not None else i, # col_smallint
        i + 1, i + 2, i + 3,                     # integer, int, bigint
        Decimal(i + 4), Decimal(i + 5),          # decimal, numeric (5,2)
        float(i + 6), float(i + 7),              # real, double
        i + 8, i + 9, i + 10,                    # smallserial/serial/big
        money,                                   # money (see docstring)
        chars[i - 1].ljust(10), chars[i].ljust(10),   # character, char
        chars[i + 1], chars[i + 2], chars[i + 3],     # varying/varchar/text
        B64_DEADBEEF,                            # bytea
        ts, ts_utc,                              # timestamp, timestamptz
        ts.date(), time_ms, timetz,              # date, time, timetz
        _interval_micros(i, i + 1, i + 2, i + 3, i + 4, i + 5),
        i % 2 == 1,                              # boolean
        float(i), float(i), _point_wkb_b64(i, i),  # point x, y, wkb
        f"192.168.{i}.0/24", f"192.168.{i}.{i}",  # cidr, inet
        f"08:00:2b:0{i}:0{i + 1}:0{i + 2}",
        f"08:00:2b:0{i}:0{i + 1}:0{i + 2}:0{i + 3}:0{i + 4}",
        # fixture bit strings: B'1010000000', B'1100000000', B'1110000000'
        _bits_b64(["1010000000", "1100000000", "1110000000"][i - 1]),
        _bits_b64(["1010000000", "1100000000", "1110000000"][i - 1]),
        ["a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11",
         "b1ffbc99-9c0b-4ef8-bb6d-6bb9bd380a12",
         "123e4567-e89b-12d3-a456-426614174000"][i - 1],
        ["<foo>bar</foo>", "<bar>foo</bar>", "<baz>qux</baz>"][i - 1],
        '{"key%s": "value%s"}' % (("", "") if i == 1
                                  else (str(i - 1), str(i - 1))),
        '{"key%s": "value%s"}' % (("", "") if i == 1
                                  else (str(i - 1), str(i - 1))),
        f"[{i},{i + 1},{i + 2}]",                # integer[]
        f"[{i},{i + 9})",                        # int4range
    )


def _schema(money_type: T.DataType) -> T.StructType:
    f = T.StructField
    return T.StructType([
        f("id", T.LongType()),
        f("col_smallint", T.IntegerType()),
        f("col_integer", T.IntegerType()),
        f("col_int", T.IntegerType()),
        f("col_bigint", T.LongType()),
        f("col_decimal", T.DecimalType(5, 2)),
        f("col_numeric", T.DecimalType(5, 2)),
        f("col_real", T.FloatType()),
        f("col_double_precision", T.DoubleType()),
        f("col_smallserial", T.IntegerType()),
        f("col_serial", T.IntegerType()),
        f("col_bigserial", T.LongType()),
        f("col_money", money_type),
        f("col_character", T.StringType()),
        f("col_char", T.StringType()),
        f("col_character_varying", T.StringType()),
        f("col_varchar", T.StringType()),
        f("col_text", T.StringType()),
        f("col_bytea", T.StringType()),
        f("col_timestamp", T.TimestampNTZType()),
        f("col_timestamp_with_time_zone", T.TimestampType()),
        f("col_date", T.DateType()),
        f("col_time", T.IntegerType()),
        f("col_time_with_time_zone", T.StringType()),
        f("col_interval", T.LongType()),
        f("col_boolean", T.BooleanType()),
        f("point_x", T.DoubleType()),
        f("point_y", T.DoubleType()),
        f("point_wkb", T.StringType()),
        f("col_cidr", T.StringType()),
        f("col_inet", T.StringType()),
        f("col_macaddr", T.StringType()),
        f("col_macaddr8", T.StringType()),
        f("col_bit", T.StringType()),
        f("col_bit_varying", T.StringType()),
        f("col_uuid", T.StringType()),
        f("col_xml", T.StringType()),
        f("col_json", T.StringType()),
        f("col_jsonb", T.StringType()),
        f("col_integer_array", T.StringType()),
        f("col_int4range", T.StringType()),
        f("KBC__OPERATION", T.StringType()),
        f("KBC__DELETED", T.BooleanType()),
        f("KBC__BATCH_EVENT_ORDER", T.LongType()),
    ])


def _export(spark, rows, money_type, out_dir) -> bytes:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame(rows, _schema(money_type))
    # Debezium Point struct → JSON with x/y doubles, wkb b64, null srid
    point = F.to_json(
        F.struct(F.col("point_x").alias("x"),
                 F.col("point_y").alias("y"),
                 F.col("point_wkb").alias("wkb"),
                 F.lit(None).cast("int").alias("srid")),
        {"ignoreNullFields": "false"})
    proj = []
    for fld in _schema(money_type).fields:
        if fld.name == "point_x":
            proj.append(point.alias("col_point"))
        elif fld.name in ("point_y", "point_wkb"):
            continue
        else:
            proj.append(F.col(fld.name))
    out = (df.select(*proj).repartition(1)
           .sortWithinPartitions("KBC__BATCH_EVENT_ORDER"))
    write_csv(out, out_dir, null_value="", options={
        "escape": '"',
        # CHAR(10) arrives space-padded and the reference egress keeps
        # the padding — the Spark CSV writer trims it by default
        "ignoreTrailingWhiteSpace": "false",
        "ignoreLeadingWhiteSpace": "false",
        "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss",
        "timestampFormat": "yyyy-MM-dd HH:mm:ssx",
    })
    part = next(f for f in sorted(os.listdir(out_dir))
                if f.endswith(".csv"))
    with open(os.path.join(out_dir, part), "rb") as fh:
        return fh.read()


def test_pg_all_datatypes_snapshot_byte_match(spark, tmp_path):
    """Stage 1: the two snapshot rows — MONEY as a snapshot double."""
    rows = [_payload(1, tz_off=2, money=12.0) + ("r", False, 0),
            _payload(2, tz_off=3, money=13.0) + ("r", False, 1)]
    got = _export(spark, rows, T.DoubleType(), str(tmp_path / "pg_adt1"))
    with open(GOLD.format(stage="01_simple-full-load"), "rb") as fh:
        assert got == fh.read()


def test_pg_all_datatypes_streamed_byte_match(spark, tmp_path):
    """Stage 2: the streamed insert + the update's after-image — MONEY
    as a scale-2 decimal, the updated col_smallint=0 carried through."""
    rows = [
        _payload(3, tz_off=4, money=Decimal("14.00")) + ("c", False, 0),
        _payload(2, tz_off=3, money=Decimal("13.00"),
                 smallint=0) + ("u", False, 1),
    ]
    got = _export(spark, rows, T.DecimalType(19, 2),
                  str(tmp_path / "pg_adt2"))
    with open(GOLD.format(stage="02_inserts_updates_deletes"),
              "rb") as fh:
        assert got == fh.read()


# ---------------------------------------------------------------------------
# legacy manifest parity: the full 40-column all-datatypes manifest
# (``.csv.manifest`` next to the stage goldens) — floats carry DECIMAL
# precision (real → NUMERIC/8, double precision → NUMERIC/17), temporals
# their JDBC display size (timestamp → 29, timestamptz → 35, date → 13,
# time → 15, timetz → 21), unbounded/opaque types the int32 cap, and
# arrays the ELEMENT type's length (integer[] → STRING/10).

# source-native DDL types per surviving column (sql_test_traits/
# all_datatypes.sql; the unsupported geometric/tsvector columns are
# dropped from the egress and carry no metadata).
_ADT_DDL = {
    "id": "serial",
    "col_smallint": "smallint",
    "col_integer": "integer",
    "col_int": "int",
    "col_bigint": "bigint",
    "col_decimal": "decimal(5,2)",
    "col_numeric": "numeric(5,2)",
    "col_real": "real",
    "col_double_precision": "double precision",
    "col_smallserial": "smallserial",
    "col_serial": "serial",
    "col_bigserial": "bigserial",
    "col_money": "money",
    "col_character": "character(10)",
    "col_char": "char(10)",
    "col_character_varying": "character varying(10)",
    "col_varchar": "varchar(10)",
    "col_text": "text",
    "col_bytea": "bytea",
    "col_timestamp": "timestamp",
    "col_timestamp_with_time_zone": "timestamp with time zone",
    "col_date": "date",
    "col_time": "time",
    "col_time_with_time_zone": "time with time zone",
    "col_interval": "interval",
    "col_boolean": "boolean",
    "col_point": "point",
    "col_cidr": "cidr",
    "col_inet": "inet",
    "col_macaddr": "macaddr",
    "col_macaddr8": "macaddr8",
    "col_bit": "bit(10)",
    "col_bit_varying": "bit varying(10)",
    "col_uuid": "uuid",
    "col_xml": "xml",
    "col_json": "json",
    "col_jsonb": "jsonb",
    "col_integer_array": "integer[]",
    "col_int4range": "int4range",
}


def test_pg_all_datatypes_manifest_parity():
    """build_legacy_manifest over the scenario's own DDL types is
    dict-identical to BOTH stage goldens (append load type: no PK,
    no destination, no incremental key)."""
    import json

    from python_cdc_component_spark.sinks.manifest import (
        build_legacy_manifest)

    for stage in ("01_simple-full-load", "02_inserts_updates_deletes"):
        want = json.load(open(GOLD.format(stage=stage) + ".manifest"))
        nullable = {
            n: {m["key"].split(".")[-1]: m["value"] for m in md}.get(
                "nullable")
            for n, md in want["column_metadata"].items()}
        data_cols = [c for c in want["columns"]
                     if not c.startswith("KBC__")]
        cols = [(c, _ADT_DDL[c], nullable[c]) for c in data_cols]
        got = build_legacy_manifest(cols, dialect="postgres")
        assert got == want
        assert list(got) == list(want)      # serialization key order
