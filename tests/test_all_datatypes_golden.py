"""all-data-types byte golden: the reference's full MySQL type-mapping
egress (``ex_mysql_cdc/tests/functional/all-data-types/``), replayed
from the source workload (``sql_test_traits/all_data_types.sql``)
through Spark types + the CSV sink, byte-compared with the expected CSV.

Pins the observed egress contracts per type family:
- DATE → ISO day; DATETIME → ``yyyy-MM-dd HH:mm:ss`` (naive);
  TIMESTAMP → zoned ``yyyy-MM-dd HH:mm:ss+00`` under the UTC session;
- TIME → millis-of-day integer, with midnight (0) emitted EMPTY;
- DECIMAL(10,2) keeps its scale textually (``123.45``);
- BOOLEAN (TINYINT(1)) → ``1``/``0`` ints;
- BLOB/BIT/BINARY/VARBINARY → base64 (``binary.handling.mode``
  default), BINARY(8) zero-padded before encoding;
- GEOMETRY → Debezium Geometry struct JSON-stringified with an explicit
  ``"srid":null`` (to_json must keep null fields);
- JSON/text columns pass through verbatim, RFC-4180 quote-doubling.
"""

import base64
import datetime
import os
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_cdc_component_spark.sinks.csv_sink import write_csv

GOLD = ("/root/reference/db_components/ex_mysql_cdc/tests/functional/"
        "all-data-types/expected/data/out/tables/"
        "inventory_all_data_types.csv")

# POINT(1 1) little-endian WKB, as Debezium's Geometry.wkb carries it
WKB_POINT_1_1 = bytes.fromhex(
    "0101000000000000000000f03f000000000000f03f")

HELLO = "Hello, World!"
B64_HELLO = base64.b64encode(HELLO.encode()).decode()          # blob cols
B64_HELLO5 = base64.b64encode(b"Hello").decode()               # tinyblob
B64_BIT = base64.b64encode(bytes([0b10101010])).decode()       # qg==
B64_BIN8 = base64.b64encode(bytes([0b10101010]) + b"\x00" * 7).decode()

# per-row varying source values (all_data_types.sql): TIME + BOOLEAN
TIMES_MS = [0, 1_800_000, 3_600_000, 10_000, 0, 0, 0, 0, 0, 0]
BOOLS = [1, 1, 0, 1, 1, 1, 1, 1, 1, 1]


def _rows():
    d = datetime.date(2022, 1, 1)
    dt = datetime.datetime(2022, 1, 1, 0, 0, 0)
    for i in range(10):
        yield (
            i + 1, 1, 1, 1, 1, 1,
            1.23, 1.23, Decimal("123.45"),
            d, dt, dt.replace(tzinfo=datetime.timezone.utc),
            # observed egress contract: TIME midnight (0 ms) is EMPTY
            TIMES_MS[i] or None,
            2022, "abcdefghij", HELLO,
            B64_HELLO, HELLO, B64_HELLO5, "Hello",
            B64_HELLO, HELLO, B64_HELLO, HELLO,
            "x", "a,b", B64_BIT, B64_BIN8, B64_BIT,
            base64.b64encode(WKB_POINT_1_1).decode(),
            BOOLS[i], '{"key": "value"}',
            "r", False, i,
        )


SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("sample_int", T.IntegerType()),
    T.StructField("sample_tinyint", T.IntegerType()),
    T.StructField("sample_smallint", T.IntegerType()),
    T.StructField("sample_mediumint", T.IntegerType()),
    T.StructField("sample_bigint", T.LongType()),
    T.StructField("sample_float", T.FloatType()),
    T.StructField("sample_double", T.DoubleType()),
    T.StructField("sample_decimal", T.DecimalType(10, 2)),
    T.StructField("sample_date", T.DateType()),
    T.StructField("sample_datetime", T.TimestampNTZType()),
    T.StructField("sample_timestamp", T.TimestampType()),
    T.StructField("sample_time", T.IntegerType()),
    T.StructField("sample_year", T.IntegerType()),
    T.StructField("sample_char", T.StringType()),
    T.StructField("sample_varchar", T.StringType()),
    T.StructField("sample_blob", T.StringType()),
    T.StructField("sample_text", T.StringType()),
    T.StructField("sample_tinyblob", T.StringType()),
    T.StructField("sample_tinytext", T.StringType()),
    T.StructField("sample_mediumblob", T.StringType()),
    T.StructField("sample_mediumtext", T.StringType()),
    T.StructField("sample_longblob", T.StringType()),
    T.StructField("sample_longtext", T.StringType()),
    T.StructField("sample_enum", T.StringType()),
    T.StructField("sample_set", T.StringType()),
    T.StructField("sample_bit", T.StringType()),
    T.StructField("sample_binary", T.StringType()),
    T.StructField("sample_varbinary", T.StringType()),
    T.StructField("wkb_b64", T.StringType()),
    T.StructField("sample_boolean", T.IntegerType()),
    T.StructField("sample_json", T.StringType()),
    T.StructField("KBC__OPERATION", T.StringType()),
    T.StructField("KBC__DELETED", T.BooleanType()),
    T.StructField("KBC__BATCH_EVENT_ORDER", T.LongType()),
])


def test_all_data_types_byte_match(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame(list(_rows()), SCHEMA)
    # Debezium Geometry struct → JSON string with explicit null srid
    geom = F.to_json(
        F.struct(F.col("wkb_b64").alias("wkb"),
                 F.lit(None).cast("int").alias("srid")),
        {"ignoreNullFields": "false"})
    cols = [f.name for f in SCHEMA.fields if f.name != "wkb_b64"]
    # sample_geometry sits in its manifest position (between
    # sample_varbinary and sample_boolean)
    proj = []
    for c in cols:
        if c == "sample_boolean":
            proj.append(geom.alias("sample_geometry"))
        proj.append(F.col(c))
    out = (df.select(*proj)
           .repartition(1).sortWithinPartitions("KBC__BATCH_EVENT_ORDER"))
    out_dir = str(tmp_path / "adt")
    write_csv(out, out_dir, null_value="", options={
        "escape": '"',
        "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss",
        "timestampFormat": "yyyy-MM-dd HH:mm:ssx",
    })
    part = next(f for f in sorted(os.listdir(out_dir))
                if f.endswith(".csv"))
    with open(os.path.join(out_dir, part), "rb") as fh:
        got = fh.read()
    with open(GOLD, "rb") as fh:
        want = fh.read()
    assert got == want
