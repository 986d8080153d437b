"""Golden-CSV byte parity with the reference's chained dedupe scenario.

Replays ``incremental-dedupe-chained`` (reference fixtures:
``ex_mysql_cdc/tests/sql_test_traits/sales_table.sql`` initial rows,
``.../incremental-dedupe-chained/02_inserts_updates_deletes/source/
transactions.sql`` event workload) through the Spark engine and
byte-compares the CSV egress with the reference's expected outputs
(``.../expected/data/out/tables/inventory_sales.csv``). This is the
type-fidelity gate of SURVEY §7.4: DECIMAL(12,5) scale preserved as
``708.00000``, booleans lowercase, soft-deleted row kept with op=d.

The reference test framework strips nondeterministic columns
(KBC__EVENT_TIMESTAMP_MS/FILE/POS) and sorts by KBC__BATCH_EVENT_ORDER
before diffing (``db_components/debezium/tests/functional.py:95-135``);
the goldens here are already in that canonical form, so the test writes
the same projection.
"""

import os
from decimal import Decimal

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_cdc_component_spark.engine import to_output_columns
from python_cdc_component_spark.operators.dedup import dedup_latest
from python_cdc_component_spark.sinks.csv_sink import write_csv

REF = ("/root/reference/db_components/ex_mysql_cdc/tests/functional/"
       "incremental-dedupe-chained")
GOLD_1 = f"{REF}/01_simple-full-load/expected/data/out/tables/inventory_sales.csv"
GOLD_2 = (f"{REF}/02_inserts_updates_deletes/expected/data/out/tables/"
          "inventory_sales.csv/slice_0.csv")

PAYLOAD = ["usergender", "usercity", "usersentiment", "zipcode", "sku",
           "createdate", "category", "price", "county", "countycode",
           "userstate", "categorygroup"]

SCHEMA = T.StructType(
    [T.StructField("usergender", T.StringType()),
     T.StructField("usercity", T.StringType()),
     T.StructField("usersentiment", T.IntegerType()),
     T.StructField("zipcode", T.StringType()),
     T.StructField("sku", T.StringType()),
     T.StructField("createdate", T.StringType()),
     T.StructField("category", T.StringType()),
     T.StructField("price", T.DecimalType(12, 5)),
     T.StructField("county", T.StringType()),
     T.StructField("countycode", T.StringType()),
     T.StructField("userstate", T.StringType()),
     T.StructField("categorygroup", T.StringType()),
     T.StructField("kbc__operation", T.StringType()),
     T.StructField("__deleted", T.BooleanType()),
     T.StructField("kbc__batch_event_order", T.LongType())])

# sales_table.sql initial rows: (payload..., op, deleted, order)
INITIAL = [
    ("Female", "Mize", -1, "39153", "SKU1", "2013-09-23 22:38:29",
     "Cameras", Decimal("708"), "Smith", "28129", "Mississippi",
     "Electronics"),
    ("Male", "The Lakes", 1, "89124", "SKU2", "2013-09-23 22:38:30",
     "Televisions", Decimal("1546"), "Clark", "32003", "Nevada",
     "Electronics"),
    ("Male", "Baldwin", 1, "21020", "ZD111483", "2013-09-23 22:38:31",
     "Loose Stones", Decimal("1262"), "Baltimore", "24005", "Maryland",
     "Jewelry"),
    ("Female", "Archbald", 1, "18501", "ZD111395", "2013-09-23 22:38:32",
     "Stereo", Decimal("104"), "Lackawanna", "42069", "Pennsylvania",
     "Electronics"),
    ("Male", "Berea", 0, "44127", "ZD111451", "2013-09-23 22:38:33",
     "Earings", Decimal("1007"), "Cuyahoga", "39035", "Ohio", "Jewelry"),
]

# transactions.sql rows the statements touch
_R2013_SKU1 = INITIAL[0]
_R2013_SKU2 = INITIAL[1]
_NY = ("Male", "New York", 1, "10001", "SKU1", "2023-01-01",
       "Electronics", None, "New York", "NY", "NY", "Electronics")
_LA = ("Female", "Los Angeles", 5, "90001", "SKU2", "2023-01-02",
       "Books", None, "Los Angeles", "CA", "CA", "Books")
_CHI = ("Female", "Chicago", 3, "60007", "SKU3", "2023-01-03",
        "Clothing", None, "Cook", "IL", "IL", "Fashion")


def _with_price(row, price):
    r = list(row)
    r[7] = Decimal(price)
    return tuple(r)


def _events_stage2():
    """The 19 change events transactions.sql produces, in binlog order:
    UPDATE ... WHERE sku='SKU1' touches BOTH the 2013 row and the new
    2023 row (sku is not the PK), each update emitting one event per
    affected row."""
    ev = []

    def emit(row, op, deleted=False):
        ev.append(row + (op, deleted, len(ev)))

    emit(_with_price(_NY, "199.99"), "c")            # order 0
    emit(_with_price(_LA, "14.99"), "c")             # 1
    emit(_with_price(_CHI, "49.99"), "c")            # 2
    for p in ("249.99", "299.99", "349.99"):         # 3..8
        emit(_with_price(_R2013_SKU1, p), "u")
        emit(_with_price(_NY, p), "u")
    for p in ("19.99", "24.99", "29.99"):            # 9..14
        emit(_with_price(_R2013_SKU2, p), "u")
        emit(_with_price(_LA, p), "u")
    for p in ("59.99", "69.99", "79.99"):            # 15..17
        emit(_with_price(_CHI, p), "u")
    emit(_with_price(_CHI, "79.99"), "d", True)      # 18: before-image
    return ev


def _export(df, out_dir):
    """Canonical egress: strip nondeterministic cols, sort by the order
    column, one slice (the goldens are single-slice)."""
    cols = PAYLOAD + ["KBC__OPERATION", "KBC__DELETED",
                      "KBC__BATCH_EVENT_ORDER"]
    out = (to_output_columns(df).select(*cols)
           .repartition(1)
           .sortWithinPartitions("KBC__BATCH_EVENT_ORDER"))
    write_csv(out, out_dir)
    part = next(f for f in sorted(os.listdir(out_dir))
                if f.endswith(".csv"))
    with open(os.path.join(out_dir, part), "rb") as fh:
        return fh.read()


@pytest.fixture()
def order_col():
    return [F.col("kbc__batch_event_order").desc()]


def test_stage1_full_load_byte_match(spark, tmp_path, order_col):
    rows = [r + ("r", False, i) for i, r in enumerate(INITIAL)]
    df = spark.createDataFrame(rows, SCHEMA)
    dedup = dedup_latest(df, ["createdate"], order_by=order_col)
    got = _export(dedup, str(tmp_path / "out1"))
    with open(GOLD_1, "rb") as fh:
        assert got == fh.read()


def test_stage2_incremental_dedupe_byte_match(spark, tmp_path, order_col):
    df = spark.createDataFrame(_events_stage2(), SCHEMA)
    dedup = dedup_latest(df, ["createdate"], order_by=order_col)
    got = _export(dedup, str(tmp_path / "out2"))
    with open(GOLD_2, "rb") as fh:
        assert got == fh.read()


# ---------------------------------------------------------------------------
# simple-incremental-no-pkey-dedupe: key = ALL payload columns
# (reference component.py:406-408; fixtures
# ex_mysql_cdc/tests/functional/simple-incremental-no-pkey-dedupe/)

NOPK = ("/root/reference/db_components/ex_mysql_cdc/tests/functional/"
        "simple-incremental-no-pkey-dedupe")
NOPK_GOLD_1 = f"{NOPK}/01_simple-full-load/expected/data/out/tables/inventory_nopkey.csv"
NOPK_GOLD_2 = (f"{NOPK}/02_inserts_updates_deletes/expected/data/out/tables/"
               "inventory_nopkey.csv/slice_0.csv")

SYSTEM = ["kbc__operation", "__deleted", "kbc__batch_event_order"]

# the no-pkey / drift scenarios insert NEW skus (SKU10/SKU20), unlike the
# dedupe-chained workload whose inserts reuse SKU1/SKU2
_NY10 = ("Male", "New York", 1, "10001", "SKU10", "2023-01-01",
         "Electronics", None, "New York", "NY", "NY", "Electronics")
_LA20 = ("Female", "Los Angeles", 5, "90001", "SKU20", "2023-01-02",
         "Books", None, "Los Angeles", "CA", "CA", "Books")


def test_nopkey_stage1_full_load_byte_match(spark, tmp_path, order_col):
    from python_cdc_component_spark.operators.dedup import dedup_latest_no_pk
    rows = [r + ("r", False, i) for i, r in enumerate(INITIAL)]
    df = spark.createDataFrame(rows, SCHEMA)
    dedup = dedup_latest_no_pk(df, system_cols=SYSTEM, order_by=order_col)
    got = _export(dedup, str(tmp_path / "nopk1"))
    with open(NOPK_GOLD_1, "rb") as fh:
        assert got == fh.read()


def test_nopkey_stage2_incremental_byte_match(spark, tmp_path, order_col):
    """c/c/u/d with all-columns key: every event payload is distinct, so
    all four survive in event order — including the soft-deleted SKU2
    with its before-image payload."""
    from python_cdc_component_spark.operators.dedup import dedup_latest_no_pk
    ev = []

    def emit(row, op, deleted=False):
        ev.append(row + (op, deleted, len(ev)))

    emit(_with_price(_NY10, "199.99"), "c")                 # order 0
    emit(_with_price(_LA20, "14.99"), "c")                  # 1
    emit(_with_price(_R2013_SKU1, "249.99"), "u")           # 2
    emit(_R2013_SKU2, "d", True)                            # 3: before-image
    df = spark.createDataFrame(ev, SCHEMA)
    dedup = dedup_latest_no_pk(df, system_cols=SYSTEM, order_by=order_col)
    got = _export(dedup, str(tmp_path / "nopk2"))
    with open(NOPK_GOLD_2, "rb") as fh:
        assert got == fh.read()


# ---------------------------------------------------------------------------
# schema-drift-chained: ALTER ADD COLUMN mid-run (new column appended at
# the end of the merged schema), ALTER DROP COLUMN (dropped column
# survives NULL-padded) — reference component.py:449-488 merge + fixtures
# ex_mysql_cdc/tests/functional/schema-drift-chained/

DRIFT = ("/root/reference/db_components/ex_mysql_cdc/tests/functional/"
         "schema-drift-chained")
DRIFT_GOLD_1 = f"{DRIFT}/01_simple-full-load/expected/data/out/tables/inventory_sales.csv"
DRIFT_GOLD_2 = (f"{DRIFT}/02_inserts_updates_deletes_alter/expected/data/out/"
                "tables/inventory_sales.csv")

_SF = ("Male", "San Francisco", 3, "94101", "SKU30", "2023-01-03",
       "Clothing", None, "San Francisco", "CA", "CA", "Clothing")
_SF2 = ("Male", None, 3, "94101", "SKU30", "2023-01-04",
        "Clothing", None, "San Francisco", "CA", "CA", "Clothing")


def _export_drift(df, out_dir, cols):
    """Drift egress: final-CSV null style (empty fields, not the staging
    sentinel), sorted by the order column, single slice."""
    out = (to_output_columns(df).select(*cols)
           .repartition(1)
           .sortWithinPartitions("KBC__BATCH_EVENT_ORDER"))
    write_csv(out, out_dir, null_value="")
    part = next(f for f in sorted(os.listdir(out_dir))
                if f.endswith(".csv"))
    with open(os.path.join(out_dir, part), "rb") as fh:
        return fh.read()


def test_drift_stage1_full_load_byte_match(spark, tmp_path, order_col):
    rows = [r + ("r", False, i) for i, r in enumerate(INITIAL)]
    df = spark.createDataFrame(rows, SCHEMA)
    dedup = dedup_latest(df, ["createdate"], order_by=order_col)
    cols = PAYLOAD + ["KBC__OPERATION", "KBC__DELETED",
                      "KBC__BATCH_EVENT_ORDER"]
    got = _export_drift(dedup, str(tmp_path / "drift1"), cols)
    with open(DRIFT_GOLD_1, "rb") as fh:
        assert got == fh.read()


def test_drift_stage2_alter_add_drop_byte_match(spark, tmp_path, order_col):
    """Three schema epochs in one run: base 12 columns, +newcolumn
    (appended at the END of the merged schema, after the system columns,
    exactly like the reference manifest), then -usercity (survives as a
    NULL-padded empty CSV field). Byte-compares the merged egress."""
    from python_cdc_component_spark.model.schema import (
        SchemaRegistry, TableSchema)
    from python_cdc_component_spark.operators.schema_align import (
        align_to_schema, union_epochs)

    ev_a, ev_b, ev_c = [], [], []
    ev_a.append(_with_price(_NY10, "199.99") + ("c", False, 0))
    ev_a.append(_with_price(_LA20, "14.99") + ("c", False, 1))
    ev_a.append(_with_price(_R2013_SKU1, "249.99") + ("u", False, 2))
    ev_a.append(_R2013_SKU2 + ("d", True, 3))
    ev_b.append(_with_price(_SF, "49.99") + ("c", False, 4, "defaultvalue"))
    row_c = list(_with_price(_SF2, "49.99"))
    del row_c[1]                                   # usercity dropped
    ev_c.append(tuple(row_c) + ("c", False, 5, "defaultvalue"))

    schema_b = T.StructType(
        SCHEMA.fields + [T.StructField("newcolumn", T.StringType())])
    schema_c = T.StructType(
        [f for f in schema_b.fields if f.name != "usercity"])

    epochs = [spark.createDataFrame(ev_a, SCHEMA),
              spark.createDataFrame(ev_b, schema_b),
              spark.createDataFrame(ev_c, schema_c)]
    reg = SchemaRegistry()
    merged = None
    for df in epochs:
        merged = reg.update(TableSchema(
            name="inventory_sales", struct=df.schema,
            primary_keys=["createdate"]))
    aligned = union_epochs(
        [align_to_schema(df, merged.struct) for df in epochs])
    assert [f.name for f in merged.struct.fields][-1] == "newcolumn"
    assert "usercity" in [f.name for f in merged.struct.fields]

    dedup = dedup_latest(aligned, ["createdate"], order_by=order_col)
    cols = PAYLOAD + ["KBC__OPERATION", "KBC__DELETED",
                      "KBC__BATCH_EVENT_ORDER", "newcolumn"]
    got = _export_drift(dedup, str(tmp_path / "drift2"), cols)
    with open(DRIFT_GOLD_2, "rb") as fh:
        assert got == fh.read()


# ---------------------------------------------------------------------------
# incremental-append-chained: T9 APPEND mode — every event survives in
# event order, no dedup (reference fixtures
# ex_mysql_cdc/tests/functional/incremental-append-chained/)

APP = ("/root/reference/db_components/ex_mysql_cdc/tests/functional/"
       "incremental-append-chained")
APP_GOLD_2 = (f"{APP}/02_inserts_updates_deletes/expected/data/out/tables/"
              "inventory_sales.csv")


def test_append_mode_stage2_byte_match(spark, tmp_path):
    """APPEND egress is a pure envelope passthrough — c/c/u/d all kept,
    including the soft-delete with its before-image payload."""
    ev = []

    def emit(row, op, deleted=False):
        ev.append(row + (op, deleted, len(ev)))

    emit(_with_price(_NY10, "199.99"), "c")
    emit(_with_price(_LA20, "14.99"), "c")
    emit(_with_price(_R2013_SKU1, "249.99"), "u")
    emit(_R2013_SKU2, "d", True)
    df = spark.createDataFrame(ev, SCHEMA)          # NO dedup: T9 APPEND
    got = _export(df, str(tmp_path / "app2"))
    with open(APP_GOLD_2, "rb") as fh:
        assert got == fh.read()


# ---------------------------------------------------------------------------
# schema-drift-drop-non-null: a NOT NULL column dropped mid-stream must
# survive NULL-padded in its original position (reference fixtures
# ex_mysql_cdc/tests/functional/schema-drift-drop-non-null/)

DNN = ("/root/reference/db_components/ex_mysql_cdc/tests/functional/"
       "schema-drift-drop-non-null")
DNN_GOLD_1 = f"{DNN}/01_initial/expected/data/out/tables/inventory_products.csv"
DNN_GOLD_2 = f"{DNN}/02_drop_column/expected/data/out/tables/inventory_products.csv"

PRODUCTS = [
    (101, "scooter", "Small 2-wheel scooter", 3.14),
    (102, "car battery", "12V car battery", 8.1),
    (103, "12-pack drill bits",
     "12-pack of drill bits with sizes ranging from #40 to #3", 0.8),
    (104, "hammer", "12oz carpenter's hammer", 0.75),
    (105, "hammer", "14oz carpenter's hammer", 0.875),
    (106, "hammer", "16oz carpenter's hammer", 1.0),
    (107, "rocks", "box of assorted rocks", 5.3),
    (108, "jacket", "water resistent black wind breaker", 0.1),
    (109, "spare tire", "24 inch spare tire", 22.2),
]

PROD_SCHEMA = T.StructType([
    T.StructField("id", T.IntegerType(), False),
    T.StructField("name", T.StringType(), False),     # NOT NULL at t0
    T.StructField("description", T.StringType()),
    T.StructField("weight", T.DoubleType()),
    T.StructField("kbc__operation", T.StringType()),
    T.StructField("__deleted", T.BooleanType()),
    T.StructField("kbc__batch_event_order", T.LongType()),
])


def _export_prod(df, out_dir, cols):
    out = (to_output_columns(df).select(*cols)
           .repartition(1)
           .sortWithinPartitions("KBC__BATCH_EVENT_ORDER"))
    write_csv(out, out_dir, null_value="")
    part = next(f for f in sorted(os.listdir(out_dir))
                if f.endswith(".csv"))
    with open(os.path.join(out_dir, part), "rb") as fh:
        return fh.read()


def test_drop_non_null_column_byte_match(spark, tmp_path, order_col):
    from python_cdc_component_spark.model.schema import (
        SchemaRegistry, TableSchema)
    from python_cdc_component_spark.operators.schema_align import (
        align_to_schema)

    cols = ["id", "name", "description", "weight", "KBC__OPERATION",
            "KBC__DELETED", "KBC__BATCH_EVENT_ORDER"]

    # stage 1: full load
    rows1 = [r + ("r", False, i) for i, r in enumerate(PRODUCTS)]
    df1 = spark.createDataFrame(rows1, PROD_SCHEMA)
    reg = SchemaRegistry()
    reg.update(TableSchema("inventory_products", df1.schema, ["id"]))
    got1 = _export_prod(dedup_latest(df1, ["id"], order_by=order_col),
                        str(tmp_path / "dnn1"), cols)
    with open(DNN_GOLD_1, "rb") as fh:
        assert got1 == fh.read()

    # stage 2: ALTER DROP COLUMN name (NOT NULL) + one insert
    schema2 = T.StructType(
        [f for f in PROD_SCHEMA.fields if f.name != "name"])
    df2 = spark.createDataFrame(
        [(1001, "Apple", 0.5, "c", False, 0)], schema2)
    merged = reg.update(
        TableSchema("inventory_products", df2.schema, ["id"]))
    names = [f.name for f in merged.struct.fields]
    assert names.index("name") == 1                 # stays in place
    assert dict((f.name, f.nullable) for f in merged.struct.fields)["name"]
    aligned = align_to_schema(df2, merged.struct)
    got2 = _export_prod(dedup_latest(aligned, ["id"], order_by=order_col),
                        str(tmp_path / "dnn2"), cols)
    with open(DNN_GOLD_2, "rb") as fh:
        assert got2 == fh.read()


# ---------------------------------------------------------------------------
# incremental-column-filter-chained: P3 exclude-regex egress (reference
# config `column_filter_type: exclude`, `^inventory\.sales\.user.*` —
# bare-name form `user.*` here; fixtures
# ex_mysql_cdc/tests/functional/incremental-column-filter-chained/)

CF = ("/root/reference/db_components/ex_mysql_cdc/tests/functional/"
      "incremental-column-filter-chained")
CF_GOLD_1 = f"{CF}/01_simple-full-load/expected/data/out/tables/inventory_sales.csv"
CF_GOLD_2 = (f"{CF}/02_inserts_updates_deletes/expected/data/out/tables/"
             "inventory_sales.csv")

CF_PAYLOAD = ["zipcode", "sku", "createdate", "category", "price",
              "county", "countycode", "categorygroup"]


def _export_cf(df, out_dir):
    from python_cdc_component_spark.operators.filters import (
        apply_column_filter)
    filtered = apply_column_filter(df, exclude=[r"user.*"])
    assert set(CF_PAYLOAD) < set(filtered.columns)
    assert not {c for c in filtered.columns if c.startswith("user")}
    cols = CF_PAYLOAD + ["KBC__OPERATION", "KBC__DELETED",
                         "KBC__BATCH_EVENT_ORDER"]
    out = (to_output_columns(filtered).select(*cols)
           .repartition(1)
           .sortWithinPartitions("KBC__BATCH_EVENT_ORDER"))
    write_csv(out, out_dir, null_value="")
    part = next(f for f in sorted(os.listdir(out_dir))
                if f.endswith(".csv"))
    with open(os.path.join(out_dir, part), "rb") as fh:
        return fh.read()


def test_column_filter_stage1_byte_match(spark, tmp_path, order_col):
    rows = [r + ("r", False, i) for i, r in enumerate(INITIAL)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = _export_cf(dedup_latest(df, ["createdate"], order_by=order_col),
                     str(tmp_path / "cf1"))
    with open(CF_GOLD_1, "rb") as fh:
        assert got == fh.read()


def test_column_filter_stage2_byte_match(spark, tmp_path, order_col):
    ev = []

    def emit(row, op, deleted=False):
        ev.append(row + (op, deleted, len(ev)))

    emit(_with_price(_NY10, "199.99"), "c")
    emit(_with_price(_LA20, "14.99"), "c")
    emit(_with_price(_R2013_SKU1, "249.99"), "u")
    emit(_R2013_SKU2, "d", True)
    df = spark.createDataFrame(ev, SCHEMA)
    got = _export_cf(dedup_latest(df, ["createdate"], order_by=order_col),
                     str(tmp_path / "cf2"))
    with open(CF_GOLD_2, "rb") as fh:
        assert got == fh.read()


# ---------------------------------------------------------------------------
# full-load-statement-overrides: S3 snapshot statement override — the
# snapshot SELECT carries the configured WHERE, so only matching rows
# are captured (reference fixtures
# ex_mysql_cdc/tests/functional/full-load-statement-overrides/,
# config snapshot_statements)

SO = ("/root/reference/db_components/ex_mysql_cdc/tests/functional/"
      "full-load-statement-overrides")
SO_SALES = f"{SO}/expected/data/out/tables/inventory_sales.csv"
SO_PRODUCTS = f"{SO}/expected/data/out/tables/inventory_products.csv"


def test_statement_override_sales_byte_match(spark, tmp_path, order_col):
    """'SELECT * FROM inventory.sales WHERE usersentiment = 1': the
    snapshot emits ONLY matching rows, renumbered from 0."""
    rows = [r for r in INITIAL if r[2] == 1]
    staged = [r + ("r", False, i) for i, r in enumerate(rows)]
    df = spark.createDataFrame(staged, SCHEMA)
    got = _export(dedup_latest(df, ["createdate"], order_by=order_col),
                  str(tmp_path / "so_sales"))
    with open(SO_SALES, "rb") as fh:
        assert got == fh.read()


def test_statement_override_products_byte_match(spark, tmp_path, order_col):
    """'SELECT * FROM inventory.products WHERE id > 103'."""
    rows = [r for r in PRODUCTS if r[0] > 103]
    staged = [r + ("r", False, i) for i, r in enumerate(rows)]
    df = spark.createDataFrame(staged, PROD_SCHEMA)
    cols = ["id", "name", "description", "weight", "KBC__OPERATION",
            "KBC__DELETED", "KBC__BATCH_EVENT_ORDER"]
    got = _export_prod(dedup_latest(df, ["id"], order_by=order_col),
                       str(tmp_path / "so_prod"), cols)
    with open(SO_PRODUCTS, "rb") as fh:
        assert got == fh.read()


# ---------------------------------------------------------------------------
# all-tables / 03_table_addition: the full S4 loop at the byte level —
# the blocking-snapshot signal row itself, the added table's stream
# capture + snapshot backfill, and the already-synced table streaming on
# (reference fixtures ex_mysql_cdc/tests/functional/all-tables/)

AT = ("/root/reference/db_components/ex_mysql_cdc/tests/functional/"
      "all-tables/03_table_addition")
AT_SIGNALS = f"{AT}/expected/data/out/tables/inventory_debezium_signals.csv"
AT_PRODUCTS = f"{AT}/expected/data/out/tables/inventory_products.csv"
AT_SALES = f"{AT}/expected/data/out/tables/inventory_sales.csv"


def test_table_addition_signal_row_byte_match(spark, tmp_path):
    """The execute-snapshot signal row the engine writes is itself a
    captured table — its export must byte-match (JSON key order and
    spacing included)."""
    from python_cdc_component_spark.control import SnapshotSignal
    sig = SnapshotSignal(tables=["inventory.products"], mode="blocking")
    row = sig.to_row()
    df = spark.createDataFrame(
        [(row["type"], row["data"], "c", False, 0)],
        "type string, data string, kbc__operation string, "
        "__deleted boolean, kbc__batch_event_order long")
    out = (to_output_columns(df)
           .select("type", "data", "KBC__OPERATION", "KBC__DELETED",
                   "KBC__BATCH_EVENT_ORDER")
           .repartition(1))
    d = str(tmp_path / "sig")
    write_csv(out, d, null_value="", options={"escape": '"'})
    part = next(f for f in sorted(os.listdir(d)) if f.endswith(".csv"))
    with open(os.path.join(d, part), "rb") as fh:
        got = fh.read()
    with open(AT_SIGNALS, "rb") as fh:
        assert got == fh.read()


def test_table_addition_products_byte_match(spark, tmp_path):
    """Added table = stream capture of its inserts (op=c) followed by
    the signal-triggered blocking snapshot (op=r), APPEND egress —
    through the REAL backfill_plan operator."""
    from python_cdc_component_spark.control import backfill_plan
    from python_cdc_component_spark.operators.schema_align import (
        union_epochs)

    # stage products as the source table for backfill_plan
    src = str(tmp_path / "srcsf")
    os.makedirs(src)
    prod_payload = T.StructType(PROD_SCHEMA.fields[:4])
    (spark.createDataFrame(PRODUCTS, prod_payload).coalesce(1)
     .write.parquet(os.path.join(src, "products.parquet")))

    stream = spark.createDataFrame(
        [r + ("c", False, i) for i, r in enumerate(PRODUCTS)], PROD_SCHEMA)
    snap = (backfill_plan(spark, src, ["products"])["products"]
            .withColumn("kbc__batch_event_order",
                        F.col("id").cast("long") - 101 + 9))
    union = union_epochs([stream, snap])
    cols = ["id", "name", "description", "weight", "KBC__OPERATION",
            "KBC__DELETED", "KBC__BATCH_EVENT_ORDER"]
    got = _export_prod(union, str(tmp_path / "at_prod"), cols)  # APPEND
    with open(AT_PRODUCTS, "rb") as fh:
        assert got == fh.read()


def test_table_addition_sales_byte_match(spark, tmp_path):
    """The already-synced table keeps streaming: exactly the one new
    insert, order reset for the run."""
    row = ("Male", "New York", 1, "10001", "SKU10", "2024-01-01",
           "Electronics", Decimal("199.99"), "New York", "NY", "NY",
           "Electronics", "c", False, 0)
    df = spark.createDataFrame([row], SCHEMA)
    got = _export(df, str(tmp_path / "at_sales"))
    with open(AT_SALES, "rb") as fh:
        assert got == fh.read()
