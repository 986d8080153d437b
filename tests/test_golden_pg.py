"""Byte-golden replays of the ex_postgres_cdc functional scenarios —
the PG flavor differs from MySQL in three load-bearing ways, each
pinned here against the reference's own expected outputs:

* **no binlog coordinates**: KBC__FILE / KBC__POS are absent from the
  egress and the manifests (W3's no-FILE/POS order-column flavor);
* **PK-only delete tombstones**: Postgres' default REPLICA IDENTITY
  emits deletes carrying ONLY the primary key — the dedupe egress
  keeps a tombstone row whose payload is all-NULL except the PK
  (MySQL keeps the full before-image);
* **raw event orders survive dedupe**: the kept row carries its
  original KBC__BATCH_EVENT_ORDER (7, 8, 13, 14, 18 in the chained
  workload), not a renumbered sequence.

Fixtures: ex_postgres_cdc/tests/sql_test_traits/sales_table.sql +
tests/functional/*/source/transactions.sql; goldens under
tests/functional/*/expected/ (canonical form: nondeterministic columns
stripped, sorted by KBC__BATCH_EVENT_ORDER)."""

import json
import os

from pyspark.sql import types as T

from python_cdc_component_spark.engine import to_output_columns
from python_cdc_component_spark.operators.dedup import dedup_latest
from python_cdc_component_spark.sinks.csv_sink import write_csv
from python_cdc_component_spark.sinks.manifest import (
    build_legacy_manifest)

from test_golden_csv import (
    GOLD_1, INITIAL, PAYLOAD, SCHEMA, _with_price, _NY, _LA, _CHI,
    _NY10, _LA20, _R2013_SKU1, _R2013_SKU2)

PG = "/root/reference/db_components/ex_postgres_cdc/tests/functional"
MY = "/root/reference/db_components/ex_mysql_cdc/tests/functional"

# ex_postgres_cdc/tests/sql_test_traits/sales_table.sql column DDL
PG_SALES_COLUMNS = [
    ("usergender", "text", True),
    ("usercity", "text", True),
    ("usersentiment", "integer", True),
    ("zipcode", "text", True),
    ("sku", "text", True),
    ("createdate", "varchar(64)", False),        # NOT NULL PRIMARY KEY
    ("category", "text", True),
    ("price", "decimal(12,5)", True),
    ("county", "text", True),
    ("countycode", "text", True),
    ("userstate", "text", True),
    ("categorygroup", "text", True),
]


def _golden(path: str) -> bytes:
    with open(path, "rb") as fh:
        return fh.read()


def _export_pg(df, out_dir):
    """PG canonical egress: no FILE/POS columns, NULLs as bare empty
    fields (the PK-only tombstones serialize that way in every PG
    expected CSV), sorted by the order column, one slice."""
    cols = PAYLOAD + ["KBC__OPERATION", "KBC__DELETED",
                      "KBC__BATCH_EVENT_ORDER"]
    out = (to_output_columns(df).select(*cols)
           .repartition(1)
           .sortWithinPartitions("KBC__BATCH_EVENT_ORDER"))
    write_csv(out, out_dir, null_value="")
    part = next(f for f in sorted(os.listdir(out_dir))
                if f.endswith(".csv"))
    with open(os.path.join(out_dir, part), "rb") as fh:
        return fh.read()


def _pk_only_delete(createdate: str):
    """Postgres default REPLICA IDENTITY delete image: PK only."""
    return (None, None, None, None, None, createdate, None, None,
            None, None, None, None)


def _order_col_desc():
    from pyspark.sql import functions as F
    return [F.col("kbc__batch_event_order").desc()]


def test_pg_dedupe_stage1_byte_match(spark, tmp_path):
    """PG full-load slice is byte-identical to the MySQL one (same
    canonical projection), reproduced through the dedupe path."""
    gold = _golden(f"{PG}/incremental-dedupe-chained/01_simple-full-load/"
                   "expected/data/out/tables/inventory_sales.csv/"
                   "slice_0.csv")
    assert gold == _golden(GOLD_1)
    rows = [r + ("r", False, i) for i, r in enumerate(INITIAL)]
    df = spark.createDataFrame(rows, SCHEMA)
    dedup = dedup_latest(df, ["createdate"], order_by=_order_col_desc())
    assert _export_pg(dedup, str(tmp_path / "pg1")) == gold


def test_pg_dedupe_stage2_byte_match(spark, tmp_path):
    """The 19-event chained workload with PG delete semantics: the
    dedupe keeps the latest event per createdate WITH its raw order
    (7/8/13/14/18) and the deleted SKU3 survives as a PK-only
    tombstone (all payload fields empty except createdate)."""
    ev = []

    def emit(row, op, deleted=False):
        ev.append(row + (op, deleted, len(ev)))

    emit(_with_price(_NY, "199.99"), "c")            # 0: SKU1-2023
    emit(_with_price(_LA, "14.99"), "c")             # 1: SKU2-2023
    emit(_with_price(_CHI, "49.99"), "c")            # 2: SKU3-2023
    for p in ("249.99", "299.99", "349.99"):         # 3..8
        emit(_with_price(_R2013_SKU1, p), "u")
        emit(_with_price(_NY, p), "u")
    for p in ("19.99", "24.99", "29.99"):            # 9..14
        emit(_with_price(_R2013_SKU2, p), "u")
        emit(_with_price(_LA, p), "u")
    for p in ("59.99", "69.99", "79.99"):            # 15..17
        emit(_with_price(_CHI, p), "u")
    emit(_pk_only_delete("2023-01-03"), "d", True)   # 18: PK-only image
    df = spark.createDataFrame(ev, SCHEMA)
    dedup = dedup_latest(df, ["createdate"], order_by=_order_col_desc())
    got = _export_pg(dedup, str(tmp_path / "pg2"))
    gold = _golden(f"{PG}/incremental-dedupe-chained/"
                   "02_inserts_updates_deletes/expected/data/out/tables/"
                   "inventory_sales.csv/slice_0.csv")
    assert got == gold


def test_pg_heartbeat_scenario_byte_match(spark, tmp_path):
    """heartbeat-incremental-chained: the kbc_heartbeat table is itself
    a captured table — snapshot op=r, then the heartbeat UPDATE as a
    plain op=u event — and the sales stage-2 egress shows the PK-only
    tombstone for the deleted SKU2-2013 row. The sales golden is
    byte-identical to simple-incremental-chained's (the heartbeat
    rides alongside, it never perturbs data tables)."""
    hb_schema = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("kbc__operation", T.StringType()),
        T.StructField("__deleted", T.BooleanType()),
        T.StructField("kbc__batch_event_order", T.LongType())])

    def hb_bytes(op, out):
        df = spark.createDataFrame([(1, op, False, 0)], hb_schema)
        o = (to_output_columns(df)
             .select("id", "KBC__OPERATION", "KBC__DELETED",
                     "KBC__BATCH_EVENT_ORDER").repartition(1))
        write_csv(o, out, null_value="")
        part = next(f for f in sorted(os.listdir(out))
                    if f.endswith(".csv"))
        with open(os.path.join(out, part), "rb") as fh:
            return fh.read()

    base = f"{PG}/heartbeat-incremental-chained"
    assert hb_bytes("r", str(tmp_path / "hb1")) == _golden(
        f"{base}/01_simple-full-load/expected/data/out/tables/"
        "kbc_heartbeat.csv")
    assert hb_bytes("u", str(tmp_path / "hb2")) == _golden(
        f"{base}/02_inserts_updates_deletes/expected/data/out/tables/"
        "kbc_heartbeat.csv")

    sales_gold = _golden(f"{base}/02_inserts_updates_deletes/expected/"
                         "data/out/tables/inventory_sales.csv")
    assert sales_gold == _golden(
        f"{PG}/simple-incremental-chained/02_inserts_updates_deletes/"
        "expected/data/out/tables/inventory_sales.csv")
    ev = []

    def emit(row, op, deleted=False):
        ev.append(row + (op, deleted, len(ev)))

    emit(_with_price(_NY10, "199.99"), "c")
    emit(_with_price(_LA20, "14.99"), "c")
    emit(_with_price(_R2013_SKU1, "249.99"), "u")
    emit(_pk_only_delete("2013-09-23 22:38:30"), "d", True)
    df = spark.createDataFrame(ev, SCHEMA)                # APPEND
    assert _export_pg(df, str(tmp_path / "hb_sales")) == sales_gold


def test_pg_table_addition_scenario_byte_match():
    """simple-incremental-chained/03: the PG signal row and the
    snapshot-only products backfill are byte-identical to the MySQL
    goldens already replayed (all-tables signals / append-chained
    products), so the PG stage is covered by those replays."""
    assert _golden(f"{PG}/simple-incremental-chained/03_table_addition/"
                   "expected/data/out/tables/inventory_debezium_signals"
                   ".csv") == _golden(
        f"{MY}/all-tables/03_table_addition/expected/data/out/tables/"
        "inventory_debezium_signals.csv")
    assert _golden(f"{PG}/simple-incremental-chained/03_table_addition/"
                   "expected/data/out/tables/inventory_products.csv"
                   ) == _golden(
        f"{MY}/incremental-append-chained/03_table_addition/expected/"
        "data/out/tables/inventory_products.csv")


def test_pg_all_tables_signal_products2_byte_match(spark, tmp_path):
    """PG all-tables/03 snapshots a DIFFERENT table (products2) — the
    signal row must serialize its name through the same JSON contract."""
    from python_cdc_component_spark.control import SnapshotSignal
    sig = SnapshotSignal(tables=["inventory.products2"], mode="blocking")
    row = sig.to_row()
    df = spark.createDataFrame(
        [(row["type"], row["data"], "c", False, 0)],
        "type string, data string, kbc__operation string, "
        "__deleted boolean, kbc__batch_event_order long")
    out = (to_output_columns(df)
           .select("type", "data", "KBC__OPERATION", "KBC__DELETED",
                   "KBC__BATCH_EVENT_ORDER").repartition(1))
    d = str(tmp_path / "pgsig")
    write_csv(out, d, null_value="", options={"escape": '"'})
    part = next(f for f in sorted(os.listdir(d)) if f.endswith(".csv"))
    with open(os.path.join(d, part), "rb") as fh:
        got = fh.read()
    assert got == _golden(
        f"{PG}/all-tables/03_table_addition/expected/data/out/tables/"
        "inventory_debezium_signals.csv")


def test_pg_drop_non_null_scenario_byte_match():
    """PG schema-drift-drop-non-null runs on products2 with the same
    content as the MySQL products goldens test_golden_csv replays —
    stage 1 byte-identical; stage 2 the same NULL-padded insert."""
    assert _golden(f"{PG}/schema-drift-drop-non-null/01_initial/expected/"
                   "data/out/tables/inventory_products2.csv") == _golden(
        f"{MY}/schema-drift-drop-non-null/01_initial/expected/data/out/"
        "tables/inventory_products.csv")
    assert _golden(f"{PG}/schema-drift-drop-non-null/02_drop_column/"
                   "expected/data/out/tables/inventory_products2.csv"
                   ) == _golden(
        f"{MY}/schema-drift-drop-non-null/02_drop_column/expected/data/"
        "out/tables/inventory_products.csv")


def test_pg_legacy_manifest_parity():
    """PG dedupe-chained manifest: postgres dialect lengths (text →
    the 16777216 cap), no FILE/POS system columns, no destination key,
    PK kept."""
    want = json.load(open(
        f"{PG}/incremental-dedupe-chained/01_simple-full-load/expected/"
        "data/out/tables/inventory_sales.csv.manifest"))
    got = build_legacy_manifest(
        PG_SALES_COLUMNS, primary_key=["createdate"],
        dialect="postgres")
    assert got == want


def test_pg_column_filter_stage2_byte_match(spark, tmp_path):
    """incremental-column-filter-chained/02: P3 exclude-regex egress
    over the PG workload — the PK-only tombstone keeps only createdate
    among the SURVIVING columns."""
    from python_cdc_component_spark.operators.filters import (
        apply_column_filter)
    from test_golden_csv import CF_PAYLOAD

    ev = []

    def emit(row, op, deleted=False):
        ev.append(row + (op, deleted, len(ev)))

    emit(_with_price(_NY10, "199.99"), "c")
    emit(_with_price(_LA20, "14.99"), "c")
    emit(_with_price(_R2013_SKU1, "249.99"), "u")
    emit(_pk_only_delete("2013-09-23 22:38:30"), "d", True)
    df = apply_column_filter(spark.createDataFrame(ev, SCHEMA),
                             exclude=[r"user.*"])
    cols = CF_PAYLOAD + ["KBC__OPERATION", "KBC__DELETED",
                         "KBC__BATCH_EVENT_ORDER"]
    out = (to_output_columns(df).select(*cols)
           .repartition(1)
           .sortWithinPartitions("KBC__BATCH_EVENT_ORDER"))
    d = str(tmp_path / "pgcf")
    write_csv(out, d, null_value="")
    part = next(f for f in sorted(os.listdir(d)) if f.endswith(".csv"))
    with open(os.path.join(d, part), "rb") as fh:
        got = fh.read()
    assert got == _golden(
        f"{PG}/incremental-column-filter-chained/"
        "02_inserts_updates_deletes/expected/data/out/tables/"
        "inventory_sales.csv")


def test_pg_drift_stage2_byte_match(spark, tmp_path):
    """schema-drift-chained/02: three schema epochs over the PG
    workload — ALTER ADD newcolumn lands at the END of the merged
    schema, the dropped usercity survives NULL-padded, and the PG
    PK-only tombstone rides through the union unchanged."""
    from python_cdc_component_spark.model.schema import (
        SchemaRegistry, TableSchema)
    from python_cdc_component_spark.operators.schema_align import (
        align_to_schema, union_epochs)
    from test_golden_csv import _SF, _SF2

    ev_a = [(_with_price(_NY10, "199.99") + ("c", False, 0)),
            (_with_price(_LA20, "14.99") + ("c", False, 1)),
            (_with_price(_R2013_SKU1, "249.99") + ("u", False, 2)),
            (_pk_only_delete("2013-09-23 22:38:30") + ("d", True, 3))]
    ev_b = [(_with_price(_SF, "49.99") + ("c", False, 4, "defaultvalue"))]
    row_c = list(_with_price(_SF2, "49.99"))
    del row_c[1]                                   # usercity dropped
    ev_c = [tuple(row_c) + ("c", False, 5, "defaultvalue")]

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
    dedup = dedup_latest(aligned, ["createdate"],
                         order_by=_order_col_desc())
    cols = PAYLOAD + ["KBC__OPERATION", "KBC__DELETED",
                      "KBC__BATCH_EVENT_ORDER", "newcolumn"]
    out = (to_output_columns(dedup).select(*cols)
           .repartition(1)
           .sortWithinPartitions("KBC__BATCH_EVENT_ORDER"))
    d = str(tmp_path / "pgdrift")
    write_csv(out, d, null_value="")
    part = next(f for f in sorted(os.listdir(d)) if f.endswith(".csv"))
    with open(os.path.join(d, part), "rb") as fh:
        got = fh.read()
    assert got == _golden(
        f"{PG}/schema-drift-chained/02_inserts_updates_deletes_alter/"
        "expected/data/out/tables/inventory_sales.csv")


def _snapshot_bytes(spark, rows, schema, cols, out_dir):
    df = spark.createDataFrame(
        [r + ("r", False, i) for i, r in enumerate(rows)], schema)
    out = (to_output_columns(df).select(*cols)
           .repartition(1)
           .sortWithinPartitions("KBC__BATCH_EVENT_ORDER"))
    write_csv(out, out_dir, null_value="")
    part = next(f for f in sorted(os.listdir(out_dir))
                if f.endswith(".csv"))
    with open(os.path.join(out_dir, part), "rb") as fh:
        return fh.read()


_SYS_FIELDS = [T.StructField("kbc__operation", T.StringType()),
               T.StructField("__deleted", T.BooleanType()),
               T.StructField("kbc__batch_event_order", T.LongType())]


def test_pg_inventory_snapshots_byte_match(spark, tmp_path):
    """all-tables/01: the Debezium inventory fixture tables' snapshots
    (customers / orders / products_on_hand) — typed date egress and
    the statement-overrides customers golden being the same snapshot."""
    customers = [(1001, "Sally", "Thomas", "sally.thomas@acme.com"),
                 (1002, "George", "Bailey", "gbailey@foobar.com"),
                 (1003, "Edward", "Walker", "ed@walker.com"),
                 (1004, "Anne", "Kretchmar", "annek@noanswer.org")]
    cust_schema = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("email", T.StringType())] + _SYS_FIELDS)
    cust_gold = _golden(f"{PG}/all-tables/01_simple-full-load/expected/"
                        "data/out/tables/inventory_customers.csv")
    assert cust_gold == _golden(
        f"{PG}/full-load-statement-overrides/expected/data/out/tables/"
        "inventory_customers.csv")
    got = _snapshot_bytes(
        spark, customers, cust_schema,
        ["id", "first_name", "last_name", "email", "KBC__OPERATION",
         "KBC__DELETED", "KBC__BATCH_EVENT_ORDER"],
        str(tmp_path / "pgcust"))
    assert got == cust_gold

    import datetime
    orders = [(10001, datetime.date(2016, 1, 16), 1001, 1, 102),
              (10002, datetime.date(2016, 1, 17), 1002, 2, 105),
              (10003, datetime.date(2016, 2, 19), 1002, 2, 106),
              (10004, datetime.date(2016, 2, 21), 1003, 1, 107)]
    ord_schema = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("order_date", T.DateType()),
        T.StructField("purchaser", T.IntegerType()),
        T.StructField("quantity", T.IntegerType()),
        T.StructField("product_id", T.IntegerType())] + _SYS_FIELDS)
    got = _snapshot_bytes(
        spark, orders, ord_schema,
        ["id", "order_date", "purchaser", "quantity", "product_id",
         "KBC__OPERATION", "KBC__DELETED", "KBC__BATCH_EVENT_ORDER"],
        str(tmp_path / "pgord"))
    assert got == _golden(f"{PG}/all-tables/01_simple-full-load/expected/"
                          "data/out/tables/inventory_orders.csv")

    poh = [(101, 3), (102, 8), (103, 18), (104, 4), (105, 5),
           (106, 0), (107, 44), (108, 2), (109, 5)]
    poh_schema = T.StructType([
        T.StructField("product_id", T.IntegerType()),
        T.StructField("quantity", T.IntegerType())] + _SYS_FIELDS)
    got = _snapshot_bytes(
        spark, poh, poh_schema,
        ["product_id", "quantity", "KBC__OPERATION", "KBC__DELETED",
         "KBC__BATCH_EVENT_ORDER"],
        str(tmp_path / "pgpoh"))
    assert got == _golden(f"{PG}/all-tables/01_simple-full-load/expected/"
                          "data/out/tables/inventory_products_on_hand.csv")


def test_pg_geom_snapshot_byte_match(spark, tmp_path):
    """all-tables/01 geom: Debezium's generic Geometry struct (wkb +
    srid, NO x/y — that form is Point-only) JSON-stringified with an
    explicit null srid; the nullable geography column h egresses as a
    bare empty field."""
    from pyspark.sql import functions as F
    # WKB payloads of the fixture rows: POINT(1 1), LINESTRING(2 1,6 6),
    # POLYGON((0 5,2 5,2 7,0 7,0 5)) — carried as opaque values
    wkbs = ["AQEAAAAAAAAAAADwPwAAAAAAAPA/",
            "AQIAAAACAAAAAAAAAAAAAEAAAAAAAADwPwAAAAAAABhAAAAAAAAAGEA=",
            "AQMAAAABAAAABQAAAAAAAAAAAAAAAAAAAAAAFEAAAAAAAAAAQAAAAAAAABRA"
            "AAAAAAAAAEAAAAAAAAAcQAAAAAAAAAAAAAAAAAAAHEAAAAAAAAAAAAAAAAAA"
            "ABRA"]
    rows = [(i + 1, wkbs[i], None, "r", False, i) for i in range(3)]
    schema = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("g_wkb", T.StringType()),
        T.StructField("h", T.StringType())] + _SYS_FIELDS)
    df = spark.createDataFrame(rows, schema)
    g = F.to_json(F.struct(F.col("g_wkb").alias("wkb"),
                           F.lit(None).cast("int").alias("srid")),
                  {"ignoreNullFields": "false"})
    out = (to_output_columns(df)
           .select("id", g.alias("g"), "h", "KBC__OPERATION",
                   "KBC__DELETED", "KBC__BATCH_EVENT_ORDER")
           .repartition(1)
           .sortWithinPartitions("KBC__BATCH_EVENT_ORDER"))
    d = str(tmp_path / "pggeom")
    write_csv(out, d, null_value="", options={"escape": '"'})
    part = next(f for f in sorted(os.listdir(d)) if f.endswith(".csv"))
    with open(os.path.join(d, part), "rb") as fh:
        got = fh.read()
    assert got == _golden(f"{PG}/all-tables/01_simple-full-load/expected/"
                          "data/out/tables/inventory_geom.csv")


def test_pg_all_tables_stage2_equivalence():
    """all-tables/02 changes only the sales table; its golden is
    byte-identical to simple-incremental-chained's stage 2 (replayed
    above); the untouched tables' stage-2 expecteds are empty."""
    assert _golden(f"{PG}/all-tables/02_inserts_updates_deletes/expected/"
                   "data/out/tables/inventory_sales.csv") == _golden(
        f"{PG}/simple-incremental-chained/02_inserts_updates_deletes/"
        "expected/data/out/tables/inventory_sales.csv")
    for t in ("inventory_orders", "inventory_customers",
              "inventory_products_on_hand", "inventory_geom",
              "inventory_products"):
        assert _golden(f"{PG}/all-tables/02_inserts_updates_deletes/"
                       f"expected/data/out/tables/{t}.csv") == b""
