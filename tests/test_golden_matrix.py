"""Functional-matrix closure: the reference ships 14 functional
scenarios; 9 are replayed byte-golden in test_golden_csv.py /
test_all_datatypes_golden.py. This file closes the rest:

* the remaining 5 scenarios' data goldens are byte-IDENTICAL to
  already-replayed ones (the MariaDB / read-only / full-load / no-pkey
  variants change the source flavor, not the egress) — pinned here so
  the equivalence is a checked fact, not a claim, and our own replay
  bytes match them directly;
* legacy manifest interop (K4): dict parity of
  ``build_legacy_manifest`` with the reference's expected manifests
  (the pre-`schema` column_metadata shape every scenario uses);
* the Debezium schema-changes DDL egress at the byte level (T6 routing
  + K1 CSV quoting of the heavily-quoted tableChanges JSON), for both
  the MySQL and MariaDB payload flavors.
"""

import csv
import io
import json
import os

from python_cdc_component_spark.engine import to_output_columns
from python_cdc_component_spark.sinks.csv_sink import write_csv
from python_cdc_component_spark.sinks.manifest import (
    build_legacy_manifest)

from test_golden_csv import (
    GOLD_1, INITIAL, NOPK_GOLD_2, SCHEMA, _export, _with_price,
    _NY10, _LA20, _R2013_SKU1, _R2013_SKU2, APP_GOLD_2)

FUNC = "/root/reference/db_components/ex_mysql_cdc/tests/functional"

# sales_table.sql column DDL (ex_mysql_cdc/tests/sql_test_traits/
# sales_table.sql) — the source types the legacy manifests serialize
SALES_COLUMNS = [
    ("usergender", "MEDIUMTEXT", True),
    ("usercity", "MEDIUMTEXT", True),
    ("usersentiment", "INT", True),
    ("zipcode", "MEDIUMTEXT", True),
    ("sku", "MEDIUMTEXT", True),
    ("createdate", "VARCHAR(64)", False),       # NOT NULL PRIMARY KEY
    ("category", "MEDIUMTEXT", True),
    ("price", "DECIMAL(12,5)", True),
    ("county", "MEDIUMTEXT", True),
    ("countycode", "MEDIUMTEXT", True),
    ("userstate", "MEDIUMTEXT", True),
    ("categorygroup", "MEDIUMTEXT", True),
]

# debezium/common.py:14-29 — the schema-changes side table
SCHEMA_CHANGE_COLUMNS = [
    ("source", "STRING", False),
    ("ts_ms", "INTEGER", False),
    ("databaseName", "STRING", False),
    ("schemaName", "STRING", False),
    ("ddl", "STRING", False),
    ("tableChanges", "STRING", False),
    ("KBC__BATCH_EVENT_ORDER", "INTEGER", False),
]


def _golden(path: str) -> bytes:
    with open(path, "rb") as fh:
        return fh.read()


# ---------------------------------------------------------------------------
# scenario equivalences + direct replays


def test_full_load_scenario_byte_match(spark, tmp_path):
    """simple-full-load: snapshot-only run (append_full config) — the
    five op=r rows in snapshot order. Its golden is byte-identical to
    the dedupe-chained stage-1 golden (same snapshot, PK-distinct
    rows), and our APPEND egress (no dedup at all — the honest
    full-load path) reproduces both."""
    gold = _golden(f"{FUNC}/simple-full-load/expected/data/out/tables/"
                   "inventory_sales.csv")
    assert gold == _golden(GOLD_1)
    rows = [r + ("r", False, i) for i, r in enumerate(INITIAL)]
    df = spark.createDataFrame(rows, SCHEMA)     # NO dedup: full load
    assert _export(df, str(tmp_path / "sfl")) == gold


def test_chained_variant_scenarios_byte_match(spark, tmp_path):
    """simple-incremental-chained-{mariadb,read_only}: the MariaDB and
    read-only (ro_mode file-signal) flavors of the chained append_full
    sync — both goldens are byte-identical to the MySQL
    incremental-append-chained stage-2 golden, and our APPEND egress
    of the same binlog workload reproduces all three."""
    maria = _golden(f"{FUNC}/simple-incremental-chained-mariadb/"
                    "02_inserts_updates_deletes/expected/data/out/"
                    "tables/inventory_sales.csv")
    ro = _golden(f"{FUNC}/simple-incremental-chained-read_only/"
                 "02_inserts_updates_deletes/expected/data/out/"
                 "tables/inventory_sales.csv")
    assert maria == ro == _golden(APP_GOLD_2)
    ev = []

    def emit(row, op, deleted=False):
        ev.append(row + (op, deleted, len(ev)))

    emit(_with_price(_NY10, "199.99"), "c")
    emit(_with_price(_LA20, "14.99"), "c")
    emit(_with_price(_R2013_SKU1, "249.99"), "u")
    emit(_R2013_SKU2, "d", True)                 # before-image delete
    df = spark.createDataFrame(ev, SCHEMA)
    assert _export(df, str(tmp_path / "var2")) == maria


def test_no_pkey_append_scenario_byte_match(spark, tmp_path):
    """simple-incremental-no-pkey (append_full, NO dedup): every event
    survives in event order. Golden byte-identical to the no-pkey-
    DEDUPE stage-2 golden (the four payloads are pairwise distinct, so
    the all-columns dedup keeps them all); the APPEND path reproduces
    it without any dedup operator in the plan."""
    gold = _golden(f"{FUNC}/simple-incremental-no-pkey/"
                   "02_inserts_updates_deletes/expected/data/out/"
                   "tables/inventory_nopkey.csv")
    assert gold == _golden(NOPK_GOLD_2)
    ev = []

    def emit(row, op, deleted=False):
        ev.append(row + (op, deleted, len(ev)))

    emit(_with_price(_NY10, "199.99"), "c")
    emit(_with_price(_LA20, "14.99"), "c")
    emit(_with_price(_R2013_SKU1, "249.99"), "u")
    emit(_R2013_SKU2, "d", True)
    df = spark.createDataFrame(ev, SCHEMA)
    assert _export(df, str(tmp_path / "nopk_app")) == gold


def test_drop_non_null_mariadb_scenario_byte_match():
    """schema-drift-drop-non-null-mariadb: the drop-column data golden
    is byte-identical to the MySQL variant test_golden_csv already
    replays (the flavors differ only in the DDL metadata payload,
    covered by the schema-changes tests below)."""
    maria = _golden(f"{FUNC}/schema-drift-drop-non-null-mariadb/"
                    "02_drop_column/expected/data/out/tables/"
                    "inventory_products.csv")
    mysql = _golden(f"{FUNC}/schema-drift-drop-non-null/02_drop_column/"
                    "expected/data/out/tables/inventory_products.csv")
    assert maria == mysql


# ---------------------------------------------------------------------------
# legacy manifest interop (K4)


def test_legacy_manifest_full_load_parity():
    """simple-full-load's sales manifest: append mode — NO primary_key
    key (the reference clears PKs under append load types,
    component.py:403-405), no incremental key."""
    want = json.load(open(
        f"{FUNC}/simple-full-load/expected/data/out/tables/"
        "inventory_sales.csv.manifest"))
    got = build_legacy_manifest(
        SALES_COLUMNS, destination=want["destination"])
    assert got == want


def test_legacy_manifest_dedupe_parity():
    """incremental-dedupe-chained stage-1: dedupe mode keeps the PK."""
    want = json.load(open(
        f"{FUNC}/incremental-dedupe-chained/01_simple-full-load/"
        "expected/data/out/tables/inventory_sales.csv.manifest"))
    got = build_legacy_manifest(
        SALES_COLUMNS, destination=want["destination"],
        primary_key=["createdate"])
    assert got == want


def test_legacy_manifest_no_pkey_parity():
    """simple-incremental-no-pkey stage-2: same column metadata, the
    nopkey destination, append mode (no PK key)."""
    want = json.load(open(
        f"{FUNC}/simple-incremental-no-pkey/02_inserts_updates_deletes/"
        "expected/data/out/tables/inventory_nopkey.csv.manifest"))
    got = build_legacy_manifest(
        SALES_COLUMNS, destination=want["destination"])
    assert got == want


def test_legacy_manifest_schema_changes_parity():
    """The schema-changes side table's manifest: bare base types, the
    4-column PK, always incremental, no system tail."""
    want = json.load(open(
        f"{FUNC}/simple-full-load/expected/data/out/tables/"
        "io_debezium_connector_mysql_schema_changes.csv.manifest"))
    got = build_legacy_manifest(
        SCHEMA_CHANGE_COLUMNS, destination=want["destination"],
        primary_key=["ts_ms", "databaseName", "schemaName", "ddl"],
        incremental=True, system_columns=False)
    assert got == want


# ---------------------------------------------------------------------------
# schema-changes DDL egress bytes (T6 + K1 quoting)


def _schema_change_golden_event(path: str):
    """Parse one expected schema-changes CSV row back into the logical
    event the source emitted: (databaseName, schemaName, ddl,
    tableChanges, order). The canonical exports strip source/ts_ms."""
    with open(path, newline="") as fh:
        row = next(csv.reader(io.StringIO(fh.read())))
    db, schema, ddl, changes, order = row
    return (db, schema or None, ddl, changes, int(order))


def _sc_bytes(spark, event, out_dir):
    from python_cdc_component_spark.operators.routing import (
        split_schema_changes)
    df = spark.createDataFrame(
        [event], "databaseName string, schemaName string, ddl string, "
                 "tableChanges string, kbc__batch_event_order long")
    _data, ddl_events = split_schema_changes(df)
    assert _data.isEmpty()
    out = (to_output_columns(ddl_events)
           .select("databaseName", "schemaName", "ddl", "tableChanges",
                   "KBC__BATCH_EVENT_ORDER")
           .repartition(1))
    write_csv(out, out_dir, null_value="", options={"escape": '"'})
    part = next(f for f in sorted(os.listdir(out_dir))
                if f.endswith(".csv"))
    with open(os.path.join(out_dir, part), "rb") as fh:
        return fh.read()


def test_schema_changes_ddl_csv_bytes_mysql(spark, tmp_path):
    """DROP COLUMN DDL event routed through split_schema_changes and
    the CSV sink must serialize the Debezium tableChanges JSON (nested
    quotes, commas, escaped identifiers) byte-exactly: RFC-4180
    quote-doubling, NULL schemaName as a bare empty field."""
    gold = (f"{FUNC}/schema-drift-drop-non-null/02_drop_column/expected/"
            "data/out/tables/io_debezium_connector_mysql_schema_changes.csv")
    ev = _schema_change_golden_event(gold)
    assert ev[1] is None and ev[2].startswith("ALTER TABLE")
    got = _sc_bytes(spark, ev, str(tmp_path / "sc_mysql"))
    assert got == _golden(gold)


def test_schema_changes_ddl_csv_bytes_mariadb(spark, tmp_path):
    """Same DDL captured from MariaDB — the tableChanges payload
    differs (INT length 11 vs null), the byte contract must hold for
    both flavors."""
    gold = (f"{FUNC}/schema-drift-drop-non-null-mariadb/02_drop_column/"
            "expected/data/out/tables/"
            "io_debezium_connector_mysql_schema_changes.csv")
    ev = _schema_change_golden_event(gold)
    got = _sc_bytes(spark, ev, str(tmp_path / "sc_maria"))
    assert got == _golden(gold)
    mysql_gold = (f"{FUNC}/schema-drift-drop-non-null/02_drop_column/"
                  "expected/data/out/tables/"
                  "io_debezium_connector_mysql_schema_changes.csv")
    assert _golden(gold) != _golden(mysql_gold)   # genuinely distinct


# ---------------------------------------------------------------------------
# incremental-append-chained / 03_table_addition: the APPEND-mode table
# addition — the new table arrives via the ad-hoc BLOCKING snapshot
# alone (op=r, orders 0..8; no stream-capture prefix, unlike the
# all-tables variant whose c×9 + r×9 interleave test_golden_csv covers)


def test_append_chained_table_addition_byte_match(spark, tmp_path):
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from python_cdc_component_spark.control import backfill_plan
    from test_golden_csv import PRODUCTS, PROD_SCHEMA, _export_prod

    ac = f"{FUNC}/incremental-append-chained/03_table_addition/expected"
    at = f"{FUNC}/all-tables/03_table_addition/expected"
    # the signal row and the already-synced table's egress are
    # byte-identical to the all-tables goldens test_golden_csv replays
    for f in ("inventory_debezium_signals.csv", "inventory_sales.csv"):
        assert (_golden(f"{ac}/data/out/tables/{f}")
                == _golden(f"{at}/data/out/tables/{f}"))

    src = str(tmp_path / "src")
    os.makedirs(src)
    prod_payload = T.StructType(PROD_SCHEMA.fields[:4])
    (spark.createDataFrame(PRODUCTS, prod_payload).coalesce(1)
     .write.parquet(os.path.join(src, "products.parquet")))
    snap = (backfill_plan(spark, src, ["products"])["products"]
            .withColumn("kbc__batch_event_order",
                        F.col("id").cast("long") - 101))
    cols = ["id", "name", "description", "weight", "KBC__OPERATION",
            "KBC__DELETED", "KBC__BATCH_EVENT_ORDER"]
    got = _export_prod(snap, str(tmp_path / "ac_prod"), cols)
    assert got == _golden(f"{ac}/data/out/tables/inventory_products.csv")


def test_engine_legacy_manifest_format(spark, sf_dir, tmp_path):
    """The sync engine's manifest_format='legacy' sink: the reference's
    column_metadata shape derived from the OUTPUT schema — KBC__*
    system columns keep their fixed metadata at their actual schema
    positions, decimals carry precision, DEDUPE keeps the PK and
    APPEND clears it (component.py:403-405), destination is
    bucket.table."""
    from python_cdc_component_spark.engine import SyncConfig, sync

    out = str(tmp_path / "out")
    sync(spark, sf_dir, out, SyncConfig(
        mode="DEDUPE", manifest_format="legacy",
        destination="in.c-bucket"))
    doc = json.load(open(os.path.join(out, "events.manifest")))
    assert doc["destination"] == "in.c-bucket.events"
    assert doc["primary_key"] == ["user_id"]
    # incremental load types emit incremental: true on DATA tables too
    # (reference incremental-append-chained goldens; is_incremental_load
    # covers incremental_load + append_incremental) — and the key sits
    # between `columns` and `enclosure` like every reference manifest
    assert doc["incremental"] is True
    keys = list(doc)
    assert keys.index("columns") < keys.index("incremental") \
        < keys.index("enclosure")
    assert doc["columns"] == list(doc["column_metadata"])
    md = doc["column_metadata"]
    assert md["KBC__OPERATION"] == [
        {"key": "KBC.description", "value": ""},
        {"key": "KBC.datatype.basetype", "value": "STRING"},
        {"key": "KBC.datatype.nullable", "value": False}]
    assert md["KBC__DELETED"][1]["value"] == "BOOLEAN"
    assert md["KBC__POS"][1]["value"] == "INTEGER"
    # a legacy run in APPEND mode clears the PK key entirely
    out2 = str(tmp_path / "out2")
    sync(spark, sf_dir, out2, SyncConfig(
        mode="APPEND", manifest_format="legacy"))
    doc2 = json.load(open(os.path.join(out2, "events.manifest")))
    assert "primary_key" not in doc2
    assert "destination" not in doc2
    # a full-load legacy run omits the incremental key (reference
    # full_load/append_full goldens never carry it)
    out2b = str(tmp_path / "out2b")
    sync(spark, sf_dir, out2b, SyncConfig(
        mode="DEDUPE", manifest_format="legacy", incremental=False))
    doc2b = json.load(open(os.path.join(out2b, "events.manifest")))
    assert "incremental" not in doc2b
    # PK-less DEDUPE falls back to all non-system columns as the PK
    # (reference component.py:406-408: "No primary keys found...
    # building primary key using all attributes")
    out2c = str(tmp_path / "out2c")
    sync(spark, sf_dir, out2c, SyncConfig(
        mode="DEDUPE", manifest_format="legacy", primary_keys=[]))
    doc2c = json.load(open(os.path.join(out2c, "events.manifest")))
    assert doc2c["primary_key"]
    assert doc2c["primary_key"] == [
        c for c in doc2c["columns"] if not c.startswith("KBC__")]
    # default format unchanged: the typed `schema` form
    out3 = str(tmp_path / "out3")
    sync(spark, sf_dir, out3, SyncConfig(mode="DEDUPE"))
    doc3 = json.load(open(os.path.join(out3, "events.manifest")))
    assert "schema" in doc3 and "column_metadata" not in doc3
