"""End-to-end engine lifecycle + sinks + entry contract."""

import json
import os

from pyspark.sql import types as T

import __spark_entry__ as entry
from python_cdc_component_spark.engine import SyncConfig, sync
from python_cdc_component_spark.model.schema import TableSchema
from python_cdc_component_spark.sinks.csv_sink import write_csv
from python_cdc_component_spark.sinks.manifest import build_manifest
from python_cdc_component_spark.sinks.state import RunState
from python_cdc_component_spark.sources.csv import read_csv_with_schema


def test_sync_dedupe_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out")
    results = sync(spark, sf_dir, out, SyncConfig(mode="DEDUPE"))
    df = results["events"]
    # one row per user (PK) at this sf
    users = df.select("user_id").distinct().count()
    assert df.count() == users
    assert "KBC__OPERATION" in df.columns and "KBC__DELETED" in df.columns
    assert os.path.exists(os.path.join(out, "schema.json"))
    assert os.path.exists(os.path.join(out, "state.json"))
    state = RunState.load(os.path.join(out, "state.json"))
    assert not state.is_initial_run
    assert state.offsets["events"]["pos"] is not None
    with open(os.path.join(out, "events.manifest")) as fh:
        manifest = json.load(fh)
    assert manifest["primary_key"] == ["user_id"]


def test_sync_append_keeps_all_events(spark, sf_dir, tmp_path):
    from python_cdc_component_spark.sources.events import read_events
    results = sync(spark, sf_dir, str(tmp_path / "out"),
                   SyncConfig(mode="APPEND"))
    assert results["events"].count() == read_events(spark, sf_dir).count()


def test_csv_null_sentinel_roundtrip(spark, tmp_path):
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("s", T.StringType()),
    ])
    df = spark.createDataFrame([(1, None), (2, "x"), (3, "")], schema)
    path = str(tmp_path / "csv")
    write_csv(df, path)
    back = read_csv_with_schema(spark, path, schema)
    got = {(r.id, r.s) for r in back.collect()}
    assert got == {(1, None), (2, "x"), (3, "")}


def test_manifest_base_types():
    ts = TableSchema("t", T.StructType([
        T.StructField("i", T.LongType(), False),
        T.StructField("d", T.DecimalType(12, 5)),
        T.StructField("s", T.StringType()),
    ]), ["i"])
    doc = build_manifest(ts, incremental=True)
    bases = {c["name"]: c["data_type"]["base"] for c in doc["schema"]}
    assert bases["i"]["type"] == "INTEGER"
    assert bases["d"] == {"type": "NUMERIC", "length": "12,5"}
    assert bases["s"]["type"] == "STRING"


def test_state_offset_b64_roundtrip(tmp_path):
    st = RunState(offsets={"t": {"ts": 5, "file": "f", "pos": 9}})
    p = str(tmp_path / "state.json")
    st.save(p)
    st2 = RunState.load(p)
    assert st2.offsets == st.offsets and not st2.is_initial_run


def test_entry_contract(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(oracles) <= set(qs)
    # every declared operator family has an oracle unless explicitly
    # non-SQL-expressible
    assert len(oracles) >= 20


def test_estimate_partitions_targets_slice_size(spark):
    from python_cdc_component_spark.sinks.csv_sink import _estimate_partitions

    df = spark.range(100_000).selectExpr("id", "repeat('x', 100) AS pad")
    # tiny target → many slices; huge target → single slice
    many = _estimate_partitions(df, target_bytes=100 * 1024)
    one = _estimate_partitions(df, target_bytes=1 << 40)
    assert one == 1
    assert many is not None and many > one
    assert many <= 10_000                     # clamped


def test_write_parquet_partition_pruning(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F
    from python_cdc_component_spark.sinks.csv_sink import write_parquet
    from python_cdc_component_spark.sources.events import read_events

    ev = read_events(spark, sf_dir).select("event_id", "event_type")
    out = str(tmp_path / "by_type")
    write_parquet(ev, out, partition_by=["event_type"])
    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    # partition pruning: the filtered scan reads only the click directory
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == ev.filter("event_type = 'click'").count()
    assert "PartitionFilters: [isnotnull(event_type" in plan


def test_sync_empty_source_keeps_initial_run(spark, sf_dir, tmp_path):
    """An empty source must not write NULL offsets: is_initial_run stays
    True so the next run is still classified as the initial load
    (ADVICE r1, engine.py)."""
    from pyspark.sql import functions as F
    from python_cdc_component_spark.sources.events import read_events

    empty_sf = str(tmp_path / "empty_sf")
    os.makedirs(empty_sf)
    (read_events(spark, sf_dir)
     .select("event_id", F.col("ts_ns").alias("ts"), "user_id",
             "event_type", "value", "props")
     .filter(F.lit(False)).coalesce(1)
     .write.parquet(os.path.join(empty_sf, "events.parquet")))

    out = str(tmp_path / "empty_out")
    sync(spark, empty_sf, out)
    st = RunState.load(os.path.join(out, "state.json"))
    assert st.is_initial_run


def test_state_reference_doc_roundtrip():
    """K5 interop with the reference's state-file shape
    (_write_result_state: last_offset b64 blob + last_schema +
    last_synced_tables): a reference-format doc loads, the opaque offset
    blob survives byte-identically, and re-export matches."""
    import base64

    raw_offset = b'{"file":"mysql-bin.000048","pos":21182}'
    ref_doc = {
        "last_offset": base64.b64encode(raw_offset).decode("ascii"),
        "last_schema": {"topic_db_t1": {"name": "t1", "fields": []}},
        "last_debezium_schema": {},
        "last_synced_tables": ["db.t1"],
    }
    st, blob = RunState.from_reference_doc(ref_doc)
    assert blob == raw_offset
    assert st.last_synced_tables == ["db.t1"]
    assert not st.is_initial_run          # JSON offsets were recovered
    out = st.to_reference_doc(raw_offset_bytes=blob)
    assert out["last_offset"] == ref_doc["last_offset"]
    assert out["last_schema"] == ref_doc["last_schema"]

    # native (non-JSON) Debezium offset blob: opaque but preserved
    st2, blob2 = RunState.from_reference_doc(
        {"last_offset": base64.b64encode(b"\x00\x01java").decode("ascii")})
    assert blob2 == b"\x00\x01java"
    assert st2.is_initial_run             # nothing parseable into offsets


def test_sync_multi_table_routing(spark, sf_dir, tmp_path):
    """Multi-table sync: one event stream with a _table discriminator
    routed per table (reference _load_tables_to_stage iteration), DDL
    events split to the side table, per-table manifests and offsets."""
    from pyspark.sql import functions as F
    from python_cdc_component_spark.engine import sync_multi
    from python_cdc_component_spark.sources.events import read_cdc_events

    ev = read_cdc_events(spark, sf_dir)
    tab = F.when(F.col("event_type").isin("click", "view"), "tab_a") \
           .otherwise("tab_b")
    multi = (ev.withColumn("_table", tab)
               .withColumn("ddl", F.when(F.col("kbc__pos") == 1,
                                         "ALTER TABLE t ADD COLUMN c int")))

    out = str(tmp_path / "multi_out")
    results = sync_multi(spark, multi, out, {
        "tab_a": SyncConfig(mode="DEDUPE", primary_keys=["user_id"]),
        "tab_b": SyncConfig(mode="APPEND"),
    })

    # DEDUPE branch: one row per user within tab_a
    a = results["tab_a"]
    assert a.count() == a.select("user_id").distinct().count()
    # APPEND branch keeps every non-DDL tab_b event
    n_b = multi.filter((F.col("_table") == "tab_b")
                       & F.col("ddl").isNull()).count()
    assert results["tab_b"].count() == n_b
    # no cross-table leakage
    total_data = multi.filter(F.col("ddl").isNull()).count()
    assert (a.count() <= total_data
            and results["tab_b"].count() < total_data)

    # DDL side table (T6)
    assert spark.read.parquet(os.path.join(out, "schema_changes")).count() == 1

    # per-table manifests + shared registry + state offsets
    for t in ("tab_a", "tab_b"):
        assert os.path.exists(os.path.join(out, f"{t}.manifest"))
    st = RunState.load(os.path.join(out, "state.json"))
    assert st.last_synced_tables == ["tab_a", "tab_b"]
    assert st.offsets["tab_a"]["pos"] is not None
    assert st.offsets["tab_b"]["pos"] is not None


def test_sync_column_filter_chained(spark, sf_dir, tmp_path):
    """incremental-column-filter-chained shape: two chained syncs with an
    exclude list — filtered columns never reach the output or the
    manifest, system columns are protected, and the registry stays
    consistent across runs."""
    out = str(tmp_path / "colf_out")
    cfg = SyncConfig(mode="DEDUPE", primary_keys=["user_id"],
                     column_exclude=["props"])
    r1 = sync(spark, sf_dir, out, cfg)["events"]
    assert "props" not in r1.columns
    assert "KBC__OPERATION" in r1.columns          # system col protected
    with open(os.path.join(out, "events.manifest")) as fh:
        m1 = json.load(fh)
    assert all(c["name"] != "props" for c in m1["schema"])

    # chained second run with the SAME registry: schema stays filtered
    st = RunState.load(os.path.join(out, "state.json"))
    r2 = sync(spark, sf_dir, out, cfg, state=st)["events"]
    assert "props" not in r2.columns
    st2 = RunState.load(os.path.join(out, "state.json"))
    assert not st2.is_initial_run


def test_sync_multi_fused_matches_per_table_loop(spark, sf_dir, tmp_path):
    """The O(1)-jobs fused multi-table path produces exactly the
    per-table loop's rows, manifests the same tables, and records the
    same end offsets — and its DEDUPE group runs as ONE window over
    (_table, pk), a single data shuffle for every table at once."""
    from pyspark.sql import functions as F

    from python_cdc_component_spark.engine import (
        SyncConfig, sync_multi, sync_multi_fused)
    from python_cdc_component_spark.model.envelope import (
        SYSTEM_COLUMNS as SC)
    from python_cdc_component_spark.sources.events import read_cdc_events

    ev = read_cdc_events(spark, sf_dir)
    multi = ev.withColumn(
        "_table", F.when(F.col("event_type").isin("click", "view"), "tab_a")
                   .otherwise("tab_b"))
    cfgs = {"tab_a": SyncConfig(mode="DEDUPE", primary_keys=["user_id"]),
            "tab_b": SyncConfig(mode="DEDUPE", primary_keys=["user_id"])}

    loop_state = RunState()
    sync_multi(spark, multi, str(tmp_path / "loop"), cfgs, loop_state)
    fused_state = RunState()
    fused = sync_multi_fused(spark, multi, str(tmp_path / "fused"), cfgs,
                             fused_state)

    for t in cfgs:
        a = {(r["user_id"], r[SC.POS]) for r in
             spark.read.parquet(str(tmp_path / "loop" / t)).collect()}
        b = {(r["user_id"], r[SC.POS]) for r in
             spark.read.parquet(
                 str(tmp_path / "fused" / "tables")).filter(
                 F.col("_table") == t).collect()}
        assert a == b, t
        assert loop_state.offsets[t] == fused_state.offsets[t]
        assert os.path.exists(str(tmp_path / "fused" / f"{t}.manifest"))

    # ONE data shuffle serves every DEDUPE table (plus AQE bookkeeping)
    from python_cdc_component_spark.plans.explain import plan_summary
    s = plan_summary(fused)
    assert s.shuffles == 1


def test_sync_multi_fused_hetero_mixed_schema_fleet(spark, sf_dir,
                                                    tmp_path):
    """VERDICT r4 #8: a mixed-schema fleet fuses per schema-fingerprint
    group — O(#schemas) jobs — and every table's rows, offsets, and
    manifest match the per-table plan it would get from the loop path.
    Here: 4 tables, 2 distinct schemas (one carries an extra column)."""
    from pyspark.sql import functions as F

    from python_cdc_component_spark.engine import (
        SyncConfig, plan_table, schema_fingerprint, sync_multi_fused_hetero)
    from python_cdc_component_spark.model.envelope import (
        SYSTEM_COLUMNS as SC)
    from python_cdc_component_spark.sources.events import read_cdc_events

    ev = read_cdc_events(spark, sf_dir)
    slim = ev.drop("props")
    fleet = {
        "wide_a": ev.filter(F.col("user_id") % 4 == 0),
        "wide_b": ev.filter(F.col("user_id") % 4 == 1),
        "slim_c": slim.filter(F.col("user_id") % 4 == 2),
        "slim_d": slim.filter(F.col("user_id") % 4 == 3),
    }
    cfgs = {t: SyncConfig(mode="DEDUPE", primary_keys=["user_id"])
            for t in fleet}

    state = RunState()
    results = sync_multi_fused_hetero(spark, fleet, str(tmp_path / "het"),
                                      cfgs, state)
    # exactly 2 fingerprint groups → 2 fused jobs
    assert len(results) == 2
    assert {schema_fingerprint(fleet["wide_a"]),
            schema_fingerprint(fleet["slim_c"])} == set(results)

    out = spark.read.parquet(str(tmp_path / "het" / "tables"))
    for t, src in fleet.items():
        want = {(r["user_id"], r[SC.POS]) for r in
                plan_table(src, cfgs[t]).collect()}
        got = {(r["user_id"], r[SC.POS]) for r in
               out.filter(F.col("_table") == t).collect()}
        assert got == want, t
        assert state.offsets[t]["pos"] == max(p for _, p in want)
        assert os.path.exists(str(tmp_path / "het" / f"{t}.manifest"))

    # each group's plan keeps the fused shape: ONE data shuffle
    from python_cdc_component_spark.plans.explain import plan_summary
    for res in results.values():
        assert plan_summary(res).shuffles == 1
