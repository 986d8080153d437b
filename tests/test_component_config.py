"""Reference config.json compatibility (config.py): parse the
reference's OWN functional-test configs, map them onto engine configs,
and run the Keboola data-dir convention end-to-end with chained state."""

import glob
import json
import os

import pytest

from python_cdc_component_spark.config import (
    ComponentConfig, parse_component_config, run_component,
    to_stream_config, to_sync_config)

_REF_FUNCTIONAL = "/root/reference/db_components/ex_mysql_cdc/tests/functional"


def test_parses_every_reference_functional_config():
    """Every config.json the reference ships for its functional suite
    must parse without error — the 'hand us your config' contract."""
    paths = glob.glob(f"{_REF_FUNCTIONAL}/*/*/source/data/config.json")
    assert len(paths) >= 5
    for p in paths:
        cfg = parse_component_config(p)
        assert isinstance(cfg, ComponentConfig)
        assert cfg.snapshot_mode in {"initial", "initial_only",
                                     "snapshot_only", "never",
                                     "schema_only", "schema_only_recovery",
                                     "when_needed"}
        assert cfg.load_type in {"full_load", "incremental_load",
                                 "append_incremental", "append_full"}


def test_parse_known_reference_config_fields():
    p = (f"{_REF_FUNCTIONAL}/incremental-dedupe-chained/"
         "02_inserts_updates_deletes/source/data/config.json")
    cfg = parse_component_config(p)
    assert cfg.tables == ["inventory.sales"]
    assert cfg.schemas == ["inventory"]
    assert cfg.snapshot_mode == "initial"
    assert cfg.max_wait_s == 5
    assert cfg.load_type == "full_load"
    assert cfg.source_signal_table == "inventory.debezium_signals"
    assert cfg.db.port == 3306
    # {{env.MYSQL_HOST}} left verbatim when the env var is unset
    assert cfg.db.host.startswith("{{env.") or cfg.db.host


def test_load_type_mapping_matrix():
    for lt, (mode, inc) in [("full_load", ("DEDUPE", False)),
                            ("incremental_load", ("DEDUPE", True)),
                            ("append_incremental", ("APPEND", True)),
                            ("append_full", ("APPEND", False))]:
        cfg = parse_component_config(
            {"parameters": {"destination": {"load_type": lt}}})
        sc = to_sync_config(cfg)
        assert (sc.mode, sc.incremental) == (mode, inc)


def test_column_filter_and_stream_mapping():
    cfg = parse_component_config({"parameters": {
        "source_settings": {"column_filter_type": "exclude",
                            "column_filter": ["^props$"],
                            "primary_key": ["user_id"]},
        "sync_options": {"max_wait_s": 7, "max_runtime_s": 120,
                         "snapshot_mode": "never"},
    }})
    sc = to_sync_config(cfg)
    assert sc.column_exclude == ["^props$"] and sc.column_include is None
    st = to_stream_config(cfg)
    assert st.max_wait_s == 7 and st.max_duration_s == 120
    assert st.snapshot_mode == "never" and st.mode == "DEDUPE"


def test_unknown_envalues_rejected():
    with pytest.raises(ValueError):
        parse_component_config(
            {"parameters": {"destination": {"load_type": "nope"}}})
    with pytest.raises(ValueError):
        parse_component_config(
            {"parameters": {"sync_options": {"snapshot_mode": "nope"}}})
    with pytest.raises(ValueError):
        parse_component_config(
            {"parameters": {"sync_options": {"handle_binary": "nope"}}})


def test_env_template_resolution(monkeypatch):
    monkeypatch.setenv("CDC_TEST_HOST", "db.internal")
    cfg = parse_component_config({"parameters": {
        "db_settings": {"host": "{{env.CDC_TEST_HOST}}",
                        "#password": "{{env.UNSET_VAR_XYZ}}"}}})
    assert cfg.db.host == "db.internal"
    assert cfg.db.password == "{{env.UNSET_VAR_XYZ}}"
    # embedded occurrences resolve too; unset ones stay verbatim
    cfg2 = parse_component_config({"parameters": {
        "db_settings": {
            "host": "ro-{{env.CDC_TEST_HOST}}:3306/{{env.UNSET_VAR_XYZ}}"}}})
    assert cfg2.db.host == "ro-db.internal:3306/{{env.UNSET_VAR_XYZ}}"


def test_stream_config_no_pk_passes_empty_keys_through():
    cfg = parse_component_config({"parameters": {
        "destination": {"load_type": "incremental_load"}}})
    assert cfg.primary_key == []
    assert to_stream_config(cfg).primary_keys == []


def test_run_component_streaming_no_pk_matches_batch(spark, sf_dir,
                                                     tmp_path):
    """A config WITHOUT source_settings.primary_key must get the batch
    no-PK semantics on the streaming path too: dedupe on ALL payload
    columns (one row per distinct payload), not a MERGE-collapse on an
    injected fixture key."""
    import shutil
    from python_cdc_component_spark.config import run_component_streaming
    src = tmp_path / "src"
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-0.parquet")
    data = tmp_path / "stream_run_nopk"
    os.makedirs(data)
    (data / "config.json").write_text(json.dumps({
        "parameters": {
            "destination": {"load_type": "incremental_load"},
            "sync_options": {"max_wait_s": 5, "snapshot_mode": "initial"},
        },
        "action": "run",
    }))
    res = run_component_streaming(spark, str(data), str(src))
    got = spark.read.parquet(res["out_path"])
    payload = ["user_id", "event_type", "value", "props"]
    src_df = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_payloads = src_df.select(*payload).distinct().count()
    n_users = src_df.select("user_id").distinct().count()
    assert n_payloads > n_users         # the two semantics differ here
    assert got.count() == n_payloads    # batch no-PK semantics
    assert (got.select(*payload).distinct().count() == n_payloads)


def test_run_component_data_dir_convention(spark, sf_dir, tmp_path):
    """End-to-end Keboola data-dir run + chained second run through the
    reference-format state doc."""
    data1 = tmp_path / "run1"
    os.makedirs(data1)
    (data1 / "config.json").write_text(json.dumps({
        "parameters": {
            "destination": {"load_type": "incremental_load"},
            "source_settings": {"primary_key": ["user_id"]},
            "sync_options": {"snapshot_mode": "initial"},
        },
        "action": "run",
    }))
    res1 = run_component(spark, str(data1), sf_dir)
    assert "events" in res1["tables"]
    out_state = json.load(open(data1 / "out" / "state.json"))
    assert "last_offset" in out_state           # reference doc shape
    assert out_state["last_synced_tables"] == ["events"]
    assert os.path.exists(data1 / "out" / "tables" / "events.manifest")

    # chained run: previous out/state.json becomes in/state.json —
    # offsets already at the source end, so the second run emits 0 rows
    data2 = tmp_path / "run2"
    os.makedirs(data2 / "in")
    (data2 / "config.json").write_text((data1 / "config.json").read_text())
    (data2 / "in" / "state.json").write_text(json.dumps(out_state))
    res2 = run_component(spark, str(data2), sf_dir)
    comp_dir = data2 / "out" / "tables" / "events"
    n2 = (spark.read.option("header", "true").csv(str(comp_dir)).count()
          if os.path.isdir(comp_dir) else 0)
    assert n2 == 0


def test_run_component_streaming(spark, sf_dir, tmp_path):
    """Config-driven bounded streaming run: same config file drives the
    micro-batch MERGE path; result equals the batch dedup."""
    import shutil
    from python_cdc_component_spark.config import run_component_streaming
    src = tmp_path / "src"
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-0.parquet")
    data = tmp_path / "stream_run"
    os.makedirs(data)
    (data / "config.json").write_text(json.dumps({
        "parameters": {
            "destination": {"load_type": "incremental_load"},
            "source_settings": {"primary_key": ["user_id"]},
            "sync_options": {"max_wait_s": 5, "snapshot_mode": "initial"},
        },
        "action": "run",
    }))
    res = run_component_streaming(spark, str(data), str(src))
    got = spark.read.parquet(res["out_path"])
    n_users = (spark.read.parquet(f"{sf_dir}/events.parquet")
               .select("user_id").distinct().count())
    assert got.count() == n_users          # one compacted row per key


def test_run_component_sync_actions(spark, sf_dir, tmp_path):
    for action, key in [("testConnection", "status"),
                        ("getSchemas", "schemas"),
                        ("getTables", "tables")]:
        d = tmp_path / action
        os.makedirs(d)
        (d / "config.json").write_text(json.dumps(
            {"parameters": {}, "action": action}))
        assert key in run_component(spark, str(d), sf_dir)


def test_run_component_streaming_multi_table_fleet(spark, sf_dir,
                                                   tmp_path):
    """A config listing multiple source tables drains the fleet through
    bounded_sync_multi_fused: one streaming query for the shared
    (schema, mode, keys) group, per-table rows readable back."""
    import shutil
    from pyspark.sql import functions as F
    from python_cdc_component_spark.config import run_component_streaming
    from python_cdc_component_spark.streaming.bounded import (
        read_fleet_table)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = tmp_path / "src"
    for i, t in enumerate(["inv.products", "inv.orders"]):
        raw.filter(F.col("event_id") % 2 == i).write.parquet(
            str(src / t))
    data = tmp_path / "fleet_run"
    os.makedirs(data)
    (data / "config.json").write_text(json.dumps({
        "parameters": {
            "destination": {"load_type": "incremental_load"},
            "source_settings": {"tables": ["inv.products", "inv.orders"],
                                "primary_key": ["user_id"]},
            "sync_options": {"max_wait_s": 5, "snapshot_mode": "initial"},
        },
        "action": "run",
    }))
    res = run_component_streaming(spark, str(data), str(src))
    assert res["stats"]["n_tables"] == 2
    assert res["stats"]["n_queries"] == 1       # one fused group
    for i, t in enumerate(["inv.products", "inv.orders"]):
        got = read_fleet_table(spark, res["out_path"], t)
        want = (raw.filter(F.col("event_id") % 2 == i)
                .select("user_id").distinct().count())
        assert got.count() == want              # one row per key
