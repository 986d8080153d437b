"""The IO/lifecycle driver queries (queries_lifecycle.py) run the real
sink/source components end-to-end; these tests pin the component
behavior locally at sf0.001 (the driver's oracle gate re-checks them at
sf0.01)."""

import pytest

from python_cdc_component_spark.queries import QUERIES


def test_csv_roundtrip_preserves_nulls(spark, sf_dir):
    out = QUERIES["csv_roundtrip_nation"](spark, sf_dir).collect()
    assert len(out) == 25
    nulls = {r["n_nationkey"] for r in out if r["n_name"] is None}
    assert nulls == {0, 5, 10, 15, 20}     # sentinel round-trip, not ''


def test_jdbc_snapshot_override_matches_parquet(spark, sf_dir):
    from python_cdc_component_spark.sources.events import read_table
    got = {tuple(r) for r in
           QUERIES["jdbc_snapshot_override"](spark, sf_dir).collect()}
    want = {tuple(r) for r in
            read_table(spark, sf_dir, "nation")
            .filter("n_regionkey < 3").collect()}
    assert got == want and len(got) > 0


def test_manifest_contract_flags_pk_and_caps_strings(spark, sf_dir):
    rows = {r["column_name"]: r for r in
            QUERIES["manifest_contract"](spark, sf_dir).collect()}
    assert rows["l_orderkey"]["is_pk"] and rows["l_linenumber"]["is_pk"]
    assert rows["l_returnflag"]["length"] == "16777216"
    assert rows["l_shipdate"]["base_type"] == "TIMESTAMP"   # ntz mapped


def test_state_offsets_survive_b64_roundtrip(spark, sf_dir):
    row = QUERIES["state_offsets_roundtrip"](spark, sf_dir).collect()[0]
    assert row["tbl"] == "events" and row["pos"] > 0
    assert row["file"] == "binlog.000001"
