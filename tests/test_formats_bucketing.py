"""Bucketed co-located join, grouped-agg Pandas UDF, ORC round-trip."""

import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from python_cdc_component_spark.operators.bucketing import (
    write_bucketed, colocated_join, shuffle_free_join_plan)
from python_cdc_component_spark.queries import QUERIES


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Both sides bucketed(8) on the join key -> SortMergeJoin with no
    Exchange on either side, even with broadcast disabled (so the plan
    can't cheat its way out of the shuffle with a broadcast)."""
    uid = uuid.uuid4().hex[:8]
    root = tempfile.mkdtemp(prefix="bkt_test_")
    li = (spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
          .select(F.col("l_orderkey").alias("orderkey"), "l_extendedprice"))
    orders = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
              .select(F.col("o_orderkey").alias("orderkey"), "o_orderpriority"))
    lt, ot = f"li_t_{uid}", f"ord_t_{uid}"
    write_bucketed(li, lt, os.path.join(root, "li"), ["orderkey"])
    write_bucketed(orders, ot, os.path.join(root, "ord"), ["orderkey"])

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, lt, ot, ["orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert shuffle_free_join_plan(joined)
        # same join on the raw (unbucketed) frames DOES shuffle — the
        # guard is meaningful
        raw = li.join(orders, "orderkey")
        assert not shuffle_free_join_plan(raw)
        # and the bucketed join returns the same rows
        assert joined.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in (lt, ot):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_buckets_are_single_files(spark, sf_dir):
    """write_bucketed pre-repartitions on the bucket key, so each bucket
    is exactly one data file (no M-tasks x N-buckets file explosion)."""
    uid = uuid.uuid4().hex[:8]
    root = tempfile.mkdtemp(prefix="bkt_files_")
    orders = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
              .select(F.col("o_orderkey").alias("orderkey"), "o_totalprice"))
    t = f"ord_f_{uid}"
    write_bucketed(orders, t, os.path.join(root, "ord"), ["orderkey"],
                   num_buckets=4)
    try:
        files = [f for f in os.listdir(os.path.join(root, "ord"))
                 if f.endswith(".parquet")]
        assert len(files) == 4
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_grouped_agg_median_matches_jvm_percentile(spark, sf_dir):
    """The Pandas grouped-agg median equals JVM-side F.percentile(0.5)
    per group (same linear interpolation)."""
    out = QUERIES["grouped_agg_pandas_median"](spark, sf_dir)
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    jvm = (orders.groupBy("o_orderstatus")
           .agg(F.percentile("o_totalprice", F.lit(0.5)).alias("m")))
    got = {r["o_orderstatus"]: r["median_price"] for r in out.collect()}
    want = {r["o_orderstatus"]: r["m"] for r in jvm.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_orc_roundtrip_lossless(spark, sf_dir):
    """parquet -> ORC -> scan preserves every row and column bit-exact.

    Anchored independently against DuckDB over the raw parquet (max ts
    epoch-ms must agree) so fixture/type drift in the events table fails
    here instead of being round-tripped faithfully."""
    import duckdb

    from python_cdc_component_spark.sources.events import read_events
    ev = read_events(spark, sf_dir).select(
        "event_id", "ts", "event_type", "value")
    want_ms = duckdb.sql(
        f"SELECT epoch_ms(MAX(ts)) FROM "
        f"read_parquet('{sf_dir}/events.parquet')").fetchone()[0]
    got_ms = ev.agg(F.unix_millis(F.max("ts"))).first()[0]
    assert got_ms == want_ms, "read_events ts disagrees with DuckDB"
    out = tempfile.mkdtemp(prefix="orc_rt_")
    ev.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == ev.schema
    assert back.exceptAll(ev).count() == 0
    assert ev.exceptAll(back).count() == 0


def test_xml_roundtrip_lossless(spark, sf_dir):
    """parquet→XML→scan preserves every row exactly under the explicit
    read schema (doubles cross as Java's shortest-round-trip decimal
    form, timestamps as epoch-ms longs)."""
    from python_cdc_component_spark.sources.events import read_events
    ev = read_events(spark, sf_dir).select(
        "event_id", F.unix_millis("ts").alias("ts_ms"),
        "event_type", "value")
    out = tempfile.mkdtemp(prefix="xml_rt_")
    ev.write.mode("overwrite").format("xml").option("rowTag", "event").save(out)
    back = (spark.read.format("xml").option("rowTag", "event")
            .schema("event_id long, ts_ms long, event_type string, "
                    "value double").load(out))
    assert back.exceptAll(ev).count() == 0
    assert ev.exceptAll(back).count() == 0


def test_variant_absent_path_is_null_and_typed_get(spark):
    """try_variant_get returns NULL for absent paths and for
    non-castable types — the shredding contract variant_shred_events'
    n_missing column prices."""
    df = spark.createDataFrame(
        [('{"k": 5, "s": "x"}',), ('{"s": "y"}',)], "j string")
    v = df.select(F.parse_json("j").alias("v"))
    got = v.select(
        F.try_variant_get("v", "$.k", "long").alias("k"),
        F.try_variant_get("v", "$.missing", "string").alias("m"),
        F.try_variant_get("v", "$.s", "long").alias("s_as_long"),
    ).collect()
    assert [r.k for r in got] == [5, None]
    assert all(r.m is None for r in got)
    assert all(r.s_as_long is None for r in got)  # "x" not a long
