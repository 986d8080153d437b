"""Stream-stream interval join + transformWithStateInPandas running
stats: streaming results must match their batch equivalents, and the
streaming plans must carry the state-eviction guarantees (watermarks on
both join sides)."""

import os
import shutil

import pytest

from pyspark.sql import functions as F

try:                                        # transformWithState protocol dep
    from google.protobuf import descriptor  # noqa: F401
    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

from python_cdc_component_spark.sources.events import (
    read_events, read_events_stream_raw)
from python_cdc_component_spark.streaming.bounded import read_event_stream
from python_cdc_component_spark.streaming.joins import interval_join
from python_cdc_component_spark.streaming.stateful import (
    streaming_running_stats, streaming_running_stats_tws)


def _split_clicks_purchases(ev):
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("user_id", "event_id", "ts"))
    buys = (ev.filter(F.col("event_type") == "purchase")
              .select("user_id", "event_id", "ts", "value"))
    return clicks, buys


def test_interval_join_batch_semantics(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    clicks, buys = _split_clicks_purchases(ev)
    out = interval_join(clicks, buys, "user_id", interval="10 minutes")
    # brute-force reference
    ref = (clicks.alias("c").join(
        buys.alias("b"),
        (F.col("c.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") >= F.col("c.ts"))
        & (F.col("b.ts") <= F.col("c.ts") + F.expr("INTERVAL 10 minutes")))
        .select(F.col("c.event_id").alias("l"), F.col("b.event_id").alias("r")))
    got = {(r["l_event_id"], r["r_event_id"]) for r in out.collect()}
    want = {(r["l"], r["r"]) for r in ref.collect()}
    assert got == want and len(got) > 0


def test_interval_join_streaming_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(src, "p0.parquet"))
    stream = read_events_stream_raw(spark, src)
    s_clicks, s_buys = _split_clicks_purchases(stream)
    joined = interval_join(s_clicks, s_buys, "user_id",
                           interval="10 minutes", watermark="2 hours")
    sink = str(tmp_path / "sink")
    q = (joined.select("l_event_id", "r_event_id").writeStream
         .format("parquet").option("path", sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    ev = read_events(spark, sf_dir)
    clicks, buys = _split_clicks_purchases(ev)
    batch = interval_join(clicks, buys, "user_id", interval="10 minutes")
    got = {(r["l_event_id"], r["r_event_id"])
           for r in spark.read.parquet(sink).collect()}
    want = {(r["l_event_id"], r["r_event_id"]) for r in batch.collect()}
    # append-mode inner interval join with a watermark covering the whole
    # bounded input emits exactly the batch result
    assert got == want and len(got) > 0


def test_interval_join_stream_state_is_watermarked(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(src, "p0.parquet"))
    stream = read_events_stream_raw(spark, src)
    c, b = _split_clicks_purchases(stream)
    joined = interval_join(c, b, "user_id")
    # both sides must carry event-time watermarks, else state grows forever
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2


def test_running_stats_stateful(spark, sf_dir, tmp_path):
    """applyInPandasWithState running stats: the final per-key emission
    across micro-batches equals the batch aggregate. Runs in every
    deployment — no optional worker dependencies."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    # two files → at least the chance of multiple micro-batches
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(src, "p0.parquet"))
    stream = read_events_stream_raw(spark, src).withColumn(
        "value", F.col("value").cast("double"))
    out = streaming_running_stats(stream, "user_id", "value", "event_id")
    sink = str(tmp_path / "sink")

    def write_batch(df, _):
        df.write.mode("append").parquet(sink)

    q = (out.writeStream.foreachBatch(write_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(300)

    # final emission per key = batch aggregate over everything
    from python_cdc_component_spark.operators.dedup import dedup_latest
    got_df = spark.read.parquet(sink)
    final = dedup_latest(got_df, ["user_id"],
                         order_by=[F.col("last_pos").desc()])
    ev = read_events(spark, sf_dir)
    want = (ev.groupBy("user_id")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.sum("value").alias("sum_value"),
                   F.max("event_id").alias("last_pos")))
    j = (final.alias("g").join(want.alias("w"), "user_id")
         .filter((F.col("g.n_events") != F.col("w.n_events"))
                 | (F.col("g.last_pos") != F.col("w.last_pos"))
                 | (F.abs(F.col("g.sum_value") - F.col("w.sum_value"))
                    > 1e-6)))
    assert final.count() == want.count()
    assert j.count() == 0


def test_running_stats_tws_capability_contract(spark, sf_dir, tmp_path):
    """transformWithStateInPandas twin: with protobuf present the plan
    must build; without it the operator must fail FAST at plan time with
    a clear ImportError (not mid-stream in a worker). Either branch runs
    — no environment skip."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(src, "p0.parquet"))
    stream = read_events_stream_raw(spark, src)
    if _HAS_PROTOBUF:
        out = streaming_running_stats_tws(stream, "user_id", "value",
                                          "event_id")
        assert out.isStreaming
    else:
        with pytest.raises(ImportError, match="protobuf"):
            streaming_running_stats_tws(stream, "user_id", "value",
                                        "event_id")


def test_drop_duplicates_within_watermark_stream(spark, sf_dir, tmp_path):
    """Built-in streaming exact-dedup: dropDuplicatesWithinWatermark on
    the event id — the streaming form of at-least-once → exactly-once
    id dedup (state evicted past the watermark, unlike dropDuplicates
    whose state grows forever). Bounded input with a duplicated file:
    output must equal the distinct id set exactly once each."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    # same file landed twice = redelivery
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(src, "p0.parquet"))
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(src, "p1.parquet"))
    stream = read_events_stream_raw(spark, src)
    dedup = (stream.withWatermark("ts", "1 hour")
                   .dropDuplicatesWithinWatermark(["event_id"])
                   .select("event_id"))
    sink = str(tmp_path / "sink")
    q = (dedup.writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = spark.read.parquet(sink)
    n_src = read_events(spark, sf_dir).count()
    assert got.count() == n_src                       # each id exactly once
    assert got.select("event_id").distinct().count() == n_src
