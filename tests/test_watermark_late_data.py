"""Watermarked streaming windowed aggregation + late-data handling.

Beyond-reference streaming semantics (SURVEY §2.9 T10: the reference has
no watermarks — its dedup is keyed, not windowed): a 100 TB training
pipeline aggregating event-time windows needs bounded state, which is
exactly what withWatermark provides. This test proves (a) the windowed
agg over the stream equals the batch groupBy, and (b) an event older
than watermark + window is dropped once the watermark has advanced.
"""

import os
import shutil

from pyspark.sql import functions as F

from python_cdc_component_spark.sources.events import read_events
from python_cdc_component_spark.streaming.bounded import read_event_stream
from python_cdc_component_spark.model.envelope import SYSTEM_COLUMNS as SC


def _windowed(stream_df):
    ev = stream_df.withColumn(
        "ts", F.timestamp_millis(F.col(SC.event_timestamp)))
    return (ev.withWatermark("ts", "1 hour")
              .groupBy(F.window("ts", "1 hour"), "event_type")
              .agg(F.count(F.lit(1)).alias("n_events")))


def test_windowed_stream_agg_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "wm_src")
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(src, "p0.parquet"))

    out = str(tmp_path / "wm_sink")
    q = (_windowed(read_event_stream(spark, src))
         .select(F.col("window.start").alias("window_start"),
                 "event_type", "n_events")
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    got = {(r.window_start, r.event_type, r.n_events)
           for r in spark.read.parquet(out).collect()}

    batch = (read_events(spark, sf_dir)
             .groupBy(F.date_trunc("hour", "ts").alias("window_start"),
                      "event_type")
             .agg(F.count(F.lit(1)).alias("n_events")))
    expected = {(r.window_start, r.event_type, r.n_events)
                for r in batch.collect()}
    # append mode emits only watermark-closed windows; every emitted
    # window must match the batch result exactly, and most windows close
    # (the stream drains all data, watermark advances to max ts - 1h)
    assert got <= expected
    assert len(got) >= len(expected) * 0.9


def test_late_event_beyond_watermark_dropped(spark, tmp_path):
    """Three micro-batches: batch 0 advances the watermark far ahead,
    batch 1 lets that watermark take effect (Spark filters late rows
    with the PREVIOUS batch's watermark — one-batch lag by design),
    batch 2 delivers an event hours older than the effective watermark —
    its window is already closed, so it must not appear in the sink."""
    import time

    src = str(tmp_path / "late_src")
    os.makedirs(src)

    def write_events(rows, name):
        df = spark.createDataFrame(
            rows, "event_id long, ts long, user_id long, "
                  "event_type string, value double, props string")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        for i, f in enumerate(sorted(os.listdir(tmp_path / name))):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(tmp_path / name, f),
                            os.path.join(src, f"{name}.parquet"))
        time.sleep(1.1)   # distinct mtimes → deterministic batch order

    h = 3600 * 1000 * 1000 * 1000  # one hour in ns (raw source ts unit)
    base = 1_600_000_000 * 1000 * 1000 * 1000
    write_events([(1, base + 0 * h, 1, "click", 1.0, "{}"),
                  (2, base + 10 * h, 1, "click", 1.0, "{}")], "b0")
    write_events([(3, base + 11 * h, 1, "click", 1.0, "{}")], "b1")
    write_events([(4, base + 7 * h, 1, "click", 1.0, "{}")], "b2")

    out = str(tmp_path / "late_sink")
    q = (_windowed(read_event_stream(spark, src, max_files_per_trigger=1))
         .select(F.col("window.start").alias("window_start"), "n_events")
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "late_ckpt"))
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    got = spark.read.parquet(out).collect()
    starts = {r.window_start.timestamp() for r in got}
    # the hour-0 window closed (watermark reached 11h - 1h = 10h) and the
    # 7h event arrived after that close → dropped: no 7h window emitted
    hour0 = (base // 10**9) // 3600 * 3600          # hour-aligned start
    assert hour0 in starts
    assert (hour0 + 7 * 3600) not in starts
