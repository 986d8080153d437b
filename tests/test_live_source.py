"""Live-source proof (VERDICT r1 item 5): events arriving while the
query runs are consumed, and the final compacted state still equals the
batch W1 dedup over everything — T1/T2/P6 against a growing directory."""

import os
import shutil
import threading
import time

from pyspark.sql import functions as F

from python_cdc_component_spark.model.envelope import SYSTEM_COLUMNS as SC
from python_cdc_component_spark.operators.dedup import dedup_latest
from python_cdc_component_spark.sources.events import (
    read_cdc_events, read_events)
from python_cdc_component_spark.streaming.bounded import (
    BoundedStreamConfig, bounded_sync)


def _stage_waves(spark, sf_dir, tmp_path, n_waves=3):
    """Split the events table into n contiguous event_id ranges, each
    written as one parquet file in its own staging dir."""
    raw = read_events(spark, sf_dir).select(
        "event_id", F.col("ts_ns").alias("ts"), "user_id", "event_type",
        "value", "props")
    lo, hi = raw.agg(F.min("event_id"), F.max("event_id")).collect()[0]
    step = (hi - lo + 1) // n_waves + 1
    files = []
    for i in range(n_waves):
        a, b = lo + i * step, lo + (i + 1) * step - 1
        d = str(tmp_path / f"wave{i}")
        (raw.filter(F.col("event_id").between(a, b))
            .coalesce(1).write.parquet(d))
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        files.append(os.path.join(d, part))
    return files


def test_live_sync_consumes_mid_run_arrivals(spark, sf_dir, tmp_path):
    waves = _stage_waves(spark, sf_dir, tmp_path)
    src = str(tmp_path / "live_src")
    os.makedirs(src)
    # wave 0 present at start; waves 1..n land while the query runs.
    # rename-into-place (same fs) so the stream never sees partial files.
    def _land(f, i):
        tmp = os.path.join(src, f".w{i}.tmp")
        shutil.copy(f, tmp)
        os.rename(tmp, os.path.join(src, f"part-{i}.parquet"))

    _land(waves[0], 0)

    def feeder():
        for i, f in enumerate(waves[1:], start=1):
            time.sleep(2.0)
            _land(f, i)

    t = threading.Thread(target=feeder)
    t.start()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stats = bounded_sync(
        spark, src, out, ckpt,
        BoundedStreamConfig(mode="DEDUPE", primary_keys=["user_id"],
                            live=True, max_wait_s=8.0,
                            max_duration_s=120.0))
    t.join()
    assert stats["stopped_reason"] == "idle_timeout"

    got = {(r.user_id, r[SC.pos])
           for r in spark.read.parquet(out).collect()}
    expected = {(r.user_id, r[SC.pos])
                for r in dedup_latest(read_cdc_events(spark, sf_dir),
                                      ["user_id"]).collect()}
    assert got == expected
