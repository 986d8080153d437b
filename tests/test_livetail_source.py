"""Custom Python DataSourceStreamReader (S1 true form): offset-tracked
tail of an append-only event log, fed through the same dedup/merge
pipeline, with files landing mid-run."""

import json
import os
import threading
import time

from pyspark.sql import functions as F

from python_cdc_component_spark.model.envelope import SYSTEM_COLUMNS as SC
from python_cdc_component_spark.operators.dedup import dedup_latest
from python_cdc_component_spark.sinks.merge import MergeCompactor
from python_cdc_component_spark.sources.events import read_cdc_events, read_events
from python_cdc_component_spark.sources.livetail import (
    read_event_tail_stream, register_event_tail)


def _write_jsonl_waves(spark, sf_dir, tmp_path, n_waves=3):
    rows = (read_events(spark, sf_dir)
            .select("event_id", F.col("ts_ns").alias("ts"), "user_id",
                    "event_type", "value", "props")
            .orderBy("event_id").collect())
    step = len(rows) // n_waves + 1
    waves = []
    for i in range(n_waves):
        chunk = rows[i * step:(i + 1) * step]
        path = str(tmp_path / f"wave{i}.jsonl")
        with open(path, "w") as fh:
            for r in chunk:
                fh.write(json.dumps({
                    "event_id": r["event_id"], "ts": r["ts"],
                    "user_id": r["user_id"], "event_type": r["event_type"],
                    "value": r["value"], "props": r["props"]}) + "\n")
        waves.append(path)
    return waves


def test_event_tail_source_mid_run_parity(spark, sf_dir, tmp_path):
    waves = _write_jsonl_waves(spark, sf_dir, tmp_path)
    log_dir = str(tmp_path / "taillog")
    os.makedirs(log_dir)

    def _land(src, i):
        tmp = os.path.join(log_dir, f".w{i}.tmp")
        os.link(src, tmp)
        os.rename(tmp, os.path.join(log_dir, f"{i:06d}.jsonl"))

    _land(waves[0], 0)
    register_event_tail(spark)
    stream = read_event_tail_stream(spark, log_dir)

    out = str(tmp_path / "state")
    compactor = MergeCompactor(out, ["user_id"], num_buckets=8)
    seen = {"rows": 0}

    def sink(batch_df, batch_id):
        batch_df = batch_df.drop("_snapshot_phase")
        n = batch_df.count()
        compactor.merge(spark, batch_df)
        seen["rows"] += n          # only after the merge has committed

    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="300 milliseconds")
         .start())

    def feeder():
        for i, w in enumerate(waves[1:], start=1):
            time.sleep(2.0)
            _land(w, i)

    t = threading.Thread(target=feeder)
    t.start()
    total = read_cdc_events(spark, sf_dir).count()
    deadline = time.time() + 90
    while seen["rows"] < total and time.time() < deadline:
        time.sleep(0.5)
    t.join()
    q.stop()
    q.awaitTermination()
    assert seen["rows"] == total

    got = {(r.user_id, r[SC.pos]) for r in compactor.read(spark).collect()}
    expected = {(r.user_id, r[SC.pos])
                for r in dedup_latest(read_cdc_events(spark, sf_dir),
                                      ["user_id"]).collect()}
    assert got == expected
