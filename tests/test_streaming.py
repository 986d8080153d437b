"""Bounded streaming parity tests (T1/T2/T9): the streaming pipeline must
agree with the batch operators on the same input."""

import shutil

from pyspark.sql import functions as F

from python_cdc_component_spark.model.envelope import SYSTEM_COLUMNS as SC
from python_cdc_component_spark.operators.dedup import dedup_latest
from python_cdc_component_spark.sources.events import read_cdc_events
from python_cdc_component_spark.streaming.bounded import (
    BoundedStreamConfig, bounded_sync)


def _stage_events(sf_dir, tmp_path):
    import os
    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(src, "part-0.parquet"))
    return src


def test_bounded_dedupe_matches_batch(spark, sf_dir, tmp_path):
    src = _stage_events(sf_dir, tmp_path)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stats = bounded_sync(spark, src, out, ckpt,
                         BoundedStreamConfig(mode="DEDUPE",
                                             primary_keys=["user_id"]))
    assert stats["stopped_reason"] == "drained"
    got = spark.read.parquet(out)
    expected = dedup_latest(read_cdc_events(spark, sf_dir), ["user_id"])
    g = {(r.user_id, r[SC.pos]) for r in got.collect()}
    e = {(r.user_id, r[SC.pos]) for r in expected.collect()}
    assert g == e


def test_bounded_append_keeps_everything(spark, sf_dir, tmp_path):
    src = _stage_events(sf_dir, tmp_path)
    out = str(tmp_path / "out_append")
    ckpt = str(tmp_path / "ckpt_append")
    stats = bounded_sync(spark, src, out, ckpt,
                         BoundedStreamConfig(mode="APPEND"))
    assert stats["stopped_reason"] == "drained"
    got = spark.read.parquet(out)
    assert got.count() == read_cdc_events(spark, sf_dir).count()
    assert SC.operation in got.columns


def test_bounded_multi_batch_compaction(spark, sf_dir, tmp_path):
    """maxFilesPerTrigger=1 with two files → ≥2 micro-batches; incremental
    compaction must equal single-pass dedup (chunk semantics, T9)."""
    import os
    src = str(tmp_path / "multi_src")
    os.makedirs(src)
    ev = read_cdc_events(spark, sf_dir)
    mid = ev.agg(F.max(SC.pos)).collect()[0][0] // 2
    # write two event files in event order
    from python_cdc_component_spark.sources.events import read_events
    raw = read_events(spark, sf_dir).select(
        "event_id", F.col("ts_ns").alias("ts"), "user_id", "event_type",
        "value", "props")
    raw.filter(F.col("event_id") <= mid).coalesce(1) \
        .write.mode("overwrite").parquet(src + "/f0")
    raw.filter(F.col("event_id") > mid).coalesce(1) \
        .write.mode("overwrite").parquet(src + "/f1")
    flat = str(tmp_path / "flat_src")
    os.makedirs(flat)
    n = 0
    for sub in ["f0", "f1"]:
        for f in sorted(os.listdir(os.path.join(src, sub))):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(src, sub, f),
                            os.path.join(flat, f"part-{n}.parquet"))
                n += 1
    out = str(tmp_path / "out_multi")
    stats = bounded_sync(spark, flat, out, str(tmp_path / "ckpt_multi"),
                         BoundedStreamConfig(mode="DEDUPE",
                                             primary_keys=["user_id"],
                                             max_files_per_trigger=1))
    assert stats["batches"] >= 2
    got = {(r.user_id, r[SC.pos])
           for r in spark.read.parquet(out).collect()}
    expected = {(r.user_id, r[SC.pos])
                for r in dedup_latest(ev, ["user_id"]).collect()}
    assert got == expected
