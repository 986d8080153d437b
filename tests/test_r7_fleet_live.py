"""Round-7 fused-fleet contracts: live mode for the fused streaming
fleet (VERDICT r6 #2) and cfg-aware fusion grouping (ADVICE r6) —
tables with behaviorally different configs must never share a query."""

import os
import shutil
import tempfile
import threading
import time

import pytest
from pyspark.sql import functions as F

from python_cdc_component_spark.streaming.bounded import (
    BoundedStreamConfig, bounded_sync, bounded_sync_multi_fused,
    read_fleet_table)


def _rows(df):
    cols = sorted(df.columns)
    return {tuple(str(r[c]) for c in cols) for r in df.collect()}


def _split_waves(raw, n_waves):
    lo, hi = raw.agg(F.min("event_id"), F.max("event_id")).collect()[0]
    step = (hi - lo + 1) // n_waves + 1
    return [(lo + i * step, lo + (i + 1) * step - 1)
            for i in range(n_waves)]


def _land(df, src_dir, name):
    """Write one wave as a parquet file renamed into the live source
    dir (same-fs rename so the stream never sees partial files)."""
    stage = src_dir + f".stage_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    os.makedirs(src_dir, exist_ok=True)
    os.rename(os.path.join(stage, part),
              os.path.join(src_dir, f"part-{name}.parquet"))
    shutil.rmtree(stage, ignore_errors=True)


def test_fleet_live_parity_with_per_table_live(spark, sf_dir):
    """Live fused fleet: events landing mid-run are consumed, each
    group stops on its own idle timeout, and the final per-table state
    is bit-identical to per-table bounded_sync(live=True) over the same
    data — the T2 idle-stop semantics completed across a many-table
    sync."""
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    work = tempfile.mkdtemp(prefix="fleet_r7_live_")
    try:
        tables = ["la", "lb"]
        shards = {t: raw.filter(F.col("event_id") % 2 == i)
                  for i, t in enumerate(tables)}
        waves = _split_waves(raw, 2)
        dirs = {t: os.path.join(work, "src", t) for t in tables}
        for t in tables:
            lo, hi = waves[0]
            _land(shards[t].filter(F.col("event_id").between(lo, hi)),
                  dirs[t], "w0")

        def feeder():
            time.sleep(2.0)
            for t in tables:
                lo, hi = waves[1]
                _land(shards[t].filter(
                    F.col("event_id").between(lo, hi)), dirs[t], "w1")

        cfgs = {t: BoundedStreamConfig(mode="DEDUPE",
                                       primary_keys=["user_id"],
                                       live=True, max_wait_s=6.0,
                                       max_duration_s=120.0)
                for t in tables}
        th = threading.Thread(target=feeder)
        th.start()
        fused_out = os.path.join(work, "fused_out")
        stats = bounded_sync_multi_fused(
            spark, dirs, fused_out, os.path.join(work, "fused_ckpt"),
            cfgs)
        th.join()
        assert stats["n_queries"] == 1          # one live group
        assert all(r == "idle_timeout"
                   for r in stats["stopped_reasons"].values())

        for t in tables:
            solo_out = os.path.join(work, "solo", t)
            solo_stats = bounded_sync(
                spark, dirs[t], solo_out,
                os.path.join(work, "solo_ckpt", t),
                BoundedStreamConfig(mode="DEDUPE",
                                    primary_keys=["user_id"],
                                    live=True, max_wait_s=4.0,
                                    max_duration_s=120.0))
            assert solo_stats["stopped_reason"] == "idle_timeout"
            solo = spark.read.parquet(solo_out).drop("_kbc_bucket",
                                                     "_table")
            fleet = read_fleet_table(spark, fused_out, t)
            assert sorted(solo.columns) == sorted(fleet.columns), t
            assert _rows(solo) == _rows(fleet), f"row mismatch for {t}"
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_fleet_mixed_live_and_bounded_groups(spark, sf_dir):
    """live is part of the fusion group key: a live table and a
    bounded table with otherwise identical configs run as separate
    queries with their own stop reasons."""
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    work = tempfile.mkdtemp(prefix="fleet_r7_mixed_")
    try:
        dirs = {}
        for i, t in enumerate(["live_t", "bounded_t"]):
            d = os.path.join(work, "src", t)
            raw.filter(F.col("event_id") % 2 == i).write.parquet(d)
            dirs[t] = d
        cfgs = {
            "live_t": BoundedStreamConfig(
                mode="DEDUPE", primary_keys=["user_id"], live=True,
                max_wait_s=4.0, max_duration_s=120.0),
            "bounded_t": BoundedStreamConfig(
                mode="DEDUPE", primary_keys=["user_id"], live=False,
                max_wait_s=4.0),
        }
        out = os.path.join(work, "out")
        stats = bounded_sync_multi_fused(
            spark, dirs, out, os.path.join(work, "ckpt"), cfgs)
        assert stats["n_queries"] == 2
        by_table = {t: gi for gi, ts in stats["groups"].items()
                    for t in ts}
        reasons = stats["stopped_reasons"]
        assert reasons[by_table["live_t"]] == "idle_timeout"
        assert reasons[by_table["bounded_t"]] == "drained"
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_fleet_group_key_splits_on_snapshot_mode(spark, sf_dir):
    """ADVICE r6: identical (schema, mode, keys) but different
    snapshot_mode must NOT fuse — the old grouping applied the first
    table's snapshot_mode to the whole group, so a 'never' table fused
    with an 'initial' one would wrongly emit its initial snapshot (or
    vice versa suppress it)."""
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    work = tempfile.mkdtemp(prefix="fleet_r7_snap_")
    try:
        dirs = {}
        for i, t in enumerate(["t_initial", "t_never"]):
            d = os.path.join(work, "src", t)
            raw.filter(F.col("event_id") % 2 == i).write.parquet(d)
            dirs[t] = d
        cfgs = {
            "t_initial": BoundedStreamConfig(
                mode="DEDUPE", primary_keys=["user_id"],
                snapshot_mode="initial", max_wait_s=4.0),
            "t_never": BoundedStreamConfig(
                mode="DEDUPE", primary_keys=["user_id"],
                snapshot_mode="never", max_wait_s=4.0),
        }
        out = os.path.join(work, "out")
        stats = bounded_sync_multi_fused(
            spark, dirs, out, os.path.join(work, "ckpt"), cfgs)
        assert stats["n_queries"] == 2, \
            "snapshot_mode differences must split fusion groups"
        # 'initial' table emits its rows; 'never' first contact
        # drains-and-commits with zero rows (bounded_sync parity)
        assert read_fleet_table(spark, out, "t_initial").count() > 0
        assert read_fleet_table(spark, out, "t_never").count() == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_fleet_rejects_view_configs(spark, sf_dir):
    """Maintained views are per-table state — the fused path must
    refuse them loudly instead of silently dropping the view config
    (the cfg0-wins failure mode, ADVICE r6)."""
    with pytest.raises(ValueError, match="fused"):
        bounded_sync_multi_fused(
            spark, {"t": "/nonexistent"}, "/tmp/x", "/tmp/y",
            {"t": BoundedStreamConfig(view_path="/tmp/v",
                                      view_group_keys=["user_id"])})
