"""Round-6 streaming fleet fusion: bounded_sync_multi_fused drains a
mixed fleet in O(#groups) streaming queries with per-table results
identical to the per-table bounded_sync path."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from python_cdc_component_spark.streaming.bounded import (
    BoundedStreamConfig, bounded_sync, bounded_sync_multi_fused,
    read_fleet_table)


def _rows(df):
    cols = sorted(df.columns)
    return {tuple(str(r[c]) for c in cols) for r in df.collect()}


def test_fleet_fusion_parity_and_query_count(spark, sf_dir):
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    work = tempfile.mkdtemp(prefix="fleet_r6_")
    try:
        tables = ["t0", "t1", "t2", "t3"]
        dirs = {}
        for i, t in enumerate(tables):
            d = os.path.join(work, "src", t)
            raw.filter(F.col("event_id") % 4 == i).write.parquet(d)
            dirs[t] = d
        cfgs = {
            # two tables share (schema, DEDUPE, [user_id]) -> fused
            "t0": BoundedStreamConfig(mode="DEDUPE",
                                      primary_keys=["user_id"],
                                      max_wait_s=5),
            "t1": BoundedStreamConfig(mode="DEDUPE",
                                      primary_keys=["user_id"],
                                      max_wait_s=5),
            # no-PK dedupe is its own group
            "t2": BoundedStreamConfig(mode="DEDUPE", primary_keys=[],
                                      max_wait_s=5),
            # append mode is its own group
            "t3": BoundedStreamConfig(mode="APPEND",
                                      primary_keys=["user_id"],
                                      max_wait_s=5),
        }
        fused_out = os.path.join(work, "fused_out")
        stats = bounded_sync_multi_fused(
            spark, dirs, fused_out, os.path.join(work, "fused_ckpt"),
            cfgs)
        assert stats["n_tables"] == 4
        assert stats["n_queries"] == 3          # O(#groups), not O(#tables)
        assert all(r == "drained" for r in stats["stopped_reasons"].values())

        for t in tables:
            solo_out = os.path.join(work, "solo", t)
            bounded_sync(spark, dirs[t], solo_out,
                         os.path.join(work, "solo_ckpt", t), cfgs[t])
            solo = spark.read.parquet(solo_out).drop("_kbc_bucket",
                                                     "_table")
            fleet = read_fleet_table(spark, fused_out, t)
            assert sorted(solo.columns) == sorted(fleet.columns), t
            assert _rows(solo) == _rows(fleet), f"row mismatch for {t}"
    finally:
        shutil.rmtree(work, ignore_errors=True)
