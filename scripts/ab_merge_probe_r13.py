"""A/B probe for the shared-exchange merge rewrite: times the PLAIN
bounded_sync (whose per-batch cost is dominated by MergeCompactor.merge)
plus a standalone batched-merge loop, from whichever tree's package is
first on sys.path (pass the tree root as argv[1]). Prints one JSON
line; the caller interleaves A/B subprocess runs so ambient drift
cancels."""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, sys.argv[1])

from pyspark.sql import functions as F  # noqa: E402

from python_cdc_component_spark.session import get_spark  # noqa: E402


def main() -> None:
    tree = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_merge_probe")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    from python_cdc_component_spark.queries import (
        _stage_docs_as_event_waves)
    from python_cdc_component_spark.sinks.merge import MergeCompactor
    from python_cdc_component_spark.streaming.bounded import (
        BoundedStreamConfig, bounded_sync)

    out = {"tree": tree, "sync_sec": [], "merge_loop_sec": []}
    # probe 1: plain bounded_sync, 1000 docs / 4 waves (the bench row)
    for rep in range(2):
        root = tempfile.mkdtemp(prefix="ab_merge_sync_")
        try:
            docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                    .select("doc_id", "text").limit(1000))
            flat = _stage_docs_as_event_waves(spark, docs, root, 4)
            cfg = BoundedStreamConfig(
                mode="DEDUPE", primary_keys=["user_id"],
                max_files_per_trigger=1, max_wait_s=5.0)
            t0 = time.time()
            bounded_sync(spark, flat, f"{root}/state", f"{root}/ckpt",
                         cfg)
            out["sync_sec"].append(round(time.time() - t0, 3))
        finally:
            shutil.rmtree(root, ignore_errors=True)
    # probe 2: standalone merge loop at a heavier per-batch size (20k
    # rows/batch, 8 batches, 32 buckets) — isolates merge() itself
    for rep in range(2):
        root = tempfile.mkdtemp(prefix="ab_merge_loop_")
        try:
            mc = MergeCompactor(state_path=f"{root}/st",
                                keys=["user_id"], num_buckets=32)
            batches = []
            for b in range(8):
                batches.append(
                    spark.range(20_000).select(
                        (F.col("id") * 3 % 50_000).alias("user_id"),
                        (F.col("id") + b).alias("val"),
                        F.lit(b).cast("timestamp")
                        .alias("kbc__event_timestamp"),
                        F.lit(f"f{b}").alias("kbc__file"),
                        F.col("id").alias("kbc__pos"))
                    .localCheckpoint(eager=True))
            t0 = time.time()
            for b in batches:
                mc.merge(spark, b)
            out["merge_loop_sec"].append(round(time.time() - t0, 3))
        finally:
            shutil.rmtree(root, ignore_errors=True)
    out["load"] = open("/proc/loadavg").read().split()[:3]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
