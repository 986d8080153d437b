"""Job-level profile of the dedup-groups side-state epoch (guide §1).

Monkeypatches the three action surfaces (DataFrame.collect,
DataFrame.localCheckpoint(eager), DataFrameWriter.parquet/save) to time
each call and attribute it to the first package frame on the stack,
then replays bench_dedup_groups_sync's exact shape (n docs, w event
waves through bounded_sync with dedup_groups_path). Output: one JSON
line per run with per-site totals, sorted — the fixed-job-cost map the
round-2 epoch pass starts from.

Usage: python scripts/profile_groups_epoch_r13.py [n_docs] [n_waves]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# Spark 4 classic mode instantiates the classic subclass, which
# OVERRIDES the action methods — patching the base class misses them
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

from python_cdc_component_spark.session import get_spark  # noqa: E402

PKG = "python_cdc_component_spark"
SITES: dict[str, list[float]] = {}


def _site() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if PKG in fn and "profile_groups_epoch" not in fn:
            base = os.path.basename(fn)
            return f"{base}:{fr.lineno}:{fr.name}"
    return "external"


def _wrap(obj, name):
    orig = getattr(obj, name)

    def timed(self, *a, **kw):
        t0 = time.time()
        try:
            return orig(self, *a, **kw)
        finally:
            SITES.setdefault(f"{name}@{_site()}", []).append(
                time.time() - t0)

    setattr(obj, name, timed)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_waves = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_groups_epoch")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    _wrap(DataFrame, "collect")
    _wrap(DataFrame, "localCheckpoint")
    _wrap(DataFrame, "count")
    _wrap(DataFrameWriter, "parquet")
    _wrap(DataFrameWriter, "save")

    from python_cdc_component_spark.queries import (
        _stage_docs_as_event_waves)
    from python_cdc_component_spark.streaming.bounded import (
        BoundedStreamConfig, bounded_sync)

    root = tempfile.mkdtemp(prefix="prof_dgroups_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    out = {}
    try:
        docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .select("doc_id", "text").limit(n_docs))
        flat = _stage_docs_as_event_waves(spark, docs, root, n_waves)
        for label, groups_path in (("plain", None),
                                   ("with_groups", f"{root}/groups")):
            SITES.clear()
            cfg = BoundedStreamConfig(
                mode="DEDUPE", primary_keys=["user_id"],
                max_files_per_trigger=1, max_wait_s=5.0,
                dedup_groups_path=groups_path, dedup_groups_buckets=16)
            t0 = time.time()
            bounded_sync(spark, flat, f"{root}/state_{label}",
                         f"{root}/ckpt_{label}", cfg)
            wall = round(time.time() - t0, 3)
            per = sorted(
                ((k, round(sum(v), 3), len(v)) for k, v in SITES.items()),
                key=lambda t: -t[1])
            out[label] = {"wall_sec": wall,
                          "action_total": round(
                              sum(sum(v) for v in SITES.values()), 3),
                          "sites": [
                              {"site": k, "sec": s, "n": n}
                              for k, s, n in per if s >= 0.05]}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
