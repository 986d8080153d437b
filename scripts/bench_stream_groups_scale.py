"""Measured scale curve for the COLLAPSE-MODE streaming dedup-groups
facade (VERDICT r9 #2): SCALING.md's r8 streaming-groups 10× ratio
(1.43) was measured on the pre-collapse path; the r9 collapse changed
the per-batch job profile (group lookup, fused ``_groups`` sidecar
write, exact-pair translation), so the curve is re-pinned here on the
shipping path.

Method (the ``bench_scale_queries`` discipline): the documents corpus
at ``base`` and at a deterministic ``factor``× blow-up — copy i remaps
every whitespace token through ``md5(token||i)`` so within-copy
dup/shingle structure survives and nothing collides across copies —
each staged as ``n_batches`` wave files and drained through
``dedup_groups_sync`` (collapse mode is the facade default) under
``maxFilesPerTrigger=1``. A row is within bound when its time ratio is
≤ 1.3× the data ratio; with n_batches fixed, per-epoch fixed costs
make small-scale ratios run BELOW the data ratio, so the bound only
trips on super-linear terms (the quadratic the collapse deleted).

Usage::

    python scripts/bench_stream_groups_scale.py [factor] [sf_dir]

Prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F                      # noqa: E402

from python_cdc_component_spark.session import get_spark    # noqa: E402


def _stage_doc_waves(spark, docs, out_dir: str, n_waves: int) -> str:
    """Write (doc_id, text) as ``n_waves`` flat parquet files — one
    micro-batch each under ``maxFilesPerTrigger=1``."""
    src = os.path.join(out_dir, "src")
    (docs.withColumn("w", F.pmod("doc_id", F.lit(int(n_waves))))
         .repartition(F.col("w"))
         .write.partitionBy("w").mode("overwrite").parquet(src))
    flat = os.path.join(out_dir, "flat")
    os.makedirs(flat)
    n = 0
    for w in range(n_waves):
        for f in sorted(glob.glob(os.path.join(src, f"w={w}",
                                               "*.parquet"))):
            shutil.copy(f, os.path.join(flat, f"p{n:03d}.parquet"))
            n += 1
    shutil.rmtree(src, ignore_errors=True)
    return flat


def _blowup_docs(docs, factor: int, n_docs: int):
    """factor× copies with per-copy token remap (no cross-copy
    similarity; within-copy structure preserved)."""
    copies = []
    for i in range(factor):
        c = docs.withColumn("doc_id",
                            F.col("doc_id") + F.lit(i * n_docs))
        if i > 0:
            c = c.withColumn(
                "text",
                F.expr(f"array_join(transform(split(text, ' '), "
                       f"w -> substring(md5(concat(w, '#{i}')), 1, 6))"
                       f", ' ')"))
        copies.append(c)
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    return u


def stream_groups_scale(spark, sf_dir: str, factor: int = 3,
                        n_docs: int | None = None,
                        n_batches: int = 4,
                        num_buckets: int = 16) -> dict:
    """One measured base-vs-factor× pass of the collapse-mode facade,
    importable by bench.py. ``n_docs`` caps the base corpus (None =
    the full documents table)."""
    from python_cdc_component_spark.streaming.dedup_state import (
        dedup_groups_sync)

    root = tempfile.mkdtemp(prefix="bench_sgscale_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        docs = (spark.read
                .parquet(f"{sf_dir}/documents.parquet")
                .select("doc_id", "text"))
        if n_docs:
            docs = docs.limit(int(n_docs))
        base_n = docs.count()
        # warm the JVM/codegen on a throwaway facade so the base run
        # isn't measuring spin-up (the bench_lsh_stream discipline)
        wd = os.path.join(root, "warm")
        os.makedirs(wd)
        warm_staged = _stage_doc_waves(spark, docs.limit(50), wd, 2)
        dedup_groups_sync(spark, warm_staged, f"{wd}/state",
                          f"{wd}/ckpt", num_buckets=num_buckets,
                          max_files_per_trigger=1)
        out = {"factor": factor, "n_docs_base": base_n,
               "n_batches": n_batches}
        for label, f in (("base", 1), (f"x{factor}", factor)):
            d = root + f"/{label}"
            os.makedirs(d)
            staged = _stage_doc_waves(
                spark, _blowup_docs(docs, f, base_n), d, n_batches)
            t0 = time.time()
            st = dedup_groups_sync(
                spark, staged, f"{d}/state", f"{d}/ckpt",
                num_buckets=num_buckets, max_files_per_trigger=1)
            out[f"{label}_sec"] = round(time.time() - t0, 3)
            out[f"{label}_groups"] = st.read_groups(spark).count()
        ratio = round(out[f"x{factor}_sec"] / out["base_sec"], 2)
        out["time_ratio"] = ratio
        out["data_ratio"] = factor
        out["within_bound"] = bool(ratio <= 1.3 * factor)
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = (sys.argv[2] if len(sys.argv) > 2
              else os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.1"))
    spark = get_spark("bench_stream_groups_scale")
    doc = stream_groups_scale(spark, sf_dir, factor=factor)
    doc["metric"] = "stream_groups_scale"
    print(json.dumps(doc, separators=(",", ":")))


if __name__ == "__main__":
    main()
