"""Measured scale curves for the 5 most expensive headline queries
(VERDICT r5 #4): run each at sf0.1 and at a deterministic 10x synthetic
blow-up and record wall-time ratio vs the 10x data ratio. Linear-ish
(ratio <= ~1.3x data ratio) is the evidence the plan shape holds at
scale; a bigger ratio names a fixed-cost or super-linear term.

The blow-up preserves each table's WITHIN-COPY structure and kills
CROSS-COPY similarity, so pair-emitting operators' outputs grow 10x
(not 100x) and the curve measures plan scaling, not an artificial
dup-rate explosion:

- documents: copy i remaps every whitespace token through
  md5(token||i) — doc lengths, token counts, and within-copy dup/shingle
  structure survive; no shingle collides across copies.
- embeddings: copy i multiplies each dimension by a deterministic
  +-1 sign pattern — within-copy cosines are EXACTLY preserved
  (cos(s.v, s.w) = cos(v, w)); cross-copy cosines decorrelate.
- lineitem: copy i shifts l_orderkey by i*(max+1) — group keys stay
  disjoint across copies.

Usage:  python scripts/bench_scale_queries.py [factor]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F                      # noqa: E402

from python_cdc_component_spark.session import get_spark    # noqa: E402
from python_cdc_component_spark.queries import QUERIES      # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGETS = ["dup_canonical_best", "embedding_pq_ann_recall",
           "q1_pricing_summary", "semantic_dedup_pairs",
           "embedding_kmeans"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def build_blowup(spark, factor: int, out: str,
                 base: str = BASE) -> None:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        if t not in ("documents", "embeddings", "lineitem"):
            os.symlink(f"{base}/{t}.parquet", f"{out}/{t}.parquet")

    d = spark.read.parquet(f"{base}/documents.parquet")
    n_doc = d.agg(F.max("doc_id")).first()[0] + 1
    copies = []
    for i in range(factor):
        c = d.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_doc))
        if i > 0:
            c = c.withColumn(
                "text",
                F.expr(f"array_join(transform(split(text, ' '), "
                       f"w -> substring(md5(concat(w, '#{i}')), 1, 6)), "
                       f"' ')"))
        copies.append(c)
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    u.repartition(32).write.parquet(f"{out}/documents.parquet")

    e = spark.read.parquet(f"{base}/embeddings.parquet")
    n_vec = e.agg(F.max("vec_id")).first()[0] + 1
    copies = []
    for i in range(factor):
        c = e.withColumn("vec_id", F.col("vec_id") + F.lit(i * n_vec))
        if i > 0:
            # +-1 sign per (copy, dim): within-copy cosines exact
            c = c.withColumn(
                "embedding",
                F.expr(f"transform(embedding, (x, j) -> x * cast("
                       f"1 - 2 * (ascii(substring(md5(concat('{i}', '_', "
                       f"j)), 1, 1)) % 2) as float))"))
        copies.append(c)
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    u.repartition(32).write.parquet(f"{out}/embeddings.parquet")

    li = spark.read.parquet(f"{base}/lineitem.parquet")
    n_ord = li.agg(F.max("l_orderkey")).first()[0] + 1
    u = li
    for i in range(1, factor):
        u = u.unionByName(li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * n_ord)))
    u.repartition(64).write.parquet(f"{out}/lineitem.parquet")


def run(spark, name: str, sf_dir: str, reps: int = 2) -> float:
    best = None
    for _ in range(reps):
        t0 = time.time()
        (QUERIES[name](spark, sf_dir)
         .write.format("noop").mode("overwrite").save())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def scale_ratio_rows(spark, factor: int, base: str,
                     targets: list[str] = TARGETS,
                     reps: int = 2) -> dict:
    """One measured scale-curve pass, importable by bench.py (VERDICT
    r6 #5): each target runs at ``base`` and at a deterministic
    ``factor``× blow-up; a row is within bound when its time ratio is
    ≤ 1.3× the data ratio (SCALING.md's linear-ish criterion — at
    small factors fixed costs make ratios run BELOW the data ratio, so
    the bound only trips on super-linear terms). Returns the block to
    embed in the bench JSON; ``violations`` lists offenders so a
    regression is machine-detectable round-over-round."""
    blow = tempfile.mkdtemp(prefix=f"blowup_x{factor}_")
    try:
        t0 = time.time()
        build_blowup(spark, factor, blow, base=base)
        build_sec = round(time.time() - t0, 3)
        rows = []
        for name in targets:
            base_s = run(spark, name, base, reps=reps)
            big_s = run(spark, name, blow, reps=reps)
            rows.append({
                "query": name, "base_sec": base_s,
                f"x{factor}_sec": big_s,
                "time_ratio": round(big_s / base_s, 2),
                "data_ratio": factor,
                "within_bound": bool(big_s / base_s <= 1.3 * factor),
            })
        return {"factor": factor, "build_sec": build_sec, "base": base,
                "rows": rows,
                "violations": [r["query"] for r in rows
                               if not r["within_bound"]]}
    finally:
        shutil.rmtree(blow, ignore_errors=True)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("bench_scale_queries")
    blow = tempfile.mkdtemp(prefix=f"blowup_x{factor}_")
    try:
        t0 = time.time()
        build_blowup(spark, factor, blow)
        build_sec = round(time.time() - t0, 3)
        rows = []
        for name in TARGETS:
            base_s = run(spark, name, BASE)
            big_s = run(spark, name, blow)
            rows.append({
                "query": name, "base_sec": base_s,
                f"x{factor}_sec": big_s,
                "time_ratio": round(big_s / base_s, 2),
                "data_ratio": factor,
                "linear": bool(big_s / base_s <= 1.3 * factor),
            })
        # the oracled semantic_dedup_pairs pins k=4 for DuckDB replay —
        # O(n²/k) by construction. Measure the SCALE entry point too
        # (adaptive k + auto cap = the defaults), which is the form a
        # 100 TB user runs.
        from python_cdc_component_spark.operators.llm.kmeans import (
            semantic_dup_pairs)

        def sem_scale(sf_dir):
            emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                   .select("vec_id",
                           F.col("embedding").cast("array<double>")
                           .alias("e")))
            t0 = time.time()
            (semantic_dup_pairs(emb, threshold=0.4, iters=2)
             .write.format("noop").mode("overwrite").save())
            return round(time.time() - t0, 3)

        base_s = min(sem_scale(BASE), sem_scale(BASE))
        big_s = min(sem_scale(blow), sem_scale(blow))
        rows.append({
            "query": "semantic_dedup_scale_path(adaptive k + auto cap)",
            "base_sec": base_s, f"x{factor}_sec": big_s,
            "time_ratio": round(big_s / base_s, 2),
            "data_ratio": factor,
            "linear": bool(big_s / base_s <= 1.3 * factor),
        })
        print(json.dumps({"metric": "query_scale_curve",
                          "factor": factor, "build_sec": build_sec,
                          "base": BASE, "rows": rows}))
    finally:
        shutil.rmtree(blow, ignore_errors=True)


if __name__ == "__main__":
    main()
