"""Scale curve for the SemDeDup family: synthetic embeddings at
geometrically increasing corpus sizes under ADAPTIVE k (constant target
cluster size). Near-linear wall-clock growth is the evidence for the
cluster-local contract — total pair work is n × target/2 regardless of
corpus size, the assignment runs the vectorized large-k kernel, and no
stage is driver-side or single-partition. Prints one JSON line. Usage::

    python scripts/bench_semantic_scale.py [sizes_csv] [dim]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F                      # noqa: E402

from python_cdc_component_spark.session import get_spark    # noqa: E402
from python_cdc_component_spark.operators.llm.kmeans import (  # noqa: E402
    semantic_dup_pairs)


def main() -> None:
    sizes = ([int(s) for s in sys.argv[1].split(",")]
             if len(sys.argv) > 1 else [25_000, 50_000, 100_000])
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("bench_semantic_scale")
    points = []
    for i, n in enumerate([min(sizes)] + sizes):
        warmup = i == 0
        # seeded per-component rand: deterministic enough for a curve,
        # and high-dimensional noise keeps clusters honestly balanced
        emb = (spark.range(0, n, 1, 64)
               .select(F.col("id").alias("vec_id"),
                       F.array(*[F.rand(seed=7 + j)
                                 for j in range(dim)]).alias("e")))
        t0 = time.time()
        cnt = semantic_dup_pairs(emb, threshold=0.9, k=None, iters=1,
                                 target_cluster_size=512,
                                 max_cluster_size=2048).count()
        dt = time.time() - t0
        if not warmup:
            points.append({"n": n, "sec": round(dt, 2), "pairs": cnt})
    base = points[0]
    for p in points:
        p["x_rows"] = round(p["n"] / base["n"], 1)
        p["x_time"] = round(p["sec"] / base["sec"], 2)
    print(json.dumps({"metric": "semantic_dedup_scale_curve",
                      "dim": dim, "target_cluster_size": 512,
                      "points": points}))


if __name__ == "__main__":
    main()
