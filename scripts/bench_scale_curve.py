"""Scale curve for the core dedup operator (W1): synthetic events at
geometrically increasing row counts, constant key cardinality ratio.
Near-linear wall-clock growth is the evidence that the single
hash-shuffle window plan holds as data scales (the 100 TB claim is this
curve continuing across executors, since the plan has no driver-side or
single-partition stage). Prints one JSON line. Usage::

    python scripts/bench_scale_curve.py [sizes_csv]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F                      # noqa: E402

from python_cdc_component_spark.session import get_spark    # noqa: E402
from python_cdc_component_spark.operators.dedup import dedup_latest  # noqa: E402


def main() -> None:
    sizes = ([int(s) for s in sys.argv[1].split(",")]
             if len(sys.argv) > 1 else [1_000_000, 4_000_000, 16_000_000])
    spark = get_spark("bench_scale")
    points = []
    for i, n in enumerate([min(sizes)] + sizes):
        warmup = i == 0      # first pass pays JVM/codegen spin-up
        # bound rows per input split (the maxPartitionBytes analogue):
        # fixed-size in-task sorts keep the partial WindowGroupLimit
        # in-memory at any total size — THE lever that keeps this plan
        # linear on a cluster
        n_parts = max(32, n // 1_000_000)
        ev = (spark.range(0, n, 1, n_parts)
              .select((F.col("id") % (n // 100)).alias("user_id"),
                      (F.col("id")).alias("kbc__pos"),
                      F.expr("id div 1000").alias("kbc__event_timestamp"),
                      F.lit("binlog.000001").alias("kbc__file"),
                      (F.col("id") % 97).cast("double").alias("value")))
        # input is codegen'd range (near-free) — timing is dominated by
        # the dedup exchange+window; no persist, so the curve is not
        # polluted by local-JVM cache eviction at the large sizes
        t0 = time.time()
        (dedup_latest(ev, ["user_id"],
                      order_by=[F.col("kbc__pos").desc()])
         .write.format("noop").mode("overwrite").save())
        dt = time.time() - t0
        if not warmup:
            points.append({"rows": n, "sec": round(dt, 3),
                           "rows_per_sec": int(n / dt)})
    print(json.dumps({"metric": "dedup_scale_curve", "points": points,
                      "unit": "sec"}))


if __name__ == "__main__":
    main()
