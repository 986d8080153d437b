"""Per-query timing probe for optimization A/B (round 13).

Usage::

    python scripts/ab_query_times.py [--reps N] QUERY [QUERY ...]

Times each named query at $SPARK_GRAFT_SF_DIR (default sf0.1) through
the bench's noop-sink methodology on a warmed session, N reps each
(interleaved across queries: q1 q2 ... q1 q2 ... so ambient drift hits
all queries equally), and prints one JSON line with per-rep times, min
and median per query plus the host load averages at start/end.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_cdc_component_spark.session import get_spark  # noqa: E402
from python_cdc_component_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    reps = 3
    if argv and argv[0] == "--reps":
        reps = int(argv[1])
        argv = argv[2:]
    names = argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_query_times")
    load0 = os.getloadavg()
    # same warmup as bench.py: footers + the Arrow worker pool
    for t in ["lineitem", "orders", "customer", "documents", "embeddings",
              "events"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    (spark.range(spark.sparkContext.defaultParallelism)
          .repartition(spark.sparkContext.defaultParallelism)
          .mapInPandas(lambda it: it, "id long")
          .write.format("noop").mode("overwrite").save())

    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"ab:{n}")
            t0 = time.time()
            QUERIES[n](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            times[n].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        "sf_dir": sf_dir, "reps": reps,
        "load_start": [round(x, 2) for x in load0],
        "load_end": [round(x, 2) for x in os.getloadavg()],
        "times": times,
        "min": {n: min(v) for n, v in times.items()},
        "median": {n: round(statistics.median(v), 3)
                   for n, v in times.items()},
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
