"""Skew-join microbenchmark: plain shuffle join vs AQE skew-split vs
explicit salting, on a synthetically skewed key distribution.

Substantiates SCALING.md's "skew strategy, in order" with measured
numbers. Prints one JSON line. Usage::

    python scripts/bench_skew.py [n_rows] [hot_frac]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F                     # noqa: E402

from python_cdc_component_spark.session import get_spark   # noqa: E402
from python_cdc_component_spark.operators.joins import salted_join  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    spark = get_spark("bench_skew")

    # fact: hot_frac of rows share ONE key; rest uniform over 10k keys
    fact = (spark.range(n)
            .withColumn("key", F.when(F.rand(seed=7) < hot_frac, F.lit(0))
                        .otherwise((F.rand(seed=11) * 10_000).cast("long")))
            .withColumn("payload", F.col("id") % 97))
    dim = (spark.range(10_000)
           .select(F.col("id").alias("key"),
                   (F.col("id") % 5).cast("string").alias("seg")))
    fact.persist().count()
    dim.persist().count()

    def run(label, df):
        t0 = time.time()
        df.groupBy("seg").agg(F.sum("payload").alias("s")) \
          .write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    timings = {}
    # disable broadcast so the shuffle-join paths are actually exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    timings["plain_shuffle_join"] = run(
        "plain", fact.join(dim.hint("merge"), "key"))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    timings["aqe_skew_join"] = run(
        "aqe", fact.join(dim.hint("merge"), "key"))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    timings["salted_join"] = run(
        "salted", salted_join(fact, dim, on="key", buckets=16,
                              salt_by="id"))
    timings["broadcast_join"] = run(
        "broadcast", fact.join(F.broadcast(dim), "key"))

    print(json.dumps({"metric": "skew_join_suite", "rows": n,
                      "hot_frac": hot_frac, "timings": timings,
                      "unit": "sec"}))


if __name__ == "__main__":
    main()
