"""A/B attribution for the r6 lsh_incremental_pairs slowdown (VERDICT
r6 'what's wrong' #1): times the CURRENT form (orientation guard +
plain COUNT) against the r5 form (unguarded join + COUNT(DISTINCT
band)) and minhash_lsh_pairs, best-of-N in one session with the
signature cache dropped between runs so each run pays the full
pipeline. Prints one JSON line."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_cdc_component_spark.queries import (  # noqa: E402
    _LSH_BANDS, _minhash_sig_df, _spark)
from python_cdc_component_spark.caching import persist_once  # noqa: E402
from python_cdc_component_spark.operators.schema_align import (  # noqa: E402
    union_epochs)
from python_cdc_component_spark.session import get_spark  # noqa: E402


def _bands(spark, sf_dir):
    sig = persist_once(_minhash_sig_df(spark, sf_dir))
    return union_epochs([
        sig.select("doc_id", F.lit(b).alias("band"),
                   F.concat_ws("|", *[F.col(f"h{b * 4 + i}")
                                      for i in range(4)]).alias("bv"))
        for b in range(_LSH_BANDS)])


def incr_guarded(spark, sf_dir):
    bands = _bands(spark, sf_dir)
    new = bands.filter(F.col("doc_id") % 5 == 0)
    n, a = new.alias("n"), bands.alias("a")
    cand = n.join(a, (F.col("n.band") == F.col("a.band"))
                  & (F.col("n.bv") == F.col("a.bv"))
                  & (F.col("n.doc_id") != F.col("a.doc_id"))
                  & ((F.col("a.doc_id") % 5 != 0)
                     | (F.col("n.doc_id") < F.col("a.doc_id"))))
    return (cand.select(F.least("n.doc_id", "a.doc_id").alias("doc_a"),
                        F.greatest("n.doc_id", "a.doc_id").alias("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_bands")))


def incr_distinct(spark, sf_dir):
    """The r5 form: no orientation guard, COUNT(DISTINCT band)."""
    bands = _bands(spark, sf_dir)
    new = bands.filter(F.col("doc_id") % 5 == 0)
    n, a = new.alias("n"), bands.alias("a")
    cand = n.join(a, (F.col("n.band") == F.col("a.band"))
                  & (F.col("n.bv") == F.col("a.bv"))
                  & (F.col("n.doc_id") != F.col("a.doc_id")))
    return (cand.select(F.least("n.doc_id", "a.doc_id").alias("doc_a"),
                        F.greatest("n.doc_id", "a.doc_id").alias("doc_b"),
                        F.col("n.band").alias("band"))
            .groupBy("doc_a", "doc_b")
            .agg(F.countDistinct("band").alias("n_bands")))


def full_pairs(spark, sf_dir):
    bands = _bands(spark, sf_dir)
    a, b = bands.alias("a"), bands.alias("b")
    cand = a.join(b, (F.col("a.band") == F.col("b.band"))
                  & (F.col("a.bv") == F.col("b.bv"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
    return (cand.select(F.col("a.doc_id").alias("doc_a"),
                        F.col("b.doc_id").alias("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_bands")))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("AB_RUNS", "3"))
    spark = get_spark("bench_lsh_ab")
    out = {"sf_dir": sf_dir}
    for name, fn in [("incr_guarded_count", incr_guarded),
                     ("incr_r5_countdistinct", incr_distinct),
                     ("full_minhash_lsh_pairs", full_pairs)]:
        times, rows = [], None
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.time()
            rows = fn(_spark(spark), sf_dir).count()
            times.append(round(time.time() - t0, 3))
        out[name] = {"best": min(times), "runs": times, "rows": rows}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
