"""Micro A/B: dynamic-partition-overwrite vs delete-dirs+append for the
per-epoch tier writes (guide §1 measure-first; the epoch profile shows
_overwrite_dynamic = 42% of side-state action time).

Layout mirrors the labels/bands stores: 16 hash partitions × one batch
tier per epoch, ~250 rows/epoch. Seeds E epochs, then times N further
tier writes under each protocol, interleaved A/B/A/B so ambient drift
cancels. Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_cdc_component_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("ab_overwrite_micro")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    n_rows, n_seed, n_reps = 250, 8, 6
    root = tempfile.mkdtemp(prefix="ab_ow_")

    def mk(tier: int):
        return (spark.range(n_rows)
                .select((F.col("id") + tier * n_rows).alias("node"),
                        (F.col("id") % 97).alias("component"),
                        F.lit(tier).alias("b_batch"))
                .withColumn("p", F.pmod("node", F.lit(16)).cast("int"))
                .repartition(16, F.col("p")))

    def w_dyn(path: str, tier: int) -> float:
        df = mk(tier)
        t0 = time.time()
        (df.write.partitionBy("p", "b_batch")
           .option("partitionOverwriteMode", "dynamic")
           .mode("overwrite").parquet(path))
        return time.time() - t0

    def w_del_append(path: str, tier: int) -> float:
        df = mk(tier)
        t0 = time.time()
        # replace semantics: drop this tier's dirs (crashed partials),
        # then plain append — readers exclude the in-flight tier
        for pdir in os.listdir(path) if os.path.isdir(path) else []:
            tdir = os.path.join(path, pdir, f"b_batch={tier}")
            if pdir.startswith("p=") and os.path.isdir(tdir):
                shutil.rmtree(tdir)
        (df.write.partitionBy("p", "b_batch")
           .mode("append").parquet(path))
        return time.time() - t0

    out = {"a_dyn": [], "b_delapp": []}
    pa, pb = f"{root}/a", f"{root}/b"
    for t in range(n_seed):       # seed both tables identically (append)
        for p in (pa, pb):
            (mk(t).write.partitionBy("p", "b_batch")
             .mode("append").parquet(p))
    for r in range(n_reps):       # interleaved
        out["a_dyn"].append(round(w_dyn(pa, n_seed + r), 3))
        out["b_delapp"].append(round(w_del_append(pb, n_seed + r), 3))
    # replay-replacement check: rewrite an existing tier both ways,
    # then row counts must match
    out["a_replay"] = round(w_dyn(pa, n_seed), 3)
    out["b_replay"] = round(w_del_append(pb, n_seed), 3)
    ca = spark.read.parquet(pa).count()
    cb = spark.read.parquet(pb).count()
    out["rows_equal"] = bool(ca == cb)
    out["load"] = open("/proc/loadavg").read().split()[:3]
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
