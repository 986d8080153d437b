"""Per-batch cost curve for the streaming LSH index
(streaming/lsh_index.py): feed the documents corpus through in K equal
ingest batches and time each probe+append. The scale claim under test:
per-batch cost stays flat as the INDEX grows (probe work is
O(|batch| x collision fan-out) + path-pruned bucket reads), i.e. the
curve must NOT trend upward with batch number the way a full self-join
re-run (O(corpus²) per ingest) would. Prints one JSON line. Usage::

    python scripts/bench_lsh_stream.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F                      # noqa: E402

from python_cdc_component_spark.session import get_spark    # noqa: E402
from python_cdc_component_spark.streaming.lsh_index import (  # noqa: E402
    StreamingLshIndex)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("bench_lsh_stream")
    # size per-batch shuffles to the ingest batch, not the session's
    # analytical default (the same trick the stateless streaming
    # queries use): per-batch seconds should price the operator, not
    # hundreds of near-empty tasks per micro-batch stage
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .persist())     # the per-batch filter shouldn't re-pay
    n_docs = docs.count()   # the corpus scan (harness, not operator)
    work = tempfile.mkdtemp(prefix="lsh_bench_")
    try:
        idx = StreamingLshIndex(index_path=f"{work}/index")
        # warm the JVM/codegen on a throwaway index so batch 0 isn't
        # measuring spin-up
        warm = StreamingLshIndex(index_path=f"{work}/warm")
        warm.process_batch(spark, docs.filter(F.col("doc_id") % k == 0)) \
            .count()
        times, pair_counts = [], []
        for b in range(k):
            t = time.time()
            out = idx.process_batch(
                spark, docs.filter(F.col("doc_id") % k == b))
            n_pairs = out.count()
            times.append(round(time.time() - t, 3))
            pair_counts.append(n_pairs)
        first3 = sum(times[:3]) / 3
        last3 = sum(times[-3:]) / 3

        # exactly-once premium A/B (VERDICT r6 #3): the same batch
        # sequence with batch_id (dynamic-overwrite commit tiers +
        # manifest markers + replay check) vs without (plain
        # at-least-once append) — the durability cost as a measured
        # number, not an attribution guess
        def run_all(with_ids: bool) -> float:
            p = tempfile.mkdtemp(prefix="lsh_ab_", dir=work)
            ab = StreamingLshIndex(index_path=f"{p}/index")
            t0 = time.time()
            for b in range(k):
                ab.process_batch(spark,
                                 docs.filter(F.col("doc_id") % k == b),
                                 batch_id=b if with_ids else None).count()
            return round(time.time() - t0, 3)

        exactly_once_sec = run_all(True)
        at_least_once_sec = run_all(False)

        print(json.dumps({
            "metric": "lsh_stream_per_batch_sec", "n_docs": n_docs,
            "n_batches": k, "batch_sec": times, "pairs": pair_counts,
            "first3_avg": round(first3, 3), "last3_avg": round(last3, 3),
            "growth_ratio": round(last3 / first3, 2) if first3 else None,
            "exactly_once_total_sec": exactly_once_sec,
            "at_least_once_total_sec": at_least_once_sec,
            "exactly_once_premium_pct": round(
                100 * (exactly_once_sec - at_least_once_sec)
                / at_least_once_sec, 1) if at_least_once_sec else None,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
