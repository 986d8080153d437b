"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is fully executed via the
"noop" sink (whole plan runs, nothing serialized to the driver), which is
the honest cost of the query at scale — .count() alone can shortcut to
parquet footer metadata.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from python_cdc_component_spark.session import get_spark  # noqa: E402
from python_cdc_component_spark.queries import QUERIES  # noqa: E402

HEADLINE = [
    "cdc_dedup_latest",      # the reference's core compaction (W1)
    "cdc_append",            # ingest passthrough (T9)
    "cdc_chunked_dedup",     # W2+J1 anti-join strategy
    "events_windowed_agg",   # event-time windowed agg
    "q1_pricing_summary",    # scan-heavy agg
    "q3_shipping_priority",  # join + top-k
    "q5_nation_revenue",     # multi-join
    "q6_revenue_delta",      # selective pushdown scan
    "text_quality",          # explode-agg text op
    "minhash_lsh_pairs",     # near-dup LSH pipeline
    "embedding_topk",        # brute-force ANN
    "tfidf_top_terms",       # broadcast-join scoring + per-doc top-k
    "hopping_window_agg",    # sliding event-time windows
    "sessionize_events",     # gaps-and-islands windows
    "disjunctive_pushdown",  # OR-of-ranges parquet pushdown
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")

    # warmup: JVM/codegen spin-up + parquet footer reads, so per-query
    # numbers measure the queries rather than session bring-up
    from python_cdc_component_spark.sources.events import read_events
    read_events(spark, sf_dir).count()
    for t in ["lineitem", "orders", "customer", "documents", "embeddings"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
