"""Long-document regime benchmark for the text kernels.

The driver corpus averages ~56 tokens/doc — far below real web/book
documents (hundreds to tens of thousands of tokens), which is exactly
the regime where a hidden O(tokens²)-per-doc term (the interpreted-HOF
re-evaluation class of bug, SCALING.md "Interpreted-HOF discipline")
stays invisible at test scale and detonates in production. This script
holds TOTAL token count constant (~2M) while growing tokens/doc, so a
linear kernel stays flat across rows and a per-doc quadratic explodes.

Usage::

    python scripts/bench_longdoc.py            # L = 100, 1000, 4000
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F                             # noqa: E402

from python_cdc_component_spark.session import get_spark           # noqa: E402


def corpus(spark, n_docs: int, tokens_per_doc: int):
    """Deterministic synthetic corpus with planted cross-doc repeats
    (every doc shares a 10%-length prefix vocabulary cycle)."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(tokens_per_doc)),
                        lambda i: F.concat(F.lit("w"),
                                           ((i + F.col("id") % 7) % 211)
                                           .cast("string"))), " ")
        .alias("text")).persist()


def main() -> None:
    spark = get_spark("longdoc")
    total_tokens = 2_000_000
    out = {}
    for L in (100, 1000, 4000):
        docs = corpus(spark, total_tokens // L, L)
        docs.count()
        row = {}

        from python_cdc_component_spark.operators.llm.exactsubstr import (
            duplicated_spans)
        t0 = time.time()
        duplicated_spans(docs, window=8).count()
        row["exact_substr"] = round(time.time() - t0, 2)

        from python_cdc_component_spark.operators.llm.lm import (
            bigram_fit, doc_bigram_perplexity)
        t0 = time.time()
        doc_bigram_perplexity(docs, bigram_fit(docs)).count()
        row["bigram_ppl"] = round(time.time() - t0, 2)

        # winnowing k-gram/window-min form (char level)
        t0 = time.time()
        hs = F.expr("transform(sequence(1, size(_c) - 7), "
                    "i -> md5(array_join(slice(_c, i, 8), '')))")
        wins = F.expr("transform(sequence(0, size(hs) - 4), "
                      "i -> array_min(slice(hs, i + 1, 4)))")
        (docs.filter(F.length("text") >= 11)
             .select("doc_id", F.split("text", "").alias("_c"))
             .select("doc_id", hs.alias("hs"))
             .select("doc_id", wins.alias("w"))
             .select("doc_id", F.size(F.array_distinct("w")).alias("n"))
             .count())
        row["winnowing"] = round(time.time() - t0, 2)

        docs.unpersist()
        out[f"L={L}"] = row
        print(json.dumps({f"L={L}": row}), flush=True)
    print(json.dumps({"metric": "longdoc_suite", "unit": "sec",
                      "total_tokens": total_tokens, "rows": out}))


if __name__ == "__main__":
    main()
