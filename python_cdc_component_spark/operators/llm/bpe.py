"""BPE vocabulary induction over a distributed corpus.

Byte-pair-encoding training is the canonical *iterative* corpus job: in
each round, count all adjacent token pairs across the corpus, promote
the most frequent pair to a new vocabulary symbol, and rewrite every
document with that pair merged. Spark-first split of the work:

- **pair counting** (the data-sized step) is pure JVM: one explode of
  adjacent pairs + one groupBy — identical shape to the shingle
  counters, map-side combined, skew-free (pair keys are near-Zipf but
  the partial aggregation collapses them before the exchange);
- **winner selection** is a driver-side top-1 on the (tiny) pair-count
  table with a lexicographic tie-break, making training deterministic;
- **merge application** is per-document and order-dependent — the one
  genuinely sequential-per-row step — so it runs as an Arrow
  ``mapInPandas`` over the token arrays (Python is the point here: the
  loop over a token list has data-dependent control flow that array
  higher-order functions express only at O(n²) cost).

Each round is one shuffle + one broadcast-sized driver fetch; k rounds
= k passes over the (shrinking) corpus — the same cost envelope as the
reference BPE trainers (Sennrich et al., 2016), distributed. State
between rounds is just the merge list (k pairs), not the corpus.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_counts(toks: DataFrame) -> DataFrame:
    """(a, b, c): corpus-wide adjacent-pair counts. JVM explode+agg."""
    pairs = toks.select(F.explode(F.expr(
        "transform(sequence(1, size(t) - 1), "
        "i -> struct(t[i - 1] AS a, t[i] AS b))")).alias("p"))
    return (pairs.select("p.a", "p.b")
                 .groupBy("a", "b").agg(F.count(F.lit(1)).alias("c")))


def merge_pair_in_tokens(a: str, b: str):
    """Single-pair merge over one token list (left-to-right, greedy,
    non-overlapping — the BPE application rule)."""
    merged_sym = a + b

    def apply(tokens: list) -> list:
        out, i, n = [], 0, len(tokens)
        while i < n:
            if i + 1 < n and tokens[i] == a and tokens[i + 1] == b:
                out.append(merged_sym)
                i += 2
            else:
                out.append(tokens[i])
                i += 1
        return out

    return apply


def bpe_train(docs: DataFrame, text_col: str = "text",
              n_merges: int = 5) -> tuple[list[tuple[str, str, int]],
                                          DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (merges, final tokens DF).

    ``merges`` is [(left, right, count_at_merge_time), ...] in learned
    order. Deterministic: winners tie-break on (count desc, a, b).
    """
    toks = docs.select(F.split(F.col(text_col), " ").alias("t"))
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (_pair_counts(toks)
               .orderBy(F.col("c").desc(), "a", "b").limit(1).collect())
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
        merges.append((a, b, c))
        apply_merge = merge_pair_in_tokens(a, b)

        def rewrite(batches: Iterator[pd.DataFrame],
                    _apply=apply_merge) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf["t"] = pdf["t"].map(lambda ts: _apply(list(ts)))
                yield pdf

        # localCheckpoint would also work; re-planning k rounds of
        # mapInPandas keeps the lineage short enough for small k
        toks = toks.mapInPandas(rewrite, schema="t array<string>")
    return merges, toks


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge list to the corpus (the tokenizer-apply
    half of BPE): each document's whitespace tokens run through the
    merges IN LEARNED ORDER, each merge greedy left-to-right
    non-overlapping — the standard BPE encode rule, and byte-for-byte
    the sequential ``replace`` chain the SQL oracle replays.

    One Arrow ``mapInPandas`` pass applies ALL merges (state per row is
    just the token list); the merge table is k pairs broadcast in the
    closure — control-plane sized at any corpus scale."""
    appliers = [merge_pair_in_tokens(a, b) for a, b in merges]

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def run(ts: list) -> list:
                for ap in appliers:
                    ts = ap(list(ts))
                return ts
            pdf["t"] = pdf["t"].map(run)
            yield pdf

    toks = docs.select(F.col(id_col).alias(id_col),
                       F.split(F.col(text_col), " ").alias("t"))
    id_type = dict(toks.dtypes)[id_col]
    return toks.mapInPandas(encode,
                            schema=f"{id_col} {id_type}, t array<string>")
