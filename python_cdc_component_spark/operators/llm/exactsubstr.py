"""ExactSubstr-style duplicated-span detection (stride-1 windows).

"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
2022) removes every substring of ≥ N tokens that appears more than once
in the corpus, at ANY offset — their single-node implementation builds a
suffix array. Tile-aligned segment dedup (``segdedup.py``) misses
repeats that straddle tile boundaries; this operator closes that gap
with the distributed equivalent for a fixed window length L:

    a substring of length ≥ L is duplicated  ⟺  every one of its
    stride-1 L-token windows is duplicated,

so marking duplicate windows and merging overlapping/adjacent ones per
document reconstructs exactly the maximal duplicated spans (down to the
L-token resolution the window length sets).

Plan shape, O(corpus) everywhere:
- ONE Generate per doc explodes the stride-1 window stream; the shuffle
  key is ``md5(window)`` so the wire carries a fixed 32-hex key +
  (doc_id, pos) per window — never the window text (L× amplification).
  DuckDB computes the identical md5, so even a collision would agree
  across engines;
- ONE shuffle ranks occurrences per window hash — ``row_number`` over
  (doc_id, pos) keeps the corpus-global first occurrence, every later
  occurrence is a duplicate window (WindowGroupLimit prunes map-side);
- ONE shuffle back on doc_id: gaps-and-islands (lag + running sum over
  the same partition/order — one Exchange serves both windows and the
  final per-span aggregate, since doc_id partitioning co-locates
  (doc_id, island) groups).

At 100 TB the hot-window skew (boilerplate headers repeated millions of
times) is the risk: prefilter window hashes with frequency > F through
a count pass (they are duplicates wherever they appear — no rank
needed, saving the skewed sort), or salt the rank window; the
first-occurrence refinement only matters for the long tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def duplicated_spans(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", window: int = 8,
                     hot_threshold: int | None = None) -> DataFrame:
    """(id, span_start, span_end, span_tokens): maximal per-doc token
    spans covered by L-token windows that occur elsewhere in the corpus
    earlier in (doc_id, pos) order. ``span_start``/``span_end`` are
    0-based token offsets, inclusive.

    ``hot_threshold``: the 100 TB skew valve. The rank window sorts each
    hash's occurrences on ONE reducer — boilerplate repeated millions of
    times (license headers, nav chrome) turns that reducer into the
    straggler. With a threshold, hashes with more than that many
    occurrences take a rank-free path: their corpus-global first
    occurrence is ``min(struct(doc_id, pos))`` — a partial-aggregable
    agg whose map-side combine collapses any hot key to one row per map
    task — and dup-marking is a broadcast join (the hot-hash set is
    tiny by definition: at most corpus/threshold entries). Cold hashes
    keep the rank window, now with the skew mass removed. Output is
    IDENTICAL to the single-path form (parity-tested)."""
    L = window
    # split hoisted to a named column: slice(split(text), i, L) inside
    # the interpreted lambda re-splits per ELEMENT — O(tokens²)/doc
    # (measured 17× on 1k-token docs); a multi-use column ref is not
    # collapsed back in and binds once per row
    toks = F.col("_t")
    # stride-1 windows; sequence(0, n-L) DESCENDS when n < L → guard
    wins = F.when(
        F.size(toks) >= L,
        F.transform(F.sequence(F.lit(0), F.size(toks) - L),
                    lambda i: F.md5(F.array_join(
                        F.slice(toks, i + 1, L), " ").cast("binary")))
    ).otherwise(F.array().cast("array<string>"))
    w = (docs.select(F.col(id_col),
                     F.split(F.col(text_col), " ").alias("_t"))
             .select(F.col(id_col), F.posexplode(wins).alias("pos", "h")))
    if hot_threshold is not None:
        dup = _dups_with_hot_path(w, id_col, hot_threshold)
    else:
        occ = Window.partitionBy("h").orderBy(id_col, "pos")
        dup = (w.withColumn("rn", F.row_number().over(occ))
                .filter(F.col("rn") > 1)
                .select(id_col, "pos"))
    by_doc = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.col("pos") > F.lag("pos").over(by_doc) + L, 1
    ).otherwise(F.when(F.lag("pos").over(by_doc).isNull(), 1).otherwise(0))
    gid = F.sum(brk).over(
        Window.partitionBy(id_col).orderBy("pos")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spans = (dup.withColumn("gid", gid)
                .groupBy(id_col, "gid")
                .agg(F.min("pos").cast("long").alias("span_start"),
                     (F.max("pos") + (L - 1)).cast("long").alias("span_end"))
                .drop("gid"))
    return spans.withColumn(
        "span_tokens",
        (F.col("span_end") - F.col("span_start") + 1).cast("long"))


def _dups_with_hot_path(w: DataFrame, id_col: str,
                        hot_threshold: int) -> DataFrame:
    """Duplicate windows with hot hashes routed around the rank sort.

    hot set:   groupBy(h).count() — map-side partials make the count
               itself skew-immune; hashes over the threshold form a
               tiny table (≤ corpus/threshold rows) that BROADCASTS.
    hot dups:  broadcast-join the occurrences with the hot set's
               per-hash min(struct(doc_id,pos)) (another partial-
               aggregable min) — every occurrence except the min is a
               duplicate. Map-side only; no hot key ever sorts.
    cold dups: the standard rank window, skew mass already excluded
               (left_anti against the broadcast hot set).
    """
    cnt = w.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    hot = cnt.filter(F.col("c") > hot_threshold).select("h")
    hot_occ = w.join(F.broadcast(hot), "h")
    hot_min = (hot_occ.groupBy("h")
               .agg(F.min(F.struct(F.col(id_col).alias("d"),
                                   F.col("pos").alias("p"))).alias("m")))
    hot_dup = (hot_occ.join(F.broadcast(hot_min), "h")
               .filter((F.col(id_col) != F.col("m.d"))
                       | (F.col("pos") != F.col("m.p")))
               .select(id_col, "pos"))
    cold = w.join(F.broadcast(hot), "h", "left_anti")
    occ = Window.partitionBy("h").orderBy(id_col, "pos")
    cold_dup = (cold.withColumn("rn", F.row_number().over(occ))
                .filter(F.col("rn") > 1)
                .select(id_col, "pos"))
    return cold_dup.unionByName(hot_dup)
