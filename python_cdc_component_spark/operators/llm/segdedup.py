"""Segment-level exact dedup (C4-style) — corpus-wide first-occurrence.

C4/Dolma-style pipelines drop *repeated spans* (boilerplate lines,
license headers, navigation chrome) rather than whole documents: every
occurrence of a span after its first, anywhere in the corpus, is
removed and the documents are reassembled. The driver corpus has no
newlines, so the span unit here is a fixed ``k``-word segment; with a
line/sentence splitter the shape is identical.

Plan shape (the part that must survive 100 TB):
- explode documents into (doc_id, seg_idx, segment) — narrow;
- ONE shuffle: ``row_number`` over ``partitionBy(segment)`` ordered by
  (doc_id, seg_idx) marks first occurrences. The window key is the
  segment text; at scale you'd key on ``xxhash64(segment)`` to shrink
  shuffle rows (same plan, smaller payload) and salt the handful of
  mega-hot segments (empty line, "----") or pre-filter them with a
  frequency pass;
- ONE shuffle back on doc_id to reassemble (``collect_list`` of
  (seg_idx, seg) structs, sorted, joined).

Both shuffles carry the corpus once — O(corpus) I/O, no self-join, no
all-pairs anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def segment_dedup(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 10) -> DataFrame:
    """(id, text_dedup, n_segments, n_dropped): corpus-wide dedup of
    k-word segments, keeping each segment's first occurrence in
    (doc_id, seg_idx) order and reassembling the surviving text."""
    t = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("t"))
    segs_arr = F.expr(
        f"transform(sequence(0, cast(ceil(size(t) / {k}.0) as int) - 1), "
        f"i -> array_join(slice(t, i * {k} + 1, {k}), ' '))")
    segs = t.select(id_col, F.posexplode(segs_arr).alias("seg_idx", "seg"))
    w = Window.partitionBy("seg").orderBy(id_col, "seg_idx")
    ranked = segs.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(F.col("rn") == 1, F.struct("seg_idx", "seg"))
    return (ranked.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)),
                        lambda x: x["seg"]), " ").alias("text_dedup"),
        F.count(F.lit(1)).alias("n_segments"),
        F.sum((F.col("rn") > 1).cast("long")).alias("n_dropped")))
