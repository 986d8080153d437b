"""Blocked fuzzy record linkage (entity resolution) at corpus scale.

Candidate pairs are generated ONLY within a blocking key — the classic
blocking-then-matching shape that keeps linkage Σ|block|² instead of
n². The match predicate (edit distance ≤ ``max_dist``) runs JVM-side
inside codegen; the ``id_a < id_b`` inequality rides the join condition
so mirror/self pairs never materialize.

``max_block_size`` is the runaway-block guard (the ``knn_join``
``max_cell_size`` discipline): real-world blocking keys are skewed —
one (city, birth-year) block, one default segment, one empty-string
key can hold millions of records, and a single |block|² term defeats
the whole design. Blocks over the cap are deterministically hash-split
on the record id; pairs across slices of a split block are sacrificed
— the same graceful recall-for-bound trade the blocking itself already
makes at block boundaries. Pass ``None`` only where an oracle must
replay the exact pair set (the ``entity_match_customers`` pin).

The over-cap slice counts join back as a DataFrame in NATIVE types
(null-safe equality per blocking column), never through a driver-built
``str(v)`` lookup map: Python's rendering diverges from Spark's
``cast('string')`` for booleans (``'True'`` vs ``'true'``) and floats
(``'1e-07'`` vs ``'1.0E-7'``), ``concat_ws`` silently drops NULL
components, and a ``U+001F`` inside a string key could alias two
blocks — every one of those mismatches made the guard fail OPEN on
exactly the skewed keys it exists to cap (ADVICE r11).

Reference parity note: the reference engine has no fuzzy-match surface
(db_components/db_common carries exact-key dedup only); this is a
beyond-reference LLM-pipeline/data-quality operator.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_link(df: DataFrame, block_cols: list[str], id_col: str,
                 compare_col: str, max_dist: int = 2,
                 max_block_size: int | None = None) -> DataFrame:
    """(id_a, id_b, dist) for every within-block pair whose
    ``compare_col`` edit distance is ≤ ``max_dist`` (id_a < id_b).
    One co-partitioning of both sides on the blocking key — no
    cartesian, no broadcast requirement on either side. The edit
    distance runs in Spark's THRESHOLDED form (3-arg ``levenshtein``):
    the DP early-exits as soon as the distance provably exceeds
    ``max_dist`` — O(max_dist × min(len)) per candidate pair instead
    of O(len²) — and returns −1 above the threshold, which the filter
    maps back to exactly the plain ``dist ≤ max_dist`` pair set with
    identical surviving distances."""
    keyed = df.select(F.col(id_col).alias("_lk_id"),
                      F.col(compare_col).alias("_lk_cmp"),
                      *[F.col(c) for c in block_cols])
    join_cols = list(block_cols)
    if max_block_size is not None:
        # hot blocks (over the cap) and their slice counts — bounded
        # by the number of HOT blocks (skew is concentrated by
        # definition), never by corpus size, so the broadcast is small
        hot = (keyed.groupBy(*block_cols)
               .agg(F.count(F.lit(1)).alias("_n"))
               .filter(F.col("_n") > max_block_size)
               .select(*[F.col(c).alias(f"_hb_{i}")
                         for i, c in enumerate(block_cols)],
                       F.ceil(F.col("_n") / F.lit(int(max_block_size)))
                       .cast("int").alias("_lk_nsl")))
        # native-type, null-safe match back onto the corpus: a NULL
        # blocking component still matches its own hot row (the pair
        # join below keeps its plain equi-join semantics — NULL-keyed
        # rows never pair — but the GUARD must see the same block the
        # size count saw)
        cond = reduce(lambda a, b: a & b,
                      [F.col(c).eqNullSafe(F.col(f"_hb_{i}"))
                       for i, c in enumerate(block_cols)])
        keyed = (keyed.join(F.broadcast(hot), cond, "left")
                 .drop(*[f"_hb_{i}" for i in range(len(block_cols))])
                 .withColumn("_lk_slice",
                             F.pmod(F.xxhash64("_lk_id"),
                                    F.coalesce(F.col("_lk_nsl"),
                                               F.lit(1))).cast("int"))
                 .drop("_lk_nsl"))
        join_cols = block_cols + ["_lk_slice"]
    a = keyed.select(F.col("_lk_id").alias("id_a"),
                     F.col("_lk_cmp").alias("_cmp_a"), *join_cols)
    b = keyed.select(F.col("_lk_id").alias("id_b"),
                     F.col("_lk_cmp").alias("_cmp_b"), *join_cols)
    dist = F.levenshtein("_cmp_a", "_cmp_b", int(max_dist))
    return (a.join(b, join_cols)
             .filter(F.col("id_a") < F.col("id_b"))
             .filter(dist >= 0)
             .select("id_a", "id_b", dist.cast("long").alias("dist")))
