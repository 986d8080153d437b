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

Reference parity note: the reference engine has no fuzzy-match surface
(db_components/db_common carries exact-key dedup only); this is a
beyond-reference LLM-pipeline/data-quality operator.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_link(df: DataFrame, block_cols: list[str], id_col: str,
                 compare_col: str, max_dist: int = 2,
                 max_block_size: int | None = None) -> DataFrame:
    """(id_a, id_b, dist) for every within-block pair whose
    ``compare_col`` edit distance is ≤ ``max_dist`` (id_a < id_b).
    One co-partitioning of both sides on the blocking key — no
    cartesian, no broadcast requirement on either side."""
    keyed = df.select(F.col(id_col).alias("_lk_id"),
                      F.col(compare_col).alias("_lk_cmp"),
                      *[F.col(c) for c in block_cols])
    join_cols = list(block_cols)
    if max_block_size is not None:
        sizes = (keyed.groupBy(*block_cols)
                 .agg(F.count(F.lit(1)).alias("_n"))
                 .filter(F.col("_n") > max_block_size)
                 .collect())
        # bounded by the number of HOT blocks (skew is concentrated
        # by definition), never by corpus size
        if sizes:
            slices = {tuple(r[c] for c in block_cols):
                      math.ceil(r["_n"] / max_block_size)
                      for r in sizes}
            key = F.concat_ws("\x1f", *[F.col(c).cast("string")
                                        for c in block_cols])
            m = F.create_map(*[x for kv in slices.items()
                               for x in (F.lit("\x1f".join(
                                   str(v) for v in kv[0])),
                                   F.lit(kv[1]))])
            sub = F.coalesce(m[key], F.lit(1))
            keyed = keyed.withColumn(
                "_lk_slice",
                F.pmod(F.xxhash64("_lk_id"), sub).cast("int"))
            join_cols = block_cols + ["_lk_slice"]
        else:
            keyed = keyed.withColumn("_lk_slice", F.lit(0))
            join_cols = block_cols + ["_lk_slice"]
    a = keyed.select(F.col("_lk_id").alias("id_a"),
                     F.col("_lk_cmp").alias("_cmp_a"), *join_cols)
    b = keyed.select(F.col("_lk_id").alias("id_b"),
                     F.col("_lk_cmp").alias("_cmp_b"), *join_cols)
    dist = F.levenshtein("_cmp_a", "_cmp_b")
    return (a.join(b, join_cols)
             .filter(F.col("id_a") < F.col("id_b"))
             .filter(dist <= max_dist)
             .select("id_a", "id_b", dist.cast("long").alias("dist")))
