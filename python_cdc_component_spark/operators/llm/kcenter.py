"""Greedy k-center (Gonzalez farthest-point) diversity selection.

Beyond-reference operator (the reference has no vector ops; SURVEY §2.4
"none").  Training-data use case: pick a maximally-diverse seed subset
of an embedded corpus — coreset construction, eval-set seeding, and the
"diverse exemplars per cluster" step of curation recipes; the greedy
2-approximation is the standard scalable form.

Scale shape: chosen centers are ≤k driver-side vectors (control-plane
sized), so each round is a **shuffle-free projection**: the center list
rides the plan as an array literal, every row folds its min distance
over it (same ``aggregate`` fold as kmeans._assign so results are
bit-reproducible), and the farthest point is a
``TakeOrderedAndProject(1)`` — per-partition top-1 then driver merge,
never a global sort.  k rounds → O(n·k²·d) flops total with zero
shuffles and zero corpus-sized state; for large k, switch to carrying a
running ``dmin`` column through a persisted/checkpointed frame instead
(O(n·k·d)), at the cost of corpus-sized cache — the literal recompute
is the right trade while k stays control-plane sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _min_dist_col(centers: list[tuple[int, list[float]]]) -> F.Column:
    """Squared distance to the nearest chosen center, as a literal-fold
    projection (the kmeans._assign fold, so cross-engine bit-exact)."""
    lit = F.array(*[F.array(*[F.lit(float(x)) for x in e])
                    for _, e in centers])
    sqd = lambda ce: F.aggregate(  # noqa: E731 — same fold as the oracle
        F.zip_with(F.col("e"), ce, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda a, x: a + x)
    return F.array_min(F.transform(lit, sqd))


def kcenter_select(emb: DataFrame, k: int = 5, id_col: str = "vec_id",
                   vec_col: str = "e") -> list[tuple[int, list[float], float]]:
    """Greedy k-center over ``emb``: deterministic start at the lowest
    id, then k−1 rounds of "farthest from the chosen set" with the
    (−dmin, id) tie-break.  Returns ``[(id, vector, dmin_at_pick)]`` in
    selection order (the first center's dmin is 0.0 by convention)."""
    v = emb.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).alias("e"))
    # persist across the k driver actions (each round is an action, and
    # without the cache every round re-scans + re-casts the source —
    # the kmeans_fit iteration pattern); released before returning so
    # no cached subtree escapes to callers.
    vc = v.persist()
    try:
        first = vc.orderBy("vec_id").limit(1).collect()[0]
        centers = [(first["vec_id"], list(first["e"]), 0.0)]
        for _ in range(k - 1):
            far = (vc.select("vec_id", "e",
                             _min_dist_col([(c, e) for c, e, _ in centers])
                             .alias("dmin"))
                     .orderBy(F.col("dmin").desc(), "vec_id")
                     .limit(1).collect())
            if not far:
                break
            r = far[0]
            centers.append((r["vec_id"], list(r["e"]), float(r["dmin"])))
    finally:
        vc.unpersist()
    return centers
