"""Exact cosine near-duplicate pair join with centroid-bucket pruning.

Beyond-reference operator (reference has no similarity ops; SURVEY §2.4
"none"). Round 1 shipped the brute-force ``a JOIN b ON ida < idb`` form,
which is O(n²) shuffle and cannot run at 100 TB. This is the scale path:
an **exact** metric similarity self-join using coarse quantization plus
triangle-inequality bucket-pair pruning (the classic exact cluster-
pruned similarity join; same family as the IVF blocking in
``embedding_ivf_ann`` but with a coverage guarantee).

Why it stays exact: for unit vectors, ``cos(x,y) >= t`` is equivalent to
``||x-y|| <= sqrt(2-2t)``. Assign every normalized vector to its nearest
of K centroids; let ``R_b`` be bucket b's radius (max distance of a
member to its centroid). By the triangle inequality a qualifying pair
(x in b1, y in b2) forces ``d(c1,c2) <= R_b1 + R_b2 + sqrt(2-2t)``, so
scoring only bucket pairs that satisfy that bound loses nothing. The
candidate bucket-pair list is K² driver-side scalars (K is small);
the data join is two hash equi-joins on the bucket key — no cross join,
no all-pairs shuffle. At 100 TB, K scales with sqrt(n) and pruning
drops almost all bucket pairs for real near-dup thresholds (~0.9).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ...caching import persist_once


def _dist(a, b):
    return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))


def normalize_vectors(emb: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "e") -> DataFrame:
    """(_id, _e, _nrm, _u): raw vector, L2 norm, unit-sphere projection."""
    norm = F.sqrt(F.aggregate(F.transform("_e", lambda x: x * x),
                              F.lit(0.0), lambda a, x: a + x))
    return (emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_e"))
            .withColumn("_nrm", norm)
            .withColumn("_u", F.transform("_e", lambda x: x / F.col("_nrm"))))


def select_centroids(n: DataFrame, n_centroids: int,
                     seed: int = 41) -> list[tuple[int, list[float]]]:
    """Deterministic k-means||-spirit quantizer: seeded-hash oversample
    of ``4*n_centroids`` unit vectors (TakeOrdered on ``xxhash64(id,
    seed)`` — one distributed top-K, id-order independent), then greedy
    farthest-point (k-center) refinement over the driver-side pool.
    The refinement keeps each pool point's min-distance-to-chosen
    incrementally (one new distance per point per round — O(pool × K)
    total, the textbook Gonzalez form), so an adaptive K=sqrt(n) stays
    driver-cheap; above 1024 centroids the hash sample is already
    region-spreading and the refinement is skipped (exactness never
    depends on centroid choice, only pruning quality does)."""
    pool_rows = (n.select(F.col("_id").alias("_cid"),
                          F.col("_u").alias("_cu"))
                  .orderBy(F.xxhash64(F.col("_cid"), F.lit(seed)), "_cid")
                  .limit(4 * n_centroids).collect())
    pool = [(r["_cid"], list(r["_cu"])) for r in pool_rows]
    if n_centroids > 1024:
        return pool[:n_centroids]
    centroids = pool[:1]
    mind = [_dist(p[1], pool[0][1]) for p in pool]
    mind[0] = -1.0      # chosen points can never be re-picked
    while len(centroids) < n_centroids and len(centroids) < len(pool):
        i = max(range(len(pool)), key=lambda j: mind[j])
        centroids.append(pool[i])
        ci = pool[i][1]
        mind[i] = -1.0
        for j, p in enumerate(pool):
            if mind[j] >= 0.0:
                d = _dist(p[1], ci)
                if d < mind[j]:
                    mind[j] = d
    return centroids


def cosine_dup_pairs(emb: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "e", threshold: float = 0.4,
                     n_centroids: int | None = None, round_dp: int = 6,
                     seed: int = 41) -> DataFrame:
    """All pairs with round(cosine, round_dp) >= threshold, emitted as
    (vec_a < vec_b, sim). ``vec_col`` must be ``array<double>``.

    ``n_centroids=None`` (default) sizes K = ceil(sqrt(n)), capped at
    4096 so the K² driver-side bucket-pair list stays bounded — the
    module docstring's "K scales with sqrt(n)" made real. A FIXED K
    makes bucket size grow with the corpus and the within-bucket join
    O(n²/K): measured 30× blow-up at K=8 ran >200× slower, adaptive K
    is n^1.5 worst-case with pruning doing far better at real
    thresholds. Pin K only where an external oracle must replay the
    bucketization (the oracled query pins 8).

    Centroid selection is a two-step deterministic quantizer in the
    k-means|| spirit: (1) a seeded-hash OVERSAMPLE of ``4*n_centroids``
    vectors (TakeOrdered on ``xxhash64(id, seed)`` — id-order
    independent, one distributed top-K), then (2) greedy farthest-point
    (k-center) refinement over that driver-side pool, which spreads the
    final centroids across the data's regions.  An adversarial id
    ordering (ids sorted by cluster) therefore cannot concentrate the
    centroids in one region and blow up the bucket radii the pruning
    bound depends on.  Exactness never depends on the centroid choice
    (the triangle-inequality bound covers any quantizer); only pruning
    quality does."""
    spark = emb.sparkSession
    n = normalize_vectors(emb, id_col, vec_col)
    if n_centroids is None:
        n_centroids = max(1, min(4096, math.ceil(math.sqrt(n.count()))))
    centroids = select_centroids(n, n_centroids, seed)
    cent_df = spark.createDataFrame(
        [(cid, cu) for cid, cu in centroids], "_cid long, _cu array<double>")

    sqdist = F.aggregate(F.zip_with("_u", "_cu", lambda x, y: (x - y) * (x - y)),
                         F.lit(0.0), lambda a, x: a + x)
    d = n.crossJoin(F.broadcast(cent_df)).withColumn("_d2", sqdist)
    w_assign = Window.partitionBy("_id").orderBy("_d2", "_cid")
    # persist: the assignment subtree feeds the radius agg and BOTH join
    # sides — without it the normalize+assign work runs three times.
    # persist_once: a re-invocation in the same session builds the
    # identical plan, which is already in the CacheManager
    assigned = persist_once(
        d.withColumn("_rn", F.row_number().over(w_assign))
         .filter(F.col("_rn") == 1)
         .select("_id", "_e", "_nrm", "_cid",
                 F.sqrt("_d2").alias("_r")))

    # bucket radii: K driver-side scalars
    radii = {r["_cid"]: r["R"] for r in
             assigned.groupBy("_cid").agg(F.max("_r").alias("R")).collect()}
    # the qualifying filter is round(cos, dp) >= t, so the lowest true
    # cosine that qualifies is t - 0.5*10^-dp — the distance bound must
    # cover that rounding slack (plus float fuzz), or a boundary pair
    # could be pruned and "exact" would be a lie
    t_eff = threshold - 0.5 * 10.0 ** (-round_dp)
    d_max = math.sqrt(max(0.0, 2.0 - 2.0 * t_eff)) + 1e-9

    # canonical orientation (low cid, high cid): the downstream filter
    # keeps only _ba <= _bb rows, so a pair emitted as (5, 2) would be
    # silently dropped — latent while centroids were id-sorted, fatal
    # once the seeded-hash sample made list order ≠ numeric order
    cand = [(min(c1, c2), max(c1, c2))
            for i, (c1, u1) in enumerate(centroids)
            for (c2, u2) in centroids[i:]
            if _dist(u1, u2) <= radii.get(c1, 0.0) + radii.get(c2, 0.0) + d_max]
    cand_df = F.broadcast(spark.createDataFrame(
        cand, "_b1 long, _b2 long"))

    a = assigned.select(F.col("_id").alias("_ida"), F.col("_e").alias("_ea"),
                        F.col("_nrm").alias("_na"), F.col("_cid").alias("_ba"))
    b = assigned.select(F.col("_id").alias("_idb"), F.col("_e").alias("_eb"),
                        F.col("_nrm").alias("_nb"), F.col("_cid").alias("_bb"))
    dot = F.aggregate(F.zip_with("_ea", "_eb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    pairs = (a.join(cand_df, a["_ba"] == cand_df["_b1"])
              .join(b, F.col("_b2") == b["_bb"])
              .filter((F.col("_ba") < F.col("_bb"))
                      | ((F.col("_ba") == F.col("_bb"))
                         & (F.col("_ida") < F.col("_idb"))))
              .select(F.least("_ida", "_idb").alias("vec_a"),
                      F.greatest("_ida", "_idb").alias("vec_b"),
                      F.round(dot / (F.col("_na") * F.col("_nb")), round_dp)
                       .alias("sim")))
    return pairs.filter(F.col("sim") >= threshold)


# Deterministic pseudo-random hyperplanes shared with the DuckDB oracle:
# integer arithmetic only, so the plane coefficients are bit-identical
# across engines and the sign bits (hence the candidate set) agree
# exactly. j = hyperplane index, i = dimension index.
_HP_COEF = "(((1 + (j*{dim} + i) * 2654435761) % 1000003) / 1000003.0 - 0.5)"


def hyperplane_lsh_pairs(emb: DataFrame, threshold: float = 0.4,
                         n_bands: int = 4,
                         bits_per_band: int | None = None,
                         target_bucket_size: int = 512,
                         id_col: str = "vec_id",
                         vec_col: str = "e") -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) LSH near-dup candidates
    with an exact cosine filter — the APPROXIMATE embedding scale path
    (vs. the exact centroid-bucketed join above, which is Ω(n²) on
    unclustered data; SCALING.md "embedding near-dup").

    ``bits_per_band=None`` (default) sizes the band key space to the
    corpus: bits = ceil(log2(n / target_bucket_size)) (clamped to
    [1, 24]), so expected bucket size stays ~target and same-band pair
    work stays ~n × target — a FIXED key space (the old 4-bit bands =
    16 keys) makes buckets grow with n and the band self-join
    O(n²/keys). Recall per band drops as bits grow (P[collision] =
    (1 - θ/π)^bits); compensate with ``n_bands`` — the standard LSH
    trade. Pin both only where an external oracle must replay the
    geometry (the oracled query pins 4×4).
    """
    spark = emb.sparkSession
    if bits_per_band is None:
        n_rows = emb.count()
        bits_per_band = max(1, min(24, math.ceil(math.log2(
            max(2.0, n_rows / target_bucket_size)))))
    head = emb.select(vec_col).first()
    if head is None:        # empty corpus: no pairs, not a TypeError
        return spark.createDataFrame(
            [], "vec_a long, vec_b long, sim double")
    dim = len(head[0])
    total_bits = n_bands * bits_per_band
    coef = _HP_COEF.format(dim=dim)
    v = emb.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).alias("e"))
    nrm = F.sqrt(F.aggregate(F.transform("e", lambda x: x * x),
                             F.lit(0.0), lambda a, x: a + x))
    u = (v.withColumn("nrm", nrm)
          .withColumn("uv", F.expr("transform(e, x -> x / nrm)")))
    bits = F.expr(f"""transform(sequence(0, {total_bits - 1}), j -> CASE
        WHEN aggregate(sequence(0, {dim - 1}), cast(0 as double),
                       (acc, i) -> acc + element_at(uv, i+1) * {coef}) >= 0
        THEN 1 ELSE 0 END)""")
    sig = persist_once(u.withColumn("bits", bits))
    key = F.expr(f"""aggregate(sequence(0, {bits_per_band - 1}),
        cast(0 as long),
        (acc, t) -> acc * 2 + element_at(bits, b * {bits_per_band} + t + 1))""")
    bands = (sig.select("vec_id", "e", "nrm",
                        F.explode(F.sequence(
                            F.lit(0), F.lit(n_bands - 1))).alias("b"),
                        "bits")
                .select("vec_id", "e", "nrm", "b", key.alias("band_key")))
    a = bands.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"),
                     F.col("nrm").alias("na"), "b", "band_key")
    bb = bands.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"),
                      F.col("nrm").alias("nb"), "b", "band_key")
    dot = F.aggregate(F.zip_with("ea", "eb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    cand = (a.join(bb, ["b", "band_key"])
             .filter(F.col("vec_a") < F.col("vec_b"))
             .select("vec_a", "vec_b",
                     F.round(dot / (F.col("na") * F.col("nb")), 6)
                      .alias("sim"))
             .distinct())
    return cand.filter(F.col("sim") >= threshold)
