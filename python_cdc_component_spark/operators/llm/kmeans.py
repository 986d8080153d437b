"""Distributed Lloyd k-means over an embedding column, and the
SemDeDup-style semantic dedup built on it.

Beyond-reference operators (the reference has no vector ops; SURVEY §2.4
"none").  The training-data use cases:

- **corpus clustering** (data maps, domain balancing, curriculum
  bucketing): k-means over document embeddings;
- **semantic dedup** (SemDeDup, Abbas et al. 2023): cluster first, then
  search for near-duplicate pairs ONLY within each cluster — the
  pairwise work drops from O(n²) to Σ|cluster|², and clusters are the
  natural unit of parallelism.

Scale shape: each Lloyd iteration is (1) a broadcast of k×d centroid
doubles, (2) one argmin projection per row (crossJoin against the k-row
centroid table + row_number — k is small), (3) one posexplode+groupBy
shuffle keyed by (cluster, dim) to compute the new means.  The collected
per-iteration state is k×d scalars — control-plane size, never data.
All mean/SSE accumulation is decimal (exact, order-independent) so
results are partition-count-invariant and oracle-comparable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(28,12)"


def _assign(v: DataFrame, cent_df: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast k rows, argmin by
    (distance, cid) — deterministic under ties."""
    sqd = F.aggregate(
        F.zip_with("e", "ce", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda a, x: a + x)
    w = Window.partitionBy("vec_id").orderBy("_d2", "cid")
    return (v.crossJoin(F.broadcast(cent_df))
             .withColumn("_d2", sqd)
             .withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") == 1)
             .select("vec_id", "e", "cid", "_d2"))


def kmeans_fit(emb: DataFrame, k: int = 4, iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "e"):
    """Lloyd iterations with deterministic lowest-id initialization
    (the same convention as ``embedding_ivf_ann``, so an external oracle
    can replay the run exactly).  Returns ``(assigned, centroids)``
    where ``assigned`` is (vec_id, e, cid, _d2) under the FINAL
    centroids and ``centroids`` is the driver-side k×d list.

    Empty clusters keep their previous centroid (no re-seeding) — the
    deterministic choice an oracle can mirror.
    """
    spark = emb.sparkSession
    dim = len(emb.select(vec_col).first()[0])
    # persist: every Lloyd round (means collect) and the final
    # assignment re-traverse the source projection
    v = emb.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).alias("e")).persist()

    cent = [(r["vec_id"], list(r["e"]))
            for r in v.orderBy("vec_id").limit(k).collect()]
    cent = [(i, e) for i, (_, e) in enumerate(cent)]

    for _ in range(iters):
        cent_df = spark.createDataFrame(
            [(c, e) for c, e in cent], "cid int, ce array<double>")
        assigned = _assign(v, cent_df)
        # new means: exact decimal sums per (cluster, dim), k*d rows
        means = (assigned
                 .select("cid", F.posexplode("e").alias("pos", "x"))
                 .groupBy("cid", "pos")
                 .agg((F.sum(F.col("x").cast(DEC)).cast("double")
                       / F.count(F.lit(1))).alias("m"))
                 .collect())
        by_cid: dict[int, list[float]] = {}
        for r in means:
            by_cid.setdefault(r["cid"], [0.0] * dim)[r["pos"]] = r["m"]
        cent = [(c, by_cid.get(c, e)) for c, e in cent]

    cent_df = spark.createDataFrame(
        [(c, e) for c, e in cent], "cid int, ce array<double>")
    return _assign(v, cent_df), cent


def semantic_dup_pairs(emb: DataFrame, threshold: float = 0.85,
                       k: int = 4, iters: int = 2,
                       id_col: str = "vec_id",
                       vec_col: str = "e") -> DataFrame:
    """SemDeDup candidate pairs: same-final-cluster pairs with
    round(cosine, 6) >= threshold.  Deliberately NOT exact across
    cluster boundaries (that is ``cosine_dup_pairs``'s job) — the
    SemDeDup contract is cluster-local search, which is what makes it
    linear-ish at corpus scale."""
    assigned, _ = kmeans_fit(emb, k=k, iters=iters,
                             id_col=id_col, vec_col=vec_col)
    nrm = F.sqrt(F.aggregate(F.transform("e", lambda x: x * x),
                             F.lit(0.0), lambda a, x: a + x))
    # persist: the assignment subtree (3 Lloyd passes upstream) feeds
    # BOTH sides of the self-join — unpersisted it runs twice
    n = assigned.withColumn("_n", nrm).persist()
    a = n.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("_ea"),
                 F.col("_n").alias("_na"), F.col("cid").alias("_ca"))
    b = n.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("_eb"),
                 F.col("_n").alias("_nb"), F.col("cid").alias("_cb"))
    dot = F.aggregate(F.zip_with("_ea", "_eb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (a.join(b, (F.col("_ca") == F.col("_cb"))
                   & (F.col("vec_a") < F.col("vec_b")))
             .select("vec_a", "vec_b", F.col("_ca").alias("cluster_id"),
                     F.round(dot / (F.col("_na") * F.col("_nb")), 6)
                      .alias("sim"))
             .filter(F.col("sim") >= threshold))
