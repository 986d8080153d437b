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

Scale shape: centroids are k×d driver-side scalars (control-plane
sized), so nearest-centroid assignment is a **pure projection** — the
centroid table is embedded as an array-of-structs literal and the argmin
is ``array_min`` over ``struct(distance, cid)``.  Zero shuffle, zero
sort; each Lloyd iteration then needs exactly ONE shuffle (posexplode +
groupBy (cluster, dim), whose map-side partial agg moves only k×d
partials per partition).  The pairwise within-cluster search is ``applyInPandas`` per
cluster — the candidate count is Σ|cluster|², so the per-pair kernel
must be vectorized, not an interpreted-per-row expression (round-4's
HOF dot was 94 % of the operator's wall clock).  The numpy kernel
accumulates dot products and norms SEQUENTIALLY OVER DIMENSIONS but
vectorized over pairs — element-wise IEEE ops in the exact order of the
``aggregate(..., 0.0, (a, x) -> a + x)`` fold — so every emitted sim is
bit-identical to the JVM/oracle formulation.  All mean/SSE accumulation
is decimal (exact, order-independent) so results are
partition-count-invariant and oracle-comparable bit-for-bit.

Cache discipline: the source projection is persisted only INSIDE
``kmeans_fit``'s iteration loop (each means-collect is an action) and
released in a ``finally`` before returning — the returned assignment is
a plain projection over the un-cached source, so callers never inherit
a cached subtree to leak (NOTES_r4 §9).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(28,12)"

# pair-enumeration chunk budget inside the per-cluster kernel: bounds
# peak memory at ~8 arrays × PAIR_CHUNK × 8 B regardless of cluster size
_PAIR_CHUNK = 4_000_000

# beyond this many k×d score terms per row, the interpreted-HOF literal
# argmin loses to the Arrow-vectorized kernel (adaptive k makes k grow
# with the corpus, so the big-k path is the one that matters at scale)
_ASSIGN_PANDAS_MIN_TERMS = 4096


def _assign_pandas(v: DataFrame,
                   cent: list[tuple[int, list[float]]]) -> DataFrame:
    """Vectorized twin of ``_assign`` for large k: BLAS matmul
    distances (‖e‖² − 2·E·Cᵀ + ‖c‖², one dgemm per Arrow batch) with
    ``argmin`` over centroids in ascending-cid order, matching the
    (distance, cid) tie-break.  Float reassociation is deliberate here:
    no oracle pins the large-k path (the oracled queries run k=4
    through the HOF literal), and dgemm turns the O(n·k·d) assignment —
    the term that dominates once adaptive k grows with the corpus —
    from interpreted per-row work into peak-throughput kernels.  Still
    a shuffle-free map; the centroid table rides the closure."""
    import numpy as np
    import pandas as pd

    cids = np.array([int(c) for c, _ in cent], dtype=np.int32)
    C = np.array([e for _, e in cent], dtype=np.float64)       # k×d
    c2 = (C * C).sum(axis=1)                                   # ‖c‖²

    def f(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            E = np.array(pdf["e"].tolist(), dtype=np.float64)  # n×d
            D = ((E * E).sum(axis=1)[:, None]
                 - 2.0 * (E @ C.T) + c2[None, :])
            best = D.argmin(axis=1)          # first min = lowest cid
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(),
                "e": pdf["e"],
                "cid": cids[best],
                # dgemm round-off can push a true 0 slightly negative
                "_d2": np.maximum(D[np.arange(n), best], 0.0),
            })

    idt = dict(v.dtypes)["vec_id"]
    return v.mapInPandas(
        f, schema=f"vec_id {idt}, e array<double>, cid int, _d2 double")


def _assign(v: DataFrame, cent: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest-centroid assignment as a shuffle-free projection.

    Centroids are already a driver-side list, so score each row against
    the literal with ``transform`` and take ``array_min`` over
    ``struct(_d2, cid)`` — struct ordering compares field-by-field,
    which is exactly the deterministic (distance, cid) tie-break the
    round-4 crossJoin + row_number window computed, minus its Exchange
    + two Sorts of n×k rows.  Above ``_ASSIGN_PANDAS_MIN_TERMS`` score
    terms per row the Arrow kernel takes over (bit-identical output)."""
    dim = len(cent[0][1]) if cent else 0
    if len(cent) * dim > _ASSIGN_PANDAS_MIN_TERMS:
        return _assign_pandas(v, cent)
    lit = F.array(*[
        F.struct(F.lit(int(c)).alias("cid"),
                 F.array(*[F.lit(float(x)) for x in e]).alias("ce"))
        for c, e in cent])
    sqd = lambda ce: F.aggregate(  # noqa: E731 — same fold as the oracle
        F.zip_with(F.col("e"), ce, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda a, x: a + x)
    scored = F.transform(
        lit, lambda s: F.struct(sqd(s["ce"]).alias("_d2"),
                                s["cid"].alias("cid")))
    return (v.select("vec_id", "e", F.array_min(scored).alias("_b"))
             .select("vec_id", "e",
                     F.col("_b.cid").alias("cid"),
                     F.col("_b._d2").alias("_d2")))


def kmeans_fit(emb: DataFrame, k: int | None = 4, iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "e",
               target_cluster_size: int = 512):
    """Lloyd iterations with deterministic lowest-id initialization
    (the same convention as ``embedding_ivf_ann``, so an external oracle
    can replay the run exactly).  Returns ``(assigned, centroids)``
    where ``assigned`` is (vec_id, e, cid, _d2) under the FINAL
    centroids and ``centroids`` is the driver-side k×d list.

    ``k=None`` sizes k from the corpus — ``ceil(n / target_cluster_size)``
    — the same move the reference makes when it sizes chunks from table
    cardinality (``executor.py:44``): at 100 TB a fixed k would mean
    huge clusters (quadratic SemDeDup work) AND a join-key cardinality
    below the executor count.

    Empty clusters are DROPPED (a cluster that loses every point in an
    update round disappears), mirroring the oracle's means-CTE behavior
    so both engines replay identically.
    """
    v = emb.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).alias("e"))
    if k is None:
        n = v.count()
        k = max(1, math.ceil(n / target_cluster_size))
    cent = [(i, list(r["e"]))
            for i, r in enumerate(v.orderBy("vec_id").limit(k).collect())]
    dim = len(cent[0][1])

    if iters > 0:
        # persist: each Lloyd round's means-collect re-traverses the
        # source projection; released before return so no cached
        # subtree escapes (the returned assignment is projection-only)
        vc = v.persist()
        try:
            for _ in range(iters):
                # new means: exact decimal sums per (cluster, dim) —
                # map-side partial agg collapses the exploded rows to
                # k×d partials per partition before the shuffle
                means = (_assign(vc, cent)
                         .select("cid", F.posexplode("e").alias("pos", "x"))
                         .groupBy("cid", "pos")
                         .agg((F.sum(F.col("x").cast(DEC)).cast("double")
                               / F.count(F.lit(1))).alias("m"))
                         .collect())
                by_cid: dict[int, list[float]] = {}
                for r in means:
                    by_cid.setdefault(r["cid"], [0.0] * dim)[r["pos"]] = r["m"]
                cent = [(c, by_cid[c]) for c, _ in cent if c in by_cid]
        finally:
            vc.unpersist()

    return _assign(v, cent), cent


def _pair_kernel(threshold: float):
    """Per-cluster near-dup search kernel for ``applyInPandas``.

    Enumerates i<j pairs (by ascending vec_id) in bounded chunks and
    computes cosine with the shared sequential-dim kernel
    (operators/llm/simkernel.py, where the bit-exactness contract
    lives): every +/*/sqrt/÷ happens in the same IEEE order as the
    sequential HOF fold the oracle replays; the emitted raw sims are
    bit-identical to the JVM formulation they replace.  The final
    round+threshold decision is made Spark-side; the kernel
    pre-filters with a 1e-6 margin only to keep the Arrow return set
    small."""
    import numpy as np
    import pandas as pd

    from .simkernel import seq_dot_pairs, seq_sq_norms

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        s = len(pdf)
        out = {"vec_a": [], "vec_b": [], "cluster_id": [], "sim": []}
        if s >= 2:
            E = np.array(pdf["e"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            cid = int(pdf["cid"].iloc[0])
            nr = np.sqrt(seq_sq_norms(E))
            block = max(1, _PAIR_CHUNK // s)
            for a0 in range(0, s - 1, block):
                a1 = min(a0 + block, s)
                ia_t, ib_t = np.triu_indices(a1 - a0, 1)
                ia = np.concatenate([ia_t + a0,
                                     np.repeat(np.arange(a0, a1), s - a1)])
                ib = np.concatenate([ib_t + a0,
                                     np.tile(np.arange(a1, s), a1 - a0)])
                sim = seq_dot_pairs(E, ia, ib) / (nr[ia] * nr[ib])
                keep = sim >= threshold - 1e-6
                out["vec_a"].append(ids[ia[keep]])
                out["vec_b"].append(ids[ib[keep]])
                out["cluster_id"].append(np.full(int(keep.sum()), cid,
                                                 dtype=np.int32))
                out["sim"].append(sim[keep])
        cat = {c: np.concatenate(v) if v else np.array([], dtype=np.float64)
               for c, v in out.items()}
        return pd.DataFrame(cat)

    return f


def semantic_dup_pairs(emb: DataFrame, threshold: float = 0.85,
                       k: int | None = None, iters: int = 2,
                       id_col: str = "vec_id",
                       vec_col: str = "e",
                       target_cluster_size: int = 512,
                       max_cluster_size: int | str | None = "auto"
                       ) -> DataFrame:
    """SemDeDup candidate pairs: same-final-cluster pairs with
    round(cosine, 6) >= threshold.  Deliberately NOT exact across
    cluster boundaries (that is ``cosine_dup_pairs``'s job) — the
    SemDeDup contract is cluster-local search, which is what makes it
    linear-ish at corpus scale.

    The search itself is ONE shuffle of n rows keyed by cluster, then a
    vectorized per-cluster kernel (see ``_pair_kernel``) — no pairwise
    self-join materializes through the JVM row pipeline at all.

    ``max_cluster_size`` is the runaway-cluster guard: a hot cluster of
    size s costs s² kernel work no matter how k was chosen (degenerate
    corpora — near-identical vectors — defeat any geometric split), so
    clusters over the cap are deterministically hash-split into
    ``ceil(s / cap)`` slices before the search, bounding the work at
    s²/slices.  Pairs across slices of a split cluster are sacrificed —
    the same graceful recall-for-bound trade SemDeDup already makes at
    cluster boundaries.  Default ``"auto"`` = ``4 ×
    target_cluster_size`` so the guard is ON for direct users (a
    forgotten opt-in guard protects nobody); the oracled driver path
    passes ``None`` explicitly because its DuckDB twin has no split.

    Scale defaults (measured, SCALING.md scale-curve section): with a
    FIXED k, per-cluster size grows with the corpus and the kernel is
    O(n²/k) — a 30× blow-up ran 76× slower. ``k=None`` (the default)
    sizes k adaptively to ``target_cluster_size`` and, with the cap,
    bounds total kernel work at ~n × cap — measured linear. Pin k only
    when an external oracle must replay the clustering exactly."""
    if max_cluster_size == "auto":
        max_cluster_size = 4 * target_cluster_size
    assigned, _ = kmeans_fit(emb, k=k, iters=iters, id_col=id_col,
                             vec_col=vec_col,
                             target_cluster_size=target_cluster_size)
    if max_cluster_size is not None:
        sizes = assigned.groupBy("cid").agg(
            F.count(F.lit(1)).alias("_n")).collect()
        slices = {r["cid"]: math.ceil(r["_n"] / max_cluster_size)
                  for r in sizes if r["_n"] > max_cluster_size}
        if slices:
            m = F.create_map(*[F.lit(x) for kv in slices.items()
                               for x in kv])
            sub = F.coalesce(m[F.col("cid")], F.lit(1))
            assigned = assigned.withColumn(
                "cid",
                F.col("cid") * (max(slices.values()) + 1)
                + F.pmod(F.xxhash64("vec_id"), sub).cast("int"))
    idt = dict(assigned.dtypes)["vec_id"]
    pairs = (assigned.select("vec_id", "e", "cid")
             .groupBy("cid")
             .applyInPandas(_pair_kernel(threshold),
                            schema=f"vec_a {idt}, vec_b {idt}, "
                                   "cluster_id int, sim double"))
    return (pairs.select("vec_a", "vec_b", "cluster_id",
                         F.round("sim", 6).alias("sim"))
                 .filter(F.col("sim") >= threshold))
