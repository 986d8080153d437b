"""Distributed Lloyd k-means + SemDeDup semantic dedup: convergence,
determinism, the cluster-local search contract, and the round-5 scale
hardening (shuffle-free assignment, adaptive k, hot-cluster cap)."""

import math

import pytest
from pyspark.sql import functions as F

from python_cdc_component_spark.operators.llm.kmeans import (
    kmeans_fit, semantic_dup_pairs)
from python_cdc_component_spark.plans.explain import plan_summary


def _emb(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id",
                    F.col("embedding").cast("array<double>").alias("e")))


def _sse(assigned):
    return assigned.agg(F.sum("_d2")).first()[0]


def test_kmeans_sse_non_increasing(spark, sf_dir):
    """Lloyd's algorithm guarantee: every assign+update round can only
    lower (or keep) the summed squared distance."""
    emb = _emb(spark, sf_dir)
    a0, _ = kmeans_fit(emb, k=4, iters=0)    # assignment under init
    a1, _ = kmeans_fit(emb, k=4, iters=1)
    a2, _ = kmeans_fit(emb, k=4, iters=2)
    s0, s1, s2 = _sse(a0), _sse(a1), _sse(a2)
    assert s0 >= s1 >= s2
    assert s1 < s0                            # first update actually moves


def test_kmeans_partitions_all_vectors_deterministically(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a, cent = kmeans_fit(emb, k=4, iters=2)
    n = emb.count()
    assert a.count() == n                     # every vector assigned once
    assert a.select("vec_id").distinct().count() == n
    assert len(cent) == 4
    # deterministic: a rerun yields the identical assignment
    b, _ = kmeans_fit(emb, k=4, iters=2)
    assert (a.select("vec_id", "cid").exceptAll(
        b.select("vec_id", "cid")).count() == 0)


def test_semantic_pairs_are_cluster_local_subset(spark, sf_dir):
    """Every SemDeDup pair must be same-cluster, sim >= threshold, and a
    subset of the exact (triangle-inequality) dup-pair set at the same
    threshold — SemDeDup only ever loses cross-cluster pairs."""
    from python_cdc_component_spark.operators.llm.simjoin import (
        cosine_dup_pairs)
    emb = _emb(spark, sf_dir)
    sem = semantic_dup_pairs(emb, threshold=0.4, k=4, iters=2).collect()
    exact = {(r["vec_a"], r["vec_b"])
             for r in cosine_dup_pairs(emb, threshold=0.4).collect()}
    assert sem, "fixture should produce at least one within-cluster pair"
    for r in sem:
        assert r["sim"] >= 0.4
        assert (r["vec_a"], r["vec_b"]) in exact


def test_assignment_is_shuffle_free(spark, sf_dir):
    """The scale guarantee of the round-5 rewrite: nearest-centroid
    assignment is a pure projection (centroid literal + array_min over
    struct(d2, cid)) — ZERO exchanges, zero sorts in the subtree.  The
    round-4 crossJoin + row_number plan exchanged n×k rows twice."""
    a, _ = kmeans_fit(_emb(spark, sf_dir), k=4, iters=2)
    s = plan_summary(a)
    assert s.exchanges == 0 and s.sorts == 0, s.text


def test_empty_cluster_dropped_matches_oracle(spark):
    """Duplicate init points → cluster 1 never wins a tie (argmin breaks
    ties to the lower cid) → it empties after one update and must be
    DROPPED, exactly like the oracle's means CTE which only emits
    non-empty cids (ADVICE r4: the keep-stale-centroid behavior was a
    latent cross-engine divergence)."""
    emb = spark.createDataFrame(
        [(0, [5.0, 0.0]), (1, [5.0, 0.0]), (2, [9.0, 0.0])],
        "vec_id int, e array<double>")
    a, cent = kmeans_fit(emb, k=2, iters=1)
    assert [c for c, _ in cent] == [0]
    assert cent[0][1][0] == pytest.approx((5 + 5 + 9) / 3)
    assert {r["cid"] for r in a.collect()} == {0}


def test_adaptive_k_sizes_from_corpus(spark, sf_dir):
    """k=None derives k = ceil(n / target_cluster_size): at 100 TB a
    fixed k means quadratic SemDeDup clusters and a join-key cardinality
    below the executor count."""
    emb = _emb(spark, sf_dir)
    n = emb.count()
    target = math.ceil(n / 3)
    _, cent = kmeans_fit(emb, k=None, iters=0, target_cluster_size=target)
    assert len(cent) == 3


def test_semantic_cap_bounds_hot_cluster(spark):
    """Adversarial: 200 near-identical vectors — every geometric split
    keeps them in ONE cluster, so only the hash cap can stop the
    self-join going s².  With cap=50 the cluster splits into 4 slices:
    pair count drops from C(200,2)=19900 to ~4·C(50,2), and every
    emitted pair still satisfies the threshold."""
    emb = spark.createDataFrame(
        [(i, [1.0 + i * 1e-9, 0.0]) for i in range(200)],
        "vec_id int, e array<double>")
    pairs = semantic_dup_pairs(emb, threshold=0.99, k=1, iters=1,
                               max_cluster_size=50)
    rows = pairs.collect()
    assert 0 < len(rows) < 19900 / 2
    assert all(r["sim"] >= 0.99 for r in rows)
    assert pairs.select("cluster_id").distinct().count() == 4


def test_vectorized_assignment_matches_jvm_path(spark, sf_dir,
                                                monkeypatch):
    """The large-k Arrow assignment kernel (BLAS matmul distances)
    agrees with the HOF-literal path: identical cluster decisions
    (tie-break included — argmin over ascending-cid order) and _d2
    within dgemm round-off.  Distances differ only by float
    reassociation, which no oracle observes (oracled queries pin k=4,
    the HOF path)."""
    from python_cdc_component_spark.operators.llm import kmeans as km

    emb = _emb(spark, sf_dir)
    a_jvm, cent = kmeans_fit(emb, k=4, iters=1)
    jvm = {r["vec_id"]: (r["cid"], r["_d2"]) for r in a_jvm.collect()}
    monkeypatch.setattr(km, "_ASSIGN_PANDAS_MIN_TERMS", 0)
    a_pd, cent_pd = kmeans_fit(emb, k=4, iters=1)
    pd_ = {r["vec_id"]: (r["cid"], r["_d2"]) for r in a_pd.collect()}
    assert set(jvm) == set(pd_)
    for vid, (cid, d2) in jvm.items():
        assert pd_[vid][0] == cid
        assert pd_[vid][1] == pytest.approx(d2, rel=1e-9, abs=1e-12)
    # identical assignments -> the decimal means replay identically
    assert [c for c, _ in cent] == [c for c, _ in cent_pd]
    for (_, a), (_, b) in zip(cent, cent_pd):
        assert a == pytest.approx(b, rel=1e-12)


def test_semantic_dedup_cap_defaults_on(spark):
    """The runaway-cluster guard is ON by default ('auto' = 4 x
    target_cluster_size): a degenerate hot corpus gets hash-split
    without the caller opting in (VERDICT r5 #7 — an opt-in guard
    protects nobody)."""
    n = 700     # > 4 * target_cluster_size with target 128
    emb = spark.createDataFrame(
        [(i, [1.0 + i * 1e-9, 0.0]) for i in range(n)],
        "vec_id int, e array<double>")
    pairs = semantic_dup_pairs(emb, threshold=0.99, k=1, iters=1,
                               target_cluster_size=128)
    # auto cap = 512 -> ceil(700/512) = 2 slices
    assert pairs.select("cluster_id").distinct().count() == 2
    assert 0 < pairs.count() < n * (n - 1) / 2
    # explicit None restores the uncapped single-cluster search
    unc = semantic_dup_pairs(emb, threshold=0.99, k=1, iters=1,
                             target_cluster_size=128,
                             max_cluster_size=None)
    assert unc.select("cluster_id").distinct().count() == 1


def test_knn_join_hot_cell_cap_defaults_on(spark):
    """The runaway-cell guard is ON by default in knn_join: a
    degenerate corpus (near-identical vectors, k_cells=1) gets
    hash-split instead of building one m x m kernel matrix."""
    from python_cdc_component_spark.operators.llm.annindex import knn_join
    n = 700
    emb = spark.createDataFrame(
        [(i, [1.0 + i * 1e-9, 0.0]) for i in range(n)],
        "vec_id int, e array<double>")
    out = knn_join(emb, k_neighbors=2, k_cells=1, iters=1,
                   target_cell_size=128)
    # every vector still gets its neighbors (within its slice)
    assert out.select("qid").distinct().count() == n
    assert out.groupBy("qid").count().agg(
        {"count": "max"}).first()[0] <= 2
    # uncapped comparison: identical single-cell search
    unc = knn_join(emb, k_neighbors=2, k_cells=1, iters=1,
                   target_cell_size=128, max_cell_size=None)
    assert unc.select("qid").distinct().count() == n
