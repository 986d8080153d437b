"""Distributed Lloyd k-means + SemDeDup semantic dedup: convergence,
determinism, and the cluster-local search contract."""

from pyspark.sql import functions as F

from python_cdc_component_spark.operators.llm.kmeans import (
    kmeans_fit, semantic_dup_pairs)


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
