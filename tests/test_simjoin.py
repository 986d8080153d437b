"""Exact centroid-bucketed cosine similarity join: agrees with brute
force on every dataset (exactness guarantee), and its plan contains no
all-pairs join between the vector sides."""

import math
import random

from pyspark.sql import functions as F

from python_cdc_component_spark.operators.llm.simjoin import cosine_dup_pairs


def _brute(vecs, threshold):
    out = set()
    for i, (ida, a) in enumerate(vecs):
        for idb, b in vecs[i + 1:]:
            dot = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            if round(dot / (na * nb), 6) >= threshold:
                out.add((min(ida, idb), max(ida, idb)))
    return out


def _mk_vecs(seed=7, n=120, dim=16, n_clusters=5):
    rng = random.Random(seed)
    bases = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)]
    vecs = []
    for i in range(n):
        base = bases[i % n_clusters]
        vecs.append((i, [x + rng.gauss(0, 0.15) for x in base]))
    return vecs


def test_bucketed_simjoin_matches_brute_force(spark):
    for threshold in (0.5, 0.9):
        vecs = _mk_vecs()
        emb = spark.createDataFrame(vecs, "vec_id long, e array<double>")
        got = {(r.vec_a, r.vec_b)
               for r in cosine_dup_pairs(emb, threshold=threshold,
                                         n_centroids=6).collect()}
        assert got == _brute(vecs, threshold), f"t={threshold}"


def test_bucketed_simjoin_plan_has_no_allpairs_join(spark):
    """The pair-generating joins must be equi-joins on the bucket key;
    the only nested-loop allowed is the K-row centroid broadcast used for
    assignment (bounded, not O(n^2))."""
    vecs = _mk_vecs(n=60)
    emb = spark.createDataFrame(vecs, "vec_id long, e array<double>")
    out = cosine_dup_pairs(emb, threshold=0.9, n_centroids=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the bucket-pair equi-joins are hash joins on _b1/_b2
    assert "_b1" in plan and "_b2" in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    # any nested-loop join must be broadcasting the K-row centroid list
    # (the assignment step), never a vector-vector pairing
    for seg in plan.splitlines():
        if "BroadcastNestedLoopJoin" in seg:
            assert "BuildRight" in seg
    # the assignment subtree is cached, so the centroid cross join runs
    # once, not once per join side
    assert "InMemoryTableScan" in plan


def test_seeded_centroids_prune_on_adversarial_id_order(spark):
    """Worst-case id assignment: ids sorted by cluster, so the N lowest
    ids all live in ONE cluster. Lowest-id centroids would then share one
    region, radii of the catch-all buckets would balloon, and the
    bucket-pair bound would admit nearly everything. The seeded-hash
    sample is id-order independent: at a near-dup threshold it must
    prune most of the K*(K+1)/2 bucket pairs, and stay exact."""
    n_clusters, per = 6, 40
    vecs = _mk_vecs(seed=11, n=n_clusters * per, dim=16,
                    n_clusters=n_clusters)
    # adversarial relabel: sort by cluster (i % n_clusters), dense new ids
    by_cluster = sorted(range(len(vecs)), key=lambda i: i % n_clusters)
    relabeled = [(new_id, vecs[old][1])
                 for new_id, old in enumerate(by_cluster)]
    emb = spark.createDataFrame(relabeled, "vec_id long, e array<double>")

    threshold, k = 0.9, 6
    got = {(r.vec_a, r.vec_b)
           for r in cosine_dup_pairs(emb, threshold=threshold,
                                     n_centroids=k).collect()}
    assert got == _brute(relabeled, threshold)      # exactness holds

    # measure pruning with the operator's own quantizer + radius logic
    import math as _m
    from pyspark.sql import Window

    from python_cdc_component_spark.operators.llm.simjoin import (
        _dist, normalize_vectors, select_centroids)
    n = normalize_vectors(emb, "vec_id", "e")
    cents = select_centroids(n, k)
    cent_df = spark.createDataFrame(cents, "_cid long, _cu array<double>")
    sqd = F.aggregate(F.zip_with("_u", "_cu", lambda x, y: (x - y) * (x - y)),
                      F.lit(0.0), lambda a, x: a + x)
    w = Window.partitionBy("_id").orderBy("_d2", "_cid")
    assigned = (n.crossJoin(F.broadcast(cent_df)).withColumn("_d2", sqd)
                 .withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") == 1)
                 .select("_cid", F.sqrt("_d2").alias("_r")))
    radii = {r["_cid"]: r["R"] for r in
             assigned.groupBy("_cid").agg(F.max("_r").alias("R")).collect()}
    d_max = _m.sqrt(2.0 - 2.0 * (threshold - 5e-7)) + 1e-9

    total = k * (k + 1) // 2
    kept = sum(1 for i, (c1, u1) in enumerate(cents)
               for (c2, u2) in cents[i:]
               if _dist(u1, u2) <= radii.get(c1, 0.0)
               + radii.get(c2, 0.0) + d_max)
    # seeded sampling must keep the bucket-pair list sparse even when the
    # id order is hostile: at least a third of the pairs pruned
    assert kept <= (2 * total) // 3, (kept, total)
