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
