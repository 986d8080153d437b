"""Streaming SemDeDup (round-10 continuation): contracts the
`semantic_groups_stream` oracle can't see — batch-split invariance,
exactly-once replay / crash convergence across BOTH state sides
(vector index + groups), GDPR purge with survivor re-election, and the
`merge_pairs` external-pair entry's verify path for pairs WITHOUT the
``exact`` column."""

import json
import os

import pytest
from pyspark.sql import functions as F

from python_cdc_component_spark.streaming.semantic_state import (
    StreamingSemanticGroups)


def _vec(axis, v=1.0, dim=8):
    e = [0.0] * dim
    e[axis % dim] = v
    return e


def _near(axis, eps, dim=8):
    e = _vec(axis, dim=dim)
    e[(axis + 1) % dim] = eps          # small rotation, cos ≈ 1/√(1+eps²)
    return e


def _rows(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, e array<double>")


# 4 seed axes (ids 0..3) + two near-dup families (axis 0: ids 10,11,12;
# axis 2: ids 20,21) + two true singletons (cosine is scale-invariant,
# so 30/31 must NOT simply rescale a seed axis — they mix two axes at
# ~45°, cos ≈ 0.707 < 0.9 to everything)
CORPUS = ([(i, _vec(i)) for i in range(4)]
          + [(10, _near(0, 0.05)), (11, _near(0, 0.08)),
             (12, _near(0, 0.11)),
             (20, _near(2, 0.06)), (21, _near(2, 0.09)),
             (30, _near(1, 1.0)), (31, _near(3, 1.0))])


def _groups_set(spark, st):
    return {(r["component"], r["keep_doc_id"], r["cluster_size"])
            for r in st.read_groups(spark).collect()}


def test_batch_split_invariance(spark, tmp_path):
    """1-batch, 2-batch, and 3-batch ingests of the same corpus reach
    the same keep-list (seed codebook pinned by the FIRST batch — the
    splits here all lead with ids 0..3, so the codebook agrees)."""
    splits = [
        [CORPUS],
        [CORPUS[:6], CORPUS[6:]],
        [CORPUS[:4], CORPUS[4:8], CORPUS[8:]],
    ]
    results = []
    for si, batches in enumerate(splits):
        st = StreamingSemanticGroups(str(tmp_path / f"s{si}"),
                                     n_cells=4, threshold=0.9,
                                     num_buckets=8)
        for b, rows in enumerate(batches):
            st.process_batch(spark, _rows(spark, rows), batch_id=b)
        results.append(_groups_set(spark, st))
    assert results[0] == results[1] == results[2]
    got = results[0]
    # the two families merged under their min ids; axis-0 family
    # includes the seed vector 0 itself (cos(0, near(0)) ≈ 0.998)
    comp_of = {}
    for comp, keep, size in got:
        assert comp == keep, "keeper must be the min member id"
        comp_of[comp] = size
    assert comp_of[0] == 4          # {0, 10, 11, 12}
    assert comp_of[2] == 3          # {2, 20, 21}
    assert comp_of[30] == 1 and comp_of[31] == 1


def test_replay_noop_and_crash_convergence(spark, tmp_path):
    work = str(tmp_path / "st")
    st = StreamingSemanticGroups(work, n_cells=4, threshold=0.9,
                                 num_buckets=8)
    b0, b1 = _rows(spark, CORPUS[:6]), _rows(spark, CORPUS[6:])
    st.process_batch(spark, b0, batch_id=0)
    st.process_batch(spark, b1, batch_id=1)
    clean = _groups_set(spark, st)
    vecs = sorted(r["vec_id"] for r in spark.read.parquet(
        f"{work}/vectors").select("vec_id").collect())

    def state_bytes():
        out = {}
        for root, _, files in os.walk(work):
            for f in files:
                p = os.path.join(root, f)
                out[p] = (os.path.getsize(p), os.path.getmtime(p))
        return out

    # committed replay: byte-identical state
    before = state_bytes()
    st.process_batch(spark, b1, batch_id=1)
    assert state_bytes() == before
    # crash window: epoch-1 groups marker lost AND a half-append of
    # its vectors present — the replay purges and re-adds, converging
    os.remove(f"{work}/groups/_batches/1")
    st.index.add_batch(spark, _rows(spark, [(20, _near(2, 0.06))]))
    st.process_batch(spark, b1, batch_id=1)
    assert _groups_set(spark, st) == clean
    assert sorted(r["vec_id"] for r in spark.read.parquet(
        f"{work}/vectors").select("vec_id").collect()) == vecs


def test_purge_reelects_and_unindexes(spark, tmp_path):
    st = StreamingSemanticGroups(str(tmp_path / "st"), n_cells=4,
                                 threshold=0.9, num_buckets=8)
    st.process_batch(spark, _rows(spark, CORPUS), batch_id=0)
    # purge the axis-0 family's rep (id 0): survivors re-elect min=10
    assert st.purge_docs(spark, [0], purge_batch_id=1) > 0
    got = _groups_set(spark, st)
    assert (10, 10, 3) in got, f"axis-0 family not re-elected: {got}"
    assert all(c != 0 for c, _, _ in got)
    left = {r["vec_id"] for r in spark.read.parquet(
        str(tmp_path / "st" / "vectors")).select("vec_id").collect()}
    assert 0 not in left
    # a later batch near axis 0 can only pair with the survivors
    st.process_batch(spark, _rows(spark, [(40, _near(0, 0.06))]),
                     batch_id=2)
    got = _groups_set(spark, st)
    assert (10, 10, 4) in got


def test_merge_pairs_verifies_unverified_pairs(spark, tmp_path):
    """External pairs WITHOUT the exact column run the Jaccard verify
    against corpus text: a true near-dup pair merges, a false pair is
    rejected."""
    from python_cdc_component_spark.streaming.dedup_state import (
        StreamingDedupGroups)
    base = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, base), (2, base + " tail"),
         (3, "entirely different words " + " ".join(
             f"z{i}" for i in range(12)))],
        "doc_id long, text string")
    st = StreamingDedupGroups(str(tmp_path / "g"), num_buckets=8)
    suspects = spark.createDataFrame([(1, 2), (1, 3)],
                                     "doc_a long, doc_b long")
    stats = st.merge_pairs(spark, docs, suspects, corpus=docs,
                           batch_id=0)
    assert stats["n_verified_edges"] == 1     # (1,2) real, (1,3) not
    got = {(r["component"], r["keep_doc_id"], r["cluster_size"])
           for r in st.read_groups(spark).collect()}
    assert (1, 2, 2) in got                   # doc 2 longer → keeper
    assert any(c == 3 and s == 1 for c, _, s in got)
    # replay of the committed merge is a no-op returning the same count
    stats2 = st.merge_pairs(spark, docs, suspects, corpus=docs,
                            batch_id=0)
    assert stats2.get("replay") is True
