"""Round-9 streaming boilerplate guard (VERDICT r8 #1):

* K text-identical docs cost K−1 linear (rep, member) attach pairs
  through the streaming LSH index — never K²/2 banded candidate pairs
  (the batch collapse of ``operators/llm/hybrid.py::exact_group_keyed``
  ported to ``StreamingLshIndex``);
* identical SHORT (<3-token) docs never group (undefined-empty Jaccard
  — the same singleton contract as the batch collapse);
* GDPR purge of a group's REP re-elects the min surviving member in
  the ``_groups`` sidecar — no band rewrite, and both future exact
  dups and future near-dups still find the group;
* the verified-edge collect in ``StreamingDedupGroups.process_batch``
  is a bounded probe — above ``driver_merge_max_edges`` the merge runs
  fully distributed off the edge DataFrame (``merge_path ==
  "distributed-edges"``) with keep-list parity intact;
* a crash after the band append but before the batch marker replays to
  a complete index (the "mine groups re-band" rule — a stored group
  whose rep is one of this batch's docs was written by this batch's
  own crashed attempt);
* the collapse mode is physical layout pinned in the meta: reopening
  with a different constructor arg adopts the stored mode.
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from python_cdc_component_spark.operators.llm.hybrid import (
    hybrid_dedup_keep)
from python_cdc_component_spark.streaming.dedup_state import (
    StreamingDedupGroups)
from python_cdc_component_spark.streaming.lsh_index import (
    StreamingLshIndex)

BOILER = ("this is a boilerplate license page repeated verbatim many "
          "times over across the corpus")
NEAR = ("this is a boilerplate license page repeated verbatim many "
        "times over across the corpora")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _uniq(i):
    return (f"unique document number {i} carrying totally distinct "
            f"content tokens {i * 7} {i * 13} {i * 29}")


def _keep(df):
    return {(r["component"], r["keep_doc_id"], r["keep_n_tokens"],
             r["cluster_size"]) for r in df.collect()}


def test_boilerplate_candidates_linear_in_unique_texts(spark, tmp_path):
    """200 copies of one text split across 3 batches: every batch
    emits exactly its attach pairs (one per duplicate doc, rep = the
    group's first-ever min id) plus LSH pairs at unique-text-GROUP
    granularity — candidate volume ∝ unique texts, never K²/2."""
    idx = StreamingLshIndex(str(tmp_path / "idx"), num_buckets=8,
                            collapse_exact=True)
    b1 = [(i, BOILER) for i in range(80)] + [(900 + i, _uniq(i))
                                             for i in range(3)]
    p1 = idx.process_batch(spark, _docs(spark, b1), batch_id=0)
    r1 = [(r["doc_a"], r["doc_b"]) for r in p1.collect()]
    # 79 attach pairs, all to rep 0; the unique docs collide with
    # nothing
    assert len(r1) == 79
    assert all(a == 0 for a, _ in r1)

    b2 = [(200 + i, BOILER) for i in range(60)]
    p2 = idx.process_batch(spark, _docs(spark, b2), batch_id=1)
    r2 = [(r["doc_a"], r["doc_b"]) for r in p2.collect()]
    # cross-batch dups attach to the SAME rep — 60 pairs, not 80×60
    assert len(r2) == 60
    assert all(a == 0 for a, _ in r2)

    b3 = [(400 + i, BOILER) for i in range(60)] + [(800, NEAR)]
    p3 = idx.process_batch(spark, _docs(spark, b3), batch_id=2)
    r3 = [(r["doc_a"], r["doc_b"]) for r in p3.collect()]
    # 60 attach + exactly ONE near-dup pair (group vs group, surfaced
    # at the reps) — the un-collapsed index would emit 200 pairs for
    # the near-dup doc alone
    assert sorted(r3)[-1] == (0, 800)
    assert len(r3) == 61


def test_identical_short_docs_stay_singletons(spark, tmp_path):
    idx = StreamingLshIndex(str(tmp_path / "idx"), num_buckets=8,
                            collapse_exact=True)
    rows = [(1, "hi there"), (2, "hi there"), (3, "hi"),
            (4, BOILER), (5, BOILER)]
    pairs = [(r["doc_a"], r["doc_b"]) for r in
             idx.process_batch(spark, _docs(spark, rows),
                               batch_id=0).collect()]
    assert pairs == [(4, 5)]


def test_rep_purge_reelects_min_survivor(spark, tmp_path):
    """Purging the banded rep re-elects the min surviving member:
    future exact dups attach to the NEW rep, future near-dups still
    collide with the group's (unchanged) bands."""
    idx = StreamingLshIndex(str(tmp_path / "idx"), num_buckets=8,
                            collapse_exact=True)
    idx.process_batch(spark, _docs(spark, [(5, BOILER), (9, BOILER),
                                           (12, BOILER)]), batch_id=0)
    idx.purge_docs(spark, [5])
    p = idx.process_batch(spark, _docs(spark, [(40, BOILER)]),
                          batch_id=1)
    assert [(r["doc_a"], r["doc_b"]) for r in p.collect()] == [(9, 40)]
    p2 = idx.process_batch(spark, _docs(spark, [(50, NEAR)]),
                           batch_id=2)
    assert [(r["doc_a"], r["doc_b"]) for r in p2.collect()] == [(9, 50)]
    # purging every member kills the group — and a fresh copy of the
    # text re-creates it cleanly (re-banded, new rep)
    idx.purge_docs(spark, [9, 12, 40])
    p3 = idx.process_batch(spark, _docs(spark, [(60, BOILER)]),
                           batch_id=3)
    assert [(r["doc_a"], r["doc_b"]) for r in p3.collect()] == [(50, 60)]
    p4 = idx.process_batch(spark, _docs(spark, [(70, BOILER)]),
                           batch_id=4)
    assert [(r["doc_a"], r["doc_b"]) for r in p4.collect()] == [(60, 70)]


def test_groups_keep_parity_with_batch_hybrid_under_dups(spark,
                                                         tmp_path):
    """The class-level parity contract on the collapse's riskiest
    input: exact-dup groups of varied size split ACROSS batches, a
    near-dup bridge, identical short docs, and unique docs — the
    streaming keep-list equals batch ``hybrid_dedup_keep`` of the full
    corpus."""
    rows = ([(i, BOILER) for i in (3, 7, 11, 15)]
            + [(20 + i, NEAR) for i in range(2)]
            + [(30, "hi there"), (31, "hi there")]
            + [(40 + i, _uniq(i)) for i in range(3)])
    corpus = _docs(spark, rows)
    st = StreamingDedupGroups(str(tmp_path / "st"), num_buckets=8)
    # adversarial split: the dup group arrives one doc per batch
    splits = [rows[0:1], rows[1:3], rows[3:6], rows[6:]]
    for i, chunk in enumerate(splits):
        st.process_batch(spark, _docs(spark, chunk), corpus=corpus,
                         batch_id=i)
    assert _keep(st.read_groups(spark)) == _keep(
        hybrid_dedup_keep(corpus))


def test_over_threshold_edges_run_distributed_with_parity(spark,
                                                          tmp_path):
    """A batch whose verified edge list exceeds
    ``driver_merge_max_edges`` must take the distributed-edges path —
    the edge list never lands on the driver — and the keep-list must
    still match batch hybrid."""
    rows = [(i, BOILER) for i in range(1, 9)] + [(50, _uniq(1))]
    corpus = _docs(spark, rows)
    st = StreamingDedupGroups(str(tmp_path / "st"), num_buckets=8,
                              driver_merge_max_edges=3)
    s = st.process_batch(spark, corpus, corpus=corpus, batch_id=0)
    assert s["merge_path"] == "distributed-edges"
    assert s["n_verified_edges"] == 7          # the attach star
    assert _keep(st.read_groups(spark)) == _keep(
        hybrid_dedup_keep(corpus))
    # a follow-up small batch goes back to the driver path and merges
    # into the same component
    rows2 = rows + [(60, BOILER)]
    corpus2 = _docs(spark, rows2)
    s2 = st.process_batch(spark, _docs(spark, [(60, BOILER)]),
                          corpus=corpus2, batch_id=1)
    assert s2["merge_path"] == "driver"
    assert _keep(st.read_groups(spark)) == _keep(
        hybrid_dedup_keep(corpus2))


def test_crash_before_marker_replays_to_complete_index(spark, tmp_path,
                                                       monkeypatch):
    """Crash AFTER the band append, BEFORE the batch marker: the
    replay must re-band the batch's groups (their stored ``_groups``
    rows name a rep from this very batch — the "mine" rule), so the
    dynamic overwrite replaces any partial append and later near-dups
    still find the group."""
    import python_cdc_component_spark.streaming.lsh_index as L
    idx = StreamingLshIndex(str(tmp_path / "idx"), num_buckets=8,
                            collapse_exact=True)
    idx.process_batch(spark, _docs(spark, [(1, _uniq(1))]), batch_id=0)
    real_touch = L._fs_touch

    def boom(spark_, path):
        if "_batches" in path:
            raise RuntimeError("crash before marker")
        return real_touch(spark_, path)

    monkeypatch.setattr(L, "_fs_touch", boom)
    batch = _docs(spark, [(10, BOILER), (11, BOILER)])
    with pytest.raises(RuntimeError, match="crash before marker"):
        idx.process_batch(spark, batch, batch_id=1)
    monkeypatch.undo()
    # replay: identical pairs, marker lands, index complete
    pairs = [(r["doc_a"], r["doc_b"]) for r in
             idx.process_batch(spark, batch, batch_id=1).collect()]
    assert pairs == [(10, 11)]
    p = idx.process_batch(spark, _docs(spark, [(20, NEAR)]),
                          batch_id=2)
    assert [(r["doc_a"], r["doc_b"]) for r in p.collect()] == [(10, 20)]


def test_collapse_mode_pinned_in_meta(spark, tmp_path):
    """The stored mode wins over the constructor arg in BOTH
    directions — a collapsed store reopened uncollapsed (and vice
    versa) adopts the layout it was built with."""
    path = str(tmp_path / "idx")
    idx = StreamingLshIndex(path, num_buckets=8, collapse_exact=True)
    idx.process_batch(spark, _docs(spark, [(1, BOILER), (2, BOILER)]),
                      batch_id=0)
    reopened = StreamingLshIndex(path, num_buckets=8,
                                 collapse_exact=False)
    p = reopened.process_batch(spark, _docs(spark, [(3, BOILER)]),
                               batch_id=1)
    assert reopened.collapse_exact is True
    assert [(r["doc_a"], r["doc_b"]) for r in p.collect()] == [(1, 3)]

    plain_path = str(tmp_path / "plain")
    plain = StreamingLshIndex(plain_path, num_buckets=8)
    plain.process_batch(spark, _docs(spark, [(1, BOILER), (2, BOILER)]),
                        batch_id=0)
    reopened2 = StreamingLshIndex(plain_path, num_buckets=8,
                                  collapse_exact=True)
    reopened2.process_batch(spark, _docs(spark, [(3, BOILER)]),
                            batch_id=1)
    assert reopened2.collapse_exact is False


def test_string_doc_ids_groups_parity_and_purge(spark, tmp_path):
    """String doc ids (the composite-PK envelope's key type): the
    state layer hash-partitions instead of taking id mod N (pinned in
    the meta), min-label components order strings exactly like Spark
    does, keep-list parity with batch hybrid holds, and purge +
    re-election work on string keys."""
    rows = [("u1\x1fsignup", BOILER), ("u2\x1fsignup", BOILER),
            ("u3\x1fpage", NEAR), ("u4\x1fpage", _uniq(4)),
            ("u5\x1fpage", "hi there"), ("u6\x1fpage", "hi there")]
    corpus = spark.createDataFrame(rows, "doc_id string, text string")
    st = StreamingDedupGroups(str(tmp_path / "st"), num_buckets=8)
    for i, chunk in enumerate((rows[:2], rows[2:4], rows[4:])):
        st.process_batch(
            spark,
            spark.createDataFrame(chunk, "doc_id string, text string"),
            corpus=corpus, batch_id=i)
    assert _keep(st.read_groups(spark)) == _keep(
        hybrid_dedup_keep(corpus))
    # reopening adopts the stored string kind; feeding longs raises
    st2 = StreamingDedupGroups(str(tmp_path / "st"), num_buckets=8)
    with pytest.raises(ValueError, match="keyed by string"):
        st2.process_batch(
            spark, _docs(spark, [(99, BOILER)]), corpus=corpus,
            batch_id=3)
    # purge the boilerplate group's rep: the surviving member takes
    # over and a future exact dup attaches to it
    st.purge_docs(spark, ["u1\x1fsignup"], purge_batch_id=3)
    nodes = {r["keep_doc_id"] for r in st.read_groups(spark).collect()}
    assert "u1\x1fsignup" not in nodes
    s4 = st.process_batch(
        spark,
        spark.createDataFrame([("u9\x1fsignup", BOILER)],
                              "doc_id string, text string"),
        corpus=corpus.unionByName(spark.createDataFrame(
            [("u9\x1fsignup", BOILER)], "doc_id string, text string")),
        batch_id=4)
    assert s4["n_verified_edges"] == 1
    lookup = st.read_group_of(spark, ["u9\x1fsignup"]).collect()
    assert lookup and lookup[0]["keep_doc_id"] == "u2\x1fsignup"


def test_uncollapsed_index_rejects_string_ids(spark, tmp_path):
    idx = StreamingLshIndex(str(tmp_path / "plain"), num_buckets=8)
    docs = spark.createDataFrame([("a", BOILER)],
                                 "doc_id string, text string")
    with pytest.raises(ValueError, match="collapse_exact"):
        idx.process_batch(spark, docs, batch_id=0)


def test_all_short_first_batch_still_pins_string_kind(spark, tmp_path):
    """Review hardening: an all-short first batch returns before any
    band/sidecar write, but must STILL pin the id kind — the state
    layer has already partitioned its singleton rows by it, and a
    reopened store falling back to the constructor default would
    mis-prune string-keyed lookups."""
    st = StreamingDedupGroups(str(tmp_path / "st"), num_buckets=8)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id string, text string")
    corpus = mk([("a", "hi"), ("b", "hi"),
                 ("c", BOILER), ("d", BOILER)])
    st.process_batch(spark, mk([("a", "hi"), ("b", "hi")]),
                     corpus=corpus, batch_id=0)
    # reopened store (fresh object, constructor default integral)
    st2 = StreamingDedupGroups(str(tmp_path / "st"), num_buckets=8)
    st2.process_batch(spark, mk([("c", BOILER), ("d", BOILER)]),
                      corpus=corpus, batch_id=1)
    assert st2.index.id_kind == "string"
    got = st2.read_group_of(spark, ["d"]).collect()
    assert got and got[0]["keep_doc_id"] == "c"
    assert _keep(st2.read_groups(spark)) == _keep(
        hybrid_dedup_keep(corpus))


def test_exact_skip_respects_strict_threshold(spark, tmp_path):
    """Attach pairs bypass verification (Jaccard 1 by construction) —
    at the STRICTEST valid threshold (1/1) they must still merge while
    near-dup LSH pairs fail verification, exactly like batch hybrid at
    the same threshold."""
    rows = [(1, BOILER), (2, BOILER), (3, NEAR), (4, _uniq(1))]
    corpus = _docs(spark, rows)
    st = StreamingDedupGroups(str(tmp_path / "st"), num_buckets=8,
                              jaccard_num=1, jaccard_den=1)
    for i, chunk in enumerate((rows[:2], rows[2:])):
        st.process_batch(spark, _docs(spark, chunk), corpus=corpus,
                         batch_id=i)
    got = _keep(st.read_groups(spark))
    want = _keep(hybrid_dedup_keep(corpus, threshold_num=1,
                                   threshold_den=1))
    assert got == want
    # the exact-dup pair merged; the near-dup did NOT
    comps = {r["component"]: r["cluster_size"]
             for r in st.read_groups(spark).collect()}
    assert comps[1] == 2 and comps[3] == 1 and comps[4] == 1
