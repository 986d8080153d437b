"""Round-12 directed fixes (ADVICE r11):

* emptied-store reads must not crash schema inference: a tombstone
  wave that purges EVERY ``_vec_part=``/``_ivf_cell=`` partition
  leaves only hidden markers behind — the semantic-sync membership
  probe degrades to "nothing indexed", a scheduled retrain skips, and
  ``read_groups`` reads as empty (the medium finding);
* ``IvfVectorIndex.rebuild`` carries the ``_epochs`` exactly-once
  markers across the sibling swap instead of destroying the documented
  ``ann_marker_retain`` horizon at every retrain boundary;
* the ``blocked_link`` hot-block guard matches blocks in NATIVE types
  (null-safe join), so boolean/float/NULL blocking keys can no longer
  make the |block|² cap silently fail open; the match predicate runs
  the thresholded 3-arg levenshtein with identical surviving pairs;
* NaN embeddings never pair (Spark orders NaN above every double, so
  both the collapse rep expression and the edge filter need explicit
  ``isnan`` guards).
"""

import math
import os

from pyspark.sql import functions as F

from python_cdc_component_spark.operators.llm.annindex import (
    CELL_COL, IvfVectorIndex)
from python_cdc_component_spark.operators.llm.linkage import blocked_link
from python_cdc_component_spark.streaming.semantic_state import (
    StreamingSemanticGroups)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, e array<double>")


def _axis(i, dim=8, v=1.0):
    e = [0.0] * dim
    e[i % dim] = v
    return e


def _corpus(spark):
    rows = [(i, _axis(i % 4)) for i in range(4)]
    rows += [(i, _axis(i % 4, v=1.0 + 0.01 * i)) for i in range(10, 30)]
    return _emb(spark, rows)


# -- emptied-store reads (ADVICE r11, medium) --------------------------

def test_purge_all_then_rebuild_skips_not_crashes(spark, tmp_path):
    """Erasing EVERY vector leaves the index dir with markers only; a
    scheduled retrain must skip (codebook kept) instead of failing
    schema inference over a data-less directory."""
    ix = str(tmp_path / "ix")
    idx = IvfVectorIndex(ix, n_cells=4)
    idx.build(spark, _corpus(spark))
    all_ids = [r["vec_id"] for r in
               _corpus(spark).select("vec_id").collect()]
    assert idx.purge_vectors(spark, all_ids) == len(all_ids)
    # no visible cell partition remains, centroids still present
    assert not any(n.startswith(f"{CELL_COL}=") for n in os.listdir(ix))
    assert os.path.exists(f"{ix}/_centroids.json")
    n_before = idx.n_cells
    assert idx.rebuild(spark) == n_before          # skip, not crash
    assert os.path.exists(f"{ix}/_centroids.json")
    # and a purge against the emptied index is a clean no-op even on
    # the legacy (untrusted-sidecar) full-scan path
    import shutil
    shutil.rmtree(f"{ix}/_vecmap", ignore_errors=True)
    assert idx.purge_vectors(spark, [1, 2]) == 0


def test_semantic_sync_survives_tombstone_drain(spark, tmp_path):
    """The ADVICE scenario verbatim: an epoch that tombstones EVERY
    indexed row empties _vecmap down to its hidden markers — the NEXT
    epoch's membership probe must degrade to 'nothing indexed', not
    crash the stream on schema inference."""
    import json

    from python_cdc_component_spark.streaming.bounded import (
        BoundedStreamConfig, _maintain_semantic_groups)

    def batch(spark, rows, epoch):
        data = [(vid, json.dumps(e) if e is not None else "null",
                 1_000 + epoch, "f", j, e is None, None)
                for j, (vid, e) in enumerate(rows)]
        return spark.createDataFrame(
            data,
            "user_id long, props string, kbc__event_timestamp long, "
            "kbc__file string, kbc__pos long, __deleted boolean, "
            "_snapshot_phase string")

    cfg = BoundedStreamConfig(
        mode="DEDUPE", primary_keys=["user_id"],
        semantic_groups_path=str(tmp_path / "sem"),
        semantic_cells=2, semantic_threshold=0.4, semantic_buckets=4)
    st = StreamingSemanticGroups(str(tmp_path / "sem"), n_cells=2,
                                 threshold=0.4, num_buckets=4)
    _maintain_semantic_groups(
        spark, st, batch(spark, [(i, _axis(i % 4)) for i in range(6)],
                         0), 0, cfg)
    # drain: tombstone every indexed id
    _maintain_semantic_groups(
        spark, st, batch(spark, [(i, None) for i in range(6)], 1),
        1, cfg)
    # post-drain epoch — the probe that used to crash runs here
    _maintain_semantic_groups(
        spark, st, batch(spark, [(50 + i, _axis(i % 4))
                                 for i in range(3)], 2), 2, cfg)
    groups = {r["keep_doc_id"] for r in st.read_groups(spark).collect()}
    # the drained ids are gone; the post-drain inserts are present
    assert groups == {50, 51, 52}, groups


def test_read_groups_after_full_purge_is_empty(spark, tmp_path):
    """Purging every doc leaves labels/node_map dirs with no visible
    partitions — read_groups must return an empty frame, not fail
    schema inference."""
    from python_cdc_component_spark.streaming.dedup_state import (
        StreamingDedupGroups)

    st = StreamingDedupGroups(str(tmp_path / "st"), num_buckets=4)
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " + ("x" if i < 2 else f"y{i}"))
         for i in range(4)], "doc_id long, text string")
    st.process_batch(spark, docs, corpus=docs)
    assert st.read_groups(spark).count() > 0
    st.purge_docs(spark, [0, 1, 2, 3])
    assert st.read_groups(spark).count() == 0
    assert st.vacuum(spark) == 0


# -- _epochs markers survive a retrain swap (ADVICE r11) ---------------

def test_rebuild_preserves_epoch_markers(spark, tmp_path):
    ix = str(tmp_path / "ix")
    idx = IvfVectorIndex(ix, n_cells=4)
    idx.build(spark, _corpus(spark))
    os.makedirs(f"{ix}/_epochs", exist_ok=True)
    for e in (7, 8, 9):
        open(f"{ix}/_epochs/{e}", "w").close()
    idx.rebuild(spark, n_cells=4, iters=1)
    kept = {n for n in os.listdir(f"{ix}/_epochs") if n.isdigit()}
    assert kept == {"7", "8", "9"}
    # and the rebuilt index still serves
    probes = spark.createDataFrame(
        [(0, _axis(0))], "qid long, qe array<double>")
    assert idx.probe(spark, probes, k=3, nprobe=2).count() > 0


def test_scheduled_retrain_keeps_exactly_once_horizon(spark, tmp_path):
    """In-stream form: _maintain_ann_index with ann_retrain_epochs=2 —
    after the epoch-2 retrain, the epoch-0/1/2 markers must survive so
    a checkpoint replay of those epochs stays a no-op."""
    from python_cdc_component_spark.streaming.bounded import (
        BoundedStreamConfig, _maintain_ann_index)

    ix = str(tmp_path / "ann")
    cfg = BoundedStreamConfig(
        ann_index_path=ix, ann_vec_id_col="user_id",
        ann_vec_col="props", ann_index_cells=2, ann_retrain_epochs=2)
    idx = IvfVectorIndex(ix, n_cells=2)
    import json

    def batch(e, ids):
        return spark.createDataFrame(
            [(i, json.dumps(_axis(i % 4)), 1_000 + e, "f", j, False,
              None)
             for j, i in enumerate(ids)],
            "user_id long, props string, kbc__event_timestamp long, "
            "kbc__file string, kbc__pos long, __deleted boolean, "
            "_snapshot_phase string")

    _maintain_ann_index(spark, idx, batch(0, range(4)), 0, cfg)
    _maintain_ann_index(spark, idx, batch(1, range(4, 8)), 1, cfg)
    _maintain_ann_index(spark, idx, batch(2, range(8, 12)), 2, cfg)
    kept = {n for n in os.listdir(f"{ix}/_epochs") if n.isdigit()}
    assert kept == {"0", "1", "2"}
    # replay of the retrain epoch: byte-level no-op
    mt = {p: os.path.getmtime(os.path.join(r, p))
          for r, _, fs in os.walk(ix) for p in fs}
    _maintain_ann_index(spark, idx, batch(2, range(8, 12)), 2, cfg)
    mt2 = {p: os.path.getmtime(os.path.join(r, p))
           for r, _, fs in os.walk(ix) for p in fs}
    assert mt == mt2


# -- blocked_link: native-type hot-block guard + thresholded match -----

def test_hot_block_guard_boolean_and_null_keys(spark):
    """The ADVICE failure modes verbatim: a BOOLEAN hot block (str(v)
    'True' never matched Spark's 'true' under the old stringified map,
    so the guard failed open and the |block|² volume returned) must be
    capped; NULL blocking components never pair AT ALL (the pair join
    is a plain equi-join — NULL ≠ NULL), so a NULL mega-block can't
    blow up by construction."""
    k = 40
    rows = ([(i, True, "Customer#000") for i in range(k)]
            + [(1000 + i, None, "Customer#000") for i in range(k)]
            + [(2000 + i, False, f"Customer#{i:03d}") for i in range(4)])
    df = spark.createDataFrame(rows, "rid long, seg boolean, name string")
    capped = blocked_link(df, ["seg"], "rid", "name", max_dist=2,
                          max_block_size=10)
    # the boolean hot block splits into ≥4 slices: pair volume
    # ≈ s·C(10,2), far under C(40,2) = 780
    hot_pairs = capped.filter("id_a < 1000 and id_b < 1000").count()
    assert 0 < hot_pairs < 300, hot_pairs
    # NULL-keyed rows emit no pairs (equi-join semantics)
    assert capped.filter("id_a >= 1000 and id_b < 2000").count() == 0
    # cold block (4 ≤ cap) complete; no cross-block pairs
    assert capped.filter("id_a >= 2000").count() == 6
    assert capped.filter("id_a < 2000 and id_b >= 2000").count() == 0


def test_hot_block_guard_float_keys(spark):
    """Float blocking keys ('1e-07' vs '1.0E-7' under str/cast) — the
    guard must still see and split the hot block."""
    k = 30
    rows = ([(i, 1e-07, "Customer#000") for i in range(k)]
            + [(500 + i, 2.5, f"Customer#{i:03d}") for i in range(3)])
    df = spark.createDataFrame(rows, "rid long, seg double, name string")
    capped = blocked_link(df, ["seg"], "rid", "name", max_dist=2,
                          max_block_size=8)
    hot_pairs = capped.filter("id_a < 500").count()
    assert 0 < hot_pairs < k * (k - 1) / 4, hot_pairs


def test_thresholded_levenshtein_same_pairs(spark):
    """The 3-arg early-exit levenshtein must emit exactly the plain
    `dist <= max_dist` pair set with identical distances — including
    long strings where the early exit actually fires."""
    long_a = "x" * 500
    rows = [(1, "s", long_a), (2, "s", long_a + "yy"),
            (3, "s", "completely different " + "z" * 480),
            (4, "s", long_a + "y")]
    df = spark.createDataFrame(rows, "rid long, seg string, name string")
    got = {(r["id_a"], r["id_b"], r["dist"])
           for r in blocked_link(df, ["seg"], "rid", "name",
                                 max_dist=2).collect()}
    assert got == {(1, 2, 2), (1, 4, 1), (2, 4, 1)}


# -- NaN embeddings never pair (ADVICE r11) -----------------------------

def test_nan_embeddings_never_pair(spark, tmp_path):
    """A NaN-containing embedding must form no edges (its cosine is
    undefined) and must not be collapsed under a rep — in both collapse
    modes, groups see it as a permanent singleton."""
    nan = float("nan")
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]),       # identical pair
            (3, [nan, 1.0]), (4, [nan, 1.0]),       # identical NaN pair
            (5, [0.0, 0.0])]                        # zero-norm
    for collapse in (True, False):
        st = StreamingSemanticGroups(
            str(tmp_path / f"st_{collapse}"), n_cells=1,
            threshold=0.4, num_buckets=4)
        st.collapse_identical = collapse
        st.process_batch(spark, _emb(spark, rows), batch_id=0)
        got = {(r["keep_doc_id"], r["cluster_size"])
               for r in st.read_groups(spark).collect()}
        assert got == {(1, 2), (3, 1), (4, 1), (5, 1)}, (collapse, got)
