"""CDC-fed semantic groups side state (`_maintain_semantic_groups`)
— the contracts the `cdc_semantic_groups_sync` oracle (insert-only
workload) can't see: UPDATE purge-then-reingest (stale cosine edges
must NOT survive a changed embedding — the insert-only hazard the r10
ADVICE documented, handled here by the 3e purge tier), tombstone
erasure with survivor re-election, crash/replay convergence on the
cdc3 markers, and parity with the direct `process_batch` path for
insert-only batches."""

import json
import os

from pyspark.sql import functions as F

from python_cdc_component_spark.streaming.bounded import (
    BoundedStreamConfig, _maintain_semantic_groups)
from python_cdc_component_spark.streaming.semantic_state import (
    StreamingSemanticGroups)


def _axis(i, dim=8, v=1.0):
    e = [0.0] * dim
    e[i % dim] = v
    return e


def _batch(spark, rows, epoch):
    """rows: [(vec_id, vector-or-None)] — None payload = tombstone."""
    data = [(vid, json.dumps(e) if e is not None else "null",
             1_000 + epoch, "f", j, e is None, None)
            for j, (vid, e) in enumerate(rows)]
    return spark.createDataFrame(
        data,
        "user_id long, props string, kbc__event_timestamp long, "
        "kbc__file string, kbc__pos long, __deleted boolean, "
        "_snapshot_phase string")


def _cfg(tmp_path):
    return BoundedStreamConfig(
        mode="DEDUPE", primary_keys=["user_id"],
        semantic_groups_path=str(tmp_path / "sem"),
        semantic_cells=4, semantic_threshold=0.9, semantic_buckets=8)


def _st(cfg):
    return StreamingSemanticGroups(cfg.semantic_groups_path, n_cells=4,
                                   threshold=0.9, num_buckets=8)


def _groups(spark, st):
    return {(r["component"], r["keep_doc_id"], r["cluster_size"])
            for r in st.read_groups(spark).collect()}


SEEDS = [(i, _axis(i)) for i in range(4)]


def test_update_drops_stale_edges(spark, tmp_path):
    """vec 10 starts near axis 0 (groups with 0), then UPDATES to
    axis 2: the old cosine edge must not keep it in 0's component —
    it must re-group with the axis-2 family."""
    cfg = _cfg(tmp_path)
    st = _st(cfg)
    _maintain_semantic_groups(
        spark, st, _batch(spark, SEEDS + [(10, _axis(0, v=1.1)),
                                          (20, _axis(2, v=1.1))], 0),
        0, cfg)
    got = _groups(spark, st)
    assert any(c == 0 and s == 2 for c, _, s in got), got
    # update: 10 moves to axis 2
    _maintain_semantic_groups(
        spark, st, _batch(spark, [(10, _axis(2, v=1.2))], 1), 1, cfg)
    got = _groups(spark, st)
    assert any(c == 2 and s == 3 for c, _, s in got), got   # {2,10,20}
    assert any(c == 0 and s == 1 for c, _, s in got), got   # 0 alone
    left = {r["vec_id"] for r in spark.read.parquet(
        f"{cfg.semantic_groups_path}/vectors").select("vec_id").collect()}
    assert 10 in left and len([v for v in left if v == 10]) == 1


def test_tombstone_purges_and_reelects(spark, tmp_path):
    """Deleting the component's min-id member re-elects the surviving
    min and unindexes the vector."""
    cfg = _cfg(tmp_path)
    st = _st(cfg)
    _maintain_semantic_groups(
        spark, st, _batch(spark, SEEDS + [(10, _axis(0, v=1.1)),
                                          (11, _axis(0, v=1.2))], 0),
        0, cfg)
    assert any(c == 0 and s == 3 for c, _, s in _groups(spark, st))
    _maintain_semantic_groups(
        spark, st, _batch(spark, [(0, None)], 1), 1, cfg)
    got = _groups(spark, st)
    assert any(c == 10 and s == 2 for c, _, s in got), got
    assert all(c != 0 for c, _, s in got)
    left = {r["vec_id"] for r in spark.read.parquet(
        f"{cfg.semantic_groups_path}/vectors").select("vec_id").collect()}
    assert 0 not in left


def test_replay_and_crash_convergence(spark, tmp_path):
    cfg = _cfg(tmp_path)
    st = _st(cfg)
    b0 = _batch(spark, SEEDS + [(10, _axis(0, v=1.1))], 0)
    b1 = _batch(spark, [(11, _axis(0, v=1.2)), (20, _axis(2, v=1.1))], 1)
    _maintain_semantic_groups(spark, st, b0, 0, cfg)
    _maintain_semantic_groups(spark, st, b1, 1, cfg)
    clean = _groups(spark, st)
    assert any(c == 0 and s == 3 for c, _, s in clean)

    def state_bytes():
        out = {}
        for root, _, files in os.walk(cfg.semantic_groups_path):
            for f in files:
                p = os.path.join(root, f)
                out[p] = (os.path.getsize(p), os.path.getmtime(p))
        return out

    # marked-epoch replay: byte-identical no-op
    before = state_bytes()
    _maintain_semantic_groups(spark, st, b1, 1, cfg)
    assert state_bytes() == before
    # crash window: epoch-1 ingest marker lost AND a half-append of
    # its vectors present — the replay purges and re-adds, converging
    os.remove(f"{cfg.semantic_groups_path}/groups/_batches/4")
    st.index.add_batch(spark, spark.createDataFrame(
        [(20, _axis(2, v=1.1))], "vec_id long, e array<double>"))
    _maintain_semantic_groups(spark, st, b1, 1, cfg)
    assert _groups(spark, st) == clean
    vecs = [r["vec_id"] for r in spark.read.parquet(
        f"{cfg.semantic_groups_path}/vectors").select("vec_id").collect()]
    assert sorted(vecs) == sorted(set(vecs)), "duplicate vector rows"


def test_insert_only_parity_with_direct_process_batch(spark, tmp_path):
    cfg = _cfg(tmp_path)
    st = _st(cfg)
    rows = SEEDS + [(10, _axis(0, v=1.1)), (11, _axis(0, v=1.2)),
                    (20, _axis(2, v=1.1)), (30, _axis(1, v=1.0))]
    _maintain_semantic_groups(spark, st, _batch(spark, rows[:6], 0),
                              0, cfg)
    _maintain_semantic_groups(spark, st, _batch(spark, rows[6:], 1),
                              1, cfg)
    direct = StreamingSemanticGroups(str(tmp_path / "direct"),
                                     n_cells=4, threshold=0.9,
                                     num_buckets=8)

    def vecs(rr):
        return spark.createDataFrame(rr, "vec_id long, e array<double>")

    direct.process_batch(spark, vecs(rows[:6]), batch_id=0)
    direct.process_batch(spark, vecs(rows[6:]), batch_id=1)
    assert _groups(spark, st) == _groups(spark, direct)


def test_empty_batch_marks_and_replay_skips(spark, tmp_path):
    """An empty epoch marks its ingest tier and returns (the
    ann/lexical convention, VERDICT r12 cosmetic): the replay skips at
    the marker probe, the tier mode is pinned, and later real epochs
    proceed normally."""
    cfg = _cfg(tmp_path)
    st = _st(cfg)
    empty = _batch(spark, [], 0).limit(0)
    _maintain_semantic_groups(spark, st, empty, 0, cfg)
    marker = os.path.join(st.groups._manifest_path, "1")
    assert os.path.exists(marker)
    mode_path = st.groups._tier_mode_path
    with open(mode_path) as fh:
        assert fh.read() == "cdc3"
    mt = os.path.getmtime(marker)
    # marked replay: skips before any job (marker untouched)
    _maintain_semantic_groups(spark, st, empty, 0, cfg)
    assert os.path.getmtime(marker) == mt
    # a later real epoch proceeds on the pinned scheme
    _maintain_semantic_groups(spark, st, _batch(spark, SEEDS, 1), 1,
                              cfg)
    assert len(_groups(spark, st)) == 4


def test_membership_bloom_parity_and_replay(spark, tmp_path):
    """Opt-in maintained membership bloom (r13): identical groups
    through insert/update/tombstone epochs vs the sidecar-scan probe,
    the bloom file exists and is maintained, and an unmarked-epoch
    replay converges (bloom re-union is idempotent)."""
    cfg_scan = _cfg(tmp_path / "scan")
    cfg_bloom = BoundedStreamConfig(
        mode="DEDUPE", primary_keys=["user_id"],
        semantic_groups_path=str(tmp_path / "bloom" / "sem"),
        semantic_cells=4, semantic_threshold=0.9, semantic_buckets=8,
        semantic_membership_bloom=True, semantic_bloom_words=1024)
    st_scan, st_bloom = _st(cfg_scan), _st(cfg_bloom)
    waves = [
        SEEDS,                                   # epoch 0: inserts
        [(10, _axis(0))],                        # epoch 1: near 0
        [(10, _axis(1)), (20, _axis(2))],        # epoch 2: update+new
        [(0, None), (20, None)],                 # epoch 3: tombstones
    ]
    for st, cfg in ((st_scan, cfg_scan), (st_bloom, cfg_bloom)):
        for e, rows in enumerate(waves):
            _maintain_semantic_groups(spark, st, _batch(spark, rows, e),
                                      e, cfg)
    assert _groups(spark, st_scan) == _groups(spark, st_bloom)
    bloom_path = os.path.join(cfg_bloom.semantic_groups_path, "_bloom")
    assert os.path.exists(bloom_path)
    want = _groups(spark, st_bloom)
    # crashed-epoch replay with the bloom on: delete the last ingest
    # marker and re-run — purge-then-add + bloom re-union converge
    os.remove(os.path.join(st_bloom.groups._manifest_path,
                           str(3 * 3 + 1)))
    _maintain_semantic_groups(spark, st_bloom,
                              _batch(spark, waves[3], 3), 3, cfg_bloom)
    assert _groups(spark, st_bloom) == want
