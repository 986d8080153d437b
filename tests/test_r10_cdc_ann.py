"""CDC sync × ANN serving index (round-10 continuation): a
DEDUPE-mode table whose payload carries vectors (JSON array strings in
`props`) maintains an `IvfVectorIndex` as side state of
``bounded_sync``. The insert-only end-to-end parity is oracled by the
`cdc_ann_index_sync` query; these tests pin the CDC semantics the
oracle can't see:

* UPDATE re-indexes the new vector under the STORED centroids and the
  old version never surfaces; a tombstone erases the vector;
* exactly-once: a marked epoch's replay is a no-op; a crashed
  half-append (cell rows and/or sidecar rows without the marker)
  converges to the clean-run state on replay — purge-then-add with
  the sidecar written before the cells makes the partial rows
  discoverable and reversible;
* the fused fleet path rejects the per-table config loudly.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from python_cdc_component_spark.operators.llm.annindex import (
    IvfVectorIndex)
from python_cdc_component_spark.streaming.bounded import (
    BoundedStreamConfig, bounded_sync, bounded_sync_multi_fused)

EV_SCHEMA = ("event_id long, ts long, user_id long, "
             "event_type string, value double, props string")


def _vec(i, dim=8, v=1.0):
    e = [0.0] * dim
    e[i % dim] = v
    return e


def _write_events(spark, rows, path):
    """rows: (event_id, user_id, event_type, vector-list)."""
    df = spark.createDataFrame(
        [(eid, eid * 1_000_000, uid, et, 0.0, json.dumps(vec))
         for (eid, uid, et, vec) in rows], EV_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(path)


def _stage(src, *file_dirs):
    import glob
    import shutil
    import time
    os.makedirs(src, exist_ok=True)
    n = len(os.listdir(src))
    base = int(time.time()) - 3600
    for d in file_dirs:
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            dst = os.path.join(src, f"part-{n}.parquet")
            shutil.copy(f, dst)
            # force the wave drain order: FileStreamSource sorts by
            # modification time and same-second copies tie
            os.utime(dst, (base + n, base + n))
            n += 1


def _cfg(work, mode="DEDUPE", **kw):
    return BoundedStreamConfig(
        mode=mode, primary_keys=["user_id"],
        ann_index_path=os.path.join(work, "ann"), ann_index_cells=4,
        max_wait_s=5.0, **kw)


def _envelope(spark, rows):
    """The sink-visible micro-batch frame for rows of
    (event_id, user_id, event_type, vector-list) — exactly the columns
    _maintain_ann_index consumes (payload + CDC order/tombstone
    system columns)."""
    from python_cdc_component_spark.model.envelope import (
        SYSTEM_COLUMNS as SC)
    raw = spark.createDataFrame(
        [(eid, eid * 1_000_000, uid, et, 0.0, json.dumps(vec))
         for (eid, uid, et, vec) in rows], EV_SCHEMA)
    return raw.select(
        "user_id", "props",
        F.col("ts").alias(SC.event_timestamp),
        F.lit("binlog.000001").alias(SC.file),
        F.col("event_id").alias(SC.pos),
        (F.col("event_type") == "error").alias(SC.deleted),
        F.lit(False).alias("_snapshot_phase"))


def _probe_ids(spark, idx, qe, **kw):
    probes = spark.createDataFrame([(100, qe)],
                                   "qid long, qe array<double>")
    return [(r["cid"], r["sim"])
            for r in idx.probe(spark, probes, **kw)
            .orderBy(F.col("sim").desc(), "cid").collect()]


def test_cdc_update_and_tombstone_semantics(spark, tmp_path):
    work = str(tmp_path)
    # wave 1: inserts 0..7 (centroids = 4 smallest live = 0..3)
    _write_events(spark, [(i + 1, i, "signup", _vec(i))
                          for i in range(8)], f"{work}/w1")
    # wave 2: vec 5 MOVES from axis 5 to axis 1 (update); vec 6 dies
    _write_events(spark, [(101, 5, "page", _vec(1, v=0.9)),
                          (102, 6, "error", _vec(6))], f"{work}/w2")
    _stage(f"{work}/src", f"{work}/w1", f"{work}/w2")
    cfg = _cfg(work, max_files_per_trigger=1)
    bounded_sync(spark, f"{work}/src", f"{work}/state",
                 f"{work}/ckpt", cfg)
    idx = IvfVectorIndex(f"{work}/ann", n_cells=4)
    # index content == current live state
    left = {r["vec_id"] for r in
            spark.read.parquet(f"{work}/ann").select("vec_id").collect()}
    assert left == {0, 1, 2, 3, 4, 5, 7}
    # the codebook did NOT move on update (serving contract)
    with open(f"{work}/ann/_centroids.json") as fh:
        assert json.load(fh) == [_vec(i) for i in range(4)]
    # vec 5's NEW position ranks it against axis-1 queries...
    got = _probe_ids(spark, idx, _vec(1), k=3, nprobe=1)
    assert got and got[0][0] == 1 and 5 in {c for c, _ in got}
    # ...and its OLD axis-5 position is gone; the tombstoned 6 never
    # surfaces even probing every cell
    full = _probe_ids(spark, idx, _vec(5), k=10, nprobe=4)
    assert 6 not in {c for c, _ in full}
    old_sim = [s for c, s in full if c == 5]
    assert not old_sim or all(s < 0.5 for s in old_sim)


def test_cdc_replay_and_half_append_converge(spark, tmp_path):
    from python_cdc_component_spark.streaming.bounded import (
        _maintain_ann_index)
    work = str(tmp_path)
    _write_events(spark, [(i + 1, i, "signup", _vec(i))
                          for i in range(8)], f"{work}/w1")
    _write_events(spark, [(101, 8, "signup", _vec(0, v=1.1)),
                          (102, 9, "signup", _vec(1, v=1.1))],
                  f"{work}/w2")
    _stage(f"{work}/src", f"{work}/w1", f"{work}/w2")
    cfg = _cfg(work, max_files_per_trigger=1)
    bounded_sync(spark, f"{work}/src", f"{work}/state",
                 f"{work}/ckpt", cfg)
    idx = IvfVectorIndex(f"{work}/ann", n_cells=4)

    def content():
        return sorted((r["vec_id"], tuple(r["e"]))
                      for r in spark.read.parquet(f"{work}/ann")
                      .select("vec_id", "e").collect())

    clean = content()
    assert {v for v, _ in clean} == set(range(10)) and len(clean) == 10
    batch2 = _envelope(spark, [(101, 8, "signup", _vec(0, v=1.1)),
                               (102, 9, "signup", _vec(1, v=1.1))])
    # marked-epoch replay: a strict no-op (file bytes untouched)
    def bytes_of():
        out = {}
        for root, _, files in os.walk(f"{work}/ann"):
            for f in files:
                p = os.path.join(root, f)
                out[p] = (os.path.getsize(p), os.path.getmtime(p))
        return out
    before = bytes_of()
    _maintain_ann_index(spark, idx, batch2, 1, cfg)
    assert bytes_of() == before
    # crashed half-append: epoch-1 marker lost AND a duplicate partial
    # append of its rows present — the replay purges the partials and
    # re-indexes, converging to the clean content
    os.remove(f"{work}/ann/_epochs/1")
    idx.add_batch(spark, spark.createDataFrame(
        [(8, _vec(0, v=1.1))], "vec_id long, e array<double>"))
    assert len(content()) == len(clean) + 1      # duplicate row present
    _maintain_ann_index(spark, idx, batch2, 1, cfg)
    assert content() == clean
    assert os.path.exists(f"{work}/ann/_epochs/1")


def test_ann_index_requires_dedupe(spark, tmp_path):
    """APPEND mode rejects the ANN side state on BOTH paths (per-table
    and fused — since r13 the fused fleet composes a DEDUPE-mode ANN
    config instead of rejecting it; parity is pinned in
    tests/test_r13_side_epoch.py)."""
    work = str(tmp_path)
    with pytest.raises(ValueError, match="requires DEDUPE"):
        bounded_sync(spark, f"{work}/src", f"{work}/state",
                     f"{work}/ckpt",
                     _cfg(work, mode="APPEND"))
    _write_events(spark, [(1, 1, "signup", _vec(1))], f"{work}/w1")
    with pytest.raises(ValueError, match="requires DEDUPE"):
        bounded_sync_multi_fused(
            spark, {"t": f"{work}/w1"}, f"{work}/out",
            f"{work}/ckpt2", {"t": _cfg(work, mode="APPEND")})
