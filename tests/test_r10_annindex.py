"""Round-10 continuation: IVF serving-index lifecycle — GDPR erasure
(`purge_vectors`, vecmap-pruned), filtered probes (`where=`), and cell
compaction — the `StreamingLshIndex` disciplines applied to the vector
index. The erasure semantics themselves are oracled end-to-end by
`ann_index_forget_probe`; these tests pin the I/O and crash contracts
the oracle can't see.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from python_cdc_component_spark.operators.llm.annindex import (
    CELL_COL, VEC_PART_COL, IvfVectorIndex)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, e array<double>")


def _axis(i, dim=8, v=1.0):
    e = [0.0] * dim
    e[i % dim] = v
    return e


def _corpus(spark):
    """4 well-separated cells (centroids = vecs 0..3 on distinct
    axes); vecs 10..29 spread round-robin over the 4 cells with small
    same-axis perturbations (cell assignment unambiguous)."""
    rows = [(i, _axis(i % 4)) for i in range(4)]
    rows += [(i, _axis(i % 4, v=1.0 + 0.01 * i)) for i in range(10, 30)]
    return _emb(spark, rows)


def _bytes_of(path):
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            out[os.path.relpath(p, path)] = (os.path.getsize(p),
                                             os.path.getmtime(p))
    return out


def _probe_set(spark, idx, qid_vecs, **kw):
    probes = spark.createDataFrame(qid_vecs,
                                   "qid long, qe array<double>")
    return {(r["qid"], r["cid"], r["sim"])
            for r in idx.probe(spark, probes, **kw).collect()}


def test_purge_prunes_cells_and_preserves_survivors(spark, tmp_path):
    idx = IvfVectorIndex(str(tmp_path / "ix"), n_cells=4)
    idx.build(spark, _corpus(spark))
    before = _probe_set(spark, idx, [(100, _axis(1))], k=3)
    # victims all live in cell 2 (vec_id % 4 == 2)
    victims = [14, 18, 22]
    untouched = {c: _bytes_of(str(tmp_path / "ix" / f"{CELL_COL}={c}"))
                 for c in (0, 1, 3)}
    assert idx.purge_vectors(spark, victims) == 3
    # only the victims' cell was rewritten
    for c, b in untouched.items():
        assert _bytes_of(str(tmp_path / "ix" / f"{CELL_COL}={c}")) == b, \
            f"cell {c} held no victims but was rewritten"
    left = spark.read.parquet(str(tmp_path / "ix"))
    assert {r["vec_id"] for r in left.select("vec_id").collect()} \
        .isdisjoint(victims)
    # survivors' probe results untouched (query axis 1 ∉ victim cell)
    assert _probe_set(spark, idx, [(100, _axis(1))], k=3) == before
    # victims never surface even when probing their own cell
    got = _probe_set(spark, idx, [(101, _axis(2))], k=10, nprobe=4)
    assert {c for _, c, _ in got}.isdisjoint(victims)
    # idempotent
    assert idx.purge_vectors(spark, victims) == 0


def test_purge_cell_death_deletes_directory(spark, tmp_path):
    idx = IvfVectorIndex(str(tmp_path / "ix"), n_cells=4)
    idx.build(spark, _corpus(spark))
    cell3 = [3] + [i for i in range(10, 30) if i % 4 == 3]
    assert idx.purge_vectors(spark, cell3) == len(cell3)
    assert not os.path.exists(str(tmp_path / "ix" / f"{CELL_COL}=3"))
    # probing the dead cell degrades gracefully (no rows, no error)
    assert _probe_set(spark, idx, [(100, _axis(3))], k=3, nprobe=1) \
        == set()
    # sidecar agrees: no vecmap row points at the dead cell
    vm = spark.read.parquet(str(tmp_path / "ix" / "_vecmap"))
    assert vm.filter(F.col("cell") == 3).count() == 0


def test_purge_legacy_index_full_scan_fallback(spark, tmp_path):
    idx = IvfVectorIndex(str(tmp_path / "ix"), n_cells=4)
    idx.build(spark, _corpus(spark))
    shutil.rmtree(str(tmp_path / "ix" / "_vecmap"))   # pre-sidecar index
    assert idx.purge_vectors(spark, [14, 18]) == 2
    left = spark.read.parquet(str(tmp_path / "ix"))
    assert left.filter(F.col("vec_id").isin([14, 18])).count() == 0


def test_purge_retry_after_crash_between_cells_and_sidecar(spark,
                                                           tmp_path):
    """Crash window: cells rewritten, sidecar hygiene not yet run.
    Emulated by restoring the pre-purge sidecar after a completed
    purge; the retry re-derives victims from the stale sidecar, finds
    the cells already clean, and converges (sidecar cleaned, 0 rows
    re-erased)."""
    ix = str(tmp_path / "ix")
    idx = IvfVectorIndex(ix, n_cells=4)
    idx.build(spark, _corpus(spark))
    shutil.copytree(f"{ix}/_vecmap", str(tmp_path / "vm_saved"))
    assert idx.purge_vectors(spark, [14, 18, 22]) == 3
    shutil.rmtree(f"{ix}/_vecmap")
    shutil.copytree(str(tmp_path / "vm_saved"), f"{ix}/_vecmap")
    assert idx.purge_vectors(spark, [14, 18, 22]) == 0   # retry
    vm = spark.read.parquet(f"{ix}/_vecmap")
    assert vm.filter(F.col("vec_id").isin([14, 18, 22])).count() == 0
    got = _probe_set(spark, idx, [(101, _axis(2))], k=10, nprobe=4)
    assert {c for _, c, _ in got}.isdisjoint({14, 18, 22})


def test_filtered_probe_equals_prefiltered_build(spark, tmp_path):
    """probe(where=P) over the full index ≡ an index built from the
    P-filtered corpus under the SAME centroids — filtering candidates
    commutes with scoring, never with quantization."""
    meta = _corpus(spark).withColumn(
        "label", (F.col("vec_id") % 3).cast("int"))
    cents = [r["e"] for r in
             meta.filter("vec_id < 4").orderBy("vec_id")
                 .select("e").collect()]
    full = IvfVectorIndex(str(tmp_path / "full"), n_cells=4)
    full.build(spark, meta, centroids=cents)
    pre = IvfVectorIndex(str(tmp_path / "pre"), n_cells=4)
    pre.build(spark, meta.filter("label = 1"), centroids=cents)
    qs = [(100, _axis(1)), (101, _axis(2))]
    got = _probe_set(spark, full, qs, k=4, nprobe=2, where="label = 1")
    want = _probe_set(spark, pre, qs, k=4, nprobe=2)
    assert got == want and got
    # and the predicate actually held
    labels = {r["vec_id"]: r["label"]
              for r in meta.select("vec_id", "label").collect()}
    assert all(labels[c] == 1 for _, c, _ in got)


def test_add_batch_maintains_sidecar_and_purges(spark, tmp_path):
    idx = IvfVectorIndex(str(tmp_path / "ix"), n_cells=4)
    idx.build(spark, _corpus(spark))
    assert idx.add_batch(spark, _emb(
        spark, [(40, _axis(0, v=1.2)), (41, _axis(1, v=1.2))])) == 2
    # the appended vectors are probe-visible, then erasable by sidecar
    got = _probe_set(spark, idx, [(100, _axis(0))], k=10, nprobe=1)
    assert 40 in {c for _, c, _ in got}
    assert idx.purge_vectors(spark, [40]) == 1
    got = _probe_set(spark, idx, [(100, _axis(0))], k=10, nprobe=1)
    assert 40 not in {c for _, c, _ in got}
    assert 41 in {c for _, c, _ in _probe_set(
        spark, idx, [(100, _axis(1))], k=10, nprobe=1)}


def test_compact_cells_folds_append_files(spark, tmp_path):
    from python_cdc_component_spark.fs import fs_file_count
    ix = str(tmp_path / "ix")
    idx = IvfVectorIndex(ix, n_cells=4)
    idx.build(spark, _corpus(spark))
    for b in range(4):
        idx.add_batch(spark, _emb(
            spark, [(50 + 2 * b, _axis(0, v=1.3 + 0.01 * b)),
                    (51 + 2 * b, _axis(1, v=1.3 + 0.01 * b))]))
    before = _probe_set(spark, idx, [(100, _axis(0)), (101, _axis(1))],
                        k=8, nprobe=1)
    assert fs_file_count(spark, f"{ix}/{CELL_COL}=0") == 5
    assert idx.compact_cells(spark, file_threshold=2) == 2  # cells 0,1
    assert fs_file_count(spark, f"{ix}/{CELL_COL}=0") == 1
    assert fs_file_count(spark, f"{ix}/{CELL_COL}=1") == 1
    # untouched cells keep their single build file; results identical
    assert fs_file_count(spark, f"{ix}/{CELL_COL}=2") == 1
    assert _probe_set(spark, idx, [(100, _axis(0)), (101, _axis(1))],
                      k=8, nprobe=1) == before
    assert idx.compact_cells(spark, file_threshold=2) == 0


def test_purge_equals_survivor_rebuild_property(spark, tmp_path):
    """Invariant, drawn over victim sets: purging S from an index
    equals building a fresh index over the survivors under the SAME
    codebook — same (vec_id, cell) content, same probe results.
    Covers multi-cell victims, whole-cell death, repeated purges, and
    purging ids that were never indexed."""
    import random
    rnd = random.Random(20260816)
    rows = [(i, _axis(i % 4)) for i in range(4)] \
        + [(i, _axis(i % 4, v=1.0 + 0.003 * i)) for i in range(10, 60)]
    all_ids = [i for i, _ in rows]
    emb = _emb(spark, rows)
    cents = [r["e"] for r in
             emb.filter("vec_id < 4").orderBy("vec_id")
                .select("e").collect()]

    def contents(path):
        return sorted((r["vec_id"], r[CELL_COL]) for r in
                      spark.read.parquet(path)
                      .select("vec_id", CELL_COL).collect())

    for draw in range(3):
        k = rnd.choice([3, 17, len(all_ids) - 2])
        victims = rnd.sample(all_ids, k) + [999, 1000]  # + never-indexed
        ix = str(tmp_path / f"ix{draw}")
        rb = str(tmp_path / f"rb{draw}")
        idx = IvfVectorIndex(ix, n_cells=4)
        idx.build(spark, emb, centroids=cents)
        assert idx.purge_vectors(spark, victims) == k
        ref = IvfVectorIndex(rb, n_cells=4)
        ref.build(spark, emb.filter(~F.col("vec_id").isin(victims)),
                  centroids=cents)
        assert contents(ix) == contents(rb), f"draw {draw} diverged"
        qs = [(100, _axis(0)), (101, _axis(2))]
        assert _probe_set(spark, idx, qs, k=6, nprobe=2) \
            == _probe_set(spark, ref, qs, k=6, nprobe=2)
        # second purge of the same set: no-op
        assert idx.purge_vectors(spark, victims) == 0
        assert contents(ix) == contents(rb)
