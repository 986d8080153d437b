"""Round-7 erasure-completeness contracts (ADVICE r6, medium): a
mixed-era LSH index — built before the _docmap sidecar existed, then
continued with sidecar-writing code — has a PARTIAL sidecar; trusting
it for purge bucket-resolution silently leaves pre-sidecar rows alive.
The meta's docmap_complete flag gates the pruned path; incomplete
indexes take the full anti-join scan, which doubles as the one-time
sidecar migration."""

import json
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from python_cdc_component_spark.streaming.lsh_index import (
    DOC_PART_COL, StreamingLshIndex)


def _docs(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))


def _index_doc_ids(spark, idx):
    from python_cdc_component_spark.streaming.lsh_index import BUCKET_COL
    bucket_paths = [os.path.join(idx.index_path, d)
                    for d in os.listdir(idx.index_path)
                    if d.startswith(f"{BUCKET_COL}=")]
    return {r[0] for r in
            (spark.read.option("basePath", idx.index_path)
             .parquet(*bucket_paths).select("doc_id")
             .distinct().collect())}


def _make_mixed_era_index(spark, docs, work):
    """Index whose first half predates the sidecar: ingest half,
    strip the sidecar and rewrite the meta in its r6 (flag-less)
    form, then ingest the second half with current code — the
    sidecar now covers only the second half."""
    path = os.path.join(work, "idx")
    idx = StreamingLshIndex(path, num_buckets=16)
    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    cut = ids[len(ids) // 2]
    idx.process_batch(spark, docs.filter(F.col("doc_id") < cut))
    shutil.rmtree(idx._docmap_path)
    with open(idx._meta_path, "w") as fh:
        json.dump({"num_buckets": 16}, fh)       # r6 meta: no flag
    crc = os.path.join(path, "._meta.json.crc")  # r6 wrote meta with
    if os.path.exists(crc):                      # plain open(): no crc
        os.remove(crc)
    idx.process_batch(spark, docs.filter(F.col("doc_id") >= cut))
    # the meta write in process_batch only fires when absent, so the
    # flag-less form survives — the mixed-era state under test
    with open(idx._meta_path) as fh:
        assert "docmap_complete" not in json.load(fh)
    return idx, cut


def test_mixed_era_purge_erases_pre_sidecar_docs(spark, sf_dir):
    """Victims ingested BEFORE the sidecar existed must still be
    erased: the partial sidecar has no row for them, so only the
    docmap_complete gate (falling back to the full scan) makes the
    purge complete."""
    docs = _docs(spark, sf_dir).limit(120)
    work = tempfile.mkdtemp(prefix="lsh_r7_")
    try:
        idx, cut = _make_mixed_era_index(spark, docs, work)
        pre = _index_doc_ids(spark, idx)
        # victims from the PRE-sidecar era (absent from the sidecar)
        victims = sorted(i for i in pre if i < cut)[:5]
        assert victims
        idx.purge_docs(spark, victims)
        post = _index_doc_ids(spark, idx)
        assert post == pre - set(victims), \
            "pre-sidecar rows survived the purge (silent partial erasure)"
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_mixed_era_purge_migrates_sidecar(spark, sf_dir):
    """The full-scan fallback rebuilds the sidecar from the index and
    stamps docmap_complete — the NEXT purge resolves buckets from the
    sidecar alone (proven by corrupting the docmap partitions of
    non-victim docs: a full scan would die on them)."""
    docs = _docs(spark, sf_dir).limit(120)
    work = tempfile.mkdtemp(prefix="lsh_r7_")
    try:
        idx, cut = _make_mixed_era_index(spark, docs, work)
        all_ids = _index_doc_ids(spark, idx)
        first_victims = sorted(i for i in all_ids if i < cut)[:3]
        idx.purge_docs(spark, first_victims)
        with open(idx._meta_path) as fh:
            meta = json.load(fh)
        assert meta["docmap_complete"] is True
        # sidecar now covers BOTH eras
        sidecar_ids = {r[0] for r in
                       (spark.read.parquet(idx._docmap_path)
                        .select("doc_id").distinct().collect())}
        assert sidecar_ids == all_ids - set(first_victims)
        # second purge: pick a victim, corrupt every OTHER docmap
        # partition — pruned resolution never opens them
        survivors = sorted(all_ids - set(first_victims))
        victim = survivors[0]
        vpart = victim % idx.num_buckets
        for d in os.listdir(idx._docmap_path):
            if (d.startswith(f"{DOC_PART_COL}=")
                    and d != f"{DOC_PART_COL}={vpart}"):
                pdir = os.path.join(idx._docmap_path, d)
                for f in os.listdir(pdir):
                    if f.endswith(".parquet"):
                        with open(os.path.join(pdir, f), "wb") as fh:
                            fh.write(b"garbage")
        idx.purge_docs(spark, [victim])
        assert victim not in _index_doc_ids(spark, idx)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_complete_sidecar_absent_victims_purge_is_noop(spark, sf_dir):
    """A COMPLETE sidecar with no victim partitions proves the victims
    were never indexed: purge returns 0 without scanning the index."""
    docs = _docs(spark, sf_dir).limit(60)
    work = tempfile.mkdtemp(prefix="lsh_r7_")
    try:
        idx = StreamingLshIndex(os.path.join(work, "idx"),
                                num_buckets=16)
        idx.process_batch(spark, docs)
        top = max(_index_doc_ids(spark, idx))
        # never-indexed ids hashing to partitions with no files
        ghosts = [top + 10_000_000 + k * 16 + 7 for k in range(3)
                  if not os.path.exists(os.path.join(
                      idx._docmap_path, f"{DOC_PART_COL}={7}"))]
        # fall back to any id whose partition dir is absent; if every
        # partition exists the pruned read must still find nothing
        missing = [top + 999_999_937]
        assert idx.purge_docs(spark, missing) == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_mixed_era_purge_crash_after_stamp_retries_complete(
        spark, sf_dir, monkeypatch):
    """ADVICE r7 (medium): the migration stamp must be retry-safe. A
    crash between the docmap rebuild+stamp and the index bucket
    rewrite retries down the PRUNED path — the rebuilt sidecar now
    INCLUDES the victims (their rows are still indexed at stamp time),
    so the retry finds their entries and completes the erasure. The
    old exclude-victims-then-stamp order made such a retry return 0
    with the victims' rows still in the index."""
    import pytest
    docs = _docs(spark, sf_dir).limit(120)
    work = tempfile.mkdtemp(prefix="lsh_r8_")
    try:
        idx, cut = _make_mixed_era_index(spark, docs, work)
        pre = _index_doc_ids(spark, idx)
        victims = sorted(i for i in pre if i < cut)[:4]
        assert victims
        real = StreamingLshIndex._rebuild_docmap

        def boom(self, spark_, full_index):
            real(self, spark_, full_index)
            raise RuntimeError("crash after docmap stamp")

        monkeypatch.setattr(StreamingLshIndex, "_rebuild_docmap", boom)
        with pytest.raises(RuntimeError, match="crash after"):
            idx.purge_docs(spark, victims)
        monkeypatch.undo()
        with open(idx._meta_path) as fh:
            assert json.load(fh)["docmap_complete"] is True
        # victims' band rows are still indexed; the retry must erase
        # them through the pruned path (n buckets rewritten > 0)
        assert set(victims) <= _index_doc_ids(spark, idx)
        assert idx.purge_docs(spark, victims) > 0
        assert _index_doc_ids(spark, idx) == pre - set(victims)
        sidecar_ids = {r[0] for r in
                       (spark.read.parquet(idx._docmap_path)
                        .select("doc_id").distinct().collect())}
        assert not (set(victims) & sidecar_ids)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_hyperplane_lsh_empty_corpus_returns_empty(spark):
    """ADVICE r6: an empty corpus returns an empty pair set, not a
    TypeError from first()[0]."""
    from python_cdc_component_spark.operators.llm.simjoin import (
        hyperplane_lsh_pairs)
    empty = spark.createDataFrame([], "vec_id long, e array<double>")
    out = hyperplane_lsh_pairs(empty, bits_per_band=4)
    assert out.columns == ["vec_a", "vec_b", "sim"]
    assert out.count() == 0


def test_migrate_docmap_heals_at_least_once_gap(spark, sf_dir):
    """At-least-once operation (no batch_id) with a crash between the
    band append and the sidecar write leaves index rows the sidecar
    misses — there is no replay to heal them, so purge under a
    complete-stamped meta would silently skip those docs.
    migrate_docmap rebuilds the sidecar from the index and the next
    purge is both complete AND pruned."""
    docs = _docs(spark, sf_dir).limit(80)
    work = tempfile.mkdtemp(prefix="lsh_r7_mig_")
    try:
        idx = StreamingLshIndex(os.path.join(work, "idx"),
                                num_buckets=16)
        ids = sorted(r[0] for r in docs.select("doc_id").collect())
        cut = ids[len(ids) // 2]
        idx.process_batch(spark, docs.filter(F.col("doc_id") < cut))
        # simulate the crash: second batch's bands land, sidecar write
        # "lost" (delete the docmap rows the second batch added)
        before = set(os.listdir(idx._docmap_path))
        snapshot = {}
        for d in before:
            p = os.path.join(idx._docmap_path, d)
            if os.path.isdir(p):
                snapshot[d] = set(os.listdir(p))
        idx.process_batch(spark, docs.filter(F.col("doc_id") >= cut))
        for d in os.listdir(idx._docmap_path):
            p = os.path.join(idx._docmap_path, d)
            if not os.path.isdir(p):
                continue
            if d not in snapshot:
                shutil.rmtree(p)
            else:
                for f in os.listdir(p):
                    if f not in snapshot[d]:
                        os.remove(os.path.join(p, f))
        n = idx.migrate_docmap(spark)
        all_ids = _index_doc_ids(spark, idx)
        assert n == len(all_ids)
        victims = sorted(i for i in all_ids if i >= cut)[:3]
        idx.purge_docs(spark, victims)
        assert _index_doc_ids(spark, idx) == all_ids - set(victims)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_docmap_compaction_bounds_files_and_preserves_erasure(
        spark, sf_dir):
    """r8: the erasure sidecar accretes one file per doc-part per
    batch; size-tiered compaction must bound the per-partition file
    count (append-then-delete — rows can duplicate on a crash, never
    vanish) while keeping the sidecar complete: a doc from an early
    batch still resolves through the PRUNED purge path."""
    docs = _docs(spark, sf_dir).limit(120)
    work = tempfile.mkdtemp(prefix="lsh_r8_dc_")
    try:
        idx = StreamingLshIndex(os.path.join(work, "idx"),
                                num_buckets=4,
                                compact_file_threshold=3)
        for b in range(10):
            idx.process_batch(spark,
                              docs.filter(F.col("doc_id") % 10 == b),
                              batch_id=b)
        # post-batch invariant: every doc-part dir within threshold+1
        # (the getContentSummary gate defers the per-dir check until
        # the global average crosses, so a dir can sit one file over
        # between folds)
        for d in os.listdir(idx._docmap_path):
            if not d.startswith(f"{DOC_PART_COL}="):
                continue
            pdir = os.path.join(idx._docmap_path, d)
            n_files = len([f for f in os.listdir(pdir)
                           if f.endswith(".parquet")])
            assert n_files <= 4, (d, n_files)
        # sidecar still complete after folds
        all_ids = _index_doc_ids(spark, idx)
        sidecar_ids = {r[0] for r in
                       (spark.read.parquet(idx._docmap_path)
                        .select("doc_id").distinct().collect())}
        assert sidecar_ids == all_ids
        # erasure of an early-batch doc still complete AND pruned:
        # corrupt every non-victim docmap partition first
        victim = sorted(all_ids)[0]
        vpart = victim % idx.num_buckets
        for d in os.listdir(idx._docmap_path):
            if (d.startswith(f"{DOC_PART_COL}=")
                    and d != f"{DOC_PART_COL}={vpart}"):
                pdir = os.path.join(idx._docmap_path, d)
                for f in os.listdir(pdir):
                    if f.endswith(".parquet"):
                        with open(os.path.join(pdir, f), "wb") as fh:
                            fh.write(b"garbage")
        idx.purge_docs(spark, [victim])
        assert victim not in _index_doc_ids(spark, idx)
    finally:
        shutil.rmtree(work, ignore_errors=True)
