"""Round-6 StreamingLshIndex contracts: exactly-once batch commits
(manifest + deterministic per-batch partitions) and bucket-pruned
GDPR purge via the _docmap sidecar."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from python_cdc_component_spark.streaming.lsh_index import (
    BATCH_COL, BUCKET_COL, COMPACTED_TIER, StreamingLshIndex)


def _docs(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]): r["n_bands"] for r in df.collect()}


def _file_listing(root):
    """(relative path, size) of every data file under root — the
    'index bytes identical' witness."""
    out = set()
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out.add((os.path.relpath(p, root), os.path.getsize(p)))
    return out


def _index_rows(spark, idx):
    bucket_paths = [os.path.join(idx.index_path, d)
                    for d in os.listdir(idx.index_path)
                    if d.startswith(f"{BUCKET_COL}=")]
    return {tuple(r) for r in
            (spark.read.option("basePath", idx.index_path)
             .parquet(*bucket_paths)
             .select("doc_id", "band", "bv").distinct().collect())}


def test_lsh_committed_batch_replay_is_noop(spark, sf_dir):
    """Same batch_id processed twice: identical pairs, index files
    byte-for-byte untouched (the exactly-once contract)."""
    docs = _docs(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="lsh_r6_")
    try:
        idx = StreamingLshIndex(index_path=f"{work}/index", num_buckets=16)
        idx.process_batch(spark, docs.filter("doc_id % 2 = 0"),
                          batch_id=0)
        b1 = docs.filter("doc_id % 2 = 1")
        first = _pairs(idx.process_batch(spark, b1, batch_id=1))
        listing = _file_listing(f"{work}/index")
        replay = _pairs(idx.process_batch(spark, b1, batch_id=1))
        assert replay == first
        assert _file_listing(f"{work}/index") == listing
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_lsh_partial_append_crash_recovery(spark, sf_dir):
    """Crash after the band append but before the manifest marker:
    replay must REPLACE the partial partitions (deterministic
    per-batch tier), not double them — final index row-set and pairs
    equal a clean run."""
    docs = _docs(spark, sf_dir)
    works = [tempfile.mkdtemp(prefix="lsh_r6_") for _ in range(2)]
    try:
        b0 = docs.filter("doc_id % 2 = 0")
        b1 = docs.filter("doc_id % 2 = 1")
        crashed = StreamingLshIndex(index_path=f"{works[0]}/index",
                                    num_buckets=16)
        crashed.process_batch(spark, b0, batch_id=0)
        crashed.process_batch(spark, b1, batch_id=1)
        # simulate the crash window: marker 1 never made it to disk
        os.remove(f"{works[0]}/index/_batches/1")
        got = _pairs(crashed.process_batch(spark, b1, batch_id=1))

        clean = StreamingLshIndex(index_path=f"{works[1]}/index",
                                  num_buckets=16)
        clean.process_batch(spark, b0, batch_id=0)
        want = _pairs(clean.process_batch(spark, b1, batch_id=1))
        assert got == want
        assert _index_rows(spark, crashed) == _index_rows(spark, clean)
    finally:
        for w in works:
            shutil.rmtree(w, ignore_errors=True)


def test_lsh_purge_never_opens_untouched_buckets(spark, sf_dir):
    """The sidecar contract: purge resolves victim buckets from
    _docmap and rewrites only those — proven by corrupting every
    OTHER bucket's parquet files; a full-index scan would crash."""
    docs = _docs(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="lsh_r6_")
    try:
        idx = StreamingLshIndex(index_path=f"{work}/index", num_buckets=32)
        idx.process_batch(spark, docs)
        victims = [r[0] for r in
                   docs.select("doc_id").limit(3).collect()]
        victim_buckets = {
            int(r[0]) for r in
            (spark.read.option("basePath", idx._docmap_path)
             .parquet(idx._docmap_path)
             .filter(F.col("doc_id").isin([int(v) for v in victims]))
             .select(BUCKET_COL).distinct().collect())}
        assert victim_buckets
        untouched = []
        for d in os.listdir(f"{work}/index"):
            if not d.startswith(f"{BUCKET_COL}="):
                continue
            if int(d.split("=")[1]) in victim_buckets:
                continue
            for dirpath, _, files in os.walk(f"{work}/index/{d}"):
                for f_ in files:
                    if f_.endswith(".parquet"):
                        p = os.path.join(dirpath, f_)
                        with open(p, "wb") as fh:
                            fh.write(b"not parquet at all")
                        untouched.append(p)
        assert untouched, "test needs at least one untouched bucket"
        n = idx.purge_docs(spark, victims)
        assert n == len(victim_buckets)
        # corrupted files still in place (never rewritten)
        for p in untouched:
            with open(p, "rb") as fh:
                assert fh.read() == b"not parquet at all"
        # victims really gone from the rewritten buckets
        left = (spark.read.option("basePath", idx.index_path)
                .parquet(*[os.path.join(idx.index_path,
                                        f"{BUCKET_COL}={b}")
                           for b in victim_buckets
                           if os.path.isdir(os.path.join(
                               idx.index_path, f"{BUCKET_COL}={b}"))]))
        assert left.filter(
            F.col("doc_id").isin([int(v) for v in victims])).count() == 0
        # ... and from the sidecar
        assert (spark.read.option("basePath", idx._docmap_path)
                .parquet(idx._docmap_path)
                .filter(F.col("doc_id").isin([int(v) for v in victims]))
                .count()) == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_lsh_compaction_folds_batch_tiers(spark, sf_dir):
    """After enough identified batches hit one bucket, compaction
    folds the batch tiers into _batch=-1 and probe results are
    unchanged (split-parity already covers pair math; this checks the
    physical tier discipline)."""
    docs = _docs(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="lsh_r6_")
    try:
        idx = StreamingLshIndex(index_path=f"{work}/index", num_buckets=4,
                                compact_file_threshold=2)
        for i in range(4):
            idx.process_batch(spark, docs.filter(f"doc_id % 4 = {i}"),
                              batch_id=i)
        tiers = set()
        for d in os.listdir(f"{work}/index"):
            if d.startswith(f"{BUCKET_COL}="):
                for t in os.listdir(f"{work}/index/{d}"):
                    if t.startswith(f"{BATCH_COL}="):
                        tiers.add(int(t.split("=")[1]))
        # compaction ran (threshold 2 < 4 batches over 4 buckets):
        # the compacted tier exists and dominates
        assert COMPACTED_TIER in tiers
        # full-corpus parity after compaction: one more empty batch
        # emits nothing, and a fresh full-run equals the union of all
        # emitted pairs (covered by session5 split-parity; here just
        # assert the index still probes cleanly)
        out = idx.process_batch(spark, docs.filter("doc_id < 0"),
                                batch_id=99)
        assert out.count() == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_lsh_purge_pre_sidecar_index_falls_back_to_full_scan(spark, sf_dir):
    """An index built before the _docmap sidecar existed must still
    erase (one-time full scan), never silently no-op."""
    docs = _docs(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="lsh_r6_")
    try:
        idx = StreamingLshIndex(index_path=f"{work}/index", num_buckets=8)
        idx.process_batch(spark, docs)
        shutil.rmtree(f"{work}/index/_docmap")      # simulate legacy index
        victim = docs.select("doc_id").first()[0]
        n = idx.purge_docs(spark, [victim])
        assert n > 0
        bucket_paths = [os.path.join(idx.index_path, d)
                        for d in os.listdir(idx.index_path)
                        if d.startswith(f"{BUCKET_COL}=")]
        left = (spark.read.option("basePath", idx.index_path)
                .parquet(*bucket_paths))
        assert left.filter(F.col("doc_id") == int(victim)).count() == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_lsh_index_end_to_end_foreachbatch_stream(spark, sf_dir):
    """The production wiring: documents arrive as files, a real
    Structured Streaming query feeds foreachBatch(process_batch,
    batch_id=epoch). Union of emitted pairs must equal the full-corpus
    banded self-join, each pair exactly once, with the manifest
    recording every epoch."""
    import json as _json
    from python_cdc_component_spark.queries import QUERIES
    docs = _docs(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="lsh_r6_")
    try:
        src = f"{work}/src"
        # several files so maxFilesPerTrigger yields multiple epochs
        for i in range(4):
            docs.filter(F.col("doc_id") % 4 == i).write.parquet(
                src, mode="append")
        idx = StreamingLshIndex(index_path=f"{work}/index",
                                num_buckets=16)
        acc = {}

        def sink(batch_df, batch_id):
            out = idx.process_batch(spark, batch_df.select("doc_id",
                                                           "text"),
                                    batch_id=batch_id)
            for r in out.collect():
                key = (r["doc_a"], r["doc_b"])
                assert key not in acc, f"pair {key} emitted twice"
                acc[key] = r["n_bands"]

        q = (spark.readStream.schema(docs.schema)
             .option("maxFilesPerTrigger", "1").parquet(src)
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", f"{work}/ckpt")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        full = {(r["doc_a"], r["doc_b"]): r["n_bands"]
                for r in QUERIES["minhash_lsh_pairs"](spark, sf_dir)
                            .collect()}
        assert acc == full
        markers = sorted(os.listdir(f"{work}/index/_batches"))
        assert len(markers) >= 2        # really ran multiple epochs
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_lsh_bucket_count_is_layout_pinned(spark, sf_dir):
    """Reopening an index with a DIFFERENT num_buckets must not probe
    the wrong directories (missed pairs): the stored layout wins."""
    docs = _docs(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="lsh_r6_")
    try:
        a = StreamingLshIndex(index_path=f"{work}/index", num_buckets=16)
        a.process_batch(spark, docs.filter("doc_id % 2 = 0"))
        # a different process opens the same index with the default N
        b = StreamingLshIndex(index_path=f"{work}/index", num_buckets=64)
        got = _pairs(b.process_batch(spark, docs.filter("doc_id % 2 = 1")))
        assert b.num_buckets == 16          # layout resolved from meta
        from python_cdc_component_spark.queries import QUERIES
        full = _pairs(QUERIES["minhash_lsh_pairs"](spark, sf_dir))
        first = {p: n for p, n in full.items()
                 if p[0] % 2 == 0 and p[1] % 2 == 0}
        assert {**first, **got} == full
    finally:
        shutil.rmtree(work, ignore_errors=True)
