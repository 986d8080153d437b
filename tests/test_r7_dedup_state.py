"""StreamingDedupGroups contracts (round 7): the continuously-
maintained verified-group state must equal batch ``hybrid_dedup_keep``
for ANY batch split (the parity that makes continuous ingest and batch
reprocessing interchangeable), merge components ACROSS batches, be
exactly-once under replay, and prune its member/label reads."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from python_cdc_component_spark.operators.llm.hybrid import (
    hybrid_dedup_keep)
from python_cdc_component_spark.streaming.dedup_state import (
    StreamingDedupGroups)


def _docs(spark, sf_dir, n=150):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(n))


def _groups(df):
    return {(r["component"], r["keep_doc_id"], r["keep_n_tokens"],
             r["cluster_size"]) for r in df.collect()}


def test_state_parity_with_batch_hybrid(spark, sf_dir):
    d = _docs(spark, sf_dir)
    want = _groups(hybrid_dedup_keep(d))
    work = tempfile.mkdtemp(prefix="dedup_state_")
    try:
        st = StreamingDedupGroups(os.path.join(work, "st"),
                                  num_buckets=16)
        for b in range(3):
            st.process_batch(spark,
                             d.filter(F.col("doc_id") % 3 == b),
                             corpus=d, batch_id=b)
        assert _groups(st.read_groups(spark)) == want
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_cross_batch_component_merge(spark):
    """a≈b arrive in different batches, then c (≈ both) merges the two
    single-member components into one — the min label and the longest
    keeper must come out as if all three arrived together."""
    base = " ".join(f"t{i}" for i in range(40))
    rows = [(1, base), (2, base + " x"), (3, base + " x y z")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    work = tempfile.mkdtemp(prefix="dedup_state_")
    try:
        st = StreamingDedupGroups(os.path.join(work, "st"),
                                  num_buckets=8)
        st.process_batch(spark, d.filter("doc_id = 1"), d, batch_id=0)
        st.process_batch(spark, d.filter("doc_id = 2"), d, batch_id=1)
        mid = _groups(st.read_groups(spark))
        st.process_batch(spark, d.filter("doc_id = 3"), d, batch_id=2)
        got = _groups(st.read_groups(spark))
        assert got == _groups(hybrid_dedup_keep(d))
        assert len(got) == 1 and next(iter(got))[0] == 1
        # the pre-merge state had (at most) separate components
        assert len(mid) >= 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_committed_replay_is_noop(spark, sf_dir):
    d = _docs(spark, sf_dir, n=90)
    work = tempfile.mkdtemp(prefix="dedup_state_")
    try:
        st = StreamingDedupGroups(os.path.join(work, "st"),
                                  num_buckets=8)
        for b in range(2):
            st.process_batch(spark, d.filter(F.col("doc_id") % 2 == b),
                             corpus=d, batch_id=b)
        before = _groups(st.read_groups(spark))

        def sig(base):
            out = {}
            for root, _, files in os.walk(base):
                for f in files:
                    p = os.path.join(root, f)
                    out[p] = os.path.getmtime(p)
            return out

        snap = sig(st._labels_path) | sig(st._node_map_path)
        stats = st.process_batch(spark,
                                 d.filter(F.col("doc_id") % 2 == 1),
                                 corpus=d, batch_id=1)
        assert stats["replay"] is True
        assert (sig(st._labels_path) | sig(st._node_map_path)) == snap
        assert _groups(st.read_groups(spark)) == before
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_crash_replay_converges(spark, sf_dir):
    """A torn batch (labels tier written, node_map write and marker
    lost) replayed with the same batch_id must land in the same state
    as a clean run — the in-flight tier is excluded from resolution
    and replaced by the overwrite."""
    d = _docs(spark, sf_dir, n=90)
    work = tempfile.mkdtemp(prefix="dedup_state_")
    try:
        clean = StreamingDedupGroups(os.path.join(work, "clean"),
                                     num_buckets=8)
        crash = StreamingDedupGroups(os.path.join(work, "crash"),
                                     num_buckets=8)
        b0 = d.filter(F.col("doc_id") % 2 == 0)
        b1 = d.filter(F.col("doc_id") % 2 == 1)
        for st in (clean, crash):
            st.process_batch(spark, b0, corpus=d, batch_id=0)
        clean.process_batch(spark, b1, corpus=d, batch_id=1)
        # simulate the torn write on `crash`: run batch 1, then delete
        # its marker and its node_map tier (labels tier survives)
        crash.process_batch(spark, b1, corpus=d, batch_id=1)
        os.remove(os.path.join(crash._manifest_path, "1"))
        for part in os.listdir(crash._node_map_path):
            tdir = os.path.join(crash._node_map_path, part, "_batch=1")
            if os.path.isdir(tdir):
                shutil.rmtree(tdir)
        stats = crash.process_batch(spark, b1, corpus=d, batch_id=1)
        assert stats["replay"] is False
        assert (_groups(crash.read_groups(spark))
                == _groups(clean.read_groups(spark)))
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_purge_relabels_and_erases(spark):
    """Erasing the component's LABEL doc (min id, also the keeper)
    must remove every trace of it from the state and relabel the
    survivors under the new min — topology is not re-split."""
    base = " ".join(f"t{i}" for i in range(40))
    rows = [(1, base + " a"), (2, base + " a b c"), (3, base)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    work = tempfile.mkdtemp(prefix="dedup_state_")
    try:
        st = StreamingDedupGroups(os.path.join(work, "st"),
                                  num_buckets=8)
        st.process_batch(spark, d, corpus=d, batch_id=0)
        assert _groups(st.read_groups(spark)) == {(1, 2, 43, 3)}
        # sequenced store: purge must ride the same tier sequence
        import pytest
        with pytest.raises(ValueError, match="purge_batch_id"):
            st.purge_docs(spark, [1])
        st.purge_docs(spark, [1], purge_batch_id=1)
        got = _groups(st.read_groups(spark))
        assert got == {(2, 2, 43, 2)}, got
        # no victim row survives anywhere in either state table
        for base_dir in (st._labels_path, st._node_map_path):
            surviving = {r["node"] for r in
                         spark.read.option("basePath", base_dir)
                         .parquet(base_dir).select("node").collect()}
            assert 1 not in surviving, base_dir
        # and the keeper erasure: purging the new keeper re-picks
        st.purge_docs(spark, [2], purge_batch_id=2)
        assert _groups(st.read_groups(spark)) == {(3, 3, 40, 1)}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_purge_then_ingest_keeps_working(spark, sf_dir):
    """State stays consistent through purge + further ingest: the
    purge tier outranks old claims but never collides with later
    process_batch tiers."""
    d = _docs(spark, sf_dir, n=90)
    work = tempfile.mkdtemp(prefix="dedup_state_")
    try:
        st = StreamingDedupGroups(os.path.join(work, "st"),
                                  num_buckets=8)
        st.process_batch(spark, d.filter(F.col("doc_id") % 2 == 0),
                         corpus=d, batch_id=0)
        first = sorted(r["keep_doc_id"]
                       for r in st.read_groups(spark).collect())[:2]
        st.purge_docs(spark, first, purge_batch_id=1)
        st.process_batch(spark, d.filter(F.col("doc_id") % 2 == 1),
                         corpus=d, batch_id=2)
        got = {r["keep_doc_id"]
               for r in st.read_groups(spark).collect()}
        assert not (set(first) & got)
        # every remaining doc accounted for exactly once
        all_ids = {r["doc_id"] for r in d.select("doc_id").collect()}
        sizes = sum(r["cluster_size"]
                    for r in st.read_groups(spark).collect())
        assert sizes == len(all_ids - set(first))
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_reopen_with_wrong_bucket_count_resolves_layout(spark, sf_dir):
    """Partition counts are physical layout: reopening the store with
    a different num_buckets must adopt the BUILT count (the index
    meta), or member/claim lookups would prune the wrong partitions
    and silently miss rows."""
    d = _docs(spark, sf_dir, n=90)
    want = _groups(hybrid_dedup_keep(d))
    work = tempfile.mkdtemp(prefix="dedup_state_")
    try:
        path = os.path.join(work, "st")
        st = StreamingDedupGroups(path, num_buckets=16)
        st.process_batch(spark, d.filter(F.col("doc_id") % 2 == 0),
                         corpus=d, batch_id=0)
        # reopen mis-configured: second batch + purge must still
        # resolve against the built layout
        st2 = StreamingDedupGroups(path, num_buckets=4)
        st2.process_batch(spark, d.filter(F.col("doc_id") % 2 == 1),
                          corpus=d, batch_id=1)
        assert st2.num_buckets == 16
        assert _groups(st2.read_groups(spark)) == want
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_dedup_groups_sync_streaming_front_end(spark, sf_dir):
    """The foreachBatch wrapper: drain a docs directory under
    AvailableNow, then land MORE files and re-run with the same
    checkpoint — the final keep-list must equal batch hybrid over the
    full corpus (checkpoint resume + epoch exactly-once end-to-end)."""
    from python_cdc_component_spark.streaming.dedup_state import (
        dedup_groups_sync)
    d = _docs(spark, sf_dir, n=120)
    work = tempfile.mkdtemp(prefix="dedup_sync_")
    try:
        src = os.path.join(work, "docs")
        d.filter(F.col("doc_id") % 3 < 2).repartition(2) \
         .write.mode("overwrite").parquet(src)
        st = dedup_groups_sync(
            spark, src, os.path.join(work, "state"),
            os.path.join(work, "ckpt"), num_buckets=8,
            max_files_per_trigger=1)
        first = _groups(st.read_groups(spark))
        assert first    # something landed
        # second wave of files, same checkpoint
        stage = os.path.join(work, "stage")
        d.filter(F.col("doc_id") % 3 == 2).coalesce(1) \
         .write.mode("overwrite").parquet(stage)
        import glob as _glob
        for i, f in enumerate(_glob.glob(os.path.join(stage,
                                                      "*.parquet"))):
            os.rename(f, os.path.join(src, f"wave2-{i}.parquet"))
        st2 = dedup_groups_sync(
            spark, src, os.path.join(work, "state"),
            os.path.join(work, "ckpt"), num_buckets=8,
            max_files_per_trigger=1)
        assert _groups(st2.read_groups(spark)) == _groups(
            hybrid_dedup_keep(d))
    finally:
        shutil.rmtree(work, ignore_errors=True)
