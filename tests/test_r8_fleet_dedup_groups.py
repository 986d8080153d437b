"""CDC fleet × LLM dedup surface (round 8, VERDICT r7 #5 / NOTES_r7
§12.4): a DEDUPE-mode table whose payload is documents maintains
verified near-dup groups as SIDE STATE of ``bounded_sync`` — one
foreachBatch drives both the MergeCompactor state and the
StreamingDedupGroups store. Contracts:

* insert-only table: groups state ≡ batch ``hybrid_dedup_keep`` of the
  table's current compacted state (the parity the batch/streaming
  twins already guarantee, now reached through the CDC envelope);
* updates purge the old doc version and ingest the new; tombstones
  purge — victims leave no claims anywhere;
* checkpoint resume: a second wave of files with the same checkpoint
  continues the epoch sequence and keeps parity;
* the fused fleet path rejects dedup-groups configs loudly (per-table
  state, like maintained views).
"""

import os

import pytest
from pyspark.sql import functions as F

from python_cdc_component_spark.model.envelope import (
    SYSTEM_COLUMNS as SC)
from python_cdc_component_spark.operators.llm.hybrid import (
    hybrid_dedup_keep)
from python_cdc_component_spark.streaming.bounded import (
    BoundedStreamConfig, bounded_sync, bounded_sync_multi_fused)

EV_SCHEMA = ("event_id long, ts long, user_id long, "
             "event_type string, value double, props string")
BASE = " ".join(f"w{i}" for i in range(40))


def _write_events(spark, rows, path):
    """rows: (event_id, user_id, event_type, text)."""
    df = spark.createDataFrame(
        [(eid, eid * 1_000_000, uid, et, 0.0, text)
         for (eid, uid, et, text) in rows], EV_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(path)


def _stage(src, *file_dirs):
    import glob
    import shutil
    os.makedirs(src, exist_ok=True)
    n = len(os.listdir(src))
    for d in file_dirs:
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            shutil.copy(f, os.path.join(src, f"part-{n}.parquet"))
            n += 1


def _cfg(work, **kw):
    return BoundedStreamConfig(
        mode="DEDUPE", primary_keys=["user_id"],
        dedup_groups_path=os.path.join(work, "groups"),
        dedup_groups_buckets=8, max_wait_s=5.0, **kw)


def _groups_set(groups, spark):
    return {(r["component"], r["keep_doc_id"], r["cluster_size"])
            for r in groups.read_groups(spark).collect()}


def _hybrid_set(docs):
    return {(r["component"], r["keep_doc_id"], r["cluster_size"])
            for r in hybrid_dedup_keep(docs).collect()}


def test_insert_only_sync_matches_batch_hybrid(spark, sf_dir, tmp_path):
    """Multi-epoch drain of an insert-only documents table: the side
    groups state equals batch hybrid of the table's current state."""
    from python_cdc_component_spark.streaming.dedup_state import (
        StreamingDedupGroups)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(60).collect())
    rows = [(i + 1, r["doc_id"], "signup", r["text"])
            for i, r in enumerate(docs)]
    cut = len(rows) // 2
    w1, w2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    _write_events(spark, rows[:cut], w1)
    _write_events(spark, rows[cut:], w2)
    src = str(tmp_path / "src")
    _stage(src, w1, w2)
    work = str(tmp_path)
    cfg = _cfg(work, max_files_per_trigger=1)
    stats = bounded_sync(spark, src, os.path.join(work, "state"),
                         os.path.join(work, "ckpt"), cfg)
    assert stats["batches"] >= 2        # the side state saw ≥2 epochs
    groups = StreamingDedupGroups(cfg.dedup_groups_path, num_buckets=8)
    current = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in docs],
        "doc_id long, text string")
    assert _groups_set(groups, spark) == _hybrid_set(current)


def test_updates_and_tombstones_purge_and_reingest(spark, tmp_path):
    """Update = purge old version + ingest new; delete = purge. The
    victim of a tombstone leaves no claim anywhere; an updated doc's
    NEW text is verified against the surviving corpus."""
    from python_cdc_component_spark.streaming.dedup_state import (
        StreamingDedupGroups)
    other = " ".join(f"z{i}" for i in range(40))
    rows1 = [(1, 1, "signup", BASE + " a"),
             (2, 2, "signup", BASE + " a b"),
             (3, 3, "signup", other)]
    # wave 2: delete doc 1; update doc 3's text to a near-dup of 2
    rows2 = [(4, 1, "error", BASE + " a"),
             (5, 3, "page", BASE + " a b c")]
    w1, w2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    _write_events(spark, rows1, w1)
    _write_events(spark, rows2, w2)
    work = str(tmp_path)
    cfg = _cfg(work)
    src = str(tmp_path / "src")
    _stage(src, w1)
    bounded_sync(spark, src, os.path.join(work, "state"),
                 os.path.join(work, "ckpt"), cfg)
    groups = StreamingDedupGroups(cfg.dedup_groups_path, num_buckets=8)
    got1 = _groups_set(groups, spark)
    assert got1 == {(1, 2, 2), (3, 3, 1)}, got1
    _stage(src, w2)      # second wave, same checkpoint (resume)
    bounded_sync(spark, src, os.path.join(work, "state"),
                 os.path.join(work, "ckpt"), cfg)
    got2 = _groups_set(groups, spark)
    # doc 1 erased (its component relabels to 2); doc 3's new text
    # joins the group — current state {2, 3} is one verified group
    assert got2 == {(2, 3, 2)}, got2
    for base_dir in (groups._labels_path, groups._node_map_path):
        nodes = {r["node"] for r in
                 spark.read.option("basePath", base_dir)
                 .parquet(base_dir).select("node").collect()}
        assert 1 not in nodes, base_dir
    # compacted CDC state agrees: doc 1 soft-deleted, doc 3 updated
    state = spark.read.parquet(os.path.join(work, "state"))
    live = {(r["user_id"], r["props"]) for r in
            state.filter(~F.col(SC.deleted)).collect()}
    assert live == {(2, BASE + " a b"), (3, BASE + " a b c")}


def test_fused_fleet_rejects_dedup_groups_cfg(spark, tmp_path):
    w1 = str(tmp_path / "w1")
    _write_events(spark, [(1, 1, "signup", BASE)], w1)
    cfg = _cfg(str(tmp_path))
    with pytest.raises(ValueError, match="dedup-groups"):
        bounded_sync_multi_fused(
            spark, {"t": w1}, str(tmp_path / "out"),
            str(tmp_path / "ck"), {"t": cfg})


def test_append_mode_rejects_dedup_groups_cfg(spark, tmp_path):
    w1 = str(tmp_path / "w1")
    _write_events(spark, [(1, 1, "signup", BASE)], w1)
    cfg = _cfg(str(tmp_path))
    cfg.mode = "APPEND"
    with pytest.raises(ValueError, match="DEDUPE"):
        bounded_sync(spark, w1, str(tmp_path / "out"),
                     str(tmp_path / "ck"), cfg)


def test_purge_between_runs_on_cdc3_store(spark, sf_dir, tmp_path):
    """Round-9 (VERDICT r8 #6): new CDC-fed stores reserve a third
    tier residue (purge 3e / ingest 3e+1 / erasure 3e+2), so direct
    between-runs erasure works there too — the victim leaves the
    keep-list, one slot per ingest gap, and a second sync keeps
    working at higher tiers."""
    from python_cdc_component_spark.streaming.dedup_state import (
        StreamingDedupGroups)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(20).collect())
    rows = [(i + 1, r["doc_id"], "signup", r["text"])
            for i, r in enumerate(docs)]
    w1 = str(tmp_path / "w1")
    _write_events(spark, rows, w1)
    work = str(tmp_path)
    cfg = _cfg(work)
    src = str(tmp_path / "src")
    _stage(src, w1)
    bounded_sync(spark, src, os.path.join(work, "state"),
                 os.path.join(work, "ckpt"), cfg)
    groups = StreamingDedupGroups(cfg.dedup_groups_path, num_buckets=8)
    victim = int(rows[0][1])
    before = {r["keep_doc_id"] for r in
              groups.read_groups(spark).collect()}
    assert before                      # store is live
    groups.purge_between_runs(spark, [victim])
    nodes = {r["keep_doc_id"] for r in
             groups.read_groups(spark).collect()}
    assert victim not in nodes
    # one erasure slot per ingest gap
    with pytest.raises(ValueError, match="one erasure slot"):
        groups.purge_between_runs(spark, [int(rows[1][1])])
    # a second sync wave still works (its tiers outrank the erasure)
    rows2 = [(len(rows) + 1, 999_001, "signup",
              " ".join(f"fresh{i}" for i in range(30)))]
    w2 = str(tmp_path / "w2")
    _write_events(spark, rows2, w2)
    _stage(src, w2)
    bounded_sync(spark, src, os.path.join(work, "state"),
                 os.path.join(work, "ckpt"), cfg)
    nodes2 = {r["keep_doc_id"] for r in
              groups.read_groups(spark).collect()}
    assert victim not in nodes2 and 999_001 in nodes2
    # ... and opens a fresh erasure slot
    groups.purge_between_runs(spark, [999_001])
    assert 999_001 not in {r["keep_doc_id"] for r in
                           groups.read_groups(spark).collect()}


def test_purge_between_runs_refuses_legacy_cdc_store(spark, tmp_path):
    """Stores pinned with the pre-r9 'cdc' mode (2e/2e+1, no free
    residue) are still refused — erasure there is tombstone events."""
    from python_cdc_component_spark.fs import fs_touch, fs_write_text
    from python_cdc_component_spark.streaming.dedup_state import (
        StreamingDedupGroups)
    st = StreamingDedupGroups(str(tmp_path / "legacy"), num_buckets=8)
    fs_write_text(spark, st._tier_mode_path, "cdc")
    fs_touch(spark, os.path.join(st._manifest_path, "1"))
    with pytest.raises(ValueError, match="tombstone events"):
        st.purge_between_runs(spark, [1])


def test_crash_inside_epoch_replay_does_not_unindex_batch(
        spark, tmp_path, monkeypatch):
    """Code-review regression (r8): a crash INSIDE process_batch —
    after the LSH index appended this batch's bands and committed its
    sub-marker, before the groups marker — must not let the replay's
    purge erase those bands (the index replay contract would then skip
    the re-append and the docs would be silently un-indexed forever).
    The purge marker gates the replay: wave-2's doc must still pair
    with wave-3's near-dup after the crash-replay cycle."""
    import python_cdc_component_spark.streaming.dedup_state as D
    from python_cdc_component_spark.streaming.dedup_state import (
        StreamingDedupGroups)
    rows = {1: (1, 3, "signup", BASE),
            2: (2, 2, "signup", BASE + " x"),
            3: (3, 1, "signup", BASE + " y")}
    work = str(tmp_path)
    cfg = _cfg(work)
    src = str(tmp_path / "src")
    state, ckpt = os.path.join(work, "state"), os.path.join(work, "ckpt")
    for wave in (1, 2, 3):
        wdir = str(tmp_path / f"w{wave}")
        _write_events(spark, [rows[wave]], wdir)
        _stage(src, wdir)
        if wave == 2:
            real = D.verify_jaccard_pairs

            def boom(*a, **k):
                raise RuntimeError("crash mid-epoch after index append")

            monkeypatch.setattr(D, "verify_jaccard_pairs", boom)
            with pytest.raises(Exception, match="crash mid-epoch"):
                bounded_sync(spark, src, state, ckpt, cfg)
            monkeypatch.setattr(D, "verify_jaccard_pairs", real)
        bounded_sync(spark, src, state, ckpt, cfg)
    groups = StreamingDedupGroups(cfg.dedup_groups_path, num_buckets=8)
    # all three docs near-dup: ONE component labeled 1; under the bug
    # doc 2's bands were erased on replay and it stays a singleton
    got = _groups_set(groups, spark)
    assert got == {(1, 1, 3)}, got


def test_composite_pk_dedup_groups_parity(spark, tmp_path):
    """Round-9 (VERDICT r8 #5): a reference-shaped table with a
    TWO-COLUMN primary key feeds dedup_groups_path through the keyed
    envelope — the PK columns concatenate into one string doc key
    (unit-separator joined) and the groups store runs string-keyed.
    Keep-list parity vs batch hybrid on the concatenated key; a
    tombstone purges the composite-keyed doc."""
    from python_cdc_component_spark.streaming.dedup_state import (
        StreamingDedupGroups)
    other = " ".join(f"z{i}" for i in range(40))
    # (event_id, user_id, event_type, text): PK = (user_id, event_type)
    rows1 = [(1, 1, "signup", BASE + " a"),
             (2, 1, "page", BASE + " a b"),       # same user, new doc
             (3, 2, "signup", other)]
    rows2 = [(4, 2, "page", BASE + " a c"),
             (5, 1, "signup", other + " q")]      # update of (1,signup)
    w1, w2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    _write_events(spark, rows1, w1)
    _write_events(spark, rows2, w2)
    work = str(tmp_path)
    cfg = _cfg(work, dedup_doc_id_col=["user_id", "event_type"])
    cfg.primary_keys = ["user_id", "event_type"]
    src = str(tmp_path / "src")
    _stage(src, w1, w2)
    bounded_sync(spark, src, os.path.join(work, "state"),
                 os.path.join(work, "ckpt"), cfg)
    groups = StreamingDedupGroups(cfg.dedup_groups_path, num_buckets=8)
    # parity vs batch hybrid over the CURRENT table state on the
    # concatenated key
    state = spark.read.parquet(os.path.join(work, "state"))
    docs = (state.filter(~F.col(SC.deleted))
            .select(F.concat_ws("\x1f",
                                F.col("user_id").cast("string"),
                                F.col("event_type")).alias("doc_id"),
                    F.col("props").alias("text")))
    assert _groups_set(groups, spark) == _hybrid_set(docs)
    # the composite keys are the node identities
    nodes = {r["keep_doc_id"] for r in
             groups.read_groups(spark).collect()}
    assert all("\x1f" in n for n in nodes)
    # between-runs erasure on the composite key (cdc3 store)
    victim = "1\x1fpage"
    groups.purge_between_runs(spark, [victim])
    assert victim not in {r["keep_doc_id"] for r in
                          groups.read_groups(spark).collect()}
