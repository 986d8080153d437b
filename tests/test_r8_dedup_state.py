"""Round-8 StreamingDedupGroups contracts:

* the per-batch component merge is BOUNDED — a component larger than
  ``driver_merge_max_members`` never lands on the driver (the merge
  runs distributed through ``connected_components``) and the keep-list
  parity with batch ``hybrid_dedup_keep`` still holds (VERDICT r7 #1);
* unsequenced (append-mode) operation draws monotone tiers from the
  ``_seq`` counter, so cross-batch merges resolve deterministically
  (ADVICE r7: two tier -1 rows used to tie-break arbitrarily);
* purge tiers share the ingest ordering — a purge can never outrank
  later ingest merges forever (ADVICE r7: the 1<<40 purge tier made a
  purge-relabeled survivor unmergeable for the rest of the store's
  life);
* sequenced and unsequenced operation never mix (loud guards);
* ``vacuum()`` drops cross-partition stale labels rows while leaving
  untouched partitions byte-identical (VERDICT r7 #4).
"""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from python_cdc_component_spark.operators.llm.hybrid import (
    hybrid_dedup_keep)
from python_cdc_component_spark.streaming.dedup_state import (
    StreamingDedupGroups)

BASE = " ".join(f"w{i}" for i in range(40))


def _groups(df):
    return {(r["component"], r["keep_doc_id"], r["keep_n_tokens"],
             r["cluster_size"]) for r in df.collect()}


def _dup_docs(spark, ids, text=BASE):
    return spark.createDataFrame([(int(i), text) for i in ids],
                                 "doc_id long, text string")


def test_over_threshold_merge_runs_distributed_with_parity(spark):
    """A stored component larger than driver_merge_max_members: the
    batch that touches it must take the distributed merge path (the
    bounded probe truncates — nothing component-sized reaches the
    driver) and the final keep-list must still equal the batch hybrid
    of the full corpus."""
    first = list(range(1, 13))           # 12 identical docs
    extra = [13, 14]
    all_docs = _dup_docs(spark, first + extra)
    work = tempfile.mkdtemp(prefix="dedup_state_r8_")
    try:
        st = StreamingDedupGroups(os.path.join(work, "st"),
                                  num_buckets=8,
                                  driver_merge_max_members=5)
        s0 = st.process_batch(spark, _dup_docs(spark, first),
                              corpus=all_docs, batch_id=0)
        # first batch: no stored members yet — driver path is fine
        assert s0["merge_path"] == "driver"
        s1 = st.process_batch(spark, _dup_docs(spark, extra),
                              corpus=all_docs, batch_id=1)
        # second batch joins the stored 12-member component: the probe
        # (limit 6) truncates and the merge must stay off the driver
        assert s1["merge_path"] == "distributed"
        assert s1["n_relabeled"] > 0
        got = _groups(st.read_groups(spark))
        assert got == _groups(hybrid_dedup_keep(all_docs))
        # cross-path parity: the same ingest under a roomy threshold
        big = StreamingDedupGroups(os.path.join(work, "big"),
                                   num_buckets=8)
        for b, ids in enumerate((first, extra)):
            sb = big.process_batch(spark, _dup_docs(spark, ids),
                                   corpus=all_docs, batch_id=b)
            assert sb["merge_path"] == "driver"
        assert _groups(big.read_groups(spark)) == got
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_unsequenced_tiers_are_monotone_and_merge_deterministically(
        spark):
    """Append-mode (batch_id=None) cross-batch merge: the relabeled
    node must resolve to its NEW component deterministically. Before
    the _seq counter every append landed at tier -1 and row_number
    broke the tie arbitrarily."""
    rows = [(1, BASE), (2, BASE + " x"), (3, BASE + " x y z")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    work = tempfile.mkdtemp(prefix="dedup_state_r8_")
    try:
        st = StreamingDedupGroups(os.path.join(work, "st"),
                                  num_buckets=8)
        for i in (1, 2, 3):
            st.process_batch(spark, d.filter(F.col("doc_id") == i),
                             corpus=d, batch_id=None)
        assert _groups(st.read_groups(spark)) == _groups(
            hybrid_dedup_keep(d))
        # the relabeled nodes hold exactly ONE current claim each:
        # every claim of a node sits at a distinct (monotone) tier
        nm = (spark.read.option("basePath", st._node_map_path)
              .parquet(st._node_map_path))
        per_tier = (nm.groupBy("node", "_batch")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .filter(F.col("n") > 1).count())
        assert per_tier == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_purge_then_ingest_merges_in_append_mode(spark):
    """ADVICE r7 regression: purge the component LABEL, then ingest a
    near-dup with a smaller id — the survivor must merge into the new
    component. Under the old 1<<40 purge tier the survivor's purge-time
    claim outranked every later ingest tier and the group silently
    split."""
    d = spark.createDataFrame(
        [(1, BASE), (2, BASE + " x"), (3, BASE + " y")],
        "doc_id long, text string")
    work = tempfile.mkdtemp(prefix="dedup_state_r8_")
    try:
        st = StreamingDedupGroups(os.path.join(work, "st"),
                                  num_buckets=8)
        # ingest docs 2 and 3 (near-dups): component label = 2
        st.process_batch(spark, d.filter("doc_id in (2, 3)"),
                         corpus=d, batch_id=None)
        assert {g[0] for g in _groups(st.read_groups(spark))} == {2}
        # erase the label doc: survivor 3 relabels to component 3
        st.purge_docs(spark, [2])
        assert _groups(st.read_groups(spark)) == {(3, 3, 41, 1)}
        # now ingest doc 1 (near-dup of 3): the group MUST merge to 1
        st.process_batch(spark, d.filter("doc_id = 1"),
                         corpus=d.filter("doc_id != 2"), batch_id=None)
        got = _groups(st.read_groups(spark))
        assert got == {(1, 3, 41, 2)}, got
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_mode_mix_guards(spark):
    d = _dup_docs(spark, [1, 2])
    work = tempfile.mkdtemp(prefix="dedup_state_r8_")
    try:
        seq = StreamingDedupGroups(os.path.join(work, "seq"),
                                   num_buckets=8)
        seq.process_batch(spark, d, corpus=d, batch_id=0)
        with pytest.raises(ValueError, match="sequenced"):
            seq.process_batch(spark, d, corpus=d, batch_id=None)
        app = StreamingDedupGroups(os.path.join(work, "app"),
                                   num_buckets=8)
        app.process_batch(spark, d, corpus=d, batch_id=None)
        with pytest.raises(ValueError, match="unsequenced"):
            app.process_batch(spark, d, corpus=d, batch_id=7)
        with pytest.raises(ValueError, match="unsequenced"):
            app.purge_docs(spark, [1], purge_batch_id=7)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_vacuum_drops_cross_partition_stale_rows(spark):
    """A node relabeled across partitions N times leaves one labels
    row per former component partition; vacuum folds it to exactly the
    current claim and leaves untouched partitions byte-identical."""
    # components move across mod-8 classes: 30 → 21 → 12 → 3
    d = spark.createDataFrame(
        [(30, BASE), (21, BASE), (12, BASE), (3, BASE),
         (7, " ".join(f"u{i}" for i in range(40)))],
        "doc_id long, text string")
    work = tempfile.mkdtemp(prefix="dedup_state_r8_")
    try:
        st = StreamingDedupGroups(os.path.join(work, "st"),
                                  num_buckets=8)
        for b, ids in enumerate(([30, 7], [21], [12], [3])):
            st.process_batch(spark,
                             d.filter(F.col("doc_id").isin(ids)),
                             corpus=d, batch_id=b)
        before = _groups(st.read_groups(spark))
        labels = spark.read.option(
            "basePath", st._labels_path).parquet(st._labels_path)
        # node 30 has a stale row in every former component partition
        assert labels.filter("node = 30").count() > 1

        def bytes_of(part):
            out = {}
            pdir = os.path.join(st._labels_path, f"_comp_part={part}")
            for root, _, files in os.walk(pdir):
                for f in sorted(files):
                    p = os.path.join(root, f)
                    with open(p, "rb") as fh:
                        out[os.path.relpath(p, pdir)] = fh.read()
            return out

        untouched = {p: bytes_of(p) for p in (7 % 8, 3 % 8)}
        n = st.vacuum(spark)
        assert n > 0
        labels2 = spark.read.option(
            "basePath", st._labels_path).parquet(st._labels_path)
        # ≤1 row per node, and only current claims remain
        assert labels2.groupBy("node").count() \
                      .filter("count > 1").count() == 0
        assert labels2.filter("node = 30 and component != 3") \
                      .count() == 0
        # untouched partitions byte-identical; results unchanged
        for p, want in untouched.items():
            assert bytes_of(p) == want, f"partition {p} was rewritten"
        assert _groups(st.read_groups(spark)) == before
        # idempotent: a second vacuum finds nothing to do
        assert st.vacuum(spark) == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_purge_between_runs_on_streaming_facade(spark, tmp_path):
    """The dedup_groups_sync facade maps epochs to odd tiers, so
    between-runs GDPR erasure always has a free even tier: purge the
    component label between two sync runs, then ingest a near-dup with
    a smaller id — the purge must erase completely AND the later run's
    merge must outrank the purge's relabels (the ADVICE r7 ordering
    bug, now on the streaming facade)."""
    import glob
    from python_cdc_component_spark.streaming.dedup_state import (
        StreamingDedupGroups, dedup_groups_sync)
    other = " ".join(f"u{i}" for i in range(40))
    d = spark.createDataFrame(
        [(1, BASE + " y"), (2, BASE + " x"), (3, BASE), (7, other)],
        "doc_id long, text string")
    src = str(tmp_path / "docs")
    d.filter("doc_id in (2, 3, 7)").coalesce(1) \
     .write.mode("overwrite").parquet(src)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    st = dedup_groups_sync(spark, src, state, ckpt, num_buckets=8)
    assert _groups(st.read_groups(spark)) == {(2, 2, 41, 2),
                                              (7, 7, 40, 1)}
    n = st.purge_between_runs(spark, [2])
    assert n > 0
    assert _groups(st.read_groups(spark)) == {(3, 3, 40, 1),
                                              (7, 7, 40, 1)}
    # second wave: doc 1 (near-dup of 3, smaller id) via the same
    # checkpoint — the merge must supersede the purge relabel
    stage = str(tmp_path / "stage")
    d.filter("doc_id = 1").coalesce(1) \
     .write.mode("overwrite").parquet(stage)
    for i, f in enumerate(glob.glob(os.path.join(stage, "*.parquet"))):
        os.rename(f, os.path.join(src, f"wave2-{i}.parquet"))
    st2 = dedup_groups_sync(spark, src, state, ckpt, num_buckets=8)
    got = _groups(st2.read_groups(spark))
    assert got == {(1, 1, 41, 2), (7, 7, 40, 1)}, got
    for base_dir in (st2._labels_path, st2._node_map_path):
        nodes = {r["node"] for r in
                 spark.read.option("basePath", base_dir)
                 .parquet(base_dir).select("node").collect()}
        assert 2 not in nodes, base_dir


def test_read_group_of_point_lookup_is_pruned(spark):
    """read_group_of answers 'is this doc a dup / who keeps it' from
    partition-pruned reads only: results match the full read_groups
    join, erased/unknown docs are absent, and corrupting every
    partition OUTSIDE the queried docs' footprint does not break the
    lookup (the corruption canary proves those partitions are never
    opened)."""
    U = " ".join(f"u{i}" for i in range(40))
    d = spark.createDataFrame(
        [(9, BASE), (17, BASE), (2, U), (10, U), (5, "short text here")],
        "doc_id long, text string")
    work = tempfile.mkdtemp(prefix="dedup_state_r8_")
    try:
        st = StreamingDedupGroups(os.path.join(work, "st"),
                                  num_buckets=8)
        st.process_batch(spark, d, corpus=d, batch_id=0)
        full = {(r["component"], r["keep_doc_id"], r["keep_n_tokens"],
                 r["cluster_size"])
                for r in st.read_groups(spark).collect()}
        got = {tuple(r) for r in
               st.read_group_of(spark, [17, 5, 999]).collect()}
        # doc 17 → group 9, doc 5 → itself, 999 absent
        want = {(17, c, k, n, s) for (c, k, n, s) in full if c == 9} \
             | {(5, c, k, n, s) for (c, k, n, s) in full if c == 5}
        assert got == want, got
        # canary: corrupt every partition the {17} lookup never needs
        # (group A={9,17} lives wholly in part 1; comp part 1)
        for base_dir, keep in ((st._node_map_path, {1}),
                               (st._labels_path, {1})):
            for p in os.listdir(base_dir):
                if "=" not in p:
                    continue
                if int(p.split("=")[1]) in keep:
                    continue
                pdir = os.path.join(base_dir, p)
                for root, _, files in os.walk(pdir):
                    for f in files:
                        if f.endswith(".parquet"):
                            with open(os.path.join(root, f), "wb") as fh:
                                fh.write(b"garbage")
        got17 = {tuple(r) for r in
                 st.read_group_of(spark, [17]).collect()}
        assert got17 == {(17, 9, 9, 40, 2)}, got17
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_purge_between_runs_consumes_one_slot_per_gap(spark, tmp_path):
    """Code-review regression (r8): the consumed even tier is recorded
    in the manifest, so a second between-runs purge without an
    intervening ingest raises instead of silently reusing the tier
    (same-tier duplicate claims resolved by arbitrary tie-break); a
    new sync re-opens the slot."""
    import glob
    from python_cdc_component_spark.streaming.dedup_state import (
        dedup_groups_sync)
    d = spark.createDataFrame(
        [(1, BASE), (2, BASE + " x"), (3, BASE + " y")],
        "doc_id long, text string")
    src = str(tmp_path / "docs")
    d.filter("doc_id in (1, 2)").coalesce(1) \
     .write.mode("overwrite").parquet(src)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    st = dedup_groups_sync(spark, src, state, ckpt, num_buckets=8)
    assert st.purge_between_runs(spark, [1]) > 0
    with pytest.raises(ValueError, match="one erasure slot"):
        st.purge_between_runs(spark, [2])
    # an ingest gap re-opens the slot
    stage = str(tmp_path / "stage")
    d.filter("doc_id = 3").coalesce(1) \
     .write.mode("overwrite").parquet(stage)
    for i, f in enumerate(glob.glob(os.path.join(stage, "*.parquet"))):
        os.rename(f, os.path.join(src, f"wave2-{i}.parquet"))
    st2 = dedup_groups_sync(spark, src, state, ckpt, num_buckets=8)
    assert st2.purge_between_runs(spark, [2]) > 0
    got = _groups(st2.read_groups(spark))
    assert got == {(3, 3, 41, 1)}, got
