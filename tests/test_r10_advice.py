"""Round-10 fixes (VERDICT r9 #3/#5 + the three ADVICE items):

* composite doc keys FAIL LOUDLY on malformed PKs — a NULL component
  (concat_ws would silently drop it: (NULL,'x') and ('x',NULL) both
  collapse to 'x') or a component containing the reserved U+001F
  separator (could alias another tuple) raises at ingest instead of
  corrupting the groups store;
* ``_legacy_type`` resolves MySQL attribute-suffixed DDL again —
  ``int(10) unsigned`` is INTEGER/10, not the STRING/None fallback the
  r9 pg-tail change regressed it to — while pg's recognized post-paren
  tails (``timestamp(3) with time zone``) keep working;
* a FRESH handle over an existing string-keyed store resolves the
  pinned id kind before building empty-result schemas, so
  ``read_group_of``'s empty frame is ``doc_id string``, not the long
  default (callers union/join it);
* string-keyed ``vacuum()``: cross-partition relabel → stale labels
  rows dropped, untouched partitions byte-identical, point lookup
  still correct (VERDICT r9 #5 — one line of real coverage over the
  shared machinery);
* endpoint filters in the per-batch merge run as a broadcast
  semi/anti-join above ``isin_literal_max`` (VERDICT r9 #3) — keep-list
  parity with the literal-In path on the same stream.
"""

import os
import tempfile
import types

import pytest
from pyspark.sql import functions as F

from python_cdc_component_spark.sinks.manifest import _legacy_type
from python_cdc_component_spark.streaming.bounded import (
    BoundedStreamConfig, _maintain_dedup_groups)
from python_cdc_component_spark.streaming.dedup_state import (
    StreamingDedupGroups)

BASE = " ".join(f"w{i}" for i in range(40))

# the envelope-parsed micro-batch shape _maintain_dedup_groups sees
_BATCH_SCHEMA = ("user_id long, event_type string, props string, "
                 "kbc__event_timestamp long, kbc__file string, "
                 "kbc__pos long, __deleted boolean, "
                 "_snapshot_phase string")


def _batch(spark, rows):
    """rows: (user_id, event_type, text)."""
    return spark.createDataFrame(
        [(uid, et, tx, i, "f1", i, False, "s")
         for i, (uid, et, tx) in enumerate(rows)], _BATCH_SCHEMA)


def _composite_cfg(work):
    return BoundedStreamConfig(
        mode="DEDUPE", primary_keys=["user_id", "event_type"],
        dedup_doc_id_col=["user_id", "event_type"],
        dedup_groups_path=os.path.join(work, "groups"),
        dedup_groups_buckets=8)


def _maintain(spark, work, rows):
    cfg = _composite_cfg(work)
    groups = StreamingDedupGroups(cfg.dedup_groups_path, num_buckets=8)
    # the raise fires before the compacted state is ever read; a stub
    # path keeps the fixture minimal
    compactor = types.SimpleNamespace(
        state_path=os.path.join(work, "state"))
    _maintain_dedup_groups(spark, groups, compactor,
                           _batch(spark, rows), epoch=0, cfg=cfg)


def test_composite_null_pk_component_raises(spark, tmp_path):
    """(NULL,'x') would silently collapse to 'x' under concat_ws —
    the keyed envelope must reject it at ingest."""
    with pytest.raises(ValueError, match="doc keys would alias"):
        _maintain(spark, str(tmp_path),
                  [(1, "signup", BASE), (None, "signup", BASE + " b")])


def test_composite_separator_in_pk_component_raises(spark, tmp_path):
    """A PK value containing the reserved U+001F separator could alias
    another tuple ('1\\x1fa' + 'b' vs '1' + 'a\\x1fb')."""
    with pytest.raises(ValueError, match="doc keys would alias"):
        _maintain(spark, str(tmp_path),
                  [(1, "a\x1fb", BASE)])


def test_composite_valid_pks_still_ingest(spark, tmp_path):
    """The guard rides the existing batch_ids collect — well-formed
    composite PKs ingest exactly as before."""
    work = str(tmp_path)
    os.makedirs(os.path.join(work, "state"))
    spark.createDataFrame(
        [(1, "signup", BASE, False)],
        "user_id long, event_type string, props string, "
        "__deleted boolean").write.mode("overwrite").parquet(
        os.path.join(work, "state"))
    _maintain(spark, work, [(1, "signup", BASE),
                            (2, "signup", BASE + " b")])
    st = StreamingDedupGroups(os.path.join(work, "groups"),
                              num_buckets=8)
    nodes = {r["keep_doc_id"] for r in st.read_groups(spark).collect()}
    assert nodes and all("\x1f" in n for n in nodes)


def test_legacy_type_mysql_attribute_suffixes():
    """ADVICE r9: 'int(10) unsigned' regressed to STRING/None when the
    pg post-paren tail handling landed — attribute suffixes are not
    part of the type name."""
    assert _legacy_type("int(10) unsigned") == ("INTEGER", 10)
    assert _legacy_type("INT(10) UNSIGNED") == ("INTEGER", 10)
    assert _legacy_type("bigint(20) unsigned zerofill") == (
        "INTEGER", 19)
    assert _legacy_type("int unsigned") == ("INTEGER", 10)
    assert _legacy_type("decimal(12,5) unsigned") == ("NUMERIC", 12)
    # the recognized pg tails keep joining the base
    assert _legacy_type("timestamp(3) with time zone",
                        dialect="postgres") == ("TIMESTAMP", 35)
    assert _legacy_type("time(3) without time zone",
                        dialect="postgres") == ("TIMESTAMP", 15)
    # an UNRECOGNIZED post-paren tail no longer invents a base type
    assert _legacy_type("varchar(64) something") == ("STRING", 64)


def test_read_group_of_empty_schema_matches_string_store(spark,
                                                         tmp_path):
    """ADVICE r9: a fresh handle over an existing string-keyed store
    must type its empty results 'doc_id string' — resolve the pinned
    id kind BEFORE building the schema."""
    work = str(tmp_path / "st")
    st = StreamingDedupGroups(work, num_buckets=8)
    d = spark.createDataFrame(
        [("a", BASE), ("b", BASE + " x")], "doc_id string, text string")
    st.process_batch(spark, d, corpus=d, batch_id=None)
    fresh = StreamingDedupGroups(work, num_buckets=8)
    empty = fresh.read_group_of(spark, [])
    assert dict(empty.dtypes)["doc_id"] == "string"
    assert empty.count() == 0
    # a miss (never-ingested id) comes back empty AND string-typed
    fresh2 = StreamingDedupGroups(work, num_buckets=8)
    miss = fresh2.read_group_of(spark, ["zzz-never-ingested"])
    assert dict(miss.dtypes)["doc_id"] == "string"
    assert miss.count() == 0
    # the hit path still answers (keeper = most tokens, i.e. 'b')
    hit = fresh2.read_group_of(spark, ["a"]).collect()
    assert hit and hit[0]["component"] == "a"
    assert hit[0]["keep_doc_id"] == "b"


def test_vacuum_string_keyed_store(spark):
    """VERDICT r9 #5: vacuum() on a STRING-keyed store — a node
    relabeled across partitions leaves one labels row per former
    component partition; vacuum folds it to the current claim, leaves
    untouched partitions byte-identical, and the point lookup still
    answers."""
    ids = ["d30", "d21", "d12", "d03"]       # min-id relabel chain
    d = spark.createDataFrame(
        [(i, BASE) for i in ids]
        + [("solo", " ".join(f"u{i}" for i in range(40)))],
        "doc_id string, text string")
    work = tempfile.mkdtemp(prefix="dedup_state_r10_")
    try:
        st = StreamingDedupGroups(os.path.join(work, "st"),
                                  num_buckets=8)
        for b, batch in enumerate((["d30", "solo"], ["d21"],
                                   ["d12"], ["d03"])):
            st.process_batch(spark,
                             d.filter(F.col("doc_id").isin(batch)),
                             corpus=d, batch_id=b)
        before = {(r["component"], r["keep_doc_id"], r["cluster_size"])
                  for r in st.read_groups(spark).collect()}
        labels = spark.read.option(
            "basePath", st._labels_path).parquet(st._labels_path)
        assert labels.filter("node = 'd30'").count() > 1

        def bytes_of(pdir):
            out = {}
            for root, _, files in os.walk(pdir):
                for f in sorted(files):
                    p = os.path.join(root, f)
                    with open(p, "rb") as fh:
                        out[os.path.relpath(p, pdir)] = fh.read()
            return out

        # the solo singleton's partition must survive byte-identical
        solo_part = next(iter(
            st.index._id_parts_of(spark, ["solo"])))
        solo_dir = os.path.join(st._labels_path,
                                f"_comp_part={solo_part}")
        untouched = bytes_of(solo_dir)
        n = st.vacuum(spark)
        assert n > 0
        labels2 = spark.read.option(
            "basePath", st._labels_path).parquet(st._labels_path)
        assert labels2.groupBy("node").count() \
                      .filter("count > 1").count() == 0
        assert labels2.filter(
            "node = 'd30' and component != 'd03'").count() == 0
        assert bytes_of(solo_dir) == untouched
        assert {(r["component"], r["keep_doc_id"], r["cluster_size"])
                for r in st.read_groups(spark).collect()} == before
        # point lookup post-vacuum
        hit = st.read_group_of(spark, ["d30"]).collect()
        assert hit and hit[0]["component"] == "d03"
        assert st.vacuum(spark) == 0
    finally:
        import shutil
        shutil.rmtree(work, ignore_errors=True)


def test_failed_deferred_index_write_fails_batch_before_marker(
        spark, tmp_path):
    """Pipelining contract (VERDICT r9 #4): the index's deferred write
    half runs concurrently with verify+merge, but a write failure must
    still fail the batch BEFORE any state marker lands — and the next
    attempt (the foreachBatch replay) must converge to the same state
    a never-crashed run reaches."""
    d = spark.createDataFrame(
        [(1, BASE), (2, BASE + " x"), (3, "totally different words "
                                          + " ".join(f"y{i}" for i in
                                                     range(12)))],
        "doc_id long, text string")
    st = StreamingDedupGroups(str(tmp_path / "st"), num_buckets=8)
    boom = RuntimeError("simulated index write failure")
    orig = st.index._compact

    def failing_compact(*a, **kw):
        raise boom

    st.index._compact = failing_compact
    with pytest.raises(RuntimeError, match="simulated index write"):
        st.process_batch(spark, d, corpus=d, batch_id=0)
    # no state marker: the batch is NOT committed
    marker = os.path.join(st._manifest_path, "0")
    assert os.path.basename(st._manifest_path) == "_batches"
    assert not os.path.exists(marker)
    # the replay (writes repaired) converges to the clean-run state
    st.index._compact = orig
    st2 = StreamingDedupGroups(str(tmp_path / "st"), num_buckets=8)
    st2.process_batch(spark, d, corpus=d, batch_id=0)
    assert os.path.exists(marker)      # the successful run commits
    clean = StreamingDedupGroups(str(tmp_path / "clean"), num_buckets=8)
    clean.process_batch(spark, d, corpus=d, batch_id=0)
    got = {(r["component"], r["keep_doc_id"], r["cluster_size"])
           for r in st2.read_groups(spark).collect()}
    want = {(r["component"], r["keep_doc_id"], r["cluster_size"])
            for r in clean.read_groups(spark).collect()}
    assert got == want and got


def test_merge_endpoint_semi_join_parity(spark, tmp_path):
    """VERDICT r9 #3: with isin_literal_max=0 every endpoint filter
    runs as a broadcast semi/anti-join; the keep-list equals the
    literal-In store's on the same stream (singles = anti-join side,
    endpoints = semi-join side, both exercised)."""
    docs = [(i, BASE + f" v{i % 3}") for i in range(1, 13)] \
        + [(i, f"unique text {i} " + " ".join(
            f"q{i}{j}" for j in range(12))) for i in range(13, 19)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    halves = (d.filter("doc_id % 2 = 0"), d.filter("doc_id % 2 = 1"))
    keeps = []
    for name, lit_max in (("lit", 512), ("join", 0)):
        st = StreamingDedupGroups(str(tmp_path / name), num_buckets=8,
                                  isin_literal_max=lit_max)
        for b, half in enumerate(halves):
            st.process_batch(spark, half, corpus=d, batch_id=b)
        keeps.append({(r["component"], r["keep_doc_id"],
                       r["cluster_size"])
                      for r in st.read_groups(spark).collect()})
    assert keeps[0] == keeps[1]
    assert any(c > 1 for _, _, c in keeps[0])   # real merges happened
