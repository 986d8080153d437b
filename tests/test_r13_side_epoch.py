"""Unified side-state epoch driver (VERDICT r12 #5) — the four
`_maintain_*` drivers now share one skeleton (`_run_side_epoch`:
exactly-once probe → keyed extract → empty gate → purge-then-add
work). The full r7-r12 crash/replay suites pin behavior-identity; this
file pins the NEW aligned convention: every state kind marks its
epoch on an empty batch and a replay skips at the marker probe."""

import os
import types

from python_cdc_component_spark.streaming.bounded import (
    BoundedStreamConfig, _maintain_dedup_groups)
from python_cdc_component_spark.streaming.dedup_state import (
    StreamingDedupGroups)

_BATCH_SCHEMA = ("user_id long, event_type string, props string, "
                 "kbc__event_timestamp long, kbc__file string, "
                 "kbc__pos long, __deleted boolean, "
                 "_snapshot_phase string")


def test_dedup_groups_empty_epoch_marks_and_replay_skips(spark,
                                                         tmp_path):
    """An empty epoch marks its ingest tier (tier mode pinned first)
    and the replay skips at the marker probe; a later real epoch
    proceeds on the pinned scheme."""
    cfg = BoundedStreamConfig(
        mode="DEDUPE", primary_keys=["user_id"],
        dedup_groups_path=str(tmp_path / "groups"),
        dedup_groups_buckets=8)
    groups = StreamingDedupGroups(cfg.dedup_groups_path, num_buckets=8)
    compactor = types.SimpleNamespace(
        state_path=str(tmp_path / "state"))
    empty = spark.createDataFrame([], _BATCH_SCHEMA)
    _maintain_dedup_groups(spark, groups, compactor, empty, 0, cfg)
    marker = os.path.join(groups._manifest_path, "1")
    assert os.path.exists(marker)
    with open(groups._tier_mode_path) as fh:
        assert fh.read() == "cdc3"
    mt = os.path.getmtime(marker)
    _maintain_dedup_groups(spark, groups, compactor, empty, 0, cfg)
    assert os.path.getmtime(marker) == mt
    # a later real epoch proceeds normally on the pinned scheme
    rows = spark.createDataFrame(
        [(uid, "signup",
          " ".join(f"u{uid}w{i}" for i in range(40)),
          uid, "f1", uid, False, "s")
         for uid in (1, 2)], _BATCH_SCHEMA)
    state = rows.select("user_id", "props",
                        rows["__deleted"].alias("__deleted"))
    state.write.mode("overwrite").parquet(compactor.state_path)
    _maintain_dedup_groups(spark, groups, compactor, rows, 1, cfg)
    got = {r["keep_doc_id"] for r in
           groups.read_groups(spark).select("keep_doc_id").collect()}
    assert got == {1, 2}


def test_fused_lexical_parity_with_per_table(spark, tmp_path):
    """Lexical side state on the fused fleet path (VERDICT r12 #3):
    a fused table's index content is byte-identical to its per-table
    `bounded_sync(lexical_index_path=...)` twin — same postings, same
    docstats, same maintained corpus stats, same served BM25 — while a
    same-group table WITHOUT the config stays unindexed."""
    from python_cdc_component_spark.queries import (
        _stage_docs_as_event_waves)
    from python_cdc_component_spark.streaming.bounded import (
        bounded_sync, bounded_sync_multi_fused)
    from python_cdc_component_spark.streaming.lexical_state import (
        StreamingLexicalIndex)

    docs = spark.createDataFrame(
        [(i, f"alpha w{i} w{i % 3} beta") for i in range(10)],
        "doc_id long, text string")
    flat_a = _stage_docs_as_event_waves(spark, docs,
                                        str(tmp_path / "a"), 2)
    flat_b = _stage_docs_as_event_waves(spark, docs,
                                        str(tmp_path / "b"), 2)
    flat_c = _stage_docs_as_event_waves(spark, docs,
                                        str(tmp_path / "c"), 2)
    base = dict(mode="DEDUPE", primary_keys=["user_id"],
                max_files_per_trigger=1, max_wait_s=5.0,
                lexical_parts=4)
    cfg_ref = BoundedStreamConfig(
        **base, lexical_index_path=str(tmp_path / "lex_ref"))
    bounded_sync(spark, flat_a, str(tmp_path / "st_ref"),
                 str(tmp_path / "ck_ref"), cfg_ref)
    cfg_t1 = BoundedStreamConfig(
        **base, lexical_index_path=str(tmp_path / "lex_fused"))
    cfg_t2 = BoundedStreamConfig(**base)
    res = bounded_sync_multi_fused(
        spark, {"t1": flat_b, "t2": flat_c}, str(tmp_path / "out"),
        str(tmp_path / "ckf"), {"t1": cfg_t1, "t2": cfg_t2})
    assert res["n_queries"] == 1    # one schema/mode/key group
    ref = StreamingLexicalIndex(str(tmp_path / "lex_ref"), num_parts=4)
    fus = StreamingLexicalIndex(str(tmp_path / "lex_fused"),
                                num_parts=4)

    def postings(lex):
        return {(r["term"], r["doc_id"], r["tf"]) for r in
                spark.read.parquet(lex.postings_path)
                .select("term", "doc_id", "tf").collect()}

    def dstats(lex):
        return {(r["doc_id"], r["dl"]) for r in
                spark.read.parquet(lex.docstats_path)
                .select("doc_id", "dl").collect()}

    assert postings(ref) == postings(fus)
    assert dstats(ref) == dstats(fus)
    assert ref.corpus_stats(spark) == fus.corpus_stats(spark)
    assert ([(r["doc_id"], r["bm25"]) for r in
             ref.bm25_topk(spark, ["alpha", "beta"], k=5).collect()]
            == [(r["doc_id"], r["bm25"]) for r in
                fus.bm25_topk(spark, ["alpha", "beta"],
                              k=5).collect()])
    # the unconfigured same-group table has no index anywhere
    assert not os.path.exists(str(tmp_path / "lex_t2"))


def test_fused_ann_parity_with_per_table(spark, tmp_path):
    """ANN side state on the fused fleet path: a fused table's index
    serves identical probe results to its per-table
    `bounded_sync(ann_index_path=...)` twin (same waves → same seed
    codebook → same cells → same top-k)."""
    import json as _json

    from python_cdc_component_spark.operators.llm.annindex import (
        IvfVectorIndex)
    from python_cdc_component_spark.queries import (
        _stage_docs_as_event_waves)
    from python_cdc_component_spark.streaming.bounded import (
        bounded_sync, bounded_sync_multi_fused)
    from pyspark.sql import functions as F

    def axis(i, dim=8):
        e = [0.0] * dim
        e[i % dim] = 1.0 + 0.01 * i
        return e

    vecs = spark.createDataFrame(
        [(i, _json.dumps(axis(i))) for i in range(12)],
        "doc_id long, text string")
    flat_a = _stage_docs_as_event_waves(spark, vecs,
                                        str(tmp_path / "a"), 2)
    flat_b = _stage_docs_as_event_waves(spark, vecs,
                                        str(tmp_path / "b"), 2)
    base = dict(mode="DEDUPE", primary_keys=["user_id"],
                max_files_per_trigger=1, max_wait_s=5.0,
                ann_index_cells=4)
    cfg_ref = BoundedStreamConfig(
        **base, ann_index_path=str(tmp_path / "ann_ref"))
    bounded_sync(spark, flat_a, str(tmp_path / "st_ref"),
                 str(tmp_path / "ck_ref"), cfg_ref)
    cfg_t1 = BoundedStreamConfig(
        **base, ann_index_path=str(tmp_path / "ann_fused"))
    bounded_sync_multi_fused(
        spark, {"t1": flat_b}, str(tmp_path / "out"),
        str(tmp_path / "ckf"), {"t1": cfg_t1})
    probes = spark.createDataFrame(
        [(5, axis(5)), (7, axis(7))], "qid long, qe array<double>")
    got = []
    for path in ("ann_ref", "ann_fused"):
        idx = IvfVectorIndex(str(tmp_path / path), n_cells=4)
        got.append(sorted(
            (r["qid"], r["cid"], r["sim"]) for r in
            idx.probe(spark, probes, k=5, nprobe=2).collect()))
    assert got[0] == got[1] and len(got[0]) > 0


def test_fleet_manifest_records_side_states(spark, tmp_path):
    """fleet.json names each table's maintained side states so
    operators (and erasure tooling) can find the indexes without
    reading per-table configs."""
    import json as _json

    from python_cdc_component_spark.queries import (
        _stage_docs_as_event_waves)
    from python_cdc_component_spark.streaming.bounded import (
        bounded_sync_multi_fused)

    docs = spark.createDataFrame([(1, "a b"), (2, "c d")],
                                 "doc_id long, text string")
    f1 = _stage_docs_as_event_waves(spark, docs, str(tmp_path / "1"), 1)
    f2 = _stage_docs_as_event_waves(spark, docs, str(tmp_path / "2"), 1)
    base = dict(mode="DEDUPE", primary_keys=["user_id"],
                max_wait_s=5.0)
    cfgs = {
        "t1": BoundedStreamConfig(
            **base, lexical_index_path=str(tmp_path / "lex")),
        "t2": BoundedStreamConfig(**base),
    }
    bounded_sync_multi_fused(
        spark, {"t1": f1, "t2": f2}, str(tmp_path / "out"),
        str(tmp_path / "ck"), cfgs)
    with open(str(tmp_path / "out" / "fleet.json")) as fh:
        manifest = _json.load(fh)
    (group,) = manifest.values()
    assert group["side_states"] == {
        "t1": {"lexical": {"path": str(tmp_path / "lex"),
                           "id_col": "user_id"}}}


def test_purge_fleet_keys_reaches_side_state_indexes(spark, tmp_path):
    """Fleet-wide right-to-be-forgotten erases the victim from the
    compacted state AND from the table's maintained lexical index —
    an erasure that cleaned only the state would leave the victim's
    tokens serving (r13)."""
    from python_cdc_component_spark.queries import (
        _stage_docs_as_event_waves)
    from python_cdc_component_spark.streaming.bounded import (
        bounded_sync_multi_fused, purge_fleet_keys, read_fleet_table)
    from python_cdc_component_spark.streaming.lexical_state import (
        StreamingLexicalIndex)

    docs = spark.createDataFrame(
        [(i, f"alpha secret{i} w{i}") for i in range(6)],
        "doc_id long, text string")
    flat = _stage_docs_as_event_waves(spark, docs,
                                      str(tmp_path / "ev"), 2)
    cfg = BoundedStreamConfig(
        mode="DEDUPE", primary_keys=["user_id"], max_wait_s=5.0,
        lexical_index_path=str(tmp_path / "lex"), lexical_parts=4)
    bounded_sync_multi_fused(
        spark, {"t1": flat}, str(tmp_path / "out"),
        str(tmp_path / "ck"), {"t1": cfg})
    lex = StreamingLexicalIndex(str(tmp_path / "lex"), num_parts=4)
    assert lex.corpus_stats(spark)[0] == 6
    res = purge_fleet_keys(
        spark, str(tmp_path / "out"),
        spark.createDataFrame([(2,), (4,)], "user_id long"))
    assert res["side_state_rows_erased"]["t1/lexical"] > 0
    assert res["skipped_side_states"] == []
    # gone from the compacted state
    left = {r["user_id"] for r in
            read_fleet_table(spark, str(tmp_path / "out"), "t1")
            .select("user_id").collect()}
    assert left == {0, 1, 3, 5}
    # gone from the index: postings, docstats, maintained stats
    hits = {r["doc_id"] for r in
            lex.bm25_topk(spark, ["alpha"], k=10).collect()}
    assert hits == {0, 1, 3, 5}
    assert lex.corpus_stats(spark)[0] == 4
    assert lex.corpus_stats(spark) == lex._recompute_stats(spark)
