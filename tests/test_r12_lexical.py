"""CDC-maintained lexical (BM25) index side state (VERDICT r11 #3) —
the contracts the insert-only `lexical_index_bm25_sync` oracle can't
see: UPDATE purge-then-reindex (stale postings must not survive a
changed text), tombstone erasure, crash/replay convergence on the
epoch markers, df/list purge parity, compaction, and the emptied-store
read guards."""

import os

from pyspark.sql import functions as F

from python_cdc_component_spark.streaming.bounded import (
    BoundedStreamConfig, _maintain_lexical_index)
from python_cdc_component_spark.streaming.lexical_state import (
    StreamingLexicalIndex, TERM_PART_COL)

TERMS = ["alpha", "beta", "gamma", "delta"]


def _batch(spark, rows, epoch):
    """rows: [(doc_id, text-or-None)] — None payload = tombstone."""
    data = [(did, tx if tx is not None else "x", 1_000 + epoch, "f",
             j, tx is None, None)
            for j, (did, tx) in enumerate(rows)]
    return spark.createDataFrame(
        data,
        "user_id long, props string, kbc__event_timestamp long, "
        "kbc__file string, kbc__pos long, __deleted boolean, "
        "_snapshot_phase string")


def _cfg(tmp_path):
    return BoundedStreamConfig(
        mode="DEDUPE", primary_keys=["user_id"],
        lexical_index_path=str(tmp_path / "lex"), lexical_parts=8)


def _lex(cfg):
    return StreamingLexicalIndex(cfg.lexical_index_path, num_parts=8)


def _postings(spark, lex):
    return {(r["term"], r["doc_id"], r["tf"]) for r in
            spark.read.parquet(lex.postings_path)
            .select("term", "doc_id", "tf").collect()}


def test_update_drops_stale_postings(spark, tmp_path):
    """doc 1 starts matching 'alpha'; an UPDATE changes it to 'beta'
    — a query for 'alpha' must stop retrieving it, 'beta' must."""
    cfg = _cfg(tmp_path)
    lex = _lex(cfg)
    _maintain_lexical_index(
        spark, lex, _batch(spark, [(1, "alpha alpha x"),
                                   (2, "beta y z")], 0), 0, cfg)
    got = {r["doc_id"] for r in
           lex.bm25_topk(spark, ["alpha"], k=5).collect()}
    assert got == {1}
    _maintain_lexical_index(
        spark, lex, _batch(spark, [(1, "beta q r")], 1), 1, cfg)
    assert {r["doc_id"] for r in
            lex.bm25_topk(spark, ["alpha"], k=5).collect()} == set()
    assert {r["doc_id"] for r in
            lex.bm25_topk(spark, ["beta"], k=5).collect()} == {1, 2}
    # the stale tf rows are physically gone, not just outranked
    assert not any(d == 1 and t == "alpha"
                   for t, d, _ in _postings(spark, lex))


def test_tombstone_erases_and_stats_shift(spark, tmp_path):
    cfg = _cfg(tmp_path)
    lex = _lex(cfg)
    _maintain_lexical_index(
        spark, lex, _batch(spark, [(i, f"alpha w{i} w{i}")
                                   for i in range(4)], 0), 0, cfg)
    _maintain_lexical_index(
        spark, lex, _batch(spark, [(0, None), (1, None)], 1), 1, cfg)
    left = {r["doc_id"] for r in
            lex.bm25_topk(spark, ["alpha"], k=10).collect()}
    assert left == {2, 3}
    # docstats shrank with the erasure (N drives the idf)
    n = spark.read.parquet(lex.docstats_path).count()
    assert n == 2


def test_replay_is_byte_noop_and_crash_converges(spark, tmp_path):
    cfg = _cfg(tmp_path)
    lex = _lex(cfg)
    b0 = _batch(spark, [(1, "alpha x"), (2, "beta y")], 0)
    b1 = _batch(spark, [(3, "gamma z")], 1)
    _maintain_lexical_index(spark, lex, b0, 0, cfg)
    _maintain_lexical_index(spark, lex, b1, 1, cfg)
    clean = _postings(spark, lex)
    # marked replay: byte-level no-op
    root = cfg.lexical_index_path
    mt = {p: os.path.getmtime(os.path.join(r, p))
          for r, _, fs in os.walk(root) for p in fs}
    _maintain_lexical_index(spark, lex, b1, 1, cfg)
    mt2 = {p: os.path.getmtime(os.path.join(r, p))
           for r, _, fs in os.walk(root) for p in fs}
    assert mt == mt2
    # crash INSIDE epoch 2: sidecar written, postings half-written
    # (simulated: run the add then delete the marker and re-run — the
    # replay's purge-then-add must converge to identical content)
    b2 = _batch(spark, [(4, "delta q"), (1, "alpha x2")], 2)
    _maintain_lexical_index(spark, lex, b2, 2, cfg)
    after = _postings(spark, lex)
    os.remove(os.path.join(root, "_epochs", "2"))
    _maintain_lexical_index(spark, lex, b2, 2, cfg)
    assert _postings(spark, lex) == after
    # epoch 2 was an update+insert: doc 1's stale row out, new in
    assert ("x", 1, 1) in clean and ("x", 1, 1) not in after
    assert ("x2", 1, 1) in after and ("delta", 4, 1) in after


def test_purge_df_list_parity_and_idempotence(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i} w{i % 3}") for i in range(12)],
        "doc_id long, text string")
    la = StreamingLexicalIndex(str(tmp_path / "a"), num_parts=8)
    lb = StreamingLexicalIndex(str(tmp_path / "b"), num_parts=8)
    la.add_batch(spark, docs)
    lb.add_batch(spark, docs)
    na = la.purge_docs(spark, [0, 5, 5, 11])
    nb = lb.purge_docs_df(
        spark, spark.createDataFrame([(0,), (5,), (5,), (11,)],
                                     "doc_id int"))
    assert na == nb > 0
    assert _postings(spark, la) == _postings(spark, lb)
    assert lb.purge_docs_df(
        spark, spark.createDataFrame([(5,)], "doc_id long")) == 0
    # sidecar hygiene: victims gone from _docterms
    left = {r["doc_id"] for r in
            spark.read.parquet(la._docterms_path)
            .select("doc_id").collect()}
    assert left & {0, 5, 11} == set()


def test_emptied_index_reads_and_requeries(spark, tmp_path):
    """Purging every doc leaves marker-only dirs; queries return empty
    and a later ingest resumes cleanly (the ADVICE r11 empty-dir
    class, applied from birth)."""
    cfg = _cfg(tmp_path)
    lex = _lex(cfg)
    _maintain_lexical_index(
        spark, lex, _batch(spark, [(1, "alpha x"), (2, "beta y")], 0),
        0, cfg)
    _maintain_lexical_index(
        spark, lex, _batch(spark, [(1, None), (2, None)], 1), 1, cfg)
    assert lex.bm25_topk(spark, ["alpha"], k=5).count() == 0
    _maintain_lexical_index(
        spark, lex, _batch(spark, [(7, "alpha fresh")], 2), 2, cfg)
    assert {r["doc_id"] for r in
            lex.bm25_topk(spark, ["alpha"], k=5).collect()} == {7}


def test_compaction_folds_accretion(spark, tmp_path):
    lex = StreamingLexicalIndex(str(tmp_path / "lex"), num_parts=2,
                                compact_file_threshold=2)
    for i in range(6):
        lex.add_batch(spark, spark.createDataFrame(
            [(10 * i + j, f"alpha w{i} w{j}") for j in range(3)],
            "doc_id long, text string"))
    before = _postings(spark, lex)
    assert lex.compact(spark) > 0
    assert _postings(spark, lex) == before
    # every postings partition folded to ≤ threshold files
    for name in os.listdir(lex.postings_path):
        if name.startswith(f"{TERM_PART_COL}="):
            files = [f for f in
                     os.listdir(os.path.join(lex.postings_path, name))
                     if f.endswith(".parquet")]
            assert len(files) <= 2, (name, len(files))


def test_fused_fleet_rejects_unsupported_side_state(spark, tmp_path):
    """The fused fleet path composes the LEXICAL and ANN side states
    (r13) but still rejects the other per-table kinds LOUDLY
    (silently ignoring one would skip maintenance for every epoch of
    that table), and an index config on an APPEND-mode fleet rejects
    too."""
    import pytest

    from python_cdc_component_spark.streaming.bounded import (
        bounded_sync_multi_fused)

    # any events dir works — the guard fires before any read
    events = str(tmp_path / "ev")
    spark.createDataFrame(
        [(1, 1000, 1, "signup", 0.0, "x")],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string").write.parquet(events)
    for field in ("semantic_groups_path", "dedup_groups_path"):
        cfg = BoundedStreamConfig(mode="DEDUPE",
                                  primary_keys=["user_id"],
                                  **{field: str(tmp_path / "side")})
        with pytest.raises(ValueError, match="fused fleet"):
            bounded_sync_multi_fused(
                spark, {"t1": events}, str(tmp_path / "out"),
                str(tmp_path / "ck"), {"t1": cfg})
    for field in ("lexical_index_path", "ann_index_path"):
        cfg = BoundedStreamConfig(
            mode="APPEND", primary_keys=["user_id"],
            **{field: str(tmp_path / "side")})
        with pytest.raises(ValueError, match="DEDUPE"):
            bounded_sync_multi_fused(
                spark, {"t1": events}, str(tmp_path / "out"),
                str(tmp_path / "ck"), {"t1": cfg})


def test_phrase_topk_positional_contracts(spark, tmp_path):
    """Positional layout: phrase counts match hand counts, survive
    update/tombstone through the CDC path, 3-term phrases fold
    correctly, and a non-positional store fails loudly."""
    import pytest

    cfg = BoundedStreamConfig(
        mode="DEDUPE", primary_keys=["user_id"],
        lexical_index_path=str(tmp_path / "lex"), lexical_parts=4,
        lexical_positions=True)
    lex = StreamingLexicalIndex(cfg.lexical_index_path, num_parts=4,
                                positions=True)
    _maintain_lexical_index(
        spark, lex, _batch(spark, [
            (1, "a b c a b c a b"),        # 'a b' ×3, 'a b c' ×2
            (2, "a x b a b"),              # 'a b' ×1
            (3, "b a b a")], 0), 0, cfg)   # 'a b' ×1
    got = [(r["doc_id"], r["n_phrase"]) for r in
           lex.phrase_topk(spark, ["a", "b"], k=10).collect()]
    assert got == [(1, 3), (2, 1), (3, 1)], got
    got3 = [(r["doc_id"], r["n_phrase"]) for r in
            lex.phrase_topk(spark, ["a", "b", "c"], k=10).collect()]
    assert got3 == [(1, 2)], got3
    # update doc 1 (loses the phrase), tombstone doc 2
    _maintain_lexical_index(
        spark, lex, _batch(spark, [(1, "c c c"), (2, None)], 1),
        1, cfg)
    got = [(r["doc_id"], r["n_phrase"]) for r in
           lex.phrase_topk(spark, ["a", "b"], k=10).collect()]
    assert got == [(3, 1)], got
    # a reopened handle adopts the pinned positional layout
    fresh = StreamingLexicalIndex(cfg.lexical_index_path, num_parts=4)
    assert fresh.phrase_topk(spark, ["a", "b"], k=10).count() == 1
    # non-positional store: fail loudly, not empty
    plain = StreamingLexicalIndex(str(tmp_path / "plain"), num_parts=4)
    plain.add_batch(spark, spark.createDataFrame(
        [(1, "a b")], "doc_id long, text string"))
    with pytest.raises(ValueError, match="positions"):
        plain.phrase_topk(spark, ["a", "b"])
    with pytest.raises(ValueError, match="2 terms"):
        lex.phrase_topk(spark, ["a"])


def test_positions_meta_pinned_against_constructor(spark, tmp_path):
    """The positional flag is physical layout: a handle opened with
    the OTHER constructor arg adopts the stored value (a silent flip
    would leave mixed rows)."""
    lex = StreamingLexicalIndex(str(tmp_path / "lex"), num_parts=4,
                                positions=True)
    lex.add_batch(spark, spark.createDataFrame(
        [(1, "a b a")], "doc_id long, text string"))
    re_opened = StreamingLexicalIndex(str(tmp_path / "lex"),
                                      num_parts=4, positions=False)
    re_opened.add_batch(spark, spark.createDataFrame(
        [(2, "b a b")], "doc_id long, text string"))
    # the second batch wrote POSITIONAL rows (stored flag won)
    rows = spark.read.parquet(re_opened.postings_path)
    assert "pos_list" in rows.columns
    assert rows.filter("doc_id = 2 and pos_list is null").count() == 0
    # 'b a' occurs once in each doc ("a b a" at 2, "b a b" at 1);
    # tie breaks to doc_id
    assert [(r["doc_id"], r["n_phrase"]) for r in
            re_opened.phrase_topk(spark, ["b", "a"], k=5).collect()] \
        == [(1, 1), (2, 1)]
