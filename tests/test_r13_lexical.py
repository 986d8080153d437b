"""Maintained (n_docs, Σdl) corpus stats for the lexical index
(VERDICT r12 #1) — the retract/add single-row aggregate that removes
the last O(corpus)-per-probe term from `bm25_topk`. Contracts: the
maintained row equals a full docstats recompute after every CDC epoch
(insert / update / tombstone — a purge must retract its dl), replays
converge on the epoch-pinned base, ad-hoc erasure retracts and its
RETRY never compounds, legacy stores bootstrap once, and duplicate
query terms dedup instead of crashing the pivot (ADVICE r12)."""

import os

from python_cdc_component_spark.streaming.bounded import (
    BoundedStreamConfig, _maintain_lexical_index)
from python_cdc_component_spark.streaming.lexical_state import (
    StreamingLexicalIndex)


def _batch(spark, rows, epoch):
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


def _assert_exact(spark, lex):
    assert lex.corpus_stats(spark) == lex._recompute_stats(spark)


def test_corpstats_track_recompute_through_cdc(spark, tmp_path):
    """Insert, update and tombstone epochs: after each, the maintained
    aggregate equals a full recompute — a purge retracts exactly the
    victims' dl, an update swaps old dl for new."""
    cfg = _cfg(tmp_path)
    lex = StreamingLexicalIndex(cfg.lexical_index_path, num_parts=8)
    _maintain_lexical_index(
        spark, lex, _batch(spark, [(1, "alpha x y"), (2, "beta z"),
                                   (3, "gamma q r s t")], 0), 0, cfg)
    assert lex.corpus_stats(spark) == (3, 3 + 2 + 5)
    _assert_exact(spark, lex)
    # update doc 1 (dl 3 -> 5), insert doc 4
    _maintain_lexical_index(
        spark, lex, _batch(spark, [(1, "alpha a b c d"),
                                   (4, "delta w")], 1), 1, cfg)
    assert lex.corpus_stats(spark) == (4, 5 + 2 + 5 + 2)
    _assert_exact(spark, lex)
    # tombstone docs 2 and 3
    _maintain_lexical_index(
        spark, lex, _batch(spark, [(2, None), (3, None)], 2), 2, cfg)
    assert lex.corpus_stats(spark) == (2, 5 + 2)
    _assert_exact(spark, lex)
    # full erasure: stats drop to zero, store still queryable
    _maintain_lexical_index(
        spark, lex, _batch(spark, [(1, None), (4, None)], 3), 3, cfg)
    assert lex.corpus_stats(spark) == (0, 0)
    _assert_exact(spark, lex)


def test_corpstats_replay_converges(spark, tmp_path):
    """An unmarked-epoch replay (the crash contract) re-runs
    purge-then-add; the epoch-pinned base makes the stats land on the
    same final instead of double-counting."""
    cfg = _cfg(tmp_path)
    lex = StreamingLexicalIndex(cfg.lexical_index_path, num_parts=8)
    _maintain_lexical_index(
        spark, lex, _batch(spark, [(i, f"alpha w{i} w{i}")
                                   for i in range(4)], 0), 0, cfg)
    b1 = _batch(spark, [(0, "beta longer text here"), (9, "gamma z")],
                1)
    _maintain_lexical_index(spark, lex, b1, 1, cfg)
    want = lex.corpus_stats(spark)
    assert want == (5, 3 * 3 + 4 + 2)
    os.remove(os.path.join(cfg.lexical_index_path, "_epochs", "1"))
    _maintain_lexical_index(spark, lex, b1, 1, cfg)
    assert lex.corpus_stats(spark) == want
    _assert_exact(spark, lex)
    # replay the replay (double crash): still the same final
    os.remove(os.path.join(cfg.lexical_index_path, "_epochs", "1"))
    _maintain_lexical_index(spark, lex, b1, 1, cfg)
    assert lex.corpus_stats(spark) == want
    _assert_exact(spark, lex)


def test_corpstats_store_level_epoch_replay(spark, tmp_path):
    """Store-level replay sequence a maintenance driver would issue
    after a crash INSIDE the add: purge(epoch) → add(epoch) →
    purge(epoch) → add(epoch) ends at the single-application stats."""
    lex = StreamingLexicalIndex(str(tmp_path / "lex"), num_parts=4)
    seed = spark.createDataFrame(
        [(1, "a b c"), (2, "d e")], "doc_id long, text string")
    lex.add_batch(spark, seed, epoch=0)
    assert lex.corpus_stats(spark) == (2, 5)
    batch = spark.createDataFrame(
        [(1, "a b c d e f"), (3, "g h")], "doc_id long, text string")
    vic = batch.select("doc_id")
    lex.purge_docs_df(spark, vic, epoch=1)
    lex.add_batch(spark, batch, epoch=1)
    want = lex.corpus_stats(spark)
    assert want == (3, 6 + 2 + 2)
    # crashed-add replay: purge again (deletes the re-added rows,
    # resets the in-flight final to the base), add again
    lex.purge_docs_df(spark, vic, epoch=1)
    lex.add_batch(spark, batch, epoch=1)
    assert lex.corpus_stats(spark) == want
    _assert_exact(spark, lex)


def test_corpstats_adhoc_purge_retracts_and_retry_is_safe(spark,
                                                          tmp_path):
    lex = StreamingLexicalIndex(str(tmp_path / "lex"), num_parts=4)
    lex.add_batch(spark, spark.createDataFrame(
        [(i, f"alpha w{i} pad pad") for i in range(6)],
        "doc_id long, text string"))
    assert lex.corpus_stats(spark) == (6, 24)
    assert lex.purge_docs(spark, [0, 3]) > 0
    assert lex.corpus_stats(spark) == (4, 16)
    _assert_exact(spark, lex)
    # retry of the same erasure: nothing left to retract, stats hold
    assert lex.purge_docs(spark, [0, 3]) == 0
    assert lex.corpus_stats(spark) == (4, 16)
    # purging never-indexed ids is a no-op for data AND stats
    assert lex.purge_docs(spark, [100, 101]) == 0
    assert lex.corpus_stats(spark) == (4, 16)


def test_corpstats_legacy_bootstrap_and_rebuild(spark, tmp_path):
    """A pre-stats (r12) store bootstraps from one full docstats
    aggregate on first touch; rebuild_corpstats repairs a drifted
    value (the documented ad-hoc crash-window remedy)."""
    lex = StreamingLexicalIndex(str(tmp_path / "lex"), num_parts=4)
    lex.add_batch(spark, spark.createDataFrame(
        [(1, "a b"), (2, "c d e")], "doc_id long, text string"))
    os.remove(os.path.join(str(tmp_path / "lex"), "_corpstats.json"))
    # bootstrap equals recompute, and is persisted for later reads
    assert lex.corpus_stats(spark) == (2, 5)
    assert os.path.exists(
        os.path.join(str(tmp_path / "lex"), "_corpstats.json"))
    # corrupt the maintained value; rebuild repairs from docstats
    lex._write_stats(spark, (99, 999), (99, 999), None, "drifted")
    assert lex.corpus_stats(spark) == (99, 999)
    assert lex.rebuild_corpstats(spark) == (2, 5)
    assert lex.corpus_stats(spark) == (2, 5)


def test_bm25_duplicate_terms_dedup(spark, tmp_path):
    """Duplicate query terms dedup order-preserved (ADVICE r12: a
    repeated pivot key was an ambiguous-column AnalysisException)."""
    import pytest

    lex = StreamingLexicalIndex(str(tmp_path / "lex"), num_parts=4)
    lex.add_batch(spark, spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "beta gamma"), (3, "delta x")],
        "doc_id long, text string"))
    base = [(r["doc_id"], r["bm25"]) for r in
            lex.bm25_topk(spark, ["alpha", "beta"], k=10).collect()]
    dup = [(r["doc_id"], r["bm25"]) for r in
           lex.bm25_topk(spark, ["alpha", "beta", "alpha"],
                         k=10).collect()]
    assert base == dup and len(base) == 2
    with pytest.raises(ValueError, match="query term"):
        lex.bm25_topk(spark, [])


def test_proximity_topk_contracts(spark, tmp_path):
    """Index-fed NEAR(±w): counts match hand counts (qualifying
    positions of term_a, the scan-based n_near convention), survive
    update/tombstone through the CDC path, window=0 means exact
    co-position (never true for distinct tokens of one doc), the
    same-term probe counts every position, and a non-positional store
    fails loudly."""
    import pytest

    cfg = BoundedStreamConfig(
        mode="DEDUPE", primary_keys=["user_id"],
        lexical_index_path=str(tmp_path / "lex"), lexical_parts=4,
        lexical_positions=True)
    lex = StreamingLexicalIndex(cfg.lexical_index_path, num_parts=4,
                                positions=True)
    _maintain_lexical_index(
        spark, lex, _batch(spark, [
            (1, "a x x b a"),        # a@1,5; b@4 → w2: a@5 only → 1
            (2, "a b a b"),          # a@1,3 both near b → 2
            (3, "a x x x x x b"),    # a@1, b@7 → |6| > 2 → 0
            (4, "b b b")], 0), 0, cfg)   # no 'a' → absent
    got = [(r["doc_id"], r["n_near"]) for r in
           lex.proximity_topk(spark, "a", "b", window=2,
                              k=10).collect()]
    assert got == [(2, 2), (1, 1)], got
    # wider window reaches doc 3
    got6 = [(r["doc_id"], r["n_near"]) for r in
            lex.proximity_topk(spark, "a", "b", window=6,
                               k=10).collect()]
    assert got6 == [(1, 2), (2, 2), (3, 1)], got6
    # same-term probe: |p-p| = 0 qualifies every position
    same = dict((r["doc_id"], r["n_near"]) for r in
                lex.proximity_topk(spark, "b", "b", window=0,
                                   k=10).collect())
    assert same == {1: 1, 2: 2, 3: 1, 4: 3}, same
    # update doc 2 (loses 'b'), tombstone doc 1
    _maintain_lexical_index(
        spark, lex, _batch(spark, [(2, "a a a"), (1, None)], 1),
        1, cfg)
    got = [(r["doc_id"], r["n_near"]) for r in
           lex.proximity_topk(spark, "a", "b", window=6,
                              k=10).collect()]
    assert got == [(3, 1)], got
    # non-positional store: fail loudly, not empty
    plain = StreamingLexicalIndex(str(tmp_path / "plain"), num_parts=4)
    plain.add_batch(spark, spark.createDataFrame(
        [(1, "a b")], "doc_id long, text string"))
    with pytest.raises(ValueError, match="positions"):
        plain.proximity_topk(spark, "a", "b")
    with pytest.raises(ValueError, match="window"):
        lex.proximity_topk(spark, "a", "b", window=-1)


def test_insert_only_epoch_skips_partition_rewrites(spark, tmp_path):
    """An epoch of purely NEW doc ids must not rewrite existing
    docstats/_docterms partition files (the purge's sidecar semi-join
    comes back empty → the rewrites are skipped, appends only)."""
    cfg = _cfg(tmp_path)
    lex = StreamingLexicalIndex(cfg.lexical_index_path, num_parts=8)
    _maintain_lexical_index(
        spark, lex, _batch(spark, [(i, f"alpha w{i}")
                                   for i in range(4)], 0), 0, cfg)

    def data_files():
        out = {}
        for sub in ("docstats", "_docterms"):
            root = os.path.join(cfg.lexical_index_path, sub)
            for r, _, fs in os.walk(root):
                for f in fs:
                    if f.endswith(".parquet"):
                        p = os.path.join(r, f)
                        out[p] = os.path.getmtime(p)
        return out

    before = data_files()
    _maintain_lexical_index(
        spark, lex, _batch(spark, [(i, f"beta w{i}")
                                   for i in range(10, 14)], 1), 1, cfg)
    after = data_files()
    # every pre-existing file survived untouched (no rewrite), and the
    # new epoch appended new files
    for p, mt in before.items():
        assert p in after and after[p] == mt, p
    assert len(after) > len(before)
    _assert_exact(spark, lex)
