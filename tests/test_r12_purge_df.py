"""VERDICT r11 #1: DataFrame-victims purge across the TEXT-side state
stack. The list APIs (`StreamingLshIndex.purge_docs`,
`StreamingDedupGroups.purge_docs`, `StreamingSemanticGroups.purge_docs`)
now delegate to `purge_docs_df`, so every pre-existing crash/replay/
erasure suite already runs against the new implementation; these tests
pin the parity and the DataFrame-specific contracts:

* df/list parity — same return value, same groups, same surviving
  state content, same sidecar hygiene;
* castable/duplicate victim columns;
* idempotent retry (re-purging erased ids is a no-op);
* the per-epoch hot paths (`_maintain_dedup_groups`,
  `_maintain_semantic_groups`) produce byte-identical group stores to
  their pre-rewrite list-driven behavior (covered transitively by
  test_r11_semantic_sync + test_r8_fleet_dedup_groups, re-run green);
* the distributed malformed-key gate still fails loudly
  (test_r10_advice, re-run green).
"""

import os

from pyspark.sql import functions as F

from python_cdc_component_spark.streaming.dedup_state import (
    StreamingDedupGroups)
from python_cdc_component_spark.streaming.semantic_state import (
    StreamingSemanticGroups)

BASE = " ".join(f"w{i}" for i in range(40))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus_rows():
    # 0,1 near-dup pair; 2 boilerplate twin of 3; 4,5 singletons
    return [(0, BASE + " a"), (1, BASE + " b"),
            (2, BASE + " zz yy xx"), (3, BASE + " zz yy xx"),
            (4, "unique alpha beta gamma delta " + BASE[:50]),
            (5, "another totally different doc " + "q " * 30)]


def _build_groups(spark, path):
    st = StreamingDedupGroups(path, num_buckets=8)
    docs = _docs(spark, _corpus_rows())
    st.process_batch(spark, docs, corpus=docs, batch_id=1)
    return st


def _state(spark, st):
    groups = {(r["component"], r["keep_doc_id"], r["cluster_size"])
              for r in st.read_groups(spark).collect()}
    nm = {(r["node"], r["component"])
          for r in st._latest(
              spark.read.option("basePath", st._node_map_path)
              .parquet(st._node_map_path)).collect()} \
        if os.path.exists(st._node_map_path) else set()
    return groups, nm


def test_groups_purge_df_parity_with_list_api(spark, tmp_path):
    """Same victims through both APIs → identical groups, identical
    surviving claims, identical return value."""
    a = _build_groups(spark, str(tmp_path / "a"))
    b = _build_groups(spark, str(tmp_path / "b"))
    victims = [0, 3, 4]          # a label, a dup member, a singleton
    na = a.purge_docs(spark, victims, purge_batch_id=2)
    vic_df = spark.createDataFrame([(v,) for v in victims],
                                   "doc_id long")
    nb = b.purge_docs_df(spark, vic_df, purge_batch_id=2)
    assert na == nb
    assert _state(spark, a) == _state(spark, b)
    # docs 0-3 all share BASE → one component; purging {0,3} leaves
    # survivors {1,2} relabeled to 1 with the longest doc (2) as
    # keeper; 4 erased; 5 stays a singleton
    groups, _ = _state(spark, a)
    assert groups == {(1, 2, 2), (5, 5, 1)}, groups


def test_groups_purge_df_castable_duplicates_idempotent(spark,
                                                        tmp_path):
    st = _build_groups(spark, str(tmp_path / "st"))
    vic = spark.createDataFrame([(0,), (0,), (3,)],
                                "doc_id int")      # int → long cast
    n1 = st.purge_docs_df(spark, vic, purge_batch_id=2)
    assert n1 > 0
    groups, _ = _state(spark, st)
    members = set()
    for _, k, _ in groups:
        members.add(k)
    assert 0 not in members and 3 not in members
    # retry converges: nothing left to erase (tier 3 is the next slot)
    assert st.purge_docs_df(spark, vic, purge_batch_id=3) == 0


def test_groups_purge_df_empty_victims_noop(spark, tmp_path):
    st = _build_groups(spark, str(tmp_path / "st"))
    before = _state(spark, st)
    empty = spark.createDataFrame([], "doc_id long")
    assert st.purge_docs_df(spark, empty, purge_batch_id=2) == 0
    assert _state(spark, st) == before


def test_lsh_purge_df_parity(spark, tmp_path):
    """Index-level parity: victim bands gone, survivor bands intact,
    docmap hygiene — both APIs, both return values."""
    from python_cdc_component_spark.streaming.lsh_index import (
        StreamingLshIndex)

    docs = _docs(spark, _corpus_rows())
    ia = StreamingLshIndex(str(tmp_path / "ia"), num_buckets=8)
    ib = StreamingLshIndex(str(tmp_path / "ib"), num_buckets=8)
    ia.process_batch(spark, docs, batch_id=0)
    ib.process_batch(spark, docs, batch_id=0)
    na = ia.purge_docs(spark, [1, 2])
    nb = ib.purge_docs_df(
        spark, spark.createDataFrame([(1,), (2,)], "doc_id long"))
    assert na == nb
    for ix in (ia, ib):
        left = {r["doc_id"] for r in
                spark.read.option("basePath", ix._docmap_path)
                .parquet(ix._docmap_path).select("doc_id").collect()}
        assert left & {1, 2} == set(), (ix.index_path, left)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, e array<double>")


def _axis(i, dim=8, v=1.0):
    e = [0.0] * dim
    e[i % dim] = v
    return e


def test_semantic_purge_df_parity(spark, tmp_path):
    rows = ([(i, _axis(i % 4)) for i in range(4)]
            + [(10 + i, _axis(i % 4, v=1.0 + 0.01 * i))
               for i in range(8)])
    sa = StreamingSemanticGroups(str(tmp_path / "sa"), n_cells=2,
                                 threshold=0.4, num_buckets=4)
    sb = StreamingSemanticGroups(str(tmp_path / "sb"), n_cells=2,
                                 threshold=0.4, num_buckets=4)
    sa.process_batch(spark, _emb(spark, rows), batch_id=0)
    sb.process_batch(spark, _emb(spark, rows), batch_id=0)
    victims = [0, 11, 13]
    na = sa.purge_docs(spark, victims, purge_batch_id=1)
    nb = sb.purge_docs_df(
        spark, spark.createDataFrame([(v,) for v in victims],
                                     "vec_id long"),
        purge_batch_id=1)
    assert na == nb
    ga = {(r["keep_doc_id"], r["cluster_size"])
          for r in sa.read_groups(spark).collect()}
    gb = {(r["keep_doc_id"], r["cluster_size"])
          for r in sb.read_groups(spark).collect()}
    assert ga == gb
    assert not any(k in (0, 11, 13) for k, _ in ga)
    for s in (sa, sb):
        left = {r["vec_id"] for r in
                spark.read.parquet(f"{s.state_path}/vectors")
                .select("vec_id").collect()}
        assert left & set(victims) == set()
