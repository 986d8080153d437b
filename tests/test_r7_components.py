"""Scale-adaptive connected components (round 7): the driver-side
union-find fast path must be bit-identical to the distributed
min-label loop — the cutover is a pure performance decision — and the
bounded probe must never let a big graph onto the driver."""

from pyspark.sql import functions as F

from python_cdc_component_spark.operators.llm.components import (
    connected_components)


def _graph(spark, n_chains=5, chain_len=8, n_triangles=4):
    edges = []
    base = 0
    for _ in range(n_chains):
        edges += [(base + i, base + i + 1) for i in range(chain_len)]
        base += chain_len + 10
    for _ in range(n_triangles):
        edges += [(base, base + 1), (base + 1, base + 2),
                  (base, base + 2)]
        base += 13
    return spark.createDataFrame(edges, "src long, dst long")


def test_fast_and_distributed_paths_identical(spark):
    edges = _graph(spark)
    fast = {(r.node, r.component)
            for r in connected_components(edges).collect()}
    dist = {(r.node, r.component)
            for r in connected_components(
                edges, small_graph_edges=0).collect()}
    assert fast == dist
    assert fast           # non-empty


def test_probe_truncation_falls_back_to_distributed(spark):
    """A graph one edge over the threshold must take the distributed
    path and still be correct (the truncated probe is discarded)."""
    edges = spark.createDataFrame([(i, i + 1) for i in range(12)],
                                  "src long, dst long")
    out = {(r.node, r.component)
           for r in connected_components(
               edges, small_graph_edges=5).collect()}
    assert out == {(i, 0) for i in range(13)}


def test_empty_edges_empty_components(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    out = connected_components(empty)
    assert out.columns == ["node", "component"]
    assert out.count() == 0


def test_fast_path_duplicate_and_reversed_edges(spark):
    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 3), (2, 3), (7, 7)],
        "src long, dst long")
    out = {(r.node, r.component)
           for r in connected_components(edges).collect()}
    assert out == {(1, 1), (2, 1), (3, 1), (7, 7)}


def test_string_node_ids_preserve_type_on_both_paths(spark):
    """ADVICE r7 (low), extended in r8: non-integral node ids used to
    be distributed-only (the old driver path long-cast nulled them);
    the generic driver path must now agree with the distributed loop
    bit-for-bit — Python str ordering is code-point order, which
    equals Spark's UTF8 binary ordering."""
    edges = spark.createDataFrame(
        [("apple", "banana"), ("banana", "cherry"), ("x", "y")],
        "src string, dst string")
    want = {("apple", "apple"), ("banana", "apple"),
            ("cherry", "apple"), ("x", "x"), ("y", "x")}
    for kw in ({}, {"small_graph_edges": 0}):
        out = connected_components(edges, **kw)
        assert dict(out.dtypes) == {"node": "string",
                                    "component": "string"}
        assert {(r.node, r.component) for r in out.collect()} == want


def test_struct_node_ids_cross_path_parity(spark):
    """Round-8: hybrid_dedup_keep's exact-group collapse feeds struct
    text keys straight into the closure — both paths must accept them,
    agree row-for-row, and preserve the struct type (Python tuple
    ordering equals Spark struct field-by-field ordering)."""
    rows = [((0, 10, 1), (0, 20, 2)), ((0, 20, 2), (0, 5, 9)),
            ((1, 7, 0), (0, 99, 3))]
    edges = spark.createDataFrame(
        rows, "src struct<s:int,k1:long,k2:long>, "
              "dst struct<s:int,k1:long,k2:long>")
    got_fast = connected_components(edges)
    got_dist = connected_components(edges, small_graph_edges=0)
    assert (dict(got_fast.dtypes)["node"]
            == dict(got_dist.dtypes)["node"]
            == "struct<s:int,k1:bigint,k2:bigint>")
    fast = {(tuple(r.node), tuple(r.component))
            for r in got_fast.collect()}
    dist = {(tuple(r.node), tuple(r.component))
            for r in got_dist.collect()}
    assert fast == dist
    assert fast == {((0, 10, 1), (0, 5, 9)), ((0, 20, 2), (0, 5, 9)),
                    ((0, 5, 9), (0, 5, 9)), ((1, 7, 0), (0, 99, 3)),
                    ((0, 99, 3), (0, 99, 3))}


def test_integral_ids_share_one_output_contract(spark):
    """int32 ids widen to long on BOTH paths — fast and distributed
    emit the same schema and the same rows."""
    edges = spark.createDataFrame([(1, 2), (2, 3), (9, 10)],
                                  "src int, dst int")
    fast = connected_components(edges)
    dist = connected_components(edges, small_graph_edges=0)
    assert dict(fast.dtypes) == dict(dist.dtypes) == {
        "node": "bigint", "component": "bigint"}
    assert ({tuple(r) for r in fast.collect()}
            == {tuple(r) for r in dist.collect()}
            == {(1, 1), (2, 1), (3, 1), (9, 9), (10, 9)})


def test_null_node_ids_fall_back_to_distributed(spark):
    """NULL ids (allowed pre-generalization via the distributed loop)
    must never reach the driver union-find's Python comparisons: the
    probe detects them and discards itself."""
    edges = spark.createDataFrame(
        [("a", "b"), (None, "c")], "src string, dst string")
    got_default = {(r.node, r.component)
                   for r in connected_components(edges).collect()}
    got_dist = {(r.node, r.component)
                for r in connected_components(
                    edges, small_graph_edges=0).collect()}
    assert got_default == got_dist


def test_float_node_ids_stay_distributed(spark):
    """Float ids are excluded from the driver path on purpose (a NaN
    id would hang the union-find: NaN != NaN): both calls must agree
    and TERMINATE, including with a NaN endpoint."""
    edges = spark.createDataFrame(
        [(1.5, 2.5), (float("nan"), 3.5)], "src double, dst double")
    def canon(df):
        import math
        return {(("nan" if r.node != r.node else r.node),
                 ("nan" if r.component != r.component else r.component))
                for r in df.collect()}
    assert (canon(connected_components(edges))
            == canon(connected_components(edges, small_graph_edges=0)))
