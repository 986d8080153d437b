"""Distributed connected components (label propagation to fixpoint).

Beyond-reference operator: near-dup *groups* need the transitive closure
of the pairwise LSH candidate graph — A~B and B~C put A,B,C in one
group even when A,C never collide in a band. The 1-hop form is
``lsh_dup_groups``; this operator iterates it to convergence.

Algorithm: min-label propagation. Every node starts labeled with its own
id; each round every node takes the min of its label and its neighbors'
labels; stop when no label changed. Each round is one shuffle-bounded
join+groupBy (no driver-side graph) — the Pregel-style pattern that
scales to billions of edges. Rounds needed ≤ graph diameter (near-dup
clusters are tiny-diameter, so 3-5 rounds in practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ...caching import persist_once


# Below this many edges the whole graph is collected and solved with
# driver-side union-find: a dup graph of 100k edges is a few MB, and
# the distributed loop's per-round fixed cost (join + agg + checkpoint
# + convergence collect, ~0.5-1 s each on a warm session) dwarfs the
# actual work at that size. Above it, the Pregel-style loop is the
# only shape that scales — a 100 TB dup graph never fits a driver.
SMALL_GRAPH_EDGES = 100_000


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 15,
                         small_graph_edges: int = SMALL_GRAPH_EDGES
                         ) -> DataFrame:
    """(node, component) for every node in the undirected edge list;
    component = min node id reachable. Deterministic for any input
    partitioning (min is order-independent).

    Scale-adaptive: a bounded ``limit(threshold+1)`` probe fetches the
    edge list; when it fits (≤ ``small_graph_edges``) the closure is
    union-find on the driver — one Spark job total instead of
    O(log diameter) rounds of join+agg+checkpoint. A truncated probe
    (big graph) is DISCARDED and the distributed min-label loop runs
    unchanged; the probe result is only ever used when it provably
    holds the complete edge set, so the cutover cannot change results
    (pytest pins cross-path parity).

    Callers whose edge list is expensive to compute AND likely over
    the threshold should pin it first (``localCheckpoint``, as
    hybrid_dedup_keep does) or pass ``small_graph_edges=0`` — a
    truncated probe re-computes the edge plan once more for the
    distributed path.

    Node-id types: INTEGRAL ids are normalized to long up front, so
    both paths emit ``node long, component long``. Non-integral ids
    whose src/dst types match (string doc keys, the struct text keys
    of hybrid_dedup_keep's exact-group collapse) take the SAME two
    paths with the input type preserved: Python's tuple/str ordering
    equals Spark's struct/UTF8 binary ordering (UTF-8 byte order is
    code-point order), so the driver union-find's min-label agrees
    bit-for-bit with the distributed loop's ``min(label)`` (pytest
    pins cross-path parity for strings and structs). Mismatched
    src/dst types fall back to the distributed loop unchanged."""
    from pyspark.sql.types import (
        ByteType, IntegerType, LongType, ShortType, StringType,
        StructType)
    spark = edges.sparkSession

    def _py_orderable(dt) -> bool:
        # types whose PYTHON ordering provably equals Spark's: integral
        # (tuple ints), UTF-8 strings (code-point == binary order), and
        # structs thereof. Floats are EXCLUDED on purpose — a NaN id
        # would hang the union-find (NaN != NaN) — and anything else
        # (binary, decimal, map, ...) takes the distributed loop, the
        # pre-generalization behavior.
        if isinstance(dt, (ByteType, ShortType, IntegerType, LongType,
                           StringType)):
            return True
        if isinstance(dt, StructType):
            return all(_py_orderable(f.dataType) for f in dt.fields)
        return False

    try:
        ids_integral = all(
            isinstance(edges.schema[c].dataType,
                       (ByteType, ShortType, IntegerType, LongType))
            for c in (src, dst))
        out_type = edges.schema[src].dataType
        ids_comparable = (ids_integral
                          or (out_type == edges.schema[dst].dataType
                              and _py_orderable(out_type)))
    except Exception:
        ids_integral, ids_comparable = False, False
    if ids_integral:
        # lossless widen: one output contract across both paths
        edges = edges.select(F.col(src).cast("long").alias(src),
                             F.col(dst).cast("long").alias(dst))
    probe = (edges.select(F.col(src).alias("s"),
                          F.col(dst).alias("d"))
             .limit(small_graph_edges + 1).collect()
             if ids_comparable else None)

    def _has_null(v) -> bool:
        if v is None:
            return True
        if isinstance(v, tuple):             # Row/struct values
            return any(_has_null(x) for x in v)
        return False

    if probe is not None and any(
            _has_null(r["s"]) or _has_null(r["d"]) for r in probe):
        # NULL ids (incl. nested struct fields) break Python ordering;
        # the distributed loop — the only path such ids ever took
        # before the generic fast path — keeps its semantics for them
        probe = None
    if probe is not None and len(probe) <= small_graph_edges:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:        # path compression
                parent[x], x = r, parent[x]
            return r

        for row in probe:
            a, b = row["s"], row["d"]
            for n in (a, b):
                if n not in parent:
                    parent[n] = n
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comp_min: dict = {}
        for n in parent:
            r = find(n)
            if r not in comp_min or n < comp_min[r]:
                comp_min[r] = n
        rows = [(n, comp_min[find(n)]) for n in sorted(parent)]
        # broadcast hint: THIS path's labels are bounded by
        # small_graph_edges (≤ 2·threshold driver-resident rows) by the
        # very probe that selected it, so the hint is scale-safe by
        # construction — unlike at a call site, where comp may come
        # from either path. Without it the parallelized rows plan as a
        # LogicalRDD with unknown (huge) stats and a consumer join
        # sort-merge-shuffles its big side on the node key; AQE can
        # only convert AFTER that map stage's shuffle write is paid.
        # The Pregel path below stays unhinted (unbounded labels).
        if ids_integral:
            return F.broadcast(spark.createDataFrame(
                rows, "node long, component long"))
        from pyspark.sql.types import StructField, StructType
        return F.broadcast(spark.createDataFrame(rows, StructType([
            StructField("node", out_type, False),
            StructField("component", out_type, False)])))

    both = persist_once(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
             .unionByName(edges.select(F.col(dst).alias("a"),
                                       F.col(src).alias("b")))
             .distinct())
    # seed with the 1-hop minimum (min over self + direct neighbors):
    # one aggregation that typically halves the rounds to convergence
    labels = persist_once(
        both.select(F.col("a").alias("node"),
                    F.col("b").alias("label"))
            .unionByName(both.select(F.col("a").alias("node"),
                                     F.col("a").alias("label")))
            .groupBy("node").agg(F.min("label").alias("label")))

    # Convergence signal: min-label propagation is MONOTONE — a node's
    # label can only decrease — so for integral ids the label sum is
    # strictly decreasing until the fixpoint, and "sum unchanged" ⟺
    # "no label changed". One decimal aggregate over the (cached)
    # labels per round replaces the earlier join-against-previous +
    # filter + count (a second full node-count join per round).
    # Decimal sum: exact and overflow-proof at any node-id magnitude.
    # Non-integral ids (strings) have no monotone sum — they take the
    # exact per-node comparison (both frames are pinned, so it's one
    # join over node-count rows; this is already the rare fallback).
    def _label_sum(lb):
        return lb.agg(F.sum(F.col("label").cast("decimal(38,0)"))
                       .alias("s")).collect()[0]["s"]

    def _differs(new_lb, old_lb):
        return not (new_lb.alias("n")
                    .join(old_lb.alias("o"), "node")
                    .filter(F.col("n.label") != F.col("o.label"))
                    .isEmpty())

    prev_sum = _label_sum(labels) if ids_integral else None
    converged = False
    for _ in range(max_iter):
        # neighbor labels: for each edge a→b, b's current label is a
        # candidate for a. NOTE `labels` feeds this subtree AND the
        # union below — every round references it twice, so without
        # per-round lineage truncation the lazy plan DOUBLES per round
        # (2^rounds Catalyst analysis: the pre-r6 loop OOMed the driver
        # at round ~15 on a 200-node chain).
        nbr = (both.join(labels.withColumnRenamed("node", "b"), "b")
               .select(F.col("a").alias("node"),
                       F.col("label").alias("nbr_label")))
        stepped = (labels.unionByName(
                       nbr.withColumnRenamed("nbr_label", "label"))
                   .groupBy("node").agg(F.min("label").alias("label"))
                   .persist())          # feeds both sides of the jump
        step_sum = _label_sum(stepped) if ids_integral else None
        step_unchanged = (step_sum == prev_sum if ids_integral
                          else not _differs(stepped, labels))
        if step_unchanged:
            # fixpoint reached by the plain step alone — the common
            # final round. Skipping the jump here saves one self-join +
            # checkpoint per run (~25% of loop cost at the typical 3-4
            # rounds); stepped's plan is shallow (labels was truncated
            # last round), so handing it out is safe.
            labels.unpersist()
            labels = stepped
            converged = True
            break
        # pointer jumping: also follow label ← label(label) (valid by
        # monotonicity — label(label(x)) <= label(x)), doubling the
        # effective propagation distance per round: convergence is
        # O(log diameter) rounds instead of O(diameter), so a long
        # near-dup CHAIN converges inside the round budget instead of
        # silently returning SPLIT components at the loop exit.
        x, y = stepped.alias("x"), stepped.alias("y")
        new_labels = (
            x.join(y, F.col("x.label") == F.col("y.node"), "left")
             .select(F.col("x.node").alias("node"),
                     F.coalesce(F.col("y.label"),
                                F.col("x.label")).alias("label"))
             .localCheckpoint(eager=True))      # O(1) plan per round
        new_sum = _label_sum(new_labels) if ids_integral else None
        jump_unchanged = (new_sum == prev_sum if ids_integral
                          else not _differs(new_labels, labels))
        stepped.unpersist()
        labels.unpersist()
        labels = new_labels
        if jump_unchanged:
            converged = True
            break
        prev_sum = new_sum
    both.unpersist()
    if not converged:
        # loud, never wrong: a silent exit here would return split
        # components (each caller would treat two halves of one dup
        # group as distinct canonical groups)
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"pointer-jumping rounds (graph diameter > ~2^{max_iter}); "
            f"raise max_iter")
    out = labels.select(F.col("node"), F.col("label").alias("component"))
    # Lineage truncation: the converged labels logically carry the whole
    # unrolled iteration (O(rounds) joins deep — measured ~4,700
    # exchanges / 2,300 scans of STATIC plan for the LSH dup graph), so
    # every query composing on top pays a multi-second Catalyst compile
    # of a tree that at runtime is one InMemoryTableScan anyway.  The
    # labels are already materialized (the convergence count) and stay
    # session-cached for plan reuse; localCheckpoint re-reads that cache
    # once and hands composers a flat node-count-sized relation.
    return out.localCheckpoint(eager=True)
