"""Continuously-maintained verified near-dup groups — the streaming
state form of the batch flagship ``hybrid_dedup_keep``:

    ingest batch → LSH index probe (indexed×indexed never joins)
    → exact-Jaccard verify (pairs only) → INCREMENTAL component merge
    → keep-list state

Batch mode re-runs the closure over the whole corpus each time; this
class keeps (node → component, n_tokens) as persistent state and per
batch touches only the components the new verified edges actually
connect. Per-batch cost is O(|batch| + affected-component footprint):

* candidate pairs come from :class:`StreamingLshIndex` (per-batch
  probe cost O(|batch| × collision fan-out), exactly-once tiers);
* verification reads only the pair-involved docs' text
  (``verify_jaccard_pairs`` prunes with a broadcast semi-join before
  any shingling);
* the component merge is driver-side union-find over the VERIFIED
  edge endpoints' components — near-dup edges per batch are tiny (the
  whole point of LSH), and member/row lookups are partition-pruned
  the same way the LSH index prunes erasure:

State layout (the lsh_index commit-tier discipline, twice):

* ``labels/`` — rows (node, component, n_tokens) partitioned by
  ``_comp_part = component mod N`` and ``_batch`` tier: member lookup
  for an affected component opens only its partitions;
* ``node_map/`` — the same rows partitioned by ``_node_part = node
  mod N``: current-component lookup for an edge endpoint opens only
  its partitions. A node whose component changes gets a NEW row in
  both tables (later ``_batch`` tier wins); its stale row in the old
  component's partition is filtered at read time by checking the
  node_map's current claim — stale rows cost bounded read-side work
  until compaction folds them away, never correctness.

Exactly-once: both tables write per-batch ``(part, _batch=id)`` tiers
via dynamic partition overwrite, and a ``_batches/<id>`` marker is
touched only after BOTH writes — a replay of a committed batch leaves
state bytes untouched; a crashed half-write is replaced wholesale
because resolution reads EXCLUDE the in-flight batch's own tier (the
only tier that can be partial — every earlier tier is marker-gated).

Parity contract (tested): any batch split of a corpus yields state
whose keep-list is EXACTLY ``hybrid_dedup_keep`` of the full corpus.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fs import fs_delete as _fs_delete
from ..fs import fs_exists as _fs_exists
from ..fs import fs_file_count as _fs_file_count
from ..fs import fs_list_names as _fs_list_names
from ..fs import fs_touch as _fs_touch
from ..operators.llm.hybrid import verify_jaccard_pairs
from .lsh_index import StreamingLshIndex

COMP_PART = "_comp_part"
NODE_PART = "_node_part"
BATCH_COL = "_batch"
COMPACTED_TIER = -1


@dataclass
class StreamingDedupGroups:
    """Persistent verified near-dup groups with per-batch maintenance.
    Call :meth:`process_batch` once per ingest batch; read the current
    keep-list with :meth:`read_groups`."""

    state_path: str
    num_buckets: int = 64
    jaccard_num: int = 3
    jaccard_den: int = 5
    compact_file_threshold: int = 8
    index: StreamingLshIndex = field(init=False)

    def __post_init__(self) -> None:
        self.index = StreamingLshIndex(
            os.path.join(self.state_path, "index"),
            num_buckets=self.num_buckets,
            compact_file_threshold=self.compact_file_threshold)

    def _resolve_buckets(self, spark: SparkSession) -> None:
        """Partition counts are physical layout for labels/node_map
        exactly as for the index's buckets: adopt the count the store
        was BUILT with (the index's ``_meta.json`` is the single
        source of truth — all three tables share one N), so a caller
        reopening with a different constructor arg cannot mis-prune a
        member/claim lookup and silently miss rows."""
        self.index._resolve_buckets(spark)
        self.num_buckets = self.index.num_buckets

    @property
    def _labels_path(self) -> str:
        return os.path.join(self.state_path, "labels")

    @property
    def _node_map_path(self) -> str:
        return os.path.join(self.state_path, "node_map")

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.state_path, "_batches")

    # -- tier-aware pruned reads ------------------------------------

    def _read_parts(self, spark: SparkSession, base: str, part_col: str,
                    parts: set[int], exclude_batch: int | None
                    ) -> DataFrame | None:
        paths = [p for p in
                 (os.path.join(base, f"{part_col}={v}")
                  for v in sorted(parts))
                 if _fs_exists(spark, p)]
        if not paths:
            return None
        df = spark.read.option("basePath", base).parquet(*paths)
        if exclude_batch is not None:
            # the in-flight batch's own tier may be a crashed partial
            # write about to be replaced — never let it feed resolution
            df = df.filter(F.col(BATCH_COL) != int(exclude_batch))
        return df

    @staticmethod
    def _latest(df: DataFrame) -> DataFrame:
        """Latest claim per node across tiers (later batch wins; the
        compacted tier -1 is oldest by construction)."""
        from pyspark.sql import Window
        w = (Window.partitionBy("node")
             .orderBy(F.col(BATCH_COL).desc()))
        return (df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn"))

    def _current_comps(self, spark: SparkSession, nodes: list[int],
                       exclude_batch: int | None) -> dict[int, int]:
        if not nodes or not _fs_exists(spark, self._node_map_path):
            return {}
        parts = {n % self.num_buckets for n in nodes}
        df = self._read_parts(spark, self._node_map_path, NODE_PART,
                              parts, exclude_batch)
        if df is None:
            return {}
        nodes_df = spark.createDataFrame([(int(n),) for n in nodes],
                                         "node long")
        rows = (self._latest(
                    df.join(F.broadcast(nodes_df), "node", "left_semi"))
                .select("node", "component").collect())
        return {r["node"]: r["component"] for r in rows}

    def _members(self, spark: SparkSession, comps: set[int],
                 exclude_batch: int | None) -> dict[int, tuple[int, int]]:
        """{node: (component, n_tokens)} for every CURRENT member of
        the given components. Candidate rows come from the components'
        own partitions; staleness (a node that since moved away — or
        whose row in this partition is superseded) is resolved against
        the node_map's current claim."""
        if not comps or not _fs_exists(spark, self._labels_path):
            return {}
        parts = {c % self.num_buckets for c in comps}
        df = self._read_parts(spark, self._labels_path, COMP_PART,
                              parts, exclude_batch)
        if df is None:
            return {}
        cand = (df.filter(F.col("component").isin([int(c) for c in comps]))
                .select("node", "component", "n_tokens", BATCH_COL)
                .collect())
        if not cand:
            return {}
        current = self._current_comps(spark, [r["node"] for r in cand],
                                      exclude_batch)
        out: dict[int, tuple[int, int]] = {}
        for r in cand:
            if current.get(r["node"]) == r["component"]:
                out[r["node"]] = (r["component"], r["n_tokens"])
        return out

    # -- per-batch maintenance --------------------------------------

    def process_batch(self, spark: SparkSession, batch_docs: DataFrame,
                      corpus: DataFrame,
                      batch_id: int | None = None) -> dict:
        """Ingest one batch of (doc_id, text) rows. ``corpus`` is a
        (doc_id, text) frame covering every doc indexed so far plus
        this batch (the CDC state store at production scale) — it is
        only ever read pruned to pair-involved docs. Returns a stats
        dict. With ``batch_id``, replays of committed batches are
        no-ops and crashed half-writes are replaced (exactly-once)."""
        self._resolve_buckets(spark)
        committed = (batch_id is not None
                     and _fs_exists(spark, os.path.join(
                         self._manifest_path, str(batch_id))))
        pairs = self.index.process_batch(spark, batch_docs,
                                         batch_id=batch_id)
        verified = (verify_jaccard_pairs(
                        corpus, pairs.select("doc_a", "doc_b"),
                        threshold_num=self.jaccard_num,
                        threshold_den=self.jaccard_den)
                    .filter("verified"))
        edges = [(r["doc_a"], r["doc_b"]) for r in
                 verified.select("doc_a", "doc_b").collect()]
        batch_n = batch_docs.select(
            "doc_id", F.size(F.split("text", " ")).cast("long")
            .alias("n_tokens"))
        if committed:
            return {"batch_id": batch_id, "replay": True,
                    "n_verified_edges": len(edges)}

        edge_nodes = sorted({n for e in edges for n in e})
        # current components of every edge endpoint (absent → itself)
        cur = self._current_comps(spark, edge_nodes, batch_id)
        batch_tok = {r["doc_id"]: r["n_tokens"] for r in
                     batch_n.filter(F.col("doc_id").isin(edge_nodes))
                     .collect()} if edge_nodes else {}
        comps = {cur.get(n, n) for n in edge_nodes}
        members = self._members(spark, comps, batch_id)
        # union-find over affected members + this batch's edges
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        tok: dict[int, int] = {}
        for n, (_, nt) in members.items():
            parent.setdefault(n, n)
            tok[n] = nt
        for n in edge_nodes:
            parent.setdefault(n, n)
            if n in batch_tok:
                tok[n] = batch_tok[n]
        # nodes already sharing a stored component start connected
        by_comp: dict[int, int] = {}
        for n, (c, _) in members.items():
            if c in by_comp:
                ra, rb = find(n), find(by_comp[c])
                if ra != rb:
                    parent[ra] = rb
            else:
                by_comp[c] = n
        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comp_min: dict[int, int] = {}
        for n in parent:
            r = find(n)
            if r not in comp_min or n < comp_min[r]:
                comp_min[r] = n
        new_label = {n: comp_min[find(n)] for n in parent}
        changed = [(n, new_label[n], tok[n])
                   for n in parent
                   if members.get(n, (None, None))[0] != new_label[n]]

        tier = COMPACTED_TIER if batch_id is None else int(batch_id)
        # distributed singleton rows for the rest of the batch; the
        # edge-involved rows ride along from the driver's resolution
        changed_df = spark.createDataFrame(
            changed, "node long, component long, n_tokens long")
        singles = (batch_n
                   .filter(~F.col("doc_id").isin(edge_nodes)
                           if edge_nodes else F.lit(True))
                   .select(F.col("doc_id").alias("node"),
                           F.col("doc_id").alias("component"),
                           "n_tokens"))
        rows = singles.unionByName(changed_df).withColumn(
            BATCH_COL, F.lit(tier))
        labels = rows.withColumn(
            COMP_PART, F.pmod("component", F.lit(self.num_buckets))
            .cast("int"))
        nmap = rows.withColumn(
            NODE_PART, F.pmod("node", F.lit(self.num_buckets))
            .cast("int"))
        if batch_id is None:
            (labels.write.partitionBy(COMP_PART, BATCH_COL)
                   .mode("append").parquet(self._labels_path))
            (nmap.write.partitionBy(NODE_PART, BATCH_COL)
                 .mode("append").parquet(self._node_map_path))
        else:
            self.index._overwrite_dynamic(
                spark, labels, [COMP_PART, BATCH_COL], self._labels_path)
            self.index._overwrite_dynamic(
                spark, nmap, [NODE_PART, BATCH_COL], self._node_map_path)
            _fs_touch(spark, os.path.join(self._manifest_path,
                                          str(batch_id)))
        self._compact(spark, self._labels_path, COMP_PART)
        self._compact(spark, self._node_map_path, NODE_PART)
        return {"batch_id": batch_id, "replay": False,
                "n_verified_edges": len(edges),
                "n_relabeled": len(changed)}

    # -- erasure ------------------------------------------------------

    def purge_docs(self, spark: SparkSession, doc_ids: list[int],
                   purge_batch_id: int | None = None) -> int:
        """Right-to-be-forgotten across the dedup state: remove the
        victims from the LSH index (bucket-pruned,
        ``StreamingLshIndex.purge_docs``) AND from the group state. A
        victim that was its component's LABEL (the min id) or its
        KEEPER (the longest doc) forces a relabel/re-pick of the
        SURVIVING members — all resolved from partition-pruned reads
        of the victims' components only. Component topology is NOT
        re-split (erasing a bridge doc keeps the survivors grouped):
        groups record near-dup verdicts already made, and erasure
        removes a member, not history. Writes ride a commit tier
        (``purge_batch_id``, required for exactly-once stores — tier
        ids share the process_batch sequence) or plain appends.
        Returns the number of rows rewritten."""
        if not doc_ids:
            return 0
        self._resolve_buckets(spark)
        self.index.purge_docs(spark, doc_ids)
        if not _fs_exists(spark, self._node_map_path):
            return 0
        victims = sorted(int(i) for i in doc_ids)
        ids_df = spark.createDataFrame([(v,) for v in victims],
                                       "node long")
        # ALL components the victims ever claimed (every historical
        # claim of a node lives in its ONE node_map partition, so this
        # is a pruned read) — the complete set of labels partitions
        # holding any victim row, current or stale
        vmap = self._read_parts(
            spark, self._node_map_path, NODE_PART,
            {v % self.num_buckets for v in victims}, None)
        if vmap is None:
            return 0
        claims = (vmap.join(F.broadcast(ids_df), "node", "left_semi")
                  .select("node", "component", BATCH_COL).collect())
        if not claims:
            return 0
        all_claimed = {r["component"] for r in claims}
        # current comps decide which components lose a member now
        cur = self._current_comps(spark, victims, None)
        comps = set(cur.values())
        members = self._members(spark, comps, None)
        vset = set(victims)
        survivors = {n: (c, t) for n, (c, t) in members.items()
                     if n not in vset}
        by_comp: dict[int, list[int]] = {}
        for n, (c, _) in survivors.items():
            by_comp.setdefault(c, []).append(n)
        rows = []
        for c, ns in by_comp.items():
            new_c = min(ns)
            if new_c == c:
                continue        # label survived — existing rows stand
            for n in ns:
                rows.append((n, new_c, survivors[n][1]))
        # relabel rows must OUTRANK every existing claim in _latest:
        # a strictly-higher tier (caller-sequenced in exactly-once
        # mode, max-observed+1 otherwise — max over the claims read
        # plus the manifest is cheap driver state)
        if purge_batch_id is not None:
            tier = int(purge_batch_id)
        else:
            # offset far above any foreachBatch epoch id so a FUTURE
            # process_batch tier can never collide with (and dynamic-
            # overwrite away) a purge tier
            seen = [r[BATCH_COL] for r in claims] + [COMPACTED_TIER]
            if _fs_exists(spark, self._manifest_path):
                seen += [int(x) for x in
                         _fs_list_names(spark, self._manifest_path)]
            tier = max(max(seen) + 1, 1 << 40)
        new_rows = spark.createDataFrame(
            rows, "node long, component long, n_tokens long")
        n_rewritten = 0
        for base, part_col, key in (
                (self._labels_path, COMP_PART, "component"),
                (self._node_map_path, NODE_PART, "node")):
            if key == "component":
                touched = ({c % self.num_buckets for c in all_claimed}
                           | {r[1] % self.num_buckets for r in rows})
            else:
                touched = ({v % self.num_buckets for v in victims}
                           | {r[0] % self.num_buckets for r in rows})
            paths = [p for p in
                     (os.path.join(base, f"{part_col}={v}")
                      for v in sorted(touched))
                     if _fs_exists(spark, p)]
            if not paths:
                continue
            kept = (spark.read.option("basePath", base).parquet(*paths)
                    .join(F.broadcast(ids_df), "node", "left_anti"))
            add = (new_rows.withColumn(BATCH_COL, F.lit(tier))
                   .withColumn(part_col,
                               F.pmod(key, F.lit(self.num_buckets))
                               .cast("int")))
            out = (kept.unionByName(add)
                   .repartition(F.col(part_col))
                   .localCheckpoint(eager=True))
            kept_parts = {r[0] for r in
                          out.select(part_col).distinct().collect()}
            if kept_parts:
                self.index._overwrite_dynamic(
                    spark, out, [part_col, BATCH_COL], base)
            for p in paths:
                v = int(p.rsplit("=", 1)[1])
                if v not in kept_parts:
                    _fs_delete(spark, p)
                    continue
                # tier dirs the overwrite did not re-emit would keep
                # their (victim-bearing) files — drop them
                emitted = {r[0] for r in
                           out.filter(F.col(part_col) == v)
                           .select(BATCH_COL).distinct().collect()}
                for t in _fs_list_names(spark, p):
                    if (t.startswith(f"{BATCH_COL}=")
                            and int(t.split("=", 1)[1]) not in emitted):
                        _fs_delete(spark, os.path.join(p, t))
            n_rewritten += out.count()
        return n_rewritten

    # -- reads -------------------------------------------------------

    def read_groups(self, spark: SparkSession) -> DataFrame:
        """Current keep-list: (component, keep_doc_id, keep_n_tokens,
        cluster_size) — the same shape (and, by the parity contract,
        the same rows) as batch ``hybrid_dedup_keep``."""
        from pyspark.sql import Window
        if not _fs_exists(spark, self._node_map_path):
            return spark.createDataFrame(
                [], "component long, keep_doc_id long, "
                    "keep_n_tokens long, cluster_size long")
        df = (spark.read.option("basePath", self._node_map_path)
              .parquet(self._node_map_path))
        latest = self._latest(df)
        w = Window.partitionBy("component")
        picked = (latest
                  .withColumn("csize", F.count(F.lit(1)).over(w))
                  .withColumn("rn", F.row_number().over(
                      w.orderBy(F.col("n_tokens").desc(),
                                F.col("node")))))
        return (picked.filter(F.col("rn") == 1)
                .select("component",
                        F.col("node").alias("keep_doc_id"),
                        F.col("n_tokens").alias("keep_n_tokens"),
                        F.col("csize").cast("long")
                        .alias("cluster_size")))

    # -- compaction ---------------------------------------------------

    def _compact(self, spark: SparkSession, base: str,
                 part_col: str) -> int:
        """Fold every over-threshold partition's tiers into ONE
        ``_batch=-1`` file holding only the latest claim per node —
        stale rows from moved nodes are dropped here (node_map's
        latest is authoritative; for the labels table a fold keeps the
        latest row per node WITHIN the partition, which is exactly its
        current row when the node still lives there and a droppable
        stale row otherwise — checked against node_map at read time
        either way). One Spark job for all due partitions."""
        if not _fs_exists(spark, base):
            return 0
        due = [name for name in _fs_list_names(spark, base)
               if name.startswith(f"{part_col}=")
               and _fs_file_count(spark, os.path.join(base, name),
                                  recursive=True)
               > self.compact_file_threshold]
        if not due:
            return 0
        paths = [os.path.join(base, name) for name in due]
        df = (spark.read.option("basePath", base).parquet(*paths))
        folded = (self._latest(df)
                  .withColumn(BATCH_COL, F.lit(COMPACTED_TIER))
                  .repartition(F.col(part_col))
                  .localCheckpoint(eager=True))
        self.index._overwrite_dynamic(spark, folded,
                                      [part_col, BATCH_COL], base)
        for name in due:
            pdir = os.path.join(base, name)
            for t in _fs_list_names(spark, pdir):
                if (t.startswith(f"{BATCH_COL}=")
                        and t != f"{BATCH_COL}={COMPACTED_TIER}"):
                    _fs_delete(spark, os.path.join(pdir, t))
        return len(due)


def dedup_groups_sync(spark: SparkSession, docs_dir: str,
                      state_path: str, checkpoint_path: str, *,
                      num_buckets: int = 64,
                      max_files_per_trigger: int | None = None,
                      max_duration_s: float = 300.0
                      ) -> StreamingDedupGroups:
    """Structured-Streaming front end for :class:`StreamingDedupGroups`
    (the `bounded_sync` convention applied to the dedup surface): drain
    a growing documents directory under ``Trigger.AvailableNow``, one
    :meth:`process_batch` per micro-batch with the epoch id as the
    exactly-once ``batch_id``. Re-running with the same checkpoint
    resumes — already-committed epochs replay as no-ops, a torn epoch
    is replaced (the class-level crash contract). The verification
    corpus is the directory itself re-resolved per batch: it always
    covers batch ∪ indexed docs (pairs only ever reference those), and
    the verify stage reads it pruned to pair-involved docs."""
    st = StreamingDedupGroups(state_path, num_buckets=num_buckets)
    schema = spark.read.parquet(docs_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               int(max_files_per_trigger))
    stream = reader.parquet(docs_dir).select("doc_id", "text")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        corpus = (spark.read.schema(schema).parquet(docs_dir)
                  .select("doc_id", "text"))
        st.process_batch(spark, batch_df, corpus=corpus,
                         batch_id=int(batch_id))

    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", checkpoint_path)
         .trigger(availableNow=True).start())
    q.awaitTermination(max_duration_s)
    if q.isActive:
        q.stop()
        q.awaitTermination()
    return st
