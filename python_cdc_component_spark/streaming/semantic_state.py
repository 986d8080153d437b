"""Continuously-maintained SEMANTIC near-dup groups — the streaming
state form of the batch `semantic_dup_groups` (SemDeDup) pipeline,
composed from two proven parts:

    ingest batch of vectors → IVF cell assignment under a FIXED
    codebook → same-cell cosine pairs vs (indexed ∪ batch)
    → StreamingDedupGroups.merge_pairs (incremental component merge)

* the vector side is an :class:`IvfVectorIndex` (cell-partitioned
  inverted file): pair candidates join only within a cell, so
  per-batch pair work is Σ|batch∩cell|×|cell| — the SemDeDup
  cell-blocking trade (cross-cell near-dups at the cell boundary are
  sacrificed, exactly as the batch operator sacrifices them);
* pairs arrive at the component state ALREADY verified (the cosine
  threshold IS the verdict — there is no second-stage check to run),
  so they ride :meth:`StreamingDedupGroups.merge_pairs` as
  ``exact=True`` edges and the Jaccard verify stage never executes;
* the codebook is pinned at the first batch (seed centroids = the
  ``n_cells`` smallest-id vectors of that batch — deterministic, so a
  SQL oracle can replay the assignment bit-exactly) and NEVER moves on
  ingest: assignment stays a shuffle-free codegen projection at any
  corpus size, and retraining is an explicit rebuild;
* exactly-once rides the groups store's batch markers: the vector
  index is maintained purge-then-add BEFORE the component merge, so a
  marked batch implies durable vectors, and a crashed half-append is
  reversed by the replay's purge (the CDC ANN-index discipline,
  streaming/bounded._maintain_ann_index).

Vector-exact collapse (the text twin's ``collapse_exact`` discipline,
VERDICT r10 #4): identical vectors in a batch — re-crawled pages with
identical embeddings, default/zero-filled vectors — group under their
min-id representative BEFORE same-cell pairing, so K identical vectors
cost K−1 attach edges plus one representative in the pair join, never
K²/2 pairs. Semantics are unchanged: cos(identical) == 1 ≥ any valid
threshold, so every attach edge is a pair the uncollapsed path would
emit, and any neighbor of a duplicate is equally a neighbor of its
representative (identical vectors have identical sims) — the
transitive closure, hence the groups, are equal. Zero-norm AND
NaN-norm vectors are exempt from collapse: their cosine is undefined
(NULL under try_divide / NaN respectively) and they never pair in the
uncollapsed path either — the NaN case needs explicit ``isnan`` checks
in both the rep expression and the edge filter because Spark orders
NaN above every double (ADVICE r11).

Keep rule: every vector carries n_tokens=1 through the groups state,
so the keep window degrades to MIN doc_id per component — keeper ==
component id, the SemDeDup "keep the lowest-id member" convention.

Reference parity note: the reference engine has no vector surface
(db_components/db_common has no embedding operators); this is a
beyond-reference LLM-pipeline family member.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Window

from ..fs import fs_exists as _fs_exists
from ..operators.llm.annindex import CELL_COL, IvfVectorIndex
from .dedup_state import StreamingDedupGroups


@dataclass
class StreamingSemanticGroups:
    """Persistent semantic (cosine) near-dup groups with per-batch
    maintenance. Call :meth:`process_batch` once per (vec_id, e)
    batch; read the keep-list with :meth:`read_groups`."""

    state_path: str
    n_cells: int = 8
    # verified edge iff round(cosine, 6) >= threshold — the 6dp-rounded
    # double compare BOTH engines evaluate identically (the
    # semantic_dup_pairs convention: round first, compare second, so
    # boundary values agree bit-for-bit with a SQL replay)
    threshold: float = 0.4
    num_buckets: int = 16
    # K identical vectors → K−1 attach edges instead of K²/2 pairs
    # (groups provably unchanged — module docstring). Off only for
    # debugging the raw pair volume.
    collapse_identical: bool = True
    groups: StreamingDedupGroups = field(init=False)
    index: IvfVectorIndex = field(init=False)

    def __post_init__(self) -> None:
        if not -1.0 <= self.threshold <= 1.0:
            raise ValueError(
                f"threshold {self.threshold} is not a cosine bound "
                f"in [-1, 1]")
        self.groups = StreamingDedupGroups(
            os.path.join(self.state_path, "groups"),
            num_buckets=self.num_buckets)
        self.index = IvfVectorIndex(
            os.path.join(self.state_path, "vectors"),
            n_cells=self.n_cells)

    # -- per-batch maintenance ----------------------------------------

    def process_batch(self, spark: SparkSession, batch_vecs: DataFrame,
                      batch_id: int | None = None) -> dict:
        """Ingest one batch of (vec_id long, e array<double>) rows.
        With ``batch_id``, replays of committed batches are no-ops and
        crashed half-writes converge (exactly-once on the groups
        store's marker; vector writes precede it).

        INSERT-ONLY contract (ADVICE r10): batches must carry NEW
        vec_ids. The groups state is monotone but the vector index is
        not — re-ingesting an existing vec_id with a CHANGED embedding
        purges/re-adds the vector, yet cosine edges merged from the
        old embedding persist in the groups store, so
        :meth:`read_groups` would report memberships derived from
        vectors that no longer exist. (The purge-then-add inside this
        method exists to reverse crashed half-appends of the SAME
        batch on replay, not to support updates.) Full update
        semantics need group-claim invalidation first — call
        :meth:`purge_docs` for the changed ids, then re-ingest them in
        a fresh batch."""
        committed = (batch_id is not None
                     and _fs_exists(spark, os.path.join(
                         self.groups._manifest_path, str(batch_id))))
        batch = batch_vecs.select("vec_id", "e")
        batch.persist()
        try:
            centroids = self.index.load_centroids(spark)
            fresh = centroids is None
            if fresh:
                # deterministic seed codebook: the n_cells smallest-id
                # vectors of the FIRST batch (oracle-replayable)
                centroids = [r["e"] for r in
                             batch.orderBy("vec_id")
                                  .limit(self.index.n_cells)
                                  .select("e").collect()]
                if not centroids:
                    return {"batch_id": batch_id, "n_verified_edges": 0,
                            "replay": committed}
            assigned = (IvfVectorIndex
                        .assign_cells(batch, centroids)
                        .localCheckpoint(eager=True))
            cells = [r[0] for r in
                     assigned.select(CELL_COL).distinct().collect()]
            if self.collapse_identical:
                # vector-exact collapse: identical (cell, e) rows fold
                # under their min-id representative; only reps enter
                # the pair join, duplicates ride K−1 attach edges.
                # Zero/NaN-norm vectors stay their own rep (their sims
                # are NaN/NULL — they never pair either way). The NaN
                # exemption needs an EXPLICIT isnan: Spark orders NaN
                # above every double, so `nrm > 0` alone is TRUE for a
                # NaN norm and would collapse NaN vectors (ADVICE r11).
                wrep = Window.partitionBy(CELL_COL, "e")
                grouped = assigned.withColumn(
                    "_rep",
                    F.when((F.col("nrm") > 0) & ~F.isnan("nrm"),
                           F.min("vec_id").over(wrep))
                     .otherwise(F.col("vec_id")))
                probe_side = grouped.filter("vec_id = _rep").drop("_rep")
                attach = (grouped.filter("vec_id != _rep")
                          .select(F.col("_rep").alias("doc_a"),
                                  F.col("vec_id").alias("doc_b")))
            else:
                probe_side, attach = assigned, None
            # candidate side: the batch's own cells from the stored
            # inverted file (pruned read) ∪ the batch's reps. On a
            # committed replay the stored side already holds the
            # batch's rows — same-id pairs are excluded and same-pair
            # duplicates collapse under the distinct, so the pair set
            # replays identically.
            stored = (self.index.read_cells(spark, cells)
                      if not fresh else None)
            cand = probe_side.select("vec_id", "e", "nrm", CELL_COL)
            if stored is not None:
                cand = cand.unionByName(
                    stored.select("vec_id", "e", "nrm", CELL_COL))
            a = probe_side.alias("a")
            c = cand.alias("c")
            dot = F.aggregate(
                F.zip_with("a.e", "c.e", lambda x, y: x * y),
                F.lit(0.0), lambda acc, x: acc + x)
            # try_divide: a zero-norm vector's cosine is undefined —
            # NULL fails the threshold filter (never pairs), where
            # ANSI-mode `/` would abort the whole batch on 0/0. A
            # NaN-containing embedding instead yields a NaN sim (NaN
            # norm is not a zero divisor), and Spark compares NaN
            # GREATER than every double — so the edge filter needs the
            # explicit ~isnan conjunct or a NaN vector would pair with
            # its whole cell instead of never pairing (ADVICE r11).
            sim = F.round(
                F.try_divide(dot, F.col("a.nrm") * F.col("c.nrm")), 6)
            edges = (a.join(c, (F.col(f"a.{CELL_COL}")
                                == F.col(f"c.{CELL_COL}"))
                            & (F.col("a.vec_id") != F.col("c.vec_id")))
                     .filter((sim >= F.lit(float(self.threshold)))
                             & ~F.isnan(sim))
                     .select(F.least("a.vec_id", "c.vec_id")
                             .alias("doc_a"),
                             F.greatest("a.vec_id", "c.vec_id")
                             .alias("doc_b")))
            if attach is not None:
                # attach edges already satisfy doc_a < doc_b (the rep
                # is the group's min id); the distinct below absorbs
                # any overlap with sim edges (a crash replay can see a
                # duplicate's rows on the stored side)
                edges = edges.unionByName(attach)
            pairs = (edges.distinct()
                     .select("doc_a", "doc_b",
                             F.lit(1).cast("long").alias("n_bands"),
                             # the cosine threshold IS the verdict —
                             # merge_pairs skips the Jaccard verify
                             F.lit(True).alias("exact"))
                     # pin BEFORE the writes below replace the very
                     # cell files the stored-side plan listed (the
                     # lsh_index read-then-overwrite discipline)
                     .localCheckpoint(eager=True))
            # vector maintenance BEFORE the component merge: the groups
            # marker (touched inside merge_pairs' commit) then implies
            # durable vectors; a crash in between replays as
            # purge-then-add (reversing any half-append) + an identical
            # pair set
            if not committed:
                if fresh:
                    self.index.build(spark, batch, centroids=centroids)
                else:
                    # DataFrame victims (VERDICT r10 #3): the per-batch
                    # hot path must not materialize every batch id on
                    # the driver — the sidecar pruning is a semi-join
                    self.index.purge_vectors_df(
                        spark, batch.select("vec_id"))
                    self.index.add_batch(spark, batch)
            docs_like = batch.select(
                F.col("vec_id").alias("doc_id"),
                F.lit("v").alias("text"))
            return self.groups.merge_pairs(spark, docs_like, pairs,
                                           batch_id=batch_id)
        finally:
            batch.unpersist()

    def retrain(self, spark: SparkSession, n_cells: int | None = None,
                iters: int = 2) -> int:
        """Explicit quantizer retraining — the maintenance step the
        ingest contract defers to (the codebook is pinned at the first
        batch and never moves on ingest, so a corpus that drifts from
        its seed codebook gets skewed cells and weaker same-cell
        recall). Trains ``kmeans_fit`` on the CURRENT vectors and
        rebuilds the inverted file crash-safely
        (:meth:`IvfVectorIndex.rebuild`, sibling-then-swap).

        The groups state is untouched and stays valid: merged edges
        are verified HISTORY (each was a real ≥τ cosine at merge
        time), and the codebook only shapes FUTURE pair blocking —
        retraining changes which near-dups the next batches can see,
        never what was already grouped. Returns the new cell count."""
        n = self.index.rebuild(spark, n_cells=n_cells, iters=iters)
        self.n_cells = n
        return n

    # -- reads / erasure ----------------------------------------------

    def read_groups(self, spark: SparkSession) -> DataFrame:
        """(component, keep_doc_id, cluster_size) — keeper == the min
        member id (all n_tokens are 1 in this store)."""
        return (self.groups.read_groups(spark)
                .select("component", "keep_doc_id", "cluster_size"))

    def purge_docs(self, spark: SparkSession, vec_ids: list[int],
                   purge_batch_id: int | None = None) -> int:
        """GDPR erasure across BOTH sides: the vectors leave the
        inverted file (cell-pruned) and the ids lose every group claim
        (survivor re-election, the groups-store contract). List-based
        entry for erasure endpoints; the per-epoch CDC path uses
        :meth:`purge_docs_df`."""
        if not vec_ids:
            return 0
        ids_df = spark.createDataFrame(
            [(int(v),) for v in sorted(set(vec_ids))], "vec_id long")
        return self.purge_docs_df(spark, ids_df,
                                  purge_batch_id=purge_batch_id,
                                  broadcast_victims=True)

    def purge_docs_df(self, spark: SparkSession, victims: DataFrame,
                      purge_batch_id: int | None = None,
                      broadcast_victims: bool = False,
                      _pinned: bool = False) -> int:
        """DataFrame-victims form of :meth:`purge_docs` (the
        ``purge_vectors_df`` discipline, VERDICT r11 #1): an
        update-heavy CDC micro-batch purges its whole touched-id set,
        and that set must never materialize on the driver. ``victims``
        is any frame with a castable ``vec_id`` column; both sides —
        the inverted file and the groups claims — resolve their
        pruning by joins."""
        ids = victims.select(
            F.col("vec_id").cast("long").alias("vec_id"))
        if not _pinned:
            ids = ids.distinct().localCheckpoint(eager=True)
        # no separate emptiness probe: both sides gate on their own
        # ≤N victim-partition collects (empty victims short-circuit)
        self.index.purge_vectors_df(spark, ids,
                                    broadcast_victims=broadcast_victims,
                                    _pinned=True)
        return self.groups.purge_docs_df(
            spark, ids.select(F.col("vec_id").alias("doc_id")),
            purge_batch_id=purge_batch_id,
            broadcast_victims=broadcast_victims, _pinned=True)
