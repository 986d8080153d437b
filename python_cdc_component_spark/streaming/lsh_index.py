"""Streaming near-duplicate detection: a persistent LSH band index fed
one micro-batch at a time.

This is the streaming twin of ``lsh_incremental_pairs`` (queries.py) and
the near-dup analogue of the exact-hash ``bloom_dedup_incremental``: a
growing corpus arrives in ingest batches, each batch probes the stored
band index for collisions against everything indexed so far (and
itself), emits the near-dup candidate pairs, then appends its own bands
to the index. Indexed×indexed pairs are never re-examined — per-batch
cost is O(|batch| × collision fan-out), the property that makes
continuous dedup viable at corpus scale.

Index layout: parquet partitioned by ``_lsh_bucket = pmod(xxhash64(bv),
N)``. A batch's probe reads ONLY the bucket directories its own band
values hash into (explicit path list + basePath, the MergeCompactor
discipline) — per-batch index I/O is proportional to the batch's
bucket footprint, never the full index.

Exactly-once note: the emitted pairs are pinned with an eager
``localCheckpoint`` BEFORE the batch's bands are appended — the probe
reads the very directories the append is about to grow, and a lazy
plan evaluated after the append would see the batch's own bands in the
"index" side and double-count (the view_maintain lesson). Restart
semantics follow the enclosing stream's checkpoint: re-processing a
batch re-appends its bands (idempotence is the caller's dedup-on-pair
concern, same as the reference's at-least-once Debezium window).

Parity guarantee (tested): feeding a corpus through in ANY batch split
yields exactly the pairs of the full-corpus banded self-join
(``minhash_lsh_pairs``), each pair exactly once — a pair is emitted by
whichever batch completes it.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fs import fs_exists as _fs_exists
from ..fs import fs_file_count as _fs_file_count
from ..operators.llm.minhash import band_table, minhash_signatures
from ..operators.schema_align import union_epochs

BUCKET_COL = "_lsh_bucket"


@dataclass
class StreamingLshIndex:
    """Persistent LSH band index with batch-probe-then-append flow.
    Call :meth:`process_batch` once per micro-batch (e.g. from
    ``foreachBatch``)."""

    index_path: str
    num_buckets: int = 64
    # append-mode stores accrete one file per bucket per batch; probe
    # cost then grows with BATCH COUNT (file open/footer overhead),
    # not index size. Size-tiered compaction: when a touched bucket
    # exceeds this many files it is rewritten into one — amortized
    # O(1) per batch, and per-batch probe I/O returns to being
    # proportional to touched-bucket DATA.
    compact_file_threshold: int = 8

    def _bucket(self) -> F.Column:
        return F.pmod(F.xxhash64(F.col("bv")),
                      F.lit(self.num_buckets)).cast("int")

    def process_batch(self, spark: SparkSession,
                      batch_docs: DataFrame) -> DataFrame:
        """Probe + append one batch of (doc_id, text) rows. Returns the
        near-dup candidate pairs (doc_a, doc_b, n_bands) completed by
        this batch, already materialized (safe to consume after the
        index append)."""
        bands = (band_table(minhash_signatures(batch_docs))
                 .withColumn(BUCKET_COL, self._bucket()))
        bands.persist()
        try:
            touched = [r[0] for r in
                       bands.select(BUCKET_COL).distinct().collect()]
            if not touched:
                return spark.createDataFrame(
                    [], "doc_a long, doc_b long, n_bands long")
            probe_side = bands
            if _fs_exists(spark, self.index_path):
                paths = [p for p in
                         (os.path.join(self.index_path, f"{BUCKET_COL}={b}")
                          for b in touched)
                         if _fs_exists(spark, p)]
                if paths:
                    indexed = (spark.read
                               .option("basePath", self.index_path)
                               .parquet(*paths))
                    probe_side = union_epochs([indexed, bands])
            n, a = bands.alias("n"), probe_side.alias("a")
            cand = n.join(a, (F.col("n.band") == F.col("a.band"))
                          & (F.col("n.bv") == F.col("a.bv"))
                          & (F.col("n.doc_id") != F.col("a.doc_id")))
            pairs = (cand.select(
                         F.least("n.doc_id", "a.doc_id").alias("doc_a"),
                         F.greatest("n.doc_id", "a.doc_id").alias("doc_b"),
                         F.col("n.band").alias("band"))
                     .groupBy("doc_a", "doc_b")
                     .agg(F.countDistinct("band").alias("n_bands")))
            # pin BEFORE the append below grows the directories the
            # probe read lazily
            pairs = pairs.localCheckpoint(eager=True)
            (bands.write.partitionBy(BUCKET_COL)
                  .mode("append").parquet(self.index_path))
            self._compact(spark, touched)
            return pairs
        finally:
            bands.unpersist()

    def purge_docs(self, spark: SparkSession, doc_ids: list[int]) -> int:
        """Remove every band row of the given documents from the index
        — the near-dup-index half of right-to-be-forgotten erasure
        (``MergeCompactor.purge`` discipline) and the delete step of a
        document UPDATE (purge old version, ``process_batch`` the new
        text). The erased docs' band values are unknown without their
        text, so the anti-join runs over the whole index ONCE — but the
        rewrite still only touches buckets that actually held erased
        rows (dynamic partition overwrite drops only rewritten
        partitions, and partitions with no surviving rows are removed
        explicitly). Returns the number of buckets rewritten."""
        if not doc_ids or not _fs_exists(spark, self.index_path):
            return 0
        ids_df = spark.createDataFrame([(i,) for i in doc_ids],
                                       "doc_id long")
        idx = spark.read.option("basePath", self.index_path) \
                        .parquet(self.index_path)
        hit = (idx.join(F.broadcast(ids_df), "doc_id", "left_semi")
                  .select(BUCKET_COL).distinct())
        touched = [r[0] for r in hit.collect()]
        if not touched:
            return 0
        paths = [os.path.join(self.index_path, f"{BUCKET_COL}={b}")
                 for b in touched]
        kept = (spark.read.option("basePath", self.index_path)
                .parquet(*paths)
                .join(F.broadcast(ids_df), "doc_id", "left_anti")
                .repartition(F.col(BUCKET_COL)))
        kept.persist()
        try:
            kept_buckets = {r[0] for r in
                            kept.select(BUCKET_COL).distinct().collect()}
            key = "spark.sql.sources.partitionOverwriteMode"
            prev = spark.conf.get(key, "static")
            spark.conf.set(key, "dynamic")
            try:
                (kept.write.partitionBy(BUCKET_COL)
                     .mode("overwrite").parquet(self.index_path))
            finally:
                spark.conf.set(key, prev)
            # dynamic overwrite only replaces partitions present in the
            # written data — buckets whose every row was erased must be
            # deleted explicitly
            jvm = spark._jvm
            conf = spark._jsc.hadoopConfiguration()
            for b in set(touched) - kept_buckets:
                jp = jvm.org.apache.hadoop.fs.Path(
                    os.path.join(self.index_path, f"{BUCKET_COL}={b}"))
                jp.getFileSystem(conf).delete(jp, True)
            return len(touched)
        finally:
            kept.unpersist()

    def _compact(self, spark: SparkSession, touched: list[int]) -> int:
        """Rewrite every touched bucket whose file count exceeds the
        threshold into one file each — in ONE Spark job (read the due
        bucket dirs together, hash-partition on the bucket id so each
        lands wholly in one task, dynamic-partition overwrite). A
        per-bucket job here would pay fixed job overhead × buckets per
        batch (measured 3× total cost at 64 buckets); batched, the
        amortized compaction I/O is index/threshold per batch and
        untouched buckets are never opened."""
        due = [b for b in touched
               if _fs_file_count(
                   spark, os.path.join(self.index_path, f"{BUCKET_COL}={b}"))
               > self.compact_file_threshold]
        if not due:
            return 0
        paths = [os.path.join(self.index_path, f"{BUCKET_COL}={b}")
                 for b in due]
        df = (spark.read.option("basePath", self.index_path)
              .parquet(*paths)
              .repartition(F.col(BUCKET_COL)))
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(key, "static")
        spark.conf.set(key, "dynamic")
        try:
            (df.write.partitionBy(BUCKET_COL)
               .mode("overwrite").parquet(self.index_path))
        finally:
            spark.conf.set(key, prev)
        return len(due)
