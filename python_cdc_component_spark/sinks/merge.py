"""Incremental keyed-upsert (MERGE) compaction sink.

Parity target: the reference's DEDUPE export keeps one compacted row per
primary key across chained incremental runs
(``db_components/db_common/staging.py:216-282``; chained test
``ex_mysql_cdc/tests/functional/incremental-dedupe-chained/``). The
round-1 implementation re-read and overwrote the *entire* compacted
table every micro-batch — O(total-state x batches) I/O.

Spark-first design: the compacted state is a parquet table hash-bucketed
on the primary key (``_kbc_bucket = pmod(xxhash64(pk...), N)`` as a
partition directory). A micro-batch can only change rows in the buckets
its own keys hash into, so the merge

1. computes the batch's touched bucket ids (a <=N-int driver scalar),
2. reads ONLY those buckets back (partition-pruned scan — the plan shows
   a PartitionFilters entry, never a full-state scan),
3. window-dedups batch+bucket rows per key (same W1 operator as batch
   mode), and
4. rewrites ONLY the touched buckets via dynamic partition overwrite —
   untouched buckets' files are never opened or rewritten; Spark's file
   commit protocol stages new files and swaps per-partition, so a crash
   mid-write leaves the previous bucket contents in place.

Per-batch I/O is O(|batch| + touched_buckets * state/N), proportional to
the batch for keyed workloads. At 100 TB, N scales with state size
(N ~ state_bytes / target_partition_bytes) and the bucket key gives every
run the same partitioning, so the per-bucket merge shuffle is bounded and
skew-free for uniform key hashes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fs import fs_exists as _fs_exists
from ..fs import fs_read_text as _fs_read_text
from ..fs import fs_write_text as _fs_write_text
from ..operators.dedup import dedup_latest
from ..operators.schema_align import union_epochs

BUCKET_COL = "_kbc_bucket"
_OVERWRITE_MODE_KEY = "spark.sql.sources.partitionOverwriteMode"


@dataclass
class MergeCompactor:
    """Keyed-upsert sink: ``merge`` is called once per micro-batch (from
    ``foreachBatch``) or once per chained batch run.

    The bucket count is part of the store's PHYSICAL LAYOUT: a row of
    key k lives in directory ``pmod(xxhash64(k), N)`` for the N the
    store was BUILT with. The first write persists N to
    ``_meta.json``; every later open resolves N from the store, so a
    caller constructed with a different ``num_buckets`` cannot
    silently mis-bucket (which would read the wrong directory on merge
    and produce duplicate rows per key). Growing a store's N is an
    explicit full rewrite — :meth:`rebucket` — exactly like bucketed
    tables everywhere."""

    state_path: str
    keys: list[str]
    num_buckets: int = 32

    def _meta_path(self) -> str:
        import os
        return os.path.join(self.state_path, "_meta.json")

    def _resolve_buckets(self, spark: SparkSession) -> int:
        """Layout-resolved bucket count: the stored N wins over the
        constructor arg; a legacy store (no meta) gets the current N
        persisted on first contact. Meta I/O goes through the Hadoop
        FS API like every data path — on hdfs://\u2009/\u2009s3a:// a local
        ``open()`` would never find the file and the layout-pinning
        guard would silently do nothing."""
        import json
        raw = _fs_read_text(spark, self._meta_path())
        if raw is not None:
            self.num_buckets = int(json.loads(raw)["num_buckets"])
        elif _fs_exists(spark, self.state_path):
            self._write_meta(spark)
        return self.num_buckets

    def _write_meta(self, spark: SparkSession) -> None:
        import json
        _fs_write_text(spark, self._meta_path(),
                       json.dumps({"num_buckets": self.num_buckets}))

    def _bucket(self) -> F.Column:
        return F.pmod(F.xxhash64(*[F.col(k) for k in self.keys]),
                      F.lit(self.num_buckets)).cast("int")

    def rebucket(self, spark: SparkSession, new_num_buckets: int) -> int:
        """Maintenance op: rewrite the whole store under a new bucket
        count (state growth outpacing N means per-bucket merge I/O
        creeps up — the SCALING.md "N ~ state_bytes /
        target_partition_bytes" knob, applied). Full rewrite by
        construction; returns the new N."""
        self._resolve_buckets(spark)
        if not _fs_exists(spark, self.state_path):
            self.num_buckets = int(new_num_buckets)
            return self.num_buckets
        cur = (spark.read.option("mergeSchema", "true")
               .option("basePath", self.state_path)
               .parquet(self.state_path).drop(BUCKET_COL))
        self.num_buckets = int(new_num_buckets)
        out = (cur.withColumn(BUCKET_COL, self._bucket())
                  .repartition(F.col(BUCKET_COL))
                  .localCheckpoint(eager=True))
        (out.write.partitionBy(BUCKET_COL)
            .mode("overwrite").parquet(self.state_path))
        self._write_meta(spark)
        return self.num_buckets

    def merge(self, spark: SparkSession, batch_df: DataFrame) -> int:
        """Upsert one batch into the compacted state. Returns the number
        of buckets rewritten (0 for an empty batch)."""
        self._resolve_buckets(spark)
        batch = batch_df.withColumn(BUCKET_COL, self._bucket())
        batch.persist()
        try:
            touched = [r[0] for r in
                       batch.select(BUCKET_COL).distinct().collect()]
            if not touched:
                return 0
            if _fs_exists(spark, self.state_path):
                # mergeSchema: after schema drift, buckets rewritten in
                # different batches carry different file schemas; without
                # it Spark infers from ONE arbitrary file and drifted
                # columns silently vanish. The read lists the touched
                # bucket DIRECTORIES explicitly (basePath keeps the
                # partition column): a whole-table load + filter would
                # run the mergeSchema footer job over EVERY bucket's
                # files before pruning — measured as a full-store task
                # wave per micro-batch on a 512-bucket state.
                import os
                paths = [p for p in
                         (os.path.join(self.state_path,
                                       f"{BUCKET_COL}={b}")
                          for b in touched)
                         if _fs_exists(spark, p)]
                if paths:
                    current = (spark.read.option("mergeSchema", "true")
                               .option("basePath", self.state_path)
                               .parquet(*paths))
                    merged = union_epochs([current, batch])
                else:
                    merged = batch
            else:
                merged = batch
            # ONE bucket exchange serves both the window dedup and the
            # write's bin-packing: the bucket id is a pure function of
            # the PK, so hash-partitioning on it co-locates every key's
            # rows, and a window partitioned by (bucket, *pk) rides the
            # established partitioning via the subset rule instead of
            # adding its own PK exchange (the same shared-exchange
            # pattern as q2/q21). Bin-packing is unchanged — each
            # bucket still lands wholly in one writer task, one file
            # per rewritten bucket — while the second full pass of the
            # compacted bytes over the wire is gone.
            merged = merged.repartition(F.col(BUCKET_COL))
            compacted = dedup_latest(merged, [BUCKET_COL, *self.keys])
            # WRITER-level dynamic overwrite, never the session conf:
            # inside foreachBatch the plan runs on the micro-batch's
            # CLONED session whose SQLConf was frozen at stream start —
            # a conf set here on the outer session never reaches it, the
            # overwrite silently degrades to static, and every bucket
            # the batch did NOT touch is wiped (reproduced: two
            # single-key batches, 64 buckets -> first key lost).
            (compacted.write.partitionBy(BUCKET_COL)
             .option(_OVERWRITE_MODE_KEY.rsplit(".", 1)[-1], "dynamic")
             .mode("overwrite").parquet(self.state_path))
            import os
            if _fs_read_text(spark, self._meta_path()) is None:
                self._write_meta(spark)  # pin the layout at first write
            return len(touched)
        finally:
            batch.unpersist()

    def purge(self, spark: SparkSession, keys_df: DataFrame) -> int:
        """Right-to-be-forgotten erasure against the stored state: drop
        every row whose key appears in ``keys_df``, rewriting ONLY the
        buckets those keys hash to (path-pruned read + dynamic partition
        overwrite — untouched buckets' files are never opened, same
        contract as ``merge``). Returns the number of buckets rewritten.
        Erasure is physical: the rewritten files no longer contain the
        rows, unlike a tombstone append."""
        self._resolve_buckets(spark)
        keys = keys_df.select(*self.keys).distinct()
        keys.persist()
        try:
            import os
            touched = [r[0] for r in
                       keys.select(self._bucket().alias("b"))
                           .distinct().collect()]
            paths = [p for p in
                     (os.path.join(self.state_path, f"{BUCKET_COL}={b}")
                      for b in touched)
                     if _fs_exists(spark, p)]
            if not paths:
                return 0
            current = (spark.read.option("mergeSchema", "true")
                       .option("basePath", self.state_path)
                       .parquet(*paths)).persist()
            kept = current.join(F.broadcast(keys), self.keys, "left_anti")
            # dynamic overwrite only rewrites partitions PRESENT in the
            # written data — a bucket whose every row is purged would
            # silently keep its old files; delete those dirs explicitly
            surviving = {r[0] for r in
                         kept.select(BUCKET_COL).distinct().collect()}
            try:
                # writer-level dynamic overwrite (see merge())
                (kept.repartition(F.col(BUCKET_COL))
                 .write.partitionBy(BUCKET_COL)
                 .option(_OVERWRITE_MODE_KEY.rsplit(".", 1)[-1], "dynamic")
                 .mode("overwrite").parquet(self.state_path))
            finally:
                current.unpersist()
            emptied = [b for b in touched
                       if b not in surviving
                       and _fs_exists(spark,
                                      os.path.join(self.state_path,
                                                   f"{BUCKET_COL}={b}"))]
            if emptied:
                jvm = spark._jvm
                conf = spark._jsc.hadoopConfiguration()
                for b in emptied:
                    p = jvm.org.apache.hadoop.fs.Path(
                        os.path.join(self.state_path, f"{BUCKET_COL}={b}"))
                    p.getFileSystem(conf).delete(p, True)
            return len(paths)
        finally:
            keys.unpersist()

    def health(self, spark: SparkSession) -> DataFrame:
        """Operational health report of the bucketed state store:
        per-bucket file count, row count, and tombstone count — the
        compaction-debt signals an operator watches (file-count creep
        means the bin-packing rewrite is being defeated; tombstone
        ratio drives retention compaction scheduling). One pruned scan;
        file attribution via the metadata column, no filesystem
        listing loop."""
        df = (spark.read.option("mergeSchema", "true")
              .parquet(self.state_path))
        deleted = (F.col("__deleted").cast("int")
                   if "__deleted" in df.columns else F.lit(0))
        return (df.select(F.col(BUCKET_COL).alias("bucket"),
                          F.col("_metadata.file_path").alias("_f"),
                          deleted.alias("_d"))
                .groupBy("bucket")
                .agg(F.countDistinct("_f").alias("n_files"),
                     F.count(F.lit(1)).alias("n_rows"),
                     F.sum("_d").cast("long").alias("n_tombstones"))
                .orderBy("bucket"))

    def read(self, spark: SparkSession) -> DataFrame:
        """The compacted table (bucket column dropped). mergeSchema keeps
        post-drift columns visible regardless of which bucket's files the
        schema would otherwise be inferred from; at very large state,
        pass the registry's merged StructType via ``spark.read.schema``
        instead to skip footer merging."""
        return (spark.read.option("mergeSchema", "true")
                .parquet(self.state_path).drop(BUCKET_COL))
