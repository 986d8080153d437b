"""Bucketed-table co-located joins — the storage-level shuffle remedy.

SURVEY §4 names repeated shuffles on the same join key as the dominant
cost of the reference's staging joins (reference
``db_components/db_common/staging.py:216-282`` re-joins staged chunks on
the PK every run).  Spark's answer at 100 TB is *bucketing*: persist both
fact tables hash-partitioned on the join key (``bucketBy``), after which
every equi-join / aggregation on that key reads co-located buckets and
elides the Exchange entirely — the shuffle is paid once at write time and
amortized over every subsequent read.

Design notes (100 TB):
- ``write_bucketed`` repartitions the input by the bucket expression into
  exactly ``num_buckets`` tasks before the write, so each bucket is one
  file.  That matters twice: (a) Spark only trusts ``sortBy`` ordering —
  and elides the join sort — when a bucket is a single file; (b) it
  prevents the M-tasks × N-buckets small-file explosion.
- ``repartition(n, col)`` uses the same Murmur3 ``HashPartitioning`` as
  the bucket spec, so the pre-write shuffle routes each key straight to
  its own bucket's writer task.
- Tables are registered as EXTERNAL (explicit ``path``) so the files live
  where the caller says, and the in-memory catalog entry carries only the
  bucket spec.  On a cluster the same call against a shared metastore
  makes the spec durable across jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, name: str, path: str, bucket_cols: list[str],
                   num_buckets: int = 8, sort: bool = True) -> None:
    """Persist ``df`` as an external parquet table bucketed (and
    optionally sorted) on ``bucket_cols`` — one file per bucket."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    out = df.repartition(num_buckets, *[df[c] for c in bucket_cols])
    writer = (out.write.format("parquet").mode("overwrite")
                 .bucketBy(num_buckets, *bucket_cols))
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.option("path", path).saveAsTable(name)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With both sides bucketed ``num_buckets`` on ``on``, the physical plan
    is a SortMergeJoin with NO Exchange on either side (guarded by
    ``shuffle_free_join_plan``); with single-file sorted buckets the
    per-partition Sort is elided too.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)


def shuffle_free_join_plan(joined: DataFrame) -> bool:
    """True when the join subtree contains no shuffle Exchange (bucket
    co-location was actually used by the planner)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
