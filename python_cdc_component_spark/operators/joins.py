"""Join strategies for scale: salted join for skewed keys.

The reference delegates all physical strategy to DuckDB (SURVEY §4);
Spark's Catalyst + AQE already pick broadcast/sort-merge/shuffle-hash
and split skewed partitions. ``salted_join`` is the explicit fallback
for pathological skew beyond AQE's splitting (one key ≫ executor
memory): the skewed (big) side gets a deterministic salt in
``[0, buckets)``, the small side is replicated ``buckets`` times, and
the equi-join runs on ``(key, salt)`` — same result set, ``buckets``-way
parallelism on the hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, on: str,
                buckets: int = 8, how: str = "inner",
                salt_by: str | None = None) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with salt-spread hot keys.

    ``salt_by``: a big-side column whose hash picks the salt
    deterministically (default: the join key's row spread via
    ``spark_partition_id``-free hash of all columns is overkill — we use
    ``xxhash64`` of ``salt_by`` or of the key itself, which is enough to
    spread a hot key's rows across buckets when ``salt_by`` is a
    high-cardinality column like an event id).
    """
    salt_src = salt_by or on
    big_s = big.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_src)),
                                            F.lit(buckets)).cast("int"))
    small_s = (small.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(buckets)]))))
    out = big_s.join(small_s, on=[on, "__salt"], how=how)
    return out.drop("__salt")
