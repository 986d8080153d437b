"""Z-order (Morton) multi-dimension layout clustering.

Single-column sort layouts (partition-by-date, order-by-key) prune scans
on ONE predicate dimension only; a 100 TB event store queried both by
user and by time wants file/row-group skipping on BOTH.  Interleaving
the bits of the two (bucketed) dimensions into one Morton key and
range-partitioning on it bounds EVERY partition to a small hyper-
rectangle: with b leading key bits consumed by the partitioner, each
partition spans at most 2^(bits-ceil(b/2)) distinct values per
dimension, so min/max pruning works for either predicate.

This is the layout move behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` —
re-expressed here as a plain deterministic column expression (pure
integer bit arithmetic, codegen-friendly, no UDF) plus
``repartitionByRange`` so it works on stock parquet.  Reference scope:
the reference's staging tables are single-key sorted
(core/staging.py's ORDER BY pk); this generalizes that layout for the
beyond-reference analytics surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    integer columns (x gets odd bit positions, y even).  Pure
    shift/and/add integer arithmetic — whole-stage-codegen, identical
    semantics in ANSI SQL (see :func:`zorder_key_sql`)."""
    z = None
    for i in range(bits):
        xb = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        yb = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i)
        t = xb + yb
        z = t if z is None else z + t
    return z


def zorder_key_sql(x: str, y: str, bits: int = 10) -> str:
    """ANSI-SQL twin of :func:`zorder_key` (same bit layout) for the
    DuckDB oracles."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def cluster_by_zorder(df: DataFrame, x: Column, y: Column,
                      num_partitions: int, bits: int = 10) -> DataFrame:
    """Range-partition ``df`` on the Morton key of (x, y) — the write-
    side layout operator: each output partition (→ parquet file) covers
    a bounded range in BOTH dimensions, so per-file min/max statistics
    prune reads filtered on either one.  The range partitioner samples
    the key (one extra pass over the key column only); the payload
    moves once."""
    return (df.withColumn("__z", zorder_key(x, y, bits))
              .repartitionByRange(num_partitions, "__z")
              .drop("__z"))
