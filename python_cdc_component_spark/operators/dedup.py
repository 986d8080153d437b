"""Dedup / compaction operators — the reference's core query surface.

Parity targets:
- W1 ranking-window dedup: ``QUALIFY ROW_NUMBER() OVER (PARTITION BY <pk>
  ORDER BY "kbc__batch_event_order"::BIGINT DESC) = 1`` (reference
  ``staging.py:250-256``, Snowflake variant ``:113-123``, Postgres live
  copy ``ex_postgres_cdc/src/component.py:461-471``);
- J1 left-anti slice suppression: drop a record whose PK reappears in a
  later slice (reference ``staging.py:266-282``);
- W2 map-reduce chunked dedup: per-chunk W1 + PK-cache anti-join to bound
  memory (reference ``staging.py:216-282``) — obsolete on Spark (the
  window shuffles/spills cluster-wide) but provided for parity testing;
- no-PK dedup: PK falls back to all non-system columns (reference
  ``ex_mysql_cdc/src/component.py:406-408``).

Scale notes (100 TB): ``dedup_latest`` is one hash-shuffle by the PK —
Catalyst plans a single Exchange + per-partition sort; AQE splits skewed
PKs. No global sort, no driver collection. The composite order key makes
results deterministic regardless of partitioning (see ``order.py``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .order import order_sort_cols
from .schema_align import union_epochs

_RN = "__rn_tmp"


def dedup_latest(df: DataFrame, keys: list[str],
                 order_by: list[Column] | None = None) -> DataFrame:
    """Keep the latest event per key (W1).

    Spark plan: Exchange(hash by keys) → WindowExec(row_number) → Filter.
    Equivalent SQL (the reference's generated DuckDB SQL,
    staging.py:250-256)::

        SELECT * FROM t QUALIFY ROW_NUMBER() OVER (
            PARTITION BY pk1, pk2 ORDER BY order_col DESC) = 1
    """
    order_by = order_by or order_sort_cols(descending=True)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (df.withColumn(_RN, F.row_number().over(w))
              .filter(F.col(_RN) == 1)
              .drop(_RN))


def dedup_latest_no_pk(df: DataFrame, system_cols: list[str],
                       order_by: list[Column] | None = None) -> DataFrame:
    """No-PK dedup: key = all non-system columns (reference
    ``ex_mysql_cdc/src/component.py:406-408``; test
    ``simple-incremental-no-pkey-dedupe/``). Collapses exact-duplicate
    payloads to their latest event."""
    keys = [c for c in df.columns if c not in set(system_cols)]
    return dedup_latest(df, keys, order_by=order_by)


def slice_suppress_anti_join(slice_df: DataFrame, later_keys: DataFrame,
                             keys: list[str]) -> DataFrame:
    """J1: suppress records of ``slice_df`` whose key appears in any later
    slice (later slice wins). The reference does LEFT JOIN ... WHERE
    pc.pkey IS NULL (staging.py:273-275); Spark's ``left_anti`` is the
    same logical op and Catalyst broadcasts ``later_keys`` when small."""
    on = reduce(lambda a, b: a & b,
                [slice_df[k].eqNullSafe(later_keys[k]) for k in keys])
    return slice_df.join(later_keys.select(*keys).distinct(), on=on, how="left_anti")


def chunked_dedup(chunks: list[DataFrame], keys: list[str],
                  order_by: list[Column] | None = None) -> DataFrame:
    """W2 map-reduce dedup, kept for parity verification: per-chunk W1,
    then reverse-order anti-join against the union of later-chunk keys
    (staging.py:216-282). Semantically ≡ ``dedup_latest(union_epochs(
    chunks), keys)`` **provided chunk order follows event order** — chunk
    N+1 strictly after chunk N (DedupeDbConverter.java:40-47 rotation).

    On Spark prefer the single global window; this exists so tests can
    assert the two strategies agree (SURVEY §7.4 empty-state nuance).
    """
    deduped = [dedup_latest(c, keys, order_by=order_by) for c in chunks]
    out: list[DataFrame] = []
    for i, d in enumerate(deduped):
        later = deduped[i + 1:]
        if later:
            later_keys = union_epochs([x.select(*keys) for x in later])
            d = slice_suppress_anti_join(d, later_keys, keys)
        out.append(d)
    return union_epochs(out)
