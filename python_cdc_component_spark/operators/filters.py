"""Column / table filters (P3, P4, P7).

Parity targets:
- P3 column include/exclude regex lists (Debezium ``column.include.list``
  / ``column.exclude.list``, reference ``mysql_extractor.py:170-173``,
  enum ``configuration.py:114-117``);
- P4 helper-column drop post-dedup (reference
  ``ex_postgres_cdc/src/component.py:430-443``);
- P7 table include filter (``database.include.list`` /
  ``table.include.list``, ``mysql_extractor.py:163-164``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model.envelope import SYSTEM_COLUMNS as SC


def apply_column_filter(df: DataFrame,
                        include: list[str] | None = None,
                        exclude: list[str] | None = None,
                        protect: list[str] | None = None) -> DataFrame:
    """P3: keep columns matching any ``include`` regex (or all, if no
    include list), then drop those matching any ``exclude`` regex.
    System columns are protected like Debezium protects its own metadata.
    Regexes are full-match, mirroring Debezium list semantics."""
    protect_set = set(protect if protect is not None else SC.ingest_names)
    cols = df.columns
    if include:
        pats = [re.compile(p) for p in include]
        cols = [c for c in cols
                if c in protect_set or any(p.fullmatch(c) for p in pats)]
    if exclude:
        pats = [re.compile(p) for p in exclude]
        cols = [c for c in cols
                if c in protect_set or not any(p.fullmatch(c) for p in pats)]
    return df.select(*cols)


def drop_helper_columns(df: DataFrame,
                        helpers: tuple[str, ...] = (SC.BATCH_EVENT_ORDER,
                                                    SC.OPERATION)) -> DataFrame:
    """P4: drop dedup helper columns after compaction (the reference's
    ALTER TABLE DROP of KBC__BATCH_EVENT_ORDER / KBC__OPERATION)."""
    return df.drop(*[h for h in helpers if h in df.columns])


def table_include_filter(df: DataFrame, tables: list[str],
                         table_col: str = "_table") -> DataFrame:
    """P7: keep only events of the configured tables. On a partitioned
    event store this predicate prunes whole partitions (the Spark
    analogue of Debezium's source-level topic selection)."""
    return df.filter(F.col(table_col).isin(tables))
