"""Deterministic global event order (W3 replacement).

The reference assigns ``kbc__batch_event_order`` from a single-threaded
``AtomicInteger`` (``AbstractDbConverter.java:41,101-102``) — impossible
to reproduce on a distributed engine. SURVEY §4 item 2: replace it with
the composite sort key ``(kbc__event_timestamp, kbc__file, kbc__pos)``
captured from the source log, which totally orders events without any
coordination.

``with_batch_event_order`` materializes an integer order column only when
an output contract demands it. NOTE the global ``row_number`` needs a
single-partition window — a scale bottleneck by design, so it is opt-in;
every internal operator (dedup etc.) uses the composite key directly,
which shuffles only by the dedup key and never serializes.

For per-key use (the only correctness-relevant use in the reference —
dedup order within a PK), ``order_sort_cols`` returns descending sort
expressions for the composite key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..model.envelope import SYSTEM_COLUMNS as SC


def order_sort_cols(ts_col: str = SC.event_timestamp,
                    file_col: str | None = SC.file,
                    pos_col: str | None = SC.pos,
                    descending: bool = True) -> list[Column]:
    """Sort expressions for the composite total-order key.

    ``file``/``pos`` are MySQL binlog coordinates; the Postgres component
    has no FILE/POS (reference ``ex_postgres_cdc/src/component.py``
    SYSTEM_COLUMNS diff), so both are optional.
    """
    cols = [F.col(ts_col)]
    if file_col:
        cols.append(F.col(file_col))
    if pos_col:
        cols.append(F.col(pos_col))
    return [c.desc() if descending else c.asc() for c in cols]


def with_batch_event_order(df: DataFrame,
                           order_by: list[Column] | None = None,
                           out_col: str = SC.batch_event_order) -> DataFrame:
    """Materialize an integer total-order column via row_number over a
    global window (single partition — only for bounded/egress paths where
    the reference's integer column is part of the output contract,
    e.g. the golden-test sort key, functional.py:95-96)."""
    order_by = order_by or order_sort_cols(descending=False)
    w = Window.orderBy(*order_by)
    return df.withColumn(out_col, F.row_number().over(w))
