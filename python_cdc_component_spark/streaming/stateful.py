"""Custom stateful streaming operator: incremental keyed dedup.

Beyond the reference's foreachBatch-style compaction, this is the
Spark-native *stateful* form of W1 (the core dedup,
``staging.py:250-256``): ``applyInPandasWithState`` keeps the latest
event per key in the state store, so each micro-batch emits only keys
that changed — no re-read of the compacted table. This is the scale
path when outputs feed a downstream incremental consumer: state is
partitioned by key across executors' state stores, one row per key.

The reference has no stateful operators (SURVEY §2.9 last row: "none");
this is the idiomatic Structured Streaming extension point for them.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _py(v):
    """numpy scalar → python native (state tuples must be plain types)."""
    return v.item() if hasattr(v, "item") else v


def streaming_dedup_latest(stream: DataFrame, key_col: str, order_col: str,
                           schema_ddl: str) -> DataFrame:
    """Latest-event-per-key across micro-batches via keyed state.

    ``schema_ddl``: DDL string for both output and state rows, e.g.
    ``"user_id long, kbc__pos long, value double"`` — must list a subset
    of the stream's columns including ``key_col`` and ``order_col``.
    Output mode is *update*: a key is emitted only when its latest event
    changed in this micro-batch.
    """
    # Parse the DDL through Spark's own parser — a naive split(",") would
    # shred parameterized types like decimal(10,2) or map<string,int>.
    from pyspark.sql.types import _parse_datatype_string
    cols = [f.name for f in _parse_datatype_string(schema_ddl).fields]

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        best = dict(zip(cols, state.get)) if state.exists else None
        changed = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            idx = pdf[order_col].idxmax()
            cand = {c: _py(pdf.at[idx, c]) for c in cols}
            if best is None or cand[order_col] > best[order_col]:
                best = cand
                changed = True
        if changed and best is not None:
            state.update(tuple(best[c] for c in cols))
            yield pd.DataFrame([best], columns=cols)

    return (stream.select(*cols).groupBy(key_col)
            .applyInPandasWithState(
                update,
                outputStructType=schema_ddl,
                stateStructType=schema_ddl,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
