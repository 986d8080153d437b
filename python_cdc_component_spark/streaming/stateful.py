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


def streaming_running_stats(stream: DataFrame, key_col: str,
                            value_col: str, order_col: str) -> DataFrame:
    """Per-key running (count, sum, max-order) via keyed state —
    ``applyInPandasWithState``, the stateful API available in every
    Spark 3.4+/4.x deployment with no extra worker dependencies.

    Emits one update row per key per micro-batch the key appears in:
    ``(key, n_events, sum_value, last_pos)``. State is one fixed-width
    row per key, hash-partitioned across executors' state stores.
    ``streaming_running_stats_tws`` is the ``transformWithStateInPandas``
    twin for deployments with the protobuf worker protocol + RocksDB
    provider available.
    """

    state_schema = "n bigint, s double, last_pos bigint"
    out_schema = (f"{key_col} long, n_events bigint, "
                  f"sum_value double, last_pos bigint")

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n, s, last = state.get if state.exists else (0, 0.0, None)
        seen = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            seen = True
            n += int(len(pdf))
            s += float(pdf[value_col].sum())
            mx = int(pdf[order_col].max())
            last = mx if last is None else max(last, mx)
        if seen:
            state.update((n, s, last))
            yield pd.DataFrame(
                {key_col: [_py(key[0])], "n_events": [n],
                 "sum_value": [s], "last_pos": [last]})

    return (stream.select(key_col, value_col, order_col)
            .groupBy(key_col)
            .applyInPandasWithState(
                update,
                outputStructType=out_schema,
                stateStructType=state_schema,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def streaming_running_stats_tws(stream: DataFrame, key_col: str,
                                value_col: str, order_col: str) -> DataFrame:
    """Per-key running (count, sum, max-order) via the Spark 4
    ``transformWithStateInPandas`` API — the successor to
    applyInPandasWithState with typed, individually-evictable state
    primitives (ValueState/ListState/MapState + TTL + timers).

    Emits one update row per key per micro-batch the key appears in:
    ``(key, n_events, sum_value, last_pos)``. State is one fixed-width
    row per key, hash-partitioned across executors' state stores —
    the same scale envelope as the keyed dedup above.

    Runtime requirements (checked eagerly so misconfiguration fails at
    plan time, not mid-stream): the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the
    ``protobuf`` package for the worker protocol — absent in minimal
    sandboxes, in which case ``streaming_running_stats``'s
    applyInPandasWithState path is the supported stateful form.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the `protobuf` package "
            "for its worker protocol; use streaming_running_stats "
            "(applyInPandasWithState) on deployments without it") from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    state_schema = "n bigint, s double, last_pos bigint"

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            n, s, last = (self._st.get() if self._st.exists()
                          else (0, 0.0, None))
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                n += int(len(pdf))
                s += float(pdf[value_col].sum())
                mx = int(pdf[order_col].max())
                last = mx if last is None else max(last, mx)
            self._st.update((n, s, last))
            yield pd.DataFrame(
                {key_col: [key[0]], "n_events": [n],
                 "sum_value": [s], "last_pos": [last]})

        def close(self) -> None:
            pass

    out_schema = (f"{key_col} long, n_events bigint, "
                  f"sum_value double, last_pos bigint")
    return (stream.select(key_col, value_col, order_col)
            .groupBy(key_col)
            .transformWithStateInPandas(
                statefulProcessor=RunningStats(),
                outputStructType=out_schema,
                outputMode="Update",
                timeMode="None"))
