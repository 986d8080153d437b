"""Bounded CDC stream consumption (T1/T2/T3/T9 + P6).

Parity target: the reference's Debezium engine loop —
``DbChangeConsumer.handleBatch`` micro-batches (T1,
``DbChangeConsumer.java:68-102``), stop conditions (T2,
``AbstractDebeziumTask.java:166-189``: max-duration wall clock,
idle timeout, captured end position), snapshot-phase gating (T3,
``KeboolaNotification.java:25-34``), APPEND/DEDUPE mode switch (T9,
``DebeziumKBCWrapper.java:81-106``).

Spark-first mapping (SURVEY §2.9):
- "consume to the captured end position then stop" (P6) is exactly
  ``Trigger.AvailableNow`` — it snapshots the source's end offsets at
  start and drains up to them, across however many micro-batches;
- max-duration is ``awaitTermination(timeout)`` + ``stop()``;
- idle-stop is a ``StreamingQueryListener`` watching progress rows;
- APPEND mode is a pure streaming append sink; DEDUPE compacts in
  ``foreachBatch`` using the same batch operators (one code path for
  batch and streaming — the point of Structured Streaming).

Scale notes: at 100 TB the event stream partitions by table/key at the
source; ``maxFilesPerTrigger`` bounds micro-batch size like the
reference's ``max.batch.size`` (2048, ``mysql_extractor.py:166``), and
the DEDUPE compaction shuffles only each micro-batch plus the key-state,
not history.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

from ..model.envelope import OP_SNAPSHOT_READ, SYSTEM_COLUMNS as SC
from ..operators.dedup import dedup_latest
from ..operators.schema_align import union_epochs
from ..sources.events import EVENTS_RAW_SCHEMA, PAYLOAD_COLS, _op_expr


@dataclass
class BoundedStreamConfig:
    """T2 stopping conditions + T9 mode (reference ``executor.py:48-71``
    dataclasses; MySQL defaults ``component.py:35`` /
    ``configuration.py:156``)."""

    mode: str = "DEDUPE"                       # APPEND | DEDUPE
    primary_keys: list[str] = field(default_factory=lambda: ["user_id"])
    max_duration_s: float = 85500.0            # reference MySQL default
    max_wait_s: float = 30.0                   # idle stop
    max_files_per_trigger: int | None = None   # engine batch-size analogue


def read_event_stream(spark: SparkSession, events_dir: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """S1 (stream flavor): file-backed CDC event stream with the same
    normalized envelope as the batch reader."""
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.parquet(events_dir)
    op = _op_expr()
    return raw.select(
        F.lit("events").alias("_table"),
        *PAYLOAD_COLS,
        op.alias(SC.operation),
        F.expr("ts div 1000000").alias(SC.event_timestamp),
        F.lit("binlog.000001").alias(SC.file),
        F.col("event_id").alias(SC.pos),
        (op == "d").alias(SC.deleted),
        F.col("event_id").alias(SC.batch_event_order),
        # T3: snapshot-phase column — op='r' rows belong to the initial
        # snapshot; stop conditions never fire during snapshot.
        (op == OP_SNAPSHOT_READ).alias("_snapshot_phase"),
    )


class _IdleStopListener(StreamingQueryListener):
    """T2(b): idle timeout — remembers when the stream last made progress
    with input rows; the driver loop stops the query when the idle gap
    exceeds ``max_wait_s`` (reference ``AbstractDebeziumTask.java:171-183``
    idle check, gated off during snapshot)."""

    def __init__(self):
        self.last_data_ts = time.time()
        self.busy = False

    def onQueryStarted(self, event):
        self.last_data_ts = time.time()

    def onQueryProgress(self, event):
        progress = event.progress
        if progress.numInputRows > 0:
            self.last_data_ts = time.time()
            self.busy = True
        else:
            self.busy = False

    def onQueryIdle(self, event):
        self.busy = False

    def onQueryTerminated(self, event):
        pass


def _compact(spark: SparkSession, batch_df: DataFrame, out_path: str,
             keys: list[str]) -> None:
    """DEDUPE-mode foreachBatch: merge the micro-batch with the current
    compacted table and keep the latest event per key. Same operator as
    batch mode (operators.dedup.dedup_latest) — W1 applied incrementally.
    """
    batch_df = batch_df.drop("_snapshot_phase")
    try:
        current = spark.read.parquet(out_path)
        merged = union_epochs([current, batch_df])
    except Exception:
        merged = batch_df
    compacted = dedup_latest(merged, keys).localCheckpoint(eager=True)
    compacted.write.mode("overwrite").parquet(out_path)


def bounded_sync(spark: SparkSession, events_dir: str, out_path: str,
                 checkpoint_dir: str,
                 cfg: BoundedStreamConfig | None = None) -> dict:
    """Run one bounded sync over the event stream.

    ``Trigger.AvailableNow`` drains everything present at start then
    stops (P6 semantics); the wall-clock and idle stops guard the drain
    like the reference's poll loop. Returns run stats.
    """
    cfg = cfg or BoundedStreamConfig()
    stream = read_event_stream(spark, events_dir, cfg.max_files_per_trigger)

    listener = _IdleStopListener()
    spark.streams.addListener(listener)
    try:
        if cfg.mode.upper() == "DEDUPE":
            def sink(batch_df: DataFrame, batch_id: int) -> None:
                _compact(spark, batch_df, out_path, cfg.primary_keys)

            writer = stream.writeStream.foreachBatch(sink)
        else:
            writer = (stream.drop("_snapshot_phase")
                      .writeStream.format("parquet")
                      .option("path", out_path))

        query = (writer
                 .option("checkpointLocation", checkpoint_dir)
                 .trigger(availableNow=True)
                 .start())

        start = time.time()
        stopped_reason = "drained"
        while query.isActive:
            if query.awaitTermination(1.0):
                break
            elapsed = time.time() - start
            if elapsed > cfg.max_duration_s:
                stopped_reason = "max_duration"
                query.stop()
                break
            if (not listener.busy
                    and time.time() - listener.last_data_ts > cfg.max_wait_s):
                stopped_reason = "idle_timeout"
                query.stop()
                break
        query.awaitTermination()
        progress = query.lastProgress
        return {
            "stopped_reason": stopped_reason,
            "batches": progress["batchId"] + 1 if progress else 0,
            "sink_path": out_path,
        }
    finally:
        spark.streams.removeListener(listener)
