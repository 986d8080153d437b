"""Control plane: ad-hoc snapshot signals, stop-position capture,
sync actions, heartbeat (S4, P6, §3.3, T8).

Parity targets:
- S4 ad-hoc snapshot signal: the reference injects ``execute-snapshot``
  commands via a signal file or table to backfill newly added tables
  (``executor.py:244-303`` ``signal_snapshot`` / ``_signal_via_source``
  / ``_signal_via_file``; triggered when configured tables ⊄ last-synced
  tables, ``ex_mysql_cdc/src/component.py:149-153``);
- P6 stop position: the target end coordinates captured before the run
  (``SHOW MASTER STATUS``, ``mysql_extractor.py:245-258``) — on Spark
  the same contract is "max offset present at run start", which
  ``Trigger.AvailableNow`` enforces natively; ``capture_end_position``
  records it for the state doc;
- §3.3 sync actions: ``testConnection`` / ``get_schemas`` /
  ``get_tables`` interactive metadata queries
  (``ex_mysql_cdc/src/component.py:594-626``);
- T8 heartbeat: Postgres WAL-advance keep-alive — a no-op for the
  file-backed source, kept as an explicit interface point.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks.state import RunState


# ---------------------------------------------------------------------------
# Snapshot-mode enum (reference ``configuration.py:129-136`` SnapshotMode:
# snapshot_only / when_needed / initial / never / schema_only_recovery /
# schema_only; Postgres subset ``ex_postgres_cdc/src/configuration.py:93``).

SNAPSHOT_MODES = ("initial", "initial_only", "snapshot_only", "never",
                  "schema_only", "schema_only_recovery", "when_needed")


def resolve_snapshot_mode(configured: str, state: RunState) -> str:
    """Effective per-run snapshot mode (reference ``get_snapshot_mode``,
    ``ex_mysql_cdc/src/component.py:575-592``):

    - initial run + ``never`` → ``schema_only`` recovery: record the
      table schema only; the actual sync starts next execution;
    - any other initial run → ``initial_only`` (take the snapshot now);
    - subsequent runs → the configured mode verbatim.
    """
    if configured not in SNAPSHOT_MODES:
        raise ValueError(f"unknown snapshot_mode {configured!r}; "
                         f"expected one of {SNAPSHOT_MODES}")
    if state.is_initial_run and configured == "never":
        return "schema_only"
    if state.is_initial_run:
        return "initial_only"
    return configured


# ---------------------------------------------------------------------------
# S4: snapshot signals

@dataclass
class SnapshotSignal:
    """An ``execute-snapshot`` command (reference ``executor.py:22-34``
    signal dataclasses: id, type, data{data-collections, type})."""

    tables: list[str]
    signal_type: str = "execute-snapshot"
    mode: str = "blocking"          # blocking | incremental
    id: str = field(default_factory=lambda: str(uuid.uuid4()))

    def to_row(self) -> dict:
        # key order matches the reference's signal-table rows byte-for-
        # byte (all-tables/03_table_addition expected signals CSV:
        # {"type": ..., "data-collections": [...]})
        return {"id": self.id, "type": self.signal_type,
                "data": json.dumps({"type": self.mode.upper(),
                                    "data-collections": self.tables})}


def tables_needing_snapshot(configured: list[str], state: RunState) -> list[str]:
    """Reference trigger condition (component.py:149-153): a table in the
    config but not in the last-synced set needs a blocking snapshot
    backfill before joining the stream."""
    if state.is_initial_run:
        return []        # initial run snapshots everything anyway
    synced = set(state.last_synced_tables)
    return sorted(t for t in configured if t not in synced)


def write_signal_file(signals: list[SnapshotSignal], path: str) -> None:
    """S4 file-channel: one JSON line per signal (the reference's
    ``_signal_via_file`` writes the same shape)."""
    with open(path, "a") as fh:
        for s in signals:
            fh.write(json.dumps(s.to_row(), sort_keys=True) + "\n")


def read_signal_file(path: str) -> list[SnapshotSignal]:
    out: list[SnapshotSignal] = []
    if not os.path.exists(path):
        return out
    with open(path) as fh:
        for line in fh:
            if not line.strip():
                continue
            row = json.loads(line)
            data = json.loads(row.get("data", "{}"))
            out.append(SnapshotSignal(
                tables=list(data.get("data-collections", [])),
                signal_type=row.get("type", "execute-snapshot"),
                mode=str(data.get("type", "BLOCKING")).lower(),
                id=row.get("id", str(uuid.uuid4()))))
    return out


SIGNAL_TABLE_SCHEMA = "id string, type string, data string"


def write_signal_table(spark: SparkSession, signals: list[SnapshotSignal],
                       table_path: str) -> None:
    """S4 source-channel: append ``(id, type, data)`` rows to the signal
    *table*, mirroring the reference's ``_signal_via_source`` INSERT INTO
    the Debezium signal table (``db_components/debezium/executor.py:
    244-303``). The table is an ordinary parquet table, so a live
    deployment can point it at the same path the stream reads."""
    rows = [(s.to_row()["id"], s.to_row()["type"], s.to_row()["data"])
            for s in signals]
    (spark.createDataFrame(rows, SIGNAL_TABLE_SCHEMA)
     .write.mode("append").parquet(table_path))


def read_signal_table(spark: SparkSession, table_path: str,
                      exclude_ids: set[str] | None = None
                      ) -> list[SnapshotSignal]:
    """Read pending signals from the table channel; ``exclude_ids``
    filters signals a previous run already executed (the engine records
    them in RunState, playing the role of Debezium consuming the signal
    row)."""
    from .fs import fs_exists
    if not fs_exists(spark, table_path):
        return []       # explicit: only absence is empty; read errors raise
    rows = spark.read.parquet(table_path).collect()
    exclude = exclude_ids or set()
    out: list[SnapshotSignal] = []
    for row in sorted(rows, key=lambda r: r["id"]):
        if row["id"] in exclude:
            continue
        data = json.loads(row["data"] or "{}")
        out.append(SnapshotSignal(
            tables=list(data.get("data-collections", [])),
            signal_type=row["type"] or "execute-snapshot",
            mode=str(data.get("type", "BLOCKING")).lower(),
            id=row["id"]))
    return out


def pending_signals(spark: SparkSession, file_path: str | None = None,
                    table_path: str | None = None,
                    exclude_ids: set[str] | None = None
                    ) -> list[SnapshotSignal]:
    """Union of both S4 channels (file + source table), de-duplicated by
    signal id — the reference accepts either channel per config."""
    seen: set[str] = set(exclude_ids or set())
    out: list[SnapshotSignal] = []
    chans: list[SnapshotSignal] = []
    if file_path:
        chans.extend(read_signal_file(file_path))
    if table_path:
        chans.extend(read_signal_table(spark, table_path))
    for s in chans:
        if s.id in seen:
            continue
        seen.add(s.id)
        out.append(s)
    return out


def backfill_plan(spark: SparkSession, sf_dir: str, tables: list[str]) -> dict[str, DataFrame]:
    """Blocking-snapshot backfill: batch-read each signalled table and tag
    rows as snapshot reads (op='r'), ready to union into the stream
    (the Spark form of Debezium's blocking snapshot)."""
    plans: dict[str, DataFrame] = {}
    for t in tables:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        plans[t] = (df.withColumn("kbc__operation", F.lit("r"))
                      .withColumn("__deleted", F.lit(False)))
    return plans


def incremental_backfill(spark: SparkSession, snapshot_df: DataFrame,
                         stream: DataFrame | None, key_col: str,
                         n_chunks: int = 4) -> DataFrame:
    """Execute one table's ``incremental`` snapshot signal (Debezium
    incremental snapshot, DBLog watermark algorithm — signal built by
    reference ``db_components/debezium/executor.py:244-303`` with
    ``type: INCREMENTAL``): chunk the table over its PK range and merge
    the chunk reads with the in-flight stream; a stream event at or
    after a chunk's watermark supersedes that chunk's row. In a bounded
    run the snapshot SELECT executes at the captured end position, so
    every chunk's high watermark is that position (ties → stream wins).
    Chunk range filters push into the snapshot scan (PLANS.md
    ``incremental_snapshot_users``); the merge is one W1 window."""
    from pyspark.sql import functions as _F

    from .operators.snapshot_inc import (chunk_reads, merge_incremental,
                                         plan_chunks)

    lo, hi = snapshot_df.agg(_F.min(key_col), _F.max(key_col)).collect()[0]
    if lo is None:          # empty table: nothing to backfill
        return snapshot_df.withColumn("kbc__operation", _F.lit("r")) \
                          .withColumn("kbc__pos", _F.lit(0).cast("long"))
    end_pos = 0
    if stream is not None:
        row = stream.agg(_F.max("kbc__pos").alias("p")).collect()[0]
        end_pos = int(row["p"]) if row["p"] is not None else 0
    chunks = plan_chunks(int(lo), int(hi), n_chunks)
    wms = [end_pos] * len(chunks)
    chunk_dfs = chunk_reads(snapshot_df, key_col, chunks, wms)
    if stream is None:
        from .operators.schema_align import union_epochs
        return union_epochs(chunk_dfs)
    return merge_incremental(chunk_dfs, stream, [key_col])


def execute_signals(spark: SparkSession, sf_dir: str,
                    signals: list[SnapshotSignal],
                    stream_by_table: dict[str, DataFrame] | None = None,
                    key_by_table: dict[str, str] | None = None,
                    snapshot_by_table: dict[str, DataFrame] | None = None,
                    n_chunks: int = 4) -> dict[str, DataFrame]:
    """S4 execution dispatcher: each signalled table gets a blocking
    backfill plan (op='r' full read) or the incremental chunked merge,
    per the signal's mode — the engine-side counterpart of the
    reference consuming an ``execute-snapshot`` signal row.
    ``snapshot_by_table`` overrides the raw parquet read for sources
    that need a schema-aware scan (e.g. the ns-timestamp events table)."""
    streams = stream_by_table or {}
    keys = key_by_table or {}
    snaps = snapshot_by_table or {}
    plans: dict[str, DataFrame] = {}
    for sig in signals:
        for t in sig.tables:
            if sig.mode == "incremental" and t in keys:
                snap = (snaps[t] if t in snaps
                        else spark.read.parquet(f"{sf_dir}/{t}.parquet"))
                plans[t] = incremental_backfill(
                    spark, snap, streams.get(t), keys[t], n_chunks)
            else:
                plans[t] = backfill_plan(spark, sf_dir, [t])[t]
    return plans


# ---------------------------------------------------------------------------
# P6: end-position capture

def capture_end_position(events: DataFrame,
                         ts_col: str = "kbc__event_timestamp",
                         file_col: str = "kbc__file",
                         pos_col: str = "kbc__pos") -> dict:
    """Capture the max (ts, file, pos) present now — the bounded-run
    target the reference reads via SHOW MASTER STATUS. AvailableNow
    enforces this automatically; the captured dict goes into RunState."""
    row = events.agg(F.max(ts_col).alias("ts"), F.max(file_col).alias("file"),
                     F.max(pos_col).alias("pos")).collect()[0]
    return {"ts": row["ts"], "file": row["file"], "pos": row["pos"]}


# ---------------------------------------------------------------------------
# §3.3: sync actions (interactive metadata queries)

def test_connection(spark: SparkSession, sf_dir: str) -> bool:
    """testConnection: cheapest possible probe of the source."""
    try:
        spark.read.parquet(f"{sf_dir}/region.parquet").limit(1).collect()
        return True
    except Exception:
        return False


def get_schemas(sf_dir: str) -> list[str]:
    """get_schemas: the file source has one flat namespace."""
    return ["default"] if os.path.isdir(sf_dir) else []


def get_tables(sf_dir: str) -> list[str]:
    """get_tables: SelectElement-style listing from the source."""
    return sorted(f[:-8] for f in os.listdir(sf_dir)
                  if f.endswith(".parquet"))


def generate_ssh_key(key_size: int = 2048) -> dict:
    """generate_ssh_key sync action (reference
    ``ex_mysql_cdc/src/component.py:594-626`` +
    ``db_common/ssh/ssh_utils.py:94``): RSA keypair, PEM private key +
    OpenSSH public key, returned as the ValidationResult-style markdown
    message the UI renders.  Gated behind an import-try: the
    ``cryptography`` package is the one optional dependency, and a
    deployment without it gets a structured error instead of a crash."""
    try:
        from cryptography.hazmat.primitives import serialization
        from cryptography.hazmat.primitives.asymmetric import rsa
    except ImportError:
        return {"status": "error",
                "message": "generate_ssh_key requires the `cryptography` "
                           "package"}
    key = rsa.generate_private_key(public_exponent=65537,
                                   key_size=key_size)
    # PKCS8 PEM ("BEGIN PRIVATE KEY"), matching the reference's
    # ssh_utils.generate_ssh_key_pair byte-shape (ssh_utils.py:109-111) —
    # paramiko-style consumers expect the PKCS8 blob, not OpenSSH format
    private_key = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption()).decode("ascii")
    public_key = key.public_key().public_bytes(
        serialization.Encoding.OpenSSH,
        serialization.PublicFormat.OpenSSH).decode("ascii")
    message = (f"**Private Key**  (*Copy this to the `Private Key` "
               f"configuration field*):\n\n```\n{private_key}\n```\n\n"
               f"**Public Key**  (*Add this to your servers "
               f"`ssh_keys`*): \n\n```\n{public_key}\n```")
    return {"status": "success", "private_key": private_key,
            "public_key": public_key, "message": message}


# ---------------------------------------------------------------------------
# T8: heartbeat

def heartbeat(action_query: str | None = None,
              interval_ms: int = 3000) -> dict:
    """No replication slot to keep alive in the file-backed source; kept
    as the interface the JDBC/WAL source implements for real
    (reference ``postgres_extractor.py:148-150``; config shape
    ``ex_postgres_cdc/src/configuration.py:99-101`` HeartBeatConfig with
    ``action_query`` executed against the source to advance the WAL).
    With an ``action_query`` configured the contract is echoed back as
    'configured' so a live-source implementation knows what to run."""
    if action_query:
        return {"status": "configured", "action_query": action_query,
                "interval_ms": interval_ms}
    return {"status": "noop", "reason": "file-backed source has no WAL slot"}
