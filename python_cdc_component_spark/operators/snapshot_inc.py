"""Incremental (non-blocking) snapshot: chunked backfill merged with the
live stream (S4 ``incremental`` mode).

Parity target: the reference's ``execute-snapshot`` signal with
``type: INCREMENTAL`` (``db_components/debezium/executor.py:244-303``
builds the signal; Debezium executes it with the DBLog watermark
algorithm): the table is split into PK-ordered chunks; each chunk is
SELECTed while the CDC stream keeps flowing; a chunk row is emitted at
the chunk's *high watermark* stream position, and any stream event for
the same key that is at-or-after that watermark supersedes it (the
stream always wins ties — the snapshot read can only be as fresh as the
watermark it closed at).

Spark re-expression — no driver loop, no per-chunk collect:

- ``plan_chunks``: pure arithmetic over the PK range (the reference
  sizes chunks the same way, ``incremental.snapshot.chunk.size``);
  chunk predicates are range filters that *prune* at the source (parquet
  row-group stats / JDBC range-bounded SELECTs).
- ``chunk_reads``: one DataFrame per chunk, each tagged with its high
  watermark as the event position and ``op='r'`` — plan-only; Catalyst
  unions them into a single scan with per-chunk filters.
- ``merge_incremental``: union(chunks, stream) → one W1 window dedup
  ordered by ``(pos, is_stream)`` — a single hash shuffle on the PK at
  any scale, identical to the blocking path's compaction.

The whole pipeline is the blocking snapshot's cost plus one extra
boolean in the sort key: incremental-ness lives in the watermark
bookkeeping, not in a new physical operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..model.envelope import SYSTEM_COLUMNS as SC
from .dedup import dedup_latest
from .schema_align import union_epochs

STREAM_RANK = "_is_stream"


def plan_chunks(lo: int, hi: int, n_chunks: int) -> list[tuple[int, int]]:
    """Split the inclusive PK range [lo, hi] into ``n_chunks`` contiguous
    inclusive ranges (last chunk absorbs the remainder). Driver-side
    arithmetic only — two scalars in, no data scan."""
    if hi < lo:
        return []
    n_chunks = max(1, min(n_chunks, hi - lo + 1))
    width = (hi - lo + 1 + n_chunks - 1) // n_chunks
    out = []
    start = lo
    while start <= hi:
        out.append((start, min(start + width - 1, hi)))
        start += width
    return out


def chunk_reads(snapshot_df: DataFrame, key_col: str,
                chunks: list[tuple[int, int]],
                watermarks: list[int]) -> list[DataFrame]:
    """One range-pruned read per chunk, stamped with the chunk's high
    watermark as its stream position and ``op='r'``. ``watermarks[i]``
    is the stream position at which chunk i's SELECT closed (strictly
    increasing — chunks are read in PK order while the stream flows)."""
    assert len(watermarks) == len(chunks)
    out = []
    for (clo, chi), wm in zip(chunks, watermarks):
        out.append(
            snapshot_df
            .filter((F.col(key_col) >= clo) & (F.col(key_col) <= chi))
            .withColumn(SC.operation, F.lit("r"))
            .withColumn(SC.pos, F.lit(wm).cast("long")))
    return out


def replay_chunk_states(events: DataFrame, key_col: str,
                        chunks: list[tuple[int, int]],
                        watermarks: list[int],
                        pos_col: str = SC.pos) -> DataFrame:
    """Fused oracle-replay of "each chunk's SELECT sees the table state
    at its watermark" over ONE event log — the single-scan form of

        for (clo, chi), wm in zip(chunks, watermarks):
            state = dedup_latest(events.filter(pos <= wm), [key])
            chunk_reads(state, key, [(clo, chi)], [wm])

    which pays len(chunks) overlapping scans + window shuffles.
    Equivalence: ``plan_chunks`` ranges partition [lo, hi], so every key
    belongs to exactly ONE chunk and has exactly one watermark wm(key);
    a chunk read keeps, per key in its range, the latest event with
    pos <= wm(key), stamped (op='r', pos=wm(key)) — which is one window
    dedup over ``events WHERE pos <= wm(key)`` with wm(key) computed as
    a column (chunk index = min(n_chunks-1, (key - lo) div width), the
    same arithmetic the chunk planner uses). A coarse
    ``pos <= max(watermark)`` literal predicate goes first so parquet
    row-group pruning still applies under the key-dependent filter.

    This is the *replay* construction only (used by the
    ``incremental_snapshot_users`` oracle query, where all chunk states
    derive from one log). The live S4 path (``control.py``) keeps
    per-chunk ``chunk_reads`` over the real source state — there each
    chunk SELECT is a range-pruned read of an existing table, not a
    window dedup, and nothing overlaps."""
    assert chunks and len(watermarks) == len(chunks)
    lo = chunks[0][0]
    hi = chunks[-1][1]
    width = chunks[0][1] - chunks[0][0] + 1
    idx = F.least(F.lit(len(chunks) - 1),
                  F.expr(f"({key_col} - {lo}) div {width}"))
    wm = F.element_at(F.array(*[F.lit(int(w)) for w in watermarks]),
                      (idx + 1).cast("int")).cast("long")
    state = dedup_latest(
        events.filter(F.col(pos_col) <= int(max(watermarks)))
              .filter((F.col(key_col) >= lo) & (F.col(key_col) <= hi))
              .filter(F.col(pos_col) <= wm),
        [key_col])
    return (state.withColumn(SC.operation, F.lit("r"))
                 .withColumn(pos_col, wm))


def merge_incremental(chunks: list[DataFrame], stream: DataFrame,
                      keys: list[str],
                      pos_col: str = SC.pos) -> DataFrame:
    """DBLog watermark merge: union the watermark-stamped chunk reads
    with the stream and keep, per key, the event with the highest
    ``(pos, is_stream)`` — so a stream event at the same position as a
    chunk's watermark supersedes the snapshot row (Debezium drops the
    buffered snapshot row in exactly this case). One W1 window dedup;
    the chunk count never changes the shuffle count."""
    tagged = [c.withColumn(STREAM_RANK, F.lit(0)) for c in chunks]
    tagged.append(stream.withColumn(STREAM_RANK, F.lit(1)))
    allev = union_epochs(tagged)
    order: list[Column] = [F.col(pos_col).desc(),
                           F.col(STREAM_RANK).desc()]
    return dedup_latest(allev, keys, order_by=order).drop(STREAM_RANK)
