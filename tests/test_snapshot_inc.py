"""Incremental (DBLog watermark) snapshot merge — S4 incremental mode
(operators/snapshot_inc.py)."""

from pyspark.sql import functions as F

from python_cdc_component_spark.model.envelope import SYSTEM_COLUMNS as SC
from python_cdc_component_spark.operators.snapshot_inc import (
    chunk_reads, merge_incremental, plan_chunks)


def test_plan_chunks_covers_range_exactly():
    chunks = plan_chunks(0, 9, 4)
    assert chunks == [(0, 2), (3, 5), (6, 8), (9, 9)]
    # exhaustive + disjoint
    seen = [k for lo, hi in chunks for k in range(lo, hi + 1)]
    assert seen == list(range(10))
    assert plan_chunks(5, 4, 3) == []
    assert plan_chunks(1, 2, 10) == [(1, 1), (2, 2)]  # capped at range size


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, f"user_id long, v string, {SC.operation} string, "
              f"{SC.pos} long")


def test_stream_event_at_watermark_supersedes_chunk_row(spark):
    # chunk read closed at watermark 100 carrying user 1's snapshot row;
    # a stream UPDATE for user 1 at pos exactly 100 must win (Debezium
    # drops the buffered snapshot row in the dedup window).
    snap = _mk(spark, [(1, "snap", "r", 100), (2, "snap", "r", 100)])
    stream = _mk(spark, [(1, "stream", "u", 100)])
    out = {r["user_id"]: r["v"]
           for r in merge_incremental([snap], stream, ["user_id"]).collect()}
    assert out == {1: "stream", 2: "snap"}


def test_chunk_row_wins_over_older_stream_event(spark):
    # stream event BEFORE the watermark is already reflected in the
    # chunk's SELECT — the snapshot row (newer state) must win.
    snap = _mk(spark, [(1, "snap@150", "r", 150)])
    stream = _mk(spark, [(1, "old", "u", 149)])
    out = merge_incremental([snap], stream, ["user_id"]).collect()
    assert [(r["user_id"], r["v"]) for r in out] == [(1, "snap@150")]


def test_chunked_reads_prune_and_merge_to_current_state(spark, sf_dir):
    from python_cdc_component_spark.operators.dedup import dedup_latest
    from python_cdc_component_spark.sources.events import read_cdc_events

    ev = read_cdc_events(spark, sf_dir)
    lo, hi = ev.agg(F.min("user_id"), F.max("user_id")).collect()[0]
    chunks = plan_chunks(int(lo), int(hi), 3)
    end_pos = ev.agg(F.max(SC.pos)).collect()[0][0]
    # watermarks past the end of the log: chunk state == final state,
    # stream replays everything — merged result must equal plain W1.
    wms = [end_pos + i + 1 for i in range(len(chunks))]
    state = dedup_latest(ev, ["user_id"])
    chunk_dfs = []
    for (clo, chi), wm in zip(chunks, wms):
        chunk_dfs.extend(chunk_reads(state, "user_id", [(clo, chi)], [wm]))
    merged = merge_incremental(chunk_dfs, ev, ["user_id"])
    want = {(r["user_id"], r["event_type"]) for r in state.collect()}
    got = {(r["user_id"], r["event_type"]) for r in merged.collect()}
    assert got == want


def test_execute_signals_routes_modes(spark, sf_dir):
    """S4 dispatcher: blocking mode → op='r' full backfill; incremental
    mode → chunked watermark merge with the in-flight stream, ending in
    the stream's current state for streamed keys."""
    from python_cdc_component_spark.control import (SnapshotSignal,
                                                    execute_signals)
    from python_cdc_component_spark.operators.dedup import dedup_latest
    from python_cdc_component_spark.sources.events import read_cdc_events

    ev = read_cdc_events(spark, sf_dir)
    state = dedup_latest(ev, ["user_id"]).select(
        "user_id", "event_type", "value")

    plans = execute_signals(
        spark, sf_dir,
        [SnapshotSignal(tables=["region"], mode="blocking"),
         SnapshotSignal(tables=["events"], mode="incremental")],
        stream_by_table={"events": ev},
        key_by_table={"events": "user_id"},
        snapshot_by_table={"events": state})

    region = plans["region"]
    assert {r["kbc__operation"] for r in region.collect()} == {"r"}

    merged = plans["events"]
    got = {(r["user_id"], r["event_type"]) for r in merged.collect()}
    want = {(r["user_id"], r["event_type"]) for r in state.collect()}
    assert got == want        # snapshot @ end-pos + full stream ≡ state


def test_merge_incremental_property_any_watermarks(spark):
    """Property: for ANY watermark assignment, the merged state per key
    is the stream's latest event if it is at-or-after the key's chunk
    watermark, else the chunk's snapshot row — checked against a python
    model over randomized watermarks."""
    import random

    from python_cdc_component_spark.model.envelope import \
        SYSTEM_COLUMNS as SC

    rng = random.Random(7)
    for trial in range(3):
        n_keys = 20
        wm_by_chunk = sorted(rng.randint(0, 100) for _ in range(4))
        stream_rows = [(k, f"s{p}", "u", p)
                       for k in range(n_keys)
                       for p in sorted(rng.sample(range(1, 101),
                                                  rng.randint(0, 4)))]
        chunks, chunk_dfs = [(0, 4), (5, 9), (10, 14), (15, 19)], []
        snap_rows_all = []
        for (lo, hi), wm in zip(chunks, wm_by_chunk):
            # chunk SELECT sees the latest stream value ≤ wm (or initial)
            rows = []
            for k in range(lo, hi + 1):
                pre = [r for r in stream_rows if r[0] == k and r[3] <= wm]
                v = pre[-1][1] if pre else "init"
                rows.append((k, v, "r", wm))
            snap_rows_all.extend(rows)
            chunk_dfs.append(spark.createDataFrame(
                rows, f"user_id long, v string, {SC.operation} string, "
                      f"{SC.pos} long"))
        stream = spark.createDataFrame(
            stream_rows or [(0, "s0", "u", 0)][:0],
            f"user_id long, v string, {SC.operation} string, {SC.pos} long")
        got = {r["user_id"]: r["v"] for r in
               merge_incremental(chunk_dfs, stream, ["user_id"]).collect()}
        # model: stream event with max pos wins iff pos >= chunk wm;
        # else the chunk row (which already folded events ≤ wm)
        for (lo, hi), wm in zip(chunks, wm_by_chunk):
            for k in range(lo, hi + 1):
                evs = [r for r in stream_rows if r[0] == k]
                if evs and evs[-1][3] >= wm:
                    assert got[k] == evs[-1][1], (trial, k)
                else:
                    pre = [r for r in evs if r[3] <= wm]
                    assert got[k] == (pre[-1][1] if pre else "init"), (trial, k)


def test_replay_chunk_states_equals_per_chunk_loop(spark, sf_dir):
    """r13 optimization equivalence pin: the fused per-key-watermark
    replay (ONE scan + ONE window) must reproduce the per-chunk
    ``dedup_latest(ev.filter(pos <= wm_i))`` loop byte-for-byte —
    including watermark stamping, op='r', and mid-log watermarks that
    leave some keys snapshot-less."""
    from python_cdc_component_spark.operators.dedup import dedup_latest
    from python_cdc_component_spark.operators.snapshot_inc import (
        replay_chunk_states)
    from python_cdc_component_spark.sources.events import read_cdc_events

    ev = read_cdc_events(spark, sf_dir)
    lo, hi = ev.agg(F.min("user_id"), F.max("user_id")).collect()[0]
    end_pos = int(ev.agg(F.max(SC.pos)).collect()[0][0])
    # mid-log, uneven watermarks: chunk 0 closes very early (some of its
    # keys have no event yet => absent from snap), later chunks later
    for n_chunks in (3, 4):
        chunks = plan_chunks(int(lo), int(hi), n_chunks)
        wms = [max(1, end_pos // 10) + i * (end_pos // 5)
               for i in range(len(chunks))]
        loop = []
        for (clo, chi), wm in zip(chunks, wms):
            state = dedup_latest(ev.filter(F.col(SC.pos) <= wm),
                                 ["user_id"])
            loop.extend(chunk_reads(state, "user_id", [(clo, chi)], [wm]))
        cols = ["user_id", "event_type", "value", SC.operation, SC.pos]
        want = sorted(tuple(r) for df in loop
                      for r in df.select(*cols).collect())
        fused = replay_chunk_states(ev, "user_id", chunks, wms)
        got = sorted(tuple(r) for r in fused.select(*cols).collect())
        assert got == want
