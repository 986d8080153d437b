"""Dedup operator semantics, mirrored on the reference's converter unit
tests (SURVEY §5 layer 2: DedupeDbConverterTest single-event/chunk
rotation cases)."""

from pyspark.sql import functions as F

from python_cdc_component_spark.model.envelope import SYSTEM_COLUMNS as SC
from python_cdc_component_spark.operators.dedup import (
    chunked_dedup, dedup_latest, dedup_latest_no_pk, slice_suppress_anti_join)


def _events(spark):
    # (pk, payload, ts, file, pos) — pk 1 updated twice, pk 2 deleted last,
    # pk 3 single event.
    rows = [
        (1, "a", 100, "f1", 1),
        (1, "b", 200, "f1", 2),
        (2, "x", 100, "f1", 3),
        (2, "y", 300, "f1", 4),
        (1, "c", 300, "f1", 5),
        (3, "z", 50, "f1", 6),
    ]
    return spark.createDataFrame(
        rows, ["pk", "payload", SC.event_timestamp, SC.file, SC.pos])


def test_dedup_latest_keeps_last_event_per_pk(spark):
    out = dedup_latest(_events(spark), ["pk"]).orderBy("pk").collect()
    assert [(r.pk, r.payload) for r in out] == [(1, "c"), (2, "y"), (3, "z")]


def test_dedup_latest_tie_broken_by_pos(spark):
    # equal timestamps → file/pos decide (the composite order key,
    # SURVEY §4 item 2)
    rows = [(1, "early", 100, "f1", 1), (1, "late", 100, "f1", 2)]
    df = spark.createDataFrame(
        rows, ["pk", "payload", SC.event_timestamp, SC.file, SC.pos])
    out = dedup_latest(df, ["pk"]).collect()
    assert out[0].payload == "late"


def test_chunked_dedup_equals_global_dedup(spark):
    """W2 map-reduce strategy ≡ single global window (SURVEY §7.4)."""
    ev = _events(spark)
    chunks = [ev.filter(F.col(SC.pos) <= 3), ev.filter(F.col(SC.pos) > 3)]
    via_chunks = {(r.pk, r.payload)
                  for r in chunked_dedup(chunks, ["pk"]).collect()}
    via_global = {(r.pk, r.payload)
                  for r in dedup_latest(ev, ["pk"]).collect()}
    assert via_chunks == via_global


def test_anti_join_suppresses_later_keys(spark):
    ev = _events(spark)
    early = ev.filter(F.col(SC.pos) <= 3)
    later = ev.filter(F.col(SC.pos) > 3)
    out = slice_suppress_anti_join(early, later, ["pk"]).collect()
    # pks 1,2 reappear later → only events that never reappear survive
    assert {r.pk for r in out} == set()


def test_no_pk_dedup_collapses_exact_duplicates(spark):
    rows = [(1, "a", 100, "f1", 1), (1, "a", 200, "f1", 2), (2, "b", 100, "f1", 3)]
    df = spark.createDataFrame(
        rows, ["pk", "payload", SC.event_timestamp, SC.file, SC.pos])
    out = dedup_latest_no_pk(
        df, system_cols=[SC.event_timestamp, SC.file, SC.pos])
    got = {(r.pk, r.payload, r[SC.pos]) for r in out.collect()}
    assert got == {(1, "a", 2), (2, "b", 3)}


def test_dedup_plan_is_single_shuffle(spark):
    """Scale check: the dedup plan must contain exactly one Exchange
    (hash by pk) and no global sort."""
    plan = dedup_latest(_events(spark), ["pk"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") >= 1
    assert "rangepartitioning" not in plan.lower()
