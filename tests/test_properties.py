"""Property-based tests (hypothesis) for the core operator semantics.

The reference tests only golden outputs (SURVEY §5: "no property-based
corpus"); these pin the algebraic laws the engine relies on at scale:
dedup idempotence/commutativity with chunking, schema-merge invariants,
and order determinism under repartitioning.
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_cdc_component_spark.model.schema import merge_schemas
from python_cdc_component_spark.operators.dedup import (
    chunked_dedup, dedup_latest)

# One pool of keys so duplicates are frequent; order values unique so
# "latest" is well-defined (mirrors kbc__batch_event_order).
events_strategy = st.lists(
    st.tuples(st.integers(0, 9),                 # key
              st.sampled_from(["a", "b", "c"])), # payload
    min_size=1, max_size=30)


def _df(spark, rows):
    data = [(k, p, i) for i, (k, p) in enumerate(rows)]
    return spark.createDataFrame(data, "key int, payload string, ord long")


@given(rows=events_strategy)
@settings(max_examples=15, deadline=None)
def test_dedup_idempotent_and_keeps_max_order(spark_global, rows):
    spark = spark_global
    df = _df(spark, rows)
    once = dedup_latest(df, ["key"], order_by=[F.col("ord").desc()])
    twice = dedup_latest(once, ["key"], order_by=[F.col("ord").desc()])
    got = {(r["key"], r["ord"]) for r in once.collect()}
    # latest-wins: the kept ord per key is the max ord for that key
    expect = {}
    for i, (k, _p) in enumerate(rows):
        expect[k] = max(expect.get(k, -1), i)
    assert got == set(expect.items())
    assert {(r["key"], r["ord"]) for r in twice.collect()} == got


@given(rows=events_strategy, split=st.integers(0, 30))
@settings(max_examples=10, deadline=None)
def test_chunked_dedup_equals_global_dedup(spark_global, rows, split):
    """W2+J1 (per-chunk window + later-slice anti-join) must equal the
    single global W1 window for ANY chunk boundary."""
    spark = spark_global
    df = _df(spark, rows)
    cut = min(split, len(rows))
    chunks = [df.filter(F.col("ord") < cut), df.filter(F.col("ord") >= cut)]
    via_chunks = chunked_dedup(chunks, ["key"],
                               order_by=[F.col("ord").desc()])
    via_global = dedup_latest(df, ["key"], order_by=[F.col("ord").desc()])
    assert ({(r["key"], r["ord"]) for r in via_chunks.collect()}
            == {(r["key"], r["ord"]) for r in via_global.collect()})


@given(rows=events_strategy, nparts=st.integers(1, 8))
@settings(max_examples=8, deadline=None)
def test_dedup_invariant_under_repartition(spark_global, rows, nparts):
    """Result must not depend on physical partitioning — the determinism
    contract that replaces the reference's single-threaded counter."""
    spark = spark_global
    df = _df(spark, rows)
    a = dedup_latest(df, ["key"], order_by=[F.col("ord").desc()])
    b = dedup_latest(df.repartition(nparts), ["key"],
                     order_by=[F.col("ord").desc()])
    assert ({tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()})


# --------------------------------------------------------------------------
# schema merge laws

_names = st.sampled_from(["a", "b", "c", "d", "e"])
_types = st.sampled_from([T.StringType(), T.LongType(), T.DoubleType()])


def _schema(draw_fields):
    seen, fields = set(), []
    for name, dt, nullable in draw_fields:
        if name not in seen:
            seen.add(name)
            fields.append(T.StructField(name, dt, nullable))
    return T.StructType(fields)


schemas = st.lists(st.tuples(_names, _types, st.booleans()),
                   min_size=1, max_size=5).map(_schema)


@given(prev=schemas, cur=schemas)
@settings(max_examples=50, deadline=None)
def test_merge_schemas_laws(prev, cur):
    merged = merge_schemas(prev, cur)
    names = [f.name for f in merged.fields]
    assert len(names) == len(set(names))            # no duplicate columns
    by_name = {f.name: f for f in merged.fields}
    for f in cur.fields:                            # current cols keep type
        assert by_name[f.name].dataType == f.dataType
    for f in prev.fields:                           # dropped cols survive
        assert f.name in by_name
        if f.name not in {c.name for c in cur.fields}:
            assert by_name[f.name].nullable         # ... as nullable
    # merging the merged schema with cur again is a no-op (idempotence)
    again = merge_schemas(merged, cur)
    assert {(f.name, f.dataType, f.nullable) for f in again.fields} \
        == {(f.name, f.dataType, f.nullable) for f in merged.fields}
    # storage column-order contract (pinned by the schema-drift byte
    # goldens): previous order is preserved as a prefix, new columns
    # append afterwards in current order
    prev_names = [f.name for f in prev.fields]
    assert names[:len(prev_names)] == prev_names
    cur_new = [f.name for f in cur.fields if f.name not in set(prev_names)]
    assert names[len(prev_names):] == cur_new
    # ...and idempotence holds for order too
    assert [f.name for f in again.fields] == names


# session-scoped fixture alias usable inside @given (hypothesis forbids
# function-scoped fixtures; the spark session is session-scoped already)
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark


# --- ExactSubstr spans vs a pure-Python reference ---------------------

_words = st.sampled_from([f"w{i}" for i in range(6)])
_docs_strategy = st.lists(
    st.lists(_words, min_size=0, max_size=24), min_size=1, max_size=6)


def _spans_reference(docs, L):
    """Pure-Python ExactSubstr: stride-1 L-windows, global first
    occurrence in (doc_id, pos) order kept, later occurrences merged
    into maximal spans (merge while pos <= prev + L)."""
    seen = set()
    dup = []                      # (doc_id, pos) duplicate windows
    for did, toks in enumerate(docs):
        for pos in range(len(toks) - L + 1):
            w = tuple(toks[pos:pos + L])
            if w in seen:
                dup.append((did, pos))
            else:
                seen.add(w)
    out = []
    by_doc = {}
    for did, pos in dup:
        by_doc.setdefault(did, []).append(pos)
    for did, poss in by_doc.items():
        poss.sort()
        start = prev = poss[0]
        for p in poss[1:]:
            if p > prev + L:
                out.append((did, start, prev + L - 1, prev + L - start))
                start = p
            prev = p
        out.append((did, start, prev + L - 1, prev + L - start))
    return sorted(out)


@given(docs=_docs_strategy, L=st.integers(2, 5))
@settings(max_examples=10, deadline=None)
def test_duplicated_spans_match_python_reference(spark_global, docs, L):
    from python_cdc_component_spark.operators.llm.exactsubstr import (
        duplicated_spans)
    spark = spark_global
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string")
    got = sorted((r.doc_id, r.span_start, r.span_end, r.span_tokens)
                 for r in duplicated_spans(df, window=L).collect())
    assert got == _spans_reference(docs, L)


# ---------------------------------------------------------------------------
# incremental aggregate maintenance ≡ full recompute, under random deltas

_mv_state = st.dictionaries(
    st.integers(0, 7),                                   # user (pk)
    st.tuples(st.sampled_from(["a", "b", "c"]),          # group
              st.floats(-5, 5, allow_nan=False, width=16)),
    min_size=0, max_size=8)


@given(old=_mv_state, new=_mv_state)
@settings(max_examples=15, deadline=None)
def test_maintain_view_equals_recompute(spark_global, old, new):
    """maintain_view(old_state, touched') ≡ aggregate(final state) for
    ANY old state and ANY touched-key delta — `new`'s keys are the
    touched set; a touched key absent from `new`'s value side models a
    delete, a group change models migration."""
    from python_cdc_component_spark.operators.aggmv import (
        maintain_view, merge_contributions, signed_contribution)
    spark = spark_global
    schema = "user_id long, grp string, value double"

    def df(state):
        return spark.createDataFrame(
            [(u, g, v) for u, (g, v) in state.items()], schema)

    touched_keys = set(new)                       # all keys the batch names
    final = {**{u: s for u, s in old.items() if u not in touched_keys},
             **new}
    got = {(r["grp"]): (r["n_rows"], round(r["sum_value"], 6))
           for r in maintain_view(
               df(old), df(new),
               spark.createDataFrame([(u,) for u in touched_keys] or
                                     [(None,)],  # empty-safe
                                     "user_id long").filter("user_id IS NOT NULL"),
               ["user_id"], ["grp"], "value").collect()}
    want = {(r["grp"]): (r["n_rows"], round(r["sum_value"], 6))
            for r in merge_contributions(
                [signed_contribution(df(final), ["grp"], "value", +1)],
                ["grp"]).collect()}
    assert got == want
