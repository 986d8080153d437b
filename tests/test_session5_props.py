"""Property tests for the session-5 operators: random inputs replayed
against pure-Python references (the exactsubstr/bigram convention)."""

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from python_cdc_component_spark.operators.zorder import (
    zorder_key, zorder_key_sql)


def _py_zorder(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)),
                min_size=1, max_size=30))
def test_zorder_key_matches_python_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "x long, y long")
    got = {(r["x"], r["y"]): r["z"]
           for r in df.select("x", "y",
                              zorder_key(F.col("x"), F.col("y"), 8)
                              .alias("z")).collect()}
    for x, y in pairs:
        assert got[(x, y)] == _py_zorder(x, y)


def test_zorder_sql_twin_matches_python_reference(spark):
    import duckdb
    rows = [(x, y) for x in (0, 1, 37, 255) for y in (0, 2, 129, 255)]
    expr = zorder_key_sql("x", "y", 8)
    got = duckdb.sql(
        "SELECT x, y, " + expr + " AS z FROM (VALUES " +
        ", ".join(f"({x}, {y})" for x, y in rows) + ") t(x, y)"
    ).fetchall()
    for x, y, z in got:
        assert z == _py_zorder(x, y)


def _py_resample(events):
    """Pure-Python twin of resample_interpolate over
    [(user, day_number, value)] rows; returns
    {(user, day): (val_filled, observed)} with Spark's decimal-mean +
    HALF_UP rounding discipline."""
    from collections import defaultdict
    daily = defaultdict(list)
    for u, d, v in events:
        daily[(u, d)].append(v)
    mean = {}
    for (u, d), vs in daily.items():
        tot = sum(Decimal(x).quantize(Decimal("0.000001"),
                                      rounding=ROUND_HALF_UP) for x in vs)
        mean[(u, d)] = float(tot) / len(vs)
    out = {}
    users = sorted({u for u, _ in mean})
    for u in users:
        days = sorted(d for (uu, d) in mean if uu == u)
        for i, d in enumerate(days):
            v = mean[(u, d)]
            out[(u, d)] = (_r6(v), True)
            if i + 1 < len(days):
                nd, nv = days[i + 1], mean[(u, days[i + 1])]
                for g in range(d + 1, nd):
                    interp = v + (nv - v) * (g - d) / (nd - d)
                    out[(u, g)] = (_r6(interp), False)
    return out


def _r6(x: float) -> float:
    return float(Decimal(x).quantize(Decimal("0.000001"),
                                     rounding=ROUND_HALF_UP))


def test_text_kernels_survive_unicode(spark):
    """The text pipeline is exercised on ASCII word-soup fixtures; real
    corpora carry combining marks, CJK, emoji and RTL text. The core
    kernels must stay deterministic and crash-free on them (md5 hashes
    operate on UTF-8 bytes in both engines)."""
    from python_cdc_component_spark.operators.llm.minhash import (
        minhash_signatures)
    from python_cdc_component_spark.queries import QUERIES as Q
    texts = [
        "café né résumé naïve déjà vu élan " * 4,
        "日本語 の テキスト 処理 は 難しい です ね " * 4,
        "مرحبا بالعالم هذا نص عربي للاختبار " * 4,
        "emoji 🎉 test 🚀 with 🌍 symbols 🎯 here 🔥 now " * 4,
        "źäļg̰o̶ combining marks text " * 4,
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    sig1 = {r["doc_id"]: tuple(r[f"h{j}"] for j in range(16))
            for r in minhash_signatures(docs).collect()}
    sig2 = {r["doc_id"]: tuple(r[f"h{j}"] for j in range(16))
            for r in minhash_signatures(docs).collect()}
    assert sig1 == sig2 and len(sig1) == len(texts)
    # duckdb twin hashes the same UTF-8 bytes
    import duckdb
    con = duckdb.connect()
    con.register("docs", __import__("pandas").DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    from python_cdc_component_spark.queries import (
        _MINHASH_SIG_SQL, _MINHASH_MINS)
    oracle = {r[0]: tuple(r[1:]) for r in con.execute(
        _MINHASH_SIG_SQL.format(mins=_MINHASH_MINS)
        .replace("FROM documents", "FROM docs")).fetchall()}
    assert sig1 == oracle


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 3),            # user
              st.integers(0, 12),           # day offset
              st.floats(-100, 100, allow_nan=False, width=32)),
    min_size=1, max_size=40))
def test_resample_matches_python_reference(spark, events):
    import datetime
    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(days=d, hours=1), u, "click",
             float(v), "{}")
            for i, (u, d, v) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    import tempfile
    import shutil
    work = tempfile.mkdtemp(prefix="resample_prop_")
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key)
    try:
        # match the driver fixtures' physical unit (Spark's default
        # INT96 is what the footer-probing reader guards against)
        spark.conf.set(key, "TIMESTAMP_MICROS")
        df.write.mode("overwrite").parquet(f"{work}/events.parquet")
        spark.conf.set(key, prev)
        from python_cdc_component_spark.queries import QUERIES
        got = {(r["user_id"],
                (datetime.date.fromisoformat(r["day"])
                 - base.date()).days): (r["val_filled"], r["observed"])
               for r in QUERIES["resample_interpolate"](spark, work)
                        .collect()}
    finally:
        shutil.rmtree(work, ignore_errors=True)
    ref = _py_resample([(u, d, float(v)) for u, d, v in events])
    assert set(got) == set(ref)
    for k, (v, obs) in ref.items():
        assert got[k][1] == obs
        assert abs(got[k][0] - v) < 2e-6, (k, got[k], v)
