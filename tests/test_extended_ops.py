"""As-of join, salted join, multimodal, simhash, tokenize operator tests."""

from pyspark.sql import functions as F

from python_cdc_component_spark.operators.asof import asof_join
from python_cdc_component_spark.operators.joins import salted_join
from python_cdc_component_spark.operators.llm.multimodal import (
    decode_frames, extract_features, to_multimodal)
from python_cdc_component_spark.operators.llm.simhash import simhash16
from python_cdc_component_spark.operators.llm.tokenize import regex_tokens

import pytest


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 200, "p2"), (2, 50, "p3")],
        ["k", "t", "payload"])
    right = spark.createDataFrame(
        [(1, 90, "r1"), (1, 150, "r2"), (1, 250, "r3"), (2, 60, "r4")],
        ["k", "t", "rv"])
    out = {(r.payload, r.rv_asof)
           for r in asof_join(left, right, on="k", ts="t").collect()}
    # p1@100 → r1@90; p2@200 → r2@150; p3@50 → nothing (r4@60 is later)
    assert out == {("p1", "r1"), ("p2", "r2"), ("p3", None)}


def test_asof_join_exact_ts_inclusive(spark):
    left = spark.createDataFrame([(1, 100, "p")], ["k", "t", "payload"])
    right = spark.createDataFrame([(1, 100, "r")], ["k", "t", "rv"])
    row = asof_join(left, right, on="k", ts="t").collect()[0]
    assert row.rv_asof == "r"      # at-or-before includes equal ts


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [(i % 3, i) for i in range(100)], ["k", "v"])
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["k", "s"])
    salted = {(r.k, r.v, r.s)
              for r in salted_join(big, small, on="k", buckets=4,
                                   salt_by="v").collect()}
    plain = {(r.k, r.v, r.s) for r in big.join(small, "k").collect()}
    assert salted == plain


def test_multimodal_decode_frames(spark):
    df = spark.createDataFrame([(1, "x" * 600), (2, "y" * 10)], ["id", "data"])
    mm = to_multimodal(df, "id", "data")
    assert [f.name for f in mm.schema["meta"].dataType.fields] == \
        ["n_bytes", "encoding", "source"]
    frames = decode_frames(mm, frame_bytes=256).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.content_id, []).append(r)
    assert len(by_id[1]) == 3        # 600 bytes → 256+256+88
    assert sorted(r.frame_bytes for r in by_id[1]) == [88, 256, 256]
    assert len(by_id[2]) == 1 and by_id[2][0].frame_bytes == 10
    import hashlib
    assert by_id[2][0].frame_hash == hashlib.md5(b"y" * 10).hexdigest()


def test_extract_features_model_backend_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        extract_features(None, backend="model")


def test_extract_features_histogram_backend(spark):
    import math
    docs = spark.createDataFrame([(1, "aaaa"), (2, "")], "id long, t string")
    mm = to_multimodal(docs, id_col="id", payload_col="t")
    out = {r["content_id"]: r["embedding"]
           for r in extract_features(mm).collect()}
    # 'a' = 0x61 → bin 6; all mass in one bin → unit vector
    assert out[1][6] == 1.0 and sum(out[1]) == 1.0 and len(out[1]) == 16
    # empty payload: zero vector, norm guarded to 1 (no NaN)
    assert out[2] == [0.0] * 16
    assert not any(math.isnan(x) for x in out[2])


def test_simhash_identical_docs_share_fingerprint(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),
         (2, "the quick brown fox jumps"),
         (3, "completely different words entirely here")],
        ["doc_id", "text"])
    fp = {r.doc_id: r.simhash for r in simhash16(docs).collect()}
    assert fp[1] == fp[2]
    assert 0 <= fp[1] < 2 ** 16


def test_regex_tokens(spark):
    df = spark.createDataFrame([("ab 12, c!",)], ["text"])
    out = df.select(regex_tokens(F.col("text")).alias("t")).collect()[0].t
    assert out == ["ab", "12", ",", "c", "!"]


def test_connected_components_chain_triangle_singleton(spark):
    from python_cdc_component_spark.operators.llm.components import (
        connected_components)
    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, isolated edge 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src long, dst long")
    got = {(r.node, r.component)
           for r in connected_components(edges).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1),
                   (10, 10), (11, 10), (12, 10),
                   (20, 20), (21, 20)}


def test_asof_join_shared_payload_column_preserved(spark):
    """Left and right both carry a payload column named `v`: the right
    side must not clobber the left's column through the union (ADVICE r1,
    asof.py) — left `v` survives, right `v` arrives as `v_asof`."""
    left = spark.createDataFrame(
        [(1, 100, "left-v1"), (1, 200, "left-v2")], ["k", "t", "v"])
    right = spark.createDataFrame(
        [(1, 90, "right-v1"), (1, 150, "right-v2")], ["k", "t", "v"])
    rows = {(r.v, r.v_asof)
            for r in asof_join(left, right, on="k", ts="t").collect()}
    assert rows == {("left-v1", "right-v1"), ("left-v2", "right-v2")}
