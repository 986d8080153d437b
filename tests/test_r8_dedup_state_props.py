"""Property test (round 8): StreamingDedupGroups' keep-list equals
batch ``hybrid_dedup_keep`` for ANY batch split of ANY corpus, under
ANY driver-merge threshold (driver and distributed merge paths must be
indistinguishable) and in BOTH tier modes (sequenced epoch ids and the
unsequenced ``_seq`` counter). Randomized corpora with planted exact +
near duplicates exercise cross-batch merges; tiny thresholds force the
distributed path."""

import os
import shutil
import tempfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from python_cdc_component_spark.operators.llm.hybrid import (
    hybrid_dedup_keep)
from python_cdc_component_spark.streaming.dedup_state import (
    StreamingDedupGroups)


@pytest.fixture(scope="session")
def spark_global(spark):
    # hypothesis forbids function-scoped fixtures
    return spark


_WORDS = [f"w{i}" for i in range(40)]


@st.composite
def _scenario(draw):
    n = draw(st.integers(4, 9))
    docs = {}
    for d in range(n):
        length = draw(st.integers(1, 25))
        docs[d] = [
            _WORDS[draw(st.integers(0, len(_WORDS) - 1))]
            for _ in range(length)]
    # plant exact + near duplicates so cross-batch merges happen
    docs[1] = list(docs[0])
    docs[2] = list(docs[0]) + [draw(st.sampled_from(_WORDS))]
    n_batches = draw(st.integers(1, 3))
    assignment = {d: draw(st.integers(0, n_batches - 1)) for d in docs}
    threshold = draw(st.sampled_from([0, 2, 100_000]))
    # r9: the verified-edge collect has its own bounded probe, and doc
    # ids may be strings (the composite-PK envelope's key type) — both
    # drawn so every merge path × id kind combination gets exercised
    edge_threshold = draw(st.sampled_from([0, 2, 100_000]))
    # r10: endpoint/member filters switch from literal In to a
    # broadcast semi/anti-join above isin_literal_max — draw the
    # cutoff so both idioms run under every merge path
    isin_max = draw(st.sampled_from([0, 512]))
    string_keys = draw(st.booleans())
    sequenced = draw(st.booleans())
    return (docs, n_batches, assignment, threshold, edge_threshold,
            isin_max, string_keys, sequenced)


@settings(max_examples=5, deadline=None)
@given(_scenario())
def test_any_split_any_threshold_matches_batch_hybrid(
        spark_global, scenario):
    (docs, n_batches, assignment, threshold, edge_threshold,
     isin_max, string_keys, sequenced) = scenario
    spark = spark_global
    key = (lambda i: f"d{i:03d}") if string_keys else (lambda i: i)
    d = spark.createDataFrame(
        [(key(i), " ".join(w)) for i, w in docs.items()],
        f"doc_id {'string' if string_keys else 'long'}, text string")
    want = {(r["component"], r["keep_doc_id"], r["keep_n_tokens"],
             r["cluster_size"])
            for r in hybrid_dedup_keep(d).collect()}
    work = tempfile.mkdtemp(prefix="dedup_props_")
    try:
        st_ = StreamingDedupGroups(
            os.path.join(work, "st"), num_buckets=8,
            driver_merge_max_members=threshold,
            driver_merge_max_edges=edge_threshold,
            isin_literal_max=isin_max)
        for b in range(n_batches):
            ids = [key(i) for i, a in assignment.items() if a == b]
            batch = d.filter(d.doc_id.isin(ids)) if ids \
                else d.filter("false")
            st_.process_batch(spark, batch, corpus=d,
                              batch_id=b if sequenced else None)
        got = {(r["component"], r["keep_doc_id"], r["keep_n_tokens"],
                r["cluster_size"])
               for r in st_.read_groups(spark).collect()}
        assert got == want, (n_batches, assignment, threshold,
                             edge_threshold, isin_max, string_keys,
                             sequenced)
    finally:
        shutil.rmtree(work, ignore_errors=True)
