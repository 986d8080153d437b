"""Property test: the whole hybrid-dedup pipeline against an
INDEPENDENT pure-Python reference (same math, zero shared code): md5
28-bit shingle hashes → 16 affine min-hashes → 4 bands → integer
Jaccard verdict → union-find closure → keep-longest. Any divergence in
hashing, banding, verification, closure, or the keep rule shows up as
a keep-list mismatch on randomized corpora with planted duplicates."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="session")
def spark_global(spark):
    # hypothesis forbids function-scoped fixtures; the session fixture
    # is session-scoped already (same alias as test_properties.py)
    return spark

from python_cdc_component_spark.operators.llm.hybrid import (
    hybrid_dedup_keep)
from python_cdc_component_spark.operators.llm.minhash import (
    MINHASH_AB, MINHASH_P)


def _shingle_hashes(words):
    out = set()
    for i in range(len(words) - 2):
        sh = " ".join(words[i:i + 3])
        out.add(int(hashlib.md5(sh.encode()).hexdigest()[:7], 16))
    return out


def _reference_keep(docs):
    """docs: {doc_id: [words]} → {(component, keep_id, n_tokens, size)}"""
    sh = {d: _shingle_hashes(w) for d, w in docs.items()}
    sigs = {}
    for d, vs in sh.items():
        if vs:
            sigs[d] = [min((a * v + b) % MINHASH_P for v in vs)
                       for a, b in MINHASH_AB]
    buckets = {}
    for d, s in sigs.items():
        for b in range(4):
            key = (b, "|".join(str(x) for x in s[b * 4:b * 4 + 4]))
            buckets.setdefault(key, []).append(d)
    cand = set()
    for ds in buckets.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand.add((ds[i], ds[j]))
    parent = {d: d for d in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in cand:
        ni = len(sh[a] & sh[b])
        na, nb = len(sh[a]), len(sh[b])
        if na + nb > 0 and 5 * ni >= 3 * (na + nb - ni):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
    comps = {}
    for d in docs:
        comps.setdefault(find(d), []).append(d)
    out = set()
    for members in comps.values():
        label = min(members)
        keep = sorted(members,
                      key=lambda d: (-len(docs[d]), d))[0]
        out.add((label, keep, len(docs[keep]), len(members)))
    return out


_WORDS = [f"w{i}" for i in range(40)]


@st.composite
def _corpus(draw):
    n = draw(st.integers(3, 10))
    docs = {}
    for d in range(n):
        length = draw(st.integers(1, 30))
        docs[d] = [
            _WORDS[draw(st.integers(0, len(_WORDS) - 1))]
            for _ in range(length)]
    # plant exact + near duplicates so the merge path is exercised
    if n >= 4:
        docs[1] = list(docs[0])
        docs[2] = list(docs[0]) + [draw(st.sampled_from(_WORDS))]
    # r8 exact-group collapse: plant a variable-size exact-dup GROUP
    # (the boilerplate shape the collapse rewrites) and two IDENTICAL
    # <3-token docs, which have no shingles and must stay separate
    # singletons on both sides
    for j in range(draw(st.integers(0, 5))):
        docs[100 + j] = list(docs[0])
    docs[200] = [_WORDS[0], _WORDS[1]]
    docs[201] = [_WORDS[0], _WORDS[1]]
    return docs


@settings(max_examples=6, deadline=None)
@given(_corpus())
def test_hybrid_matches_pure_python_reference(spark_global, docs):
    d = spark_global.createDataFrame(
        [(i, " ".join(w)) for i, w in docs.items()],
        "doc_id long, text string")
    got = {(r["component"], r["keep_doc_id"], r["keep_n_tokens"],
            r["cluster_size"])
           for r in hybrid_dedup_keep(d).collect()}
    assert got == _reference_keep(docs)
