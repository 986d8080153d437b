"""Round-10 decontamination additions — semantic pins beyond the
DuckDB oracles (which gate them at three SFs): a PLANTED leak must be
flagged, a clean split must not, on purpose-built synthetic corpora.

Bucket facts used below (md5(doc_id)[0:7] % 100): ids 1-6 land in the
train split (<80), ids 8/27/44 land in the eval split (>=90) — checked
by construction in the fixtures, not assumed.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from python_cdc_component_spark.queries import QUERIES

BASE = " ".join(f"w{i}" for i in range(40))


def _bucket(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:7], 16) % 100


def _write_sf(spark, tmp_path, docs=None, embs=None):
    d = str(tmp_path / "sf")
    if docs is not None:
        spark.createDataFrame(docs, "doc_id long, text string") \
            .write.mode("overwrite").parquet(f"{d}/documents.parquet")
    if embs is not None:
        spark.createDataFrame(embs, "vec_id long, embedding array<float>") \
            .write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return d


def test_fuzzy_decon_flags_planted_paraphrase(spark, tmp_path):
    """A train doc that is a light edit of an eval doc (one token
    changed out of 41 — far above Jaccard 3/5, invisible to exact
    8-gram matching only if grams were shorter) is flagged; an
    unrelated train doc is not."""
    assert _bucket(1) < 80 and _bucket(2) < 80 and _bucket(8) >= 90
    other = " ".join(f"z{i}" for i in range(40))
    docs = [(8, BASE + " tail"),            # eval
            (1, BASE + " edited"),          # train: near-dup of eval 8
            (2, other)]                     # train: unrelated
    sf = _write_sf(spark, tmp_path, docs=docs)
    out = {r["doc_id"]: (r["n_eval_dups"], r["closest_eval"])
           for r in QUERIES["fuzzy_eval_decontaminate"](
               spark, sf).collect()}
    assert out == {1: (1, 8)}


def test_fuzzy_decon_clean_split_empty(spark, tmp_path):
    """No cross-split similarity → no rows (and intra-split dups must
    NOT leak into the verdict: two identical TRAIN docs are fine)."""
    assert _bucket(3) < 80 and _bucket(4) < 80 and _bucket(27) >= 90
    other = " ".join(f"z{i}" for i in range(40))
    docs = [(27, other),                    # eval, unrelated
            (3, BASE), (4, BASE)]           # train exact dups of each other
    sf = _write_sf(spark, tmp_path, docs=docs)
    assert QUERIES["fuzzy_eval_decontaminate"](spark, sf).count() == 0


def test_semantic_decon_flags_planted_vector(spark, tmp_path):
    """A train vector nearly parallel to an eval vector is flagged
    with max_sim ~1; an orthogonal train vector is not."""
    assert _bucket(1) < 80 and _bucket(2) < 80 and _bucket(8) >= 90
    dim = 64
    e1 = [1.0] + [0.0] * (dim - 1)              # eval direction
    near = [1.0, 0.05] + [0.0] * (dim - 2)      # train: ~parallel
    orth = [0.0, 0.0, 1.0] + [0.0] * (dim - 3)  # train: orthogonal
    embs = [(8, e1), (1, near), (2, orth)]
    sf = _write_sf(spark, tmp_path, embs=embs)
    rows = {r["vec_id"]: (r["n_eval_near"], r["max_sim"])
            for r in QUERIES["semantic_eval_decontaminate"](
                spark, sf).collect()}
    assert set(rows) == {1}
    n, sim = rows[1]
    assert n == 1 and sim == pytest.approx(0.99875, abs=1e-4)
