"""Round-10 continuation: semantic pins for the embedding-side
additions (beyond the DuckDB oracles that gate them value-exact at
three SFs) and the verify-shingle handoff parity.

* filtered ANN: every hit satisfies the predicate (filter-then-search,
  never search-then-filter) and comes from a probed cell;
* hard negatives: no hit ever shares the anchor's label, and a planted
  same-label near-identical vector is excluded while a slightly-less-
  similar cross-label one is returned;
* verify_jaccard_pairs(precomputed=...): byte-identical verdicts
  whether shingles are re-derived from the corpus or handed in from a
  probe stage — including a precomputed table that covers only SOME
  endpoints (the streaming shape: batch-side reps covered, indexed
  endpoints not).
"""

from pyspark.sql import functions as F

from python_cdc_component_spark.operators.llm.hybrid import (
    verify_jaccard_pairs)
from python_cdc_component_spark.operators.llm.minhash import (
    shingle_hashes)
from python_cdc_component_spark.queries import QUERIES


def test_filtered_ann_respects_predicate(spark):
    sf = "/root/testdata/sf0.001"
    rows = QUERIES["embedding_filtered_ann"](spark, sf).collect()
    assert rows, "filtered ANN returned nothing at sf0.001"
    assert all(r["label"] % 3 == 0 for r in rows), \
        "a hit violates the label predicate (search-then-filter bug)"
    assert all(r["cid"] >= 8 for r in rows), \
        "a centroid/probe vector leaked into the candidate set"
    assert all(-1.0 <= r["sim"] <= 1.0 for r in rows)
    # per-probe top-k: no probe exceeds k=5, hits sorted by sim desc
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r["sim"])
    assert set(by_q) <= {5, 6, 7} and all(
        len(v) <= 5 for v in by_q.values())


def test_hard_negatives_cross_label_only(spark):
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qlabel = {r["vec_id"]: r["label"]
              for r in emb.filter("vec_id < 8").collect()}
    rows = QUERIES["contrastive_hard_negatives"](spark, sf).collect()
    assert rows and set(r["qid"] for r in rows) == set(qlabel)
    assert all(r["neg_label"] != qlabel[r["qid"]] for r in rows), \
        "a same-label vector surfaced as a negative"


def test_hard_negatives_planted_same_label_excluded(spark, tmp_path):
    """Anchor 0 (label 0); vec 10 is IDENTICAL to the anchor but
    same-label (sim 1.0 — must NOT appear); vec 11 is a slightly
    rotated cross-label copy (the hardest valid negative — must rank
    first)."""
    d = str(tmp_path / "sf")
    base = [1.0, 2.0] + [0.0] * 62
    near = [1.0, 1.9, 0.3] + [0.0] * 61
    far = [-2.0, 1.0] + [0.0] * 62
    rows = [(0, base, 0)] \
        + [(i, far, 3) for i in range(1, 8)] \
        + [(10, base, 0), (11, near, 1), (12, far, 4)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int") \
        .write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    got = [r for r in QUERIES["contrastive_hard_negatives"](spark, d)
           .collect() if r["qid"] == 0]
    cids = [r["cid"] for r in sorted(got, key=lambda r: -r["sim"])]
    assert 10 not in cids, "identical same-label vector mined as negative"
    assert cids[0] == 11, f"hardest cross-label negative not first: {cids}"


def _pairs_key(rows):
    return {(r["doc_a"], r["doc_b"], r["ni"], r["na"], r["nb"],
             r["verified"]) for r in rows}


def test_verify_precomputed_parity(spark):
    """precomputed shingles (full, partial, and superset coverage of
    the endpoints) produce verdict rows identical to the
    corpus-derived path."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g x"),
         (3, "q r s t u v w y"), (4, "q r s t u v w z"),
         (5, "completely different text here now ok")],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (1, 5)], "doc_a long, doc_b long")
    base = _pairs_key(verify_jaccard_pairs(docs, pairs).collect())
    sh_all = shingle_hashes(docs).distinct()
    for cover in ("doc_id <= 2",       # partial: endpoints 3,4,5 from corpus
                  "doc_id <= 5",       # full coverage: corpus side empty
                  "doc_id >= 0"):      # superset incl. non-endpoints
        pre = sh_all.filter(cover).localCheckpoint(eager=True)
        got = _pairs_key(verify_jaccard_pairs(
            docs, pairs, precomputed=pre).collect())
        assert got == base, f"precomputed ({cover}) diverged: {got}"
    # a shingle-less endpoint stays verified=False under precomputed
    short = spark.createDataFrame([(6, "one two")],
                                  "doc_id long, text string")
    p2 = spark.createDataFrame([(1, 6)], "doc_a long, doc_b long")
    got = verify_jaccard_pairs(
        docs.unionByName(short), p2,
        precomputed=sh_all.filter("doc_id = 1")).collect()
    assert len(got) == 1 and not got[0]["verified"]
