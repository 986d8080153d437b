"""Round-7 hybrid-dedup contracts (VERDICT r6 #4): the single-entry
pipeline (LSH candidates → exact-Jaccard verify → components →
canonical keep) must (a) partition the corpus exactly, (b) collapse to
the trust-every-collision piecewise path when verification is disabled,
(c) kill low-similarity candidate pairs the piecewise path would merge,
and (d) keep the quality rule (longest doc, min-id tie-break)."""

from pyspark.sql import functions as F

from python_cdc_component_spark.operators.llm.hybrid import (
    hybrid_dedup_keep)


def _docs(spark, sf_dir, n=200):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(n))


def test_output_partitions_corpus(spark, sf_dir):
    d = _docs(spark, sf_dir)
    n_docs = d.count()
    out = hybrid_dedup_keep(d).collect()
    assert sum(r["cluster_size"] for r in out) == n_docs
    assert len({r["component"] for r in out}) == len(out)
    assert len({r["keep_doc_id"] for r in out}) == len(out)


def test_threshold_zero_matches_unverified_closure(spark, sf_dir):
    """With the verify stage disabled (Jaccard ≥ 0), every LSH
    candidate is an edge — the components must equal the piecewise
    dup_components closure over the same universe, proving the hybrid
    is the piecewise path plus exactly one (verification) stage."""
    from python_cdc_component_spark.operators.llm.components import (
        connected_components)
    from python_cdc_component_spark.operators.llm.minhash import (
        band_table, minhash_signatures)

    d = _docs(spark, sf_dir)
    out = hybrid_dedup_keep(d, threshold_num=0, threshold_den=1)
    # piecewise: band self-join edges, no verification
    bands = band_table(minhash_signatures(d))
    a, b = bands.alias("a"), bands.alias("b")
    edges = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bv") == F.col("b.bv"))
                    & (F.col("a.doc_id") != F.col("b.doc_id")))
              .select(F.col("a.doc_id").alias("src"),
                      F.col("b.doc_id").alias("dst")).distinct())
    comp = connected_components(edges)
    merged_hybrid = {(r["component"], r["cluster_size"])
                     for r in out.filter(F.col("cluster_size") > 1)
                     .collect()}
    merged_piecewise = {(r["component"], r["n"]) for r in
                        comp.groupBy("component")
                        .agg(F.count(F.lit(1)).alias("n"))
                        .filter(F.col("n") > 1).collect()}
    assert merged_hybrid == merged_piecewise


def test_verify_stage_kills_low_jaccard_candidates(spark):
    """Two docs sharing a minority of shingles can still collide in a
    band (here: identical first half → identical min-hashes whenever
    the minima land in the shared prefix); the piecewise path merges
    them, the hybrid must not once their exact Jaccard < 0.6."""
    shared = " ".join(f"w{i}" for i in range(30))
    a_tail = " ".join(f"a{i}" for i in range(100))
    b_tail = " ".join(f"b{i}" for i in range(100))
    rows = [(1, f"{shared} {a_tail}"), (2, f"{shared} {b_tail}"),
            (3, f"{shared} {a_tail}")]       # 3 is an exact dup of 1
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["keep_doc_id"]: r["cluster_size"]
           for r in hybrid_dedup_keep(d).collect()}
    # exact dup pair (1,3) merges: Jaccard = 1; keeper is doc 1
    # (equal length, min id). Pair (1,2)/(3,2): Jaccard ≈ 30/230 < 0.6
    # — doc 2 must survive as its own component even if bands collide.
    assert out == {1: 2, 2: 1}


def test_keep_rule_longest_then_min_id(spark):
    base = " ".join(f"t{i}" for i in range(50))
    rows = [(10, base), (11, base + " extra tokens here"), (12, base)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = hybrid_dedup_keep(d).collect()
    assert len(out) == 1
    assert out[0]["keep_doc_id"] == 11          # longest wins
    assert out[0]["cluster_size"] == 3


def test_short_docs_are_singletons(spark):
    rows = [(1, "only two"), (2, "tiny"), (3, "a b c d e f g h")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = hybrid_dedup_keep(d).collect()
    assert {r["keep_doc_id"] for r in out} == {1, 2, 3}
    assert all(r["cluster_size"] == 1 for r in out)


def test_streaming_verified_pairs_split_invariant(spark, sf_dir, tmp_path):
    """Feeding the corpus through the streaming LSH index in 3 batches
    and exact-verifying each batch's emitted pairs must yield EXACTLY
    the verified pair set of the one-shot banded self-join — the
    hybrid pipeline is batch-split invariant, so continuous ingest and
    batch reprocessing agree pair-for-pair."""
    from pyspark.sql import functions as F

    from python_cdc_component_spark.operators.llm.hybrid import (
        verify_jaccard_pairs)
    from python_cdc_component_spark.operators.llm.minhash import (
        band_table, minhash_signatures)
    from python_cdc_component_spark.streaming.lsh_index import (
        StreamingLshIndex)

    d = _docs(spark, sf_dir, n=150)
    idx = StreamingLshIndex(str(tmp_path / "idx"), num_buckets=16)
    streamed = set()
    for b in range(3):
        pairs = idx.process_batch(
            spark, d.filter(F.col("doc_id") % 3 == b), batch_id=b)
        ver = verify_jaccard_pairs(d, pairs.select("doc_a", "doc_b"))
        streamed |= {(r["doc_a"], r["doc_b"]) for r in
                     ver.filter("verified").collect()}

    bands = band_table(minhash_signatures(d))
    a, b2 = bands.alias("a"), bands.alias("b")
    cand = (a.join(b2, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bv") == F.col("b.bv"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b")).distinct())
    oneshot = {(r["doc_a"], r["doc_b"]) for r in
               verify_jaccard_pairs(d, cand).filter("verified")
               .collect()}
    assert streamed == oneshot


def test_verify_pairs_handles_shingleless_docs(spark):
    from python_cdc_component_spark.operators.llm.hybrid import (
        verify_jaccard_pairs)
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "a b c d e f"), (3, "a b c d e f")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3)],
                                  "doc_a long, doc_b long")
    out = {(r["doc_a"], r["doc_b"]): r["verified"]
           for r in verify_jaccard_pairs(docs, pairs).collect()}
    assert out == {(1, 2): False, (2, 3): True}
