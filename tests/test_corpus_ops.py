"""Semantic tests for the corpus-analytics batch: JSONL round-trip,
quality-weighted sampling, source overlap matrix."""

from pyspark.sql import functions as F

from python_cdc_component_spark.queries import QUERIES


def test_quality_sample_is_deterministic_and_monotone(spark, sf_dir):
    out1 = QUERIES["quality_weighted_sample"](spark, sf_dir)
    out2 = QUERIES["quality_weighted_sample"](spark, sf_dir)
    # identical subset across runs (resumability contract)
    kept1 = {r["doc_id"] for r in out1.filter("kept").collect()}
    kept2 = {r["doc_id"] for r in out2.filter("kept").collect()}
    assert kept1 == kept2
    rows = out1.collect()
    # kept ⟺ u < w, u uniform in [0,1)
    for r in rows:
        assert r["kept"] == (r["u"] < r["w"])
        assert 0.0 <= r["u"] < 1.0
    # full-weight docs (w==1.0) are always kept
    assert all(r["kept"] for r in rows if r["w"] >= 1.0)
    # acceptance rate tracks the mean weight (loose 3-sigma-ish bound)
    n = len(rows)
    mean_w = sum(r["w"] for r in rows) / n
    rate = len(kept1) / n
    assert abs(rate - mean_w) < 0.1


def test_source_overlap_matrix_bounds(spark, sf_dir):
    out = QUERIES["source_overlap_matrix"](spark, sf_dir).cache()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_src = docs.select("source").distinct().count()
    # one row per unordered source pair
    assert out.count() == n_src * (n_src - 1) // 2
    bad = out.filter((F.col("jaccard") < 0) | (F.col("jaccard") > 1)
                     | (F.col("src_a") >= F.col("src_b")))
    assert bad.count() == 0
    # intersection can't exceed either set size
    sh = (docs.select("source", F.explode(F.expr(
        "transform(sequence(1, size(split(text,' ')) - 2), "
        "i -> array_join(slice(split(text,' '), i, 3), ' '))")).alias("sh"))
        .distinct().groupBy("source").agg(F.count("*").alias("n")))
    j = (out.join(sh.withColumnRenamed("source", "src_a")
                    .withColumnRenamed("n", "na"), "src_a")
            .filter(F.col("n_common") > F.col("na")))
    assert j.count() == 0


def test_jsonl_roundtrip_preserves_rows(spark, sf_dir):
    out = QUERIES["jsonl_roundtrip_events"](spark, sf_dir)
    from python_cdc_component_spark.sources.events import read_events
    want = (read_events(spark, sf_dir)
            .filter(F.col("event_type").isin("click", "purchase")).count())
    assert out.count() == want
    assert out.filter(F.col("ts_ms").isNull()).count() == 0
