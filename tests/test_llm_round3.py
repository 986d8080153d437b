"""Semantic + plan-shape tests for the round-3 training-pipeline batch:
PII redaction, C4-style segment dedup, unigram perplexity, bloom
incremental dedup. Oracle equivalence is covered by
scripts/check_oracle.py; these pin the properties the hash compare
can't see."""

import re

from pyspark.sql import functions as F

from python_cdc_component_spark.plans.explain import plan_summary
from python_cdc_component_spark.queries import QUERIES
from python_cdc_component_spark.operators.llm.pii import (
    EMAIL_RE, PHONE_RE, IPV4_RE)


# ---------------------------------------------------------------------------
# PII redaction

def test_pii_nothing_survives_redaction(spark, sf_dir):
    out = QUERIES["pii_redact"](spark, sf_dir)
    for pat in (EMAIL_RE, PHONE_RE, IPV4_RE):
        assert out.filter(
            F.regexp_like("text_redacted", F.lit(pat))).count() == 0


def test_pii_counts_follow_injection_policy(spark, sf_dir):
    rows = QUERIES["pii_redact"](spark, sf_dir).collect()
    for r in rows:
        assert r["n_emails"] == (1 if r["doc_id"] % 3 == 0 else 0)
        assert r["n_phones"] == (1 if r["doc_id"] % 3 == 1 else 0)
        assert r["n_ips"] == (1 if r["doc_id"] % 2 == 0 else 0)
        n = r["n_emails"] + r["n_phones"] + r["n_ips"]
        assert len(re.findall(r"<EMAIL>|<PHONE>|<IP>", r["text_redacted"])) == n


def test_pii_plan_is_shuffle_free(spark, sf_dir):
    s = plan_summary(QUERIES["pii_redact"](spark, sf_dir))
    assert s.shuffles == 0


# ---------------------------------------------------------------------------
# segment-level dedup

def test_segment_dedup_first_occurrence_semantics(spark, sf_dir):
    from python_cdc_component_spark.operators.llm.segdedup import segment_dedup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = segment_dedup(docs, k=5).cache()
    try:
        # conservation: segments = kept + dropped, kept = distinct segs
        tot = out.agg(F.sum("n_segments").alias("s"),
                      F.sum("n_dropped").alias("d")).collect()[0]
        segs = docs.select(F.posexplode(F.expr(
            "transform(sequence(0, cast(ceil(size(split(text,' '))/5.0) as int)-1),"
            " i -> array_join(slice(split(text,' '), i*5+1, 5), ' '))"))
            .alias("i", "seg"))
        n_all = segs.count()
        n_distinct = segs.select("seg").distinct().count()
        assert tot["s"] == n_all
        assert tot["s"] - tot["d"] == n_distinct
        # a doc with zero drops reassembles to its original text
        survivors = (out.filter(F.col("n_dropped") == 0)
                        .join(docs, "doc_id")
                        .filter(F.col("text_dedup") != F.col("text")))
        assert survivors.count() == 0
    finally:
        # a leaked cache substitutes InMemoryTableScan into any later
        # identical subtree and breaks the plan-shape guards
        out.unpersist()


def test_segment_dedup_dropped_segment_has_earlier_occurrence(spark, sf_dir):
    # rebuild ranking and verify rn>1 rows always have an rn=1 twin
    # located strictly earlier in (doc_id, seg_idx) order
    from pyspark.sql import Window
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    segs = docs.select("doc_id", F.posexplode(F.expr(
        "transform(sequence(0, cast(ceil(size(split(text,' '))/5.0) as int)-1),"
        " i -> array_join(slice(split(text,' '), i*5+1, 5), ' '))"))
        .alias("seg_idx", "seg"))
    w = Window.partitionBy("seg").orderBy("doc_id", "seg_idx")
    first = (segs.withColumn("rn", F.row_number().over(w))
                 .withColumn("f_doc", F.first("doc_id").over(w))
                 .withColumn("f_idx", F.first("seg_idx").over(w)))
    bad = first.filter((F.col("rn") > 1) & (
        (F.col("f_doc") > F.col("doc_id"))
        | ((F.col("f_doc") == F.col("doc_id"))
           & (F.col("f_idx") >= F.col("seg_idx")))))
    assert bad.count() == 0


# ---------------------------------------------------------------------------
# unigram perplexity

def test_perplexity_bounds_and_token_count(spark, sf_dir):
    out = QUERIES["unigram_perplexity"](spark, sf_dir).cache()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert out.filter(F.col("avg_logp2") > 0).count() == 0
    assert out.filter(F.col("ppl") <= 1.0).count() == 0
    # every token of every doc is in-model (model fit on same corpus),
    # so n_tokens == whitespace token count
    wc = docs.select("doc_id",
                     F.size(F.split("text", " ")).alias("wc"))
    assert out.join(wc, "doc_id").filter(
        F.col("n_tokens") != F.col("wc")).count() == 0
    # every token probability is ≥ 1/n_total, so per-doc cross-entropy
    # perplexity is bounded by the corpus token count
    n_total = docs.select(
        F.explode(F.split("text", " ")).alias("w")).count()
    assert out.filter(F.col("ppl") > n_total + 1).count() == 0


def test_perplexity_model_broadcasts(spark, sf_dir):
    s = plan_summary(QUERIES["unigram_perplexity"](spark, sf_dir))
    assert s.broadcasts >= 1


# ---------------------------------------------------------------------------
# bloom incremental dedup

def test_bloom_no_false_negatives_and_fp_bounded(spark, sf_dir):
    out = QUERIES["bloom_dedup_incremental"](spark, sf_dir).cache()
    # bloom property: a truly-seen key can never probe negative
    assert out.filter(F.col("truly_seen")
                      & ~F.col("maybe_seen")).count() == 0
    counts = {r["verdict"]: r["n"] for r in
              out.groupBy("verdict").agg(F.count("*").alias("n")).collect()}
    n_new = sum(counts.values())
    # textbook fp-rate bound with generous slack (small-m filter is
    # deliberately lossy so this class is populated): p ≈ (1-e^(-kn/m))^k
    import math
    n_keys = out.sparkSession.read.parquet(
        f"{sf_dir}/documents.parquet").filter("doc_id % 2 = 0").count()
    m_bits, k = 32 * 62, 3
    p_fp = (1 - math.exp(-k * n_keys / m_bits)) ** k
    assert counts.get("fp", 0) <= max(10.0, 5 * p_fp * n_new)


def test_bloom_probe_broadcasts_filter(spark, sf_dir):
    # the history must reach the probe as a broadcast, never a shuffle
    # of the probe side against it
    s = plan_summary(QUERIES["bloom_dedup_incremental"](spark, sf_dir))
    assert s.broadcasts >= 1
    assert "BroadcastHashJoin" in s.text
