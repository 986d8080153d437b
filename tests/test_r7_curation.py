"""Fused curation pipeline invariants (round 7): one verdict per doc,
stage order cheapest-first, keep ⟺ 'kept', and the near-dup stage
agrees with the standalone hybrid keep-list over the survivor set."""

from pyspark.sql import functions as F

from python_cdc_component_spark.queries import QUERIES


def test_curation_verdicts_partition_and_agree(spark, sf_dir):
    out = QUERIES["curation_pipeline_keep"](spark, sf_dir)
    rows = out.collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert len(rows) == docs.count()            # one verdict per doc
    assert len({r["doc_id"] for r in rows}) == len(rows)
    valid = {"eval_holdout", "lang", "gopher", "near_dup",
             "contaminated", "kept"}
    assert {r["drop_reason"] for r in rows} <= valid
    for r in rows:
        assert r["keep"] == (r["drop_reason"] == "kept")
    # ~10% of docs are the eval holdout by construction
    n_hold = sum(1 for r in rows if r["drop_reason"] == "eval_holdout")
    assert 0 < n_hold < len(rows)


def test_curation_near_dup_matches_hybrid_on_survivors(spark, sf_dir):
    from python_cdc_component_spark.operators.llm.hybrid import (
        hybrid_dedup_keep)
    out = QUERIES["curation_pipeline_keep"](spark, sf_dir)
    survivors_plus = {r["doc_id"]: r["drop_reason"] for r in out.collect()
                      if r["drop_reason"] in ("near_dup", "contaminated",
                                              "kept")}
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bucket = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")
                                       .cast("binary")), 1, 7), 16, 10)
              .cast("long") % 100)
    surv = (d.withColumn("_b", bucket)
            .filter(F.col("_b") < 90)
            .filter(F.col("doc_id").isin(*survivors_plus))
            .select("doc_id", "text"))
    keepers = {r["keep_doc_id"]
               for r in hybrid_dedup_keep(surv).collect()}
    for doc_id, reason in survivors_plus.items():
        assert (doc_id in keepers) == (reason != "near_dup"), doc_id
