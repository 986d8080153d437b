"""Semantic tests for the breadth-2 query batch (oracle equivalence is
covered by scripts/check_oracle.py; these pin properties the hash compare
can't see)."""

from pyspark.sql import functions as F

from python_cdc_component_spark.queries import QUERIES


def test_correlated_min_order_one_min_per_customer(spark, sf_dir):
    out = QUERIES["correlated_min_order"](spark, sf_dir)
    per_cust = out.groupBy("o_custkey").agg(
        F.count_distinct("o_totalprice").alias("n_prices"))
    assert per_cust.filter(F.col("n_prices") > 1).count() == 0


def test_lsh_dup_groups_rep_is_min_and_self_bounded(spark, sf_dir):
    out = QUERIES["lsh_dup_groups"](spark, sf_dir)
    # the group representative can never exceed the member's own id
    assert out.filter(F.col("group_rep") > F.col("doc_id")).count() == 0
    # every signed-up doc gets exactly one label
    assert out.groupBy("doc_id").count().filter("count > 1").count() == 0


def test_range_join_bands_cover_all_events(spark, sf_dir):
    from python_cdc_component_spark.sources.events import read_events
    out = QUERIES["range_join_value_bands"](spark, sf_dir)
    ev = read_events(spark, sf_dir)
    in_range = ev.filter((F.col("value") >= 0) & (F.col("value") < 500))
    assert (out.agg(F.sum("n_events")).collect()[0][0]
            == in_range.count())


def test_tfidf_top_terms_at_most_three_per_doc(spark, sf_dir):
    out = QUERIES["tfidf_top_terms"](spark, sf_dir)
    assert out.groupBy("doc_id").count().filter("count > 3").count() == 0
    assert out.filter(F.col("tfidf") < 0).count() == 0


def test_full_outer_keeps_both_sides(spark, sf_dir):
    out = QUERIES["full_outer_nation_counts"](spark, sf_dir)
    rows = {r["nationkey"]: r for r in out.collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    assert sum(r["n_cust"] for r in rows.values()) == cust.count()
    assert sum(r["n_supp"] for r in rows.values()) == supp.count()


# ---------------------------------------------------------------------------
# plan-shape guards for the breadth-2 batch (100 TB design contracts)

def test_range_join_is_broadcast_nested_loop(spark, sf_dir):
    from python_cdc_component_spark.plans.explain import plan_summary
    s = plan_summary(QUERIES["range_join_value_bands"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in s.text
    assert s.shuffles <= 1          # only the final 10-row agg


def test_tfidf_broadcasts_vocab_and_scalar(spark, sf_dir):
    from python_cdc_component_spark.plans.explain import plan_summary
    s = plan_summary(QUERIES["tfidf_top_terms"](spark, sf_dir))
    assert s.broadcasts >= 2        # df table + corpus-size scalar


def test_vocab_topk_no_global_sort(spark, sf_dir):
    from python_cdc_component_spark.plans.explain import plan_summary
    s = plan_summary(QUERIES["vocab_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in s.text


def test_correlated_min_single_shuffle(spark, sf_dir):
    from python_cdc_component_spark.plans.explain import assert_max_exchanges
    assert_max_exchanges(QUERIES["correlated_min_order"](spark, sf_dir), 1)


def test_schema_changes_route_filter_pushdown(spark, sf_dir):
    # the DDL branch must not force a second scan of the data branch
    from python_cdc_component_spark.plans.explain import plan_summary
    s = plan_summary(QUERIES["schema_changes_route"](spark, sf_dir))
    assert s.shuffles == 0          # pure map-side routing


def test_disjunctive_predicate_reaches_scan(spark, sf_dir):
    from python_cdc_component_spark.plans.explain import plan_summary
    s = plan_summary(QUERIES["disjunctive_pushdown"](spark, sf_dir))
    blob = "\n".join(s.pushed_filters)
    assert "Or(" in blob and "l_quantity" in blob and "l_discount" in blob
    assert s.shuffles == 0
