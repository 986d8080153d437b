"""Plan-shape pins for the round-11 queries — the scale contracts the
oracle can't see: blocked linkage must never degenerate to a cartesian
product, the ANN-ladder recall queries must broadcast the probe side
and share one qid partitioning across both ranking windows, and no new
Exchange may creep in (the test_plan_budgets lockfile discipline)."""

import pytest

from python_cdc_component_spark.plans.explain import plan_summary
from python_cdc_component_spark.queries import QUERIES

BUDGETS = {
    # audited + 1 headroom (PLANS.md r11 section)
    "entity_match_customers": 2,   # one co-partitioning of both sides
    "embedding_binary_ann": 2,     # windows share the qid exchange
    "embedding_matryoshka_recall": 2,
    "rrf_hybrid_search": 2,        # same single-pass two-window shape
    "bm25_topk_docs": 2,           # stats agg + global top-k
}


@pytest.fixture(autouse=True)
def fresh_cache(spark):
    spark.catalog.clearCache()
    yield


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_r11_plan_shuffle_budget(spark, sf_dir, name):
    s = plan_summary(QUERIES[name](spark, sf_dir))
    assert s.uniq_shuffles <= BUDGETS[name], (
        f"{name}: {s.uniq_shuffles} executed shuffles "
        f"(budget {BUDGETS[name]}):\n{s.text[:4000]}")
    assert "CartesianProduct" not in s.text, (
        f"{name} degenerated to a cartesian product")


def test_entity_match_blocking_is_an_equi_join(spark, sf_dir):
    """The blocking keys must drive a hash/broadcast EQUI join — the
    levenshtein predicate and the a<b inequality ride as join filters,
    never as the join itself (which would be the n² cartesian)."""
    s = plan_summary(QUERIES["entity_match_customers"](spark, sf_dir))
    assert "Join" in s.text and "CartesianProduct" not in s.text
    assert "BroadcastNestedLoopJoin" not in s.text, (
        "blocking keys lost — the join has no equi-condition:\n"
        + s.text[:2000])


def test_ann_ladder_probe_side_broadcasts(spark, sf_dir):
    """The tiny probe side must broadcast over the corpus scan in both
    new recall queries (the serving-path join direction)."""
    for name in ("embedding_binary_ann", "embedding_matryoshka_recall",
                 "rrf_hybrid_search"):
        s = plan_summary(QUERIES[name](spark, sf_dir))
        assert s.uniq_broadcasts >= 1, (
            f"{name}: probe side not broadcast:\n{s.text[:2000]}")


def test_bm25_topk_is_take_ordered(spark, sf_dir):
    """The global top-k must compile to TakeOrderedAndProject — a
    total Sort of the corpus would single-partition at 100 TB."""
    s = plan_summary(QUERIES["bm25_topk_docs"](spark, sf_dir))
    assert "TakeOrderedAndProject" in s.text, s.text[:2000]
