"""Plan-shape budget lockfile for the bench headline suite.

Every headline query's executed (distinct-node) shuffle count is pinned
to its audited value + 1 headroom. A new Exchange creeping into a
headline plan — an accidental repartition, a lost broadcast, a window
that stopped sharing its partitioning — fails here mechanically instead
of surfacing as a silent bench regression three rounds later.

Counts use ``PlanSummary.uniq_shuffles`` (distinct node lines), so a
cached subtree printed under several consumers is not double-counted.
The session cache is cleared first so counts are fresh-plan
deterministic, independent of suite order.
"""

import pytest

from python_cdc_component_spark.plans.explain import plan_summary
from python_cdc_component_spark.queries import QUERIES

# audited values (scripts: see PLANS.md) + 1 headroom
BUDGETS = {
    "cdc_dedup_latest": 2,
    "cdc_append": 1,
    "cdc_chunked_dedup": 4,
    "events_windowed_agg": 2,
    "q1_pricing_summary": 2,
    "q3_shipping_priority": 2,
    "q5_nation_revenue": 2,
    "q6_revenue_delta": 2,
    "text_quality": 2,
    "minhash_lsh_pairs": 4,
    "embedding_topk": 2,
    "tfidf_top_terms": 8,
    "hopping_window_agg": 2,
    "sessionize_events": 2,
    "disjunctive_pushdown": 1,
    # r13 opt: fused per-key-watermark replay (replay_chunk_states) —
    # 4 overlapping chunk-state windows + merge → snap window + merge
    "incremental_snapshot_users": 3,
    "q18_large_volume_customers": 2,
    "q21_late_supplier_blame": 4,
    "embedding_ivf_ann": 4,
    "winnowing_fingerprints": 2,
    "segment_dedup_docs": 3,
    "bloom_dedup_incremental": 4,
    "q9_nation_year_profit": 2,
    "embedding_kmeans": 2,
    "semantic_dedup_pairs": 2,
    "dsir_select_docs": 6,
    "exact_substr_spans": 4,
    "q2_min_cost_supplier": 2,
    "ngram_decontaminate": 6,
    "dup_canonical_best": 5,
    "bigram_perplexity": 9,
    "cdc_incremental_mv": 8,
    "lsh_incremental_pairs": 4,
    "embedding_pq_ann_recall": 3,
    "resample_interpolate": 3,
}


@pytest.fixture(autouse=True)
def fresh_cache(spark):
    # per-test: an earlier query's persist_once cache substitutes
    # InMemoryTableScan nodes into later identical subtrees, shifting
    # the text-plan exchange census — clear so every budget measures
    # the fresh plan, suite-order independently
    spark.catalog.clearCache()
    yield


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_headline_plan_shuffle_budget(spark, sf_dir, name):
    s = plan_summary(QUERIES[name](spark, sf_dir))
    assert s.uniq_shuffles <= BUDGETS[name], (
        f"{name}: {s.uniq_shuffles} executed shuffles "
        f"(budget {BUDGETS[name]}) — a new Exchange entered the plan:\n"
        f"{s.text[:4000]}")
