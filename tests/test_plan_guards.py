"""Plan-shape guards for the operator families SCALING.md describes but
no earlier test pinned (rollup/cube Expand, session/window Exchange+Sort
chains, schema-align zero-shuffle, single-shuffle text kernels).  Each
test is cited by name from SCALING.md — a regression that adds a shuffle
or loses the Expand strategy fails here, not in production."""

from python_cdc_component_spark.plans.explain import plan_summary
from python_cdc_component_spark.queries import QUERIES


def _summary(spark, sf_dir, name):
    return plan_summary(QUERIES[name](spark, sf_dir))


def test_rollup_uses_expand_single_shuffle(spark, sf_dir):
    """Catalyst Expand computes every grouping set in ONE shuffle —
    rollup must never become per-level scans + union."""
    s = _summary(spark, sf_dir, "rollup_orders")
    assert "Expand" in s.text and s.shuffles == 1


def test_cube_uses_expand_single_shuffle(spark, sf_dir):
    s = _summary(spark, sf_dir, "cube_lineitem")
    assert "Expand" in s.text and s.shuffles == 1


def test_hopping_window_uses_expand_single_shuffle(spark, sf_dir):
    """Overlapping (hopping) time windows expand each event into its
    covering windows map-side; the agg still shuffles once."""
    s = _summary(spark, sf_dir, "hopping_window_agg")
    assert "Expand" in s.text and s.shuffles == 1


def test_sessionize_single_exchange_sort_chain(spark, sf_dir):
    """Gap detection (lag) + session id (running sum) share one
    partition+order → exactly one Exchange for the whole chain."""
    s = _summary(spark, sf_dir, "sessionize_events")
    assert s.shuffles == 1 and s.text.count("Window") >= 2


def test_session_window_agg_single_shuffle(spark, sf_dir):
    s = _summary(spark, sf_dir, "session_window_agg")
    assert s.shuffles == 1


def test_window_suite_single_exchange(spark, sf_dir):
    """rank/dense_rank/lag/lead/running sums over the same key+order:
    one Exchange+Sort serves every window function."""
    s = _summary(spark, sf_dir, "window_functions_suite")
    assert s.shuffles == 1


def test_schema_align_union_is_shuffle_free(spark, sf_dir):
    """unionByName + NULL-pad projection adds NO exchange — each epoch
    keeps its own splits."""
    s = _summary(spark, sf_dir, "cdc_schema_align_union")
    assert s.shuffles == 0


def test_exact_dedup_single_shuffle(spark, sf_dir):
    s = _summary(spark, sf_dir, "exact_dedup_docs")
    assert s.shuffles == 1


def test_simhash_single_shuffle(spark, sf_dir):
    s = _summary(spark, sf_dir, "simhash_docs")
    assert s.shuffles == 1


def test_segment_dedup_two_shuffles(spark, sf_dir):
    """Window on segment + regroup on doc: exactly the two O(corpus)
    shuffles SCALING.md budgets — no third exchange may creep in."""
    s = _summary(spark, sf_dir, "segment_dedup_docs")
    assert s.shuffles == 2


def test_quality_filter_chain_single_shuffle(spark, sf_dir):
    """The whole language->gopher->dedup cascade is ONE scan + ONE
    uniform md5-keyed Exchange (the dedup-rank window); every rule
    stage is a map-side expression. A second shuffle creeping in means
    a stage stopped fusing."""
    s = _summary(spark, sf_dir, "quality_filter_chain")
    assert s.shuffles == 1 and s.scans == 1


def test_dsir_two_scans_no_cartesian_takeordered(spark, sf_dir):
    """DSIR is fit-scan + score-scan: exactly two corpus FileScans
    statically (uni+bi grams come from ONE Generate per pass — a
    regression to per-order unions or crossJoin totals re-adds scans),
    the lambda-table joins broadcast, and the global top-k is
    TakeOrderedAndProject (per-partition heaps), never a global Sort."""
    s = _summary(spark, sf_dir, "dsir_select_docs")
    assert s.scans == 2
    assert "CartesianProduct" not in s.text
    assert "TakeOrderedAndProject" in s.text
    assert s.text.count("Sort ") == 0


def test_ccnet_thresholds_broadcast_no_global_sort(spark, sf_dir):
    """CCNet buckets: the per-language tertile thresholds are an
    AGGREGATE broadcast back onto the docs — the plan must contain no
    Sort at all (an ntile/global-rank rewrite would add a data-sized
    single-partition window) and the scored subtree is cached, not
    statically doubled."""
    s = _summary(spark, sf_dir, "ccnet_ppl_buckets")
    assert s.text.count("Sort ") == 0
    assert "percentile" in s.text
    assert "InMemoryTableScan" in s.text or "InMemoryRelation" in s.text


def test_exact_substr_two_shuffles_hash_keyed(spark, sf_dir):
    """ExactSubstr spans: exactly two O(corpus) Exchanges (window-hash
    rank, doc-id islands — the island lag/sum/group chain reuses one
    partitioning), one scan, md5 keys on the wire (never window text)."""
    s = _summary(spark, sf_dir, "exact_substr_spans")
    # the under-split-scan _spread repartition is round-robin, not a
    # data-keyed shuffle — count hash exchanges specifically
    assert s.text.count("Exchange hashpartitioning") == 2
    assert s.scans == 1
    assert "CartesianProduct" not in s.text
    assert "md5" in s.text
