"""Round-5 session-3 operators: TPC-H tail (q2/q11/q16/q20), token-level
n-gram decontamination, quality-keep canonical selection, and the
interpolated bigram LM.  Value parity with DuckDB is covered by the
oracle gate; these tests pin semantics the hash compare can't see
(degenerate inputs, keep-policy invariants, pure-Python LM parity) and
the plan shapes SCALING.md budgets."""

import math

import pytest
from pyspark.sql import functions as F

from python_cdc_component_spark.plans.explain import plan_summary
from python_cdc_component_spark.queries import QUERIES


# ---------------------------------------------------------------------------
# bigram LM vs a pure-Python reference

def _py_bigram_ppl(texts, lam=0.7):
    """Reference implementation mirroring operators.llm.lm.bigram_fit +
    doc_bigram_perplexity (same rounding discipline)."""
    from collections import Counter
    uni, bi = Counter(), Counter()
    for t in texts.values():
        w = t.split(" ")
        uni.update(w)
        bi.update(zip(w, w[1:]))
    n_total = sum(uni.values())
    cc = Counter()
    for (p, _), c in bi.items():
        cc[p] += c
    out = {}
    for doc_id, t in texts.items():
        w = t.split(" ")
        pairs = list(zip(w, w[1:]))
        if not pairs:
            continue
        lps = [round(math.log2(lam * (bi[pr] / cc[pr[0]])
                               + (1.0 - lam) * (uni[pr[1]] / n_total)), 9)
               for pr in pairs]
        avg = round(sum(lps) / len(lps), 6)
        out[doc_id] = (len(pairs), avg, round(2.0 ** -avg, 4))
    return out


def test_bigram_matches_python_reference(spark):
    from python_cdc_component_spark.operators.llm.lm import (
        bigram_fit, doc_bigram_perplexity)
    texts = {1: "a b a b c", 2: "a a a", 3: "c b a", 4: "b"}
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logp2"], r["ppl"])
           for r in doc_bigram_perplexity(docs, bigram_fit(docs)).collect()}
    exp = _py_bigram_ppl(texts)
    assert got == exp          # doc 4 (single token) must be absent


def test_bigram_single_token_corpus_empty(spark):
    """An all-single-token corpus has no bigrams: fit and score are
    empty, not an error (the sequence(1,0) descending-surprise guard)."""
    from python_cdc_component_spark.operators.llm.lm import (
        bigram_fit, doc_bigram_perplexity)
    docs = spark.createDataFrame([(1, "x"), (2, "y")],
                                 "doc_id long, text string")
    model = bigram_fit(docs)
    assert model.count() == 0
    assert doc_bigram_perplexity(docs, model).count() == 0


# ---------------------------------------------------------------------------
# n-gram decontamination

def test_ngram_decontaminate_short_docs_excluded(spark, sf_dir):
    """Docs under 8 tokens produce no grams → can never be flagged; and
    every flagged doc is in the train split (bucket < 80)."""
    out = QUERIES["ngram_decontaminate"](spark, sf_dir)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id",
                    F.size(F.split("text", " ")).alias("n_tok"),
                    (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")
                                              .cast("binary")), 1, 7), 16, 10)
                     .cast("long") % 100).alias("bucket")))
    j = out.join(docs, "doc_id").collect()
    assert len(j) == out.count()
    for r in j:
        assert r["n_tok"] >= 8 and r["bucket"] < 80 and r["n_bad_grams"] >= 1


def test_ngram_decontaminate_flags_planted_containment(spark):
    """A train doc QUOTING an 8-token eval span is flagged even though
    the whole-doc fingerprints differ — the partial-containment case
    decontaminate_train_docs misses by design."""
    from python_cdc_component_spark.queries import ngram_decontaminate
    import os
    import tempfile
    span = "q w e r t y u i"
    rows = []
    # find ids landing in the needed buckets (same md5 bucketing as impl)
    import hashlib
    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:7], 16) % 100
    train_id = next(i for i in range(1000) if bucket(i) < 80)
    eval_id = next(i for i in range(1000) if bucket(i) >= 90)
    clean_id = next(i for i in range(1000)
                    if bucket(i) < 80 and i != train_id)
    rows.append((train_id, f"prefix words here {span} suffix tail", "en",
                 "src0", 1))
    rows.append((eval_id, f"{span} question answer", "en", "src0", 1))
    rows.append((clean_id, "totally different content with many tokens x y",
                 "en", "src0", 1))
    with tempfile.TemporaryDirectory() as td:
        (spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
                  "n_chars long")
         .write.parquet(os.path.join(td, "documents.parquet")))
        got = {r["doc_id"]: r["n_bad_grams"]
               for r in ngram_decontaminate(spark, td).collect()}
    assert train_id in got and clean_id not in got


# ---------------------------------------------------------------------------
# quality-keep canonical selection

def test_dup_canonical_keeps_longest_with_min_id_tiebreak(spark, sf_dir):
    comp = QUERIES["dup_components"](spark, sf_dir)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", F.size(F.split("text", " ")).cast("long")
                     .alias("n_tokens")))
    best = {r["component"]: r for r in
            QUERIES["dup_canonical_best"](spark, sf_dir).collect()}
    clusters = {}
    for r in comp.join(docs, "doc_id").collect():
        clusters.setdefault(r["component"], []).append(
            (r["n_tokens"], r["doc_id"]))
    assert set(best) == set(clusters)
    n_docs = 0
    for cid, members in clusters.items():
        n_docs += len(members)
        keep = max(members, key=lambda m: (m[0], -m[1]))
        assert best[cid]["keep_n_tokens"] == keep[0]
        assert best[cid]["keep_doc_id"] == keep[1]
        assert best[cid]["cluster_size"] == len(members)
    assert n_docs == docs.count()


def test_components_lineage_truncated(spark, sf_dir):
    """connected_components must hand composers a flat checkpointed
    relation — the unrolled iteration plan (thousands of exchanges)
    regressing back in shows up here, not as a mystery compile stall."""
    s = plan_summary(QUERIES["dup_components"](spark, sf_dir))
    assert s.shuffles <= 6 and s.scans <= 4


# ---------------------------------------------------------------------------
# TPC-H tail plan shapes

def test_q2_one_shared_fact_exchange_no_cartesian(spark, sf_dir):
    """r13: the projected repartition(l_partkey) serves both the pair
    aggregate (subset rule) and the per-part window — one shuffle."""
    s = plan_summary(QUERIES["q2_min_cost_supplier"](spark, sf_dir))
    assert "CartesianProduct" not in s.text
    assert s.shuffles <= 2 and s.broadcasts >= 2


def test_q11_reuses_agg_for_total(spark, sf_dir):
    """The grand total must read the cached per-part agg, not re-execute
    the fact subtree (InMemoryTableScan at both consumers)."""
    s = plan_summary(QUERIES["q11_important_stock"](spark, sf_dir))
    assert s.text.count("InMemoryTableScan") >= 2
    assert s.shuffles <= 3


def test_q16_distinct_plus_agg_only(spark, sf_dir):
    s = plan_summary(QUERIES["q16_parts_supplier_relationship"](spark, sf_dir))
    assert "CartesianProduct" not in s.text and s.shuffles <= 3


def test_q20_window_reuses_agg_partitioning(spark, sf_dir):
    s = plan_summary(QUERIES["q20_potential_promotion"](spark, sf_dir))
    assert "CartesianProduct" not in s.text and s.shuffles <= 4


def test_ngram_decontaminate_two_pruned_scans(spark, sf_dir):
    """Each split explodes its own pruned scan — no corpus-sized cache,
    no extra exchange beyond the count agg + the broadcast build."""
    s = plan_summary(QUERIES["ngram_decontaminate"](spark, sf_dir))
    assert s.scans == 2 and s.broadcasts >= 1


# ---------------------------------------------------------------------------
# greedy k-center diversity selection

def test_kcenter_greedy_invariants(spark):
    """Gonzalez invariants on a planted 1-D corpus: start = lowest id,
    each pick is the true farthest-from-set point, dmin decreases
    monotonically (the 2-approximation's structure)."""
    from python_cdc_component_spark.operators.llm.kcenter import kcenter_select
    pts = {1: 0.0, 2: 10.0, 3: 4.0, 4: 6.0, 5: 0.1}
    emb = spark.createDataFrame(
        [(i, [v, 0.0]) for i, v in pts.items()],
        "vec_id long, e array<double>")
    sel = kcenter_select(emb, k=4)
    ids = [c for c, _, _ in sel]
    assert ids[0] == 1                 # lowest id starts
    assert ids[1] == 2                 # farthest from 0.0 is 10.0
    assert ids[2] in (3, 4)            # middle points next
    dmins = [d for _, _, d in sel][1:]
    assert dmins == sorted(dmins, reverse=True)


def test_kcenter_rounds_are_shuffle_free(spark, sf_dir):
    """Each greedy round must stay a literal-fold projection +
    TakeOrderedAndProject — a global Sort or Exchange creeping into the
    per-round frame breaks the O(n) round contract."""
    from pyspark.sql import functions as F
    from python_cdc_component_spark.operators.llm.kcenter import _min_dist_col
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>")
                    .alias("e")))
    round_df = (emb.select("vec_id", "e",
                           _min_dist_col([(0, [0.0] * 64)]).alias("dmin"))
                .orderBy(F.col("dmin").desc(), "vec_id").limit(1))
    s = plan_summary(round_df)
    assert "TakeOrderedAndProject" in s.text
    assert s.shuffles == 0 and s.sorts == 0


def test_leakage_safe_split_never_straddles_components(spark, sf_dir):
    """Every near-dup component lands wholly in ONE split — the property
    per-doc hash splitting (train_split_assign) cannot give."""
    rows = QUERIES["leakage_safe_split"](spark, sf_dir).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_comp.values())
    splits = {r["split"] for r in rows}
    assert splits <= {"train", "val", "test"} and "train" in splits


def test_connected_components_long_chain_converges(spark):
    """A 200-node near-dup CHAIN (diameter 199) must converge under the
    default round budget — pointer jumping makes rounds O(log diameter)
    — and every node must land in component 0. Pre-r6, plain
    propagation covered only max_iter hops and silently returned split
    components."""
    from python_cdc_component_spark.operators.llm.components import (
        connected_components)
    edges = spark.createDataFrame([(i, i + 1) for i in range(199)],
                                  "src long, dst long")
    # small_graph_edges=0 forces the DISTRIBUTED loop — this test
    # guards the pointer-jumping round budget, which the r7 driver-side
    # fast path would otherwise bypass at this size
    out = connected_components(edges, small_graph_edges=0).collect()
    assert len(out) == 200
    assert {r["component"] for r in out} == {0}
