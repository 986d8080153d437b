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


class TestDsir:
    def test_selects_only_raw_docs_k_rows(self, spark, sf_dir):
        from python_cdc_component_spark.queries import QUERIES
        rows = QUERIES["dsir_select_docs"](spark, sf_dir).collect()
        assert 0 < len(rows) <= 100
        assert all(r.doc_id % 10 != 0 for r in rows)  # target excluded
        # deterministic: same call, same selection
        again = QUERIES["dsir_select_docs"](spark, sf_dir).collect()
        assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in again)

    def test_target_like_docs_rank_higher(self, spark, sf_dir):
        """A raw doc whose text IS a target doc's text must outscore the
        median raw doc (its n-grams all fall in target-heavy buckets)."""
        import pyspark.sql.functions as F
        from python_cdc_component_spark.operators.llm.dsir import (
            dsir_lambda_table, _gram_buckets)
        from python_cdc_component_spark.sources.events import read_table
        d = read_table(spark, sf_dir, "documents").select(
            "doc_id", "text", ((F.col("doc_id") % 10) == 0).alias("__t"))
        lam = dsir_lambda_table(_gram_buckets(d, ["__t"], "text", 256),
                                F.col("__t"), 256)
        # score EVERY doc (incl. target) under the fitted table
        scores = {r["doc_id"]: float(r["s"]) for r in (
            _gram_buckets(d, ["doc_id"], "text", 256)
            .join(F.broadcast(lam), "bkt")
            .groupBy("doc_id")
            .agg((F.sum("lam").cast("double") / F.count(F.lit(1))).alias("s"))
            .collect())}
        tgt = [s for i, s in scores.items() if i % 10 == 0]
        raw = [s for i, s in scores.items() if i % 10 != 0]
        tgt_mean = sum(tgt) / len(tgt)
        raw_med = sorted(raw)[len(raw) // 2]
        assert tgt_mean > raw_med  # per-gram weight separates the splits

    def test_bigram_guard_single_token_doc(self, spark):
        from python_cdc_component_spark.operators.llm.dsir import _gram_buckets
        d = spark.createDataFrame([(1, "one"), (2, "two words")],
                                  "doc_id long, text string")
        n = (_gram_buckets(d, ["doc_id"], "text", 16)
             .groupBy("doc_id").count().collect())
        got = {r["doc_id"]: r["count"] for r in n}
        assert got == {1: 1, 2: 3}  # 1 unigram; 2 unigrams + 1 bigram


class TestCcnetBuckets:
    def test_tertiles_per_lang(self, spark, sf_dir):
        from python_cdc_component_spark.queries import QUERIES
        rows = QUERIES["ccnet_ppl_buckets"](spark, sf_dir).collect()
        assert rows
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r.lang, []).append(r.ppl_bucket)
        for lang, buckets in by_lang.items():
            n = len(buckets)
            if n < 9:
                continue
            # head is the cleanest ~third: within ±40% of n/3
            h = buckets.count("head")
            assert abs(h - n / 3) <= max(2, 0.4 * n), (lang, h, n)
            assert set(buckets) <= {"head", "middle", "tail"}

    def test_head_has_lowest_ppl(self, spark, sf_dir):
        from python_cdc_component_spark.queries import QUERIES
        rows = QUERIES["ccnet_ppl_buckets"](spark, sf_dir).collect()
        for lang in {r.lang for r in rows}:
            lr = [r for r in rows if r.lang == lang]
            heads = [r.ppl for r in lr if r.ppl_bucket == "head"]
            tails = [r.ppl for r in lr if r.ppl_bucket == "tail"]
            if heads and tails:
                assert max(heads) <= min(tails)


class TestExactSubstr:
    def test_planted_cross_doc_span(self, spark):
        """A 10-token substring shared between two docs must surface as
        ONE merged span in the later doc (corpus-global first
        occurrence kept), at the exact token offsets."""
        from python_cdc_component_spark.operators.llm.exactsubstr import (
            duplicated_spans)
        d = spark.createDataFrame([
            (1, "a b c d e f g h i j k l m n o p"),
            (2, "zz yy c d e f g h i j k l xx ww vv uu tt ss"),
            (3, "totally different words here with no repeats at all ok"),
        ], "doc_id long, text string")
        rows = duplicated_spans(d, window=8).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.doc_id, r.span_start, r.span_end, r.span_tokens) == (2, 2, 11, 10)

    def test_offset_straddling_beats_tiles(self, spark):
        """The repeat starts mid-tile: tile-aligned segment dedup (k=8)
        cannot see it, the stride-1 window operator must."""
        from python_cdc_component_spark.operators.llm.exactsubstr import (
            duplicated_spans)
        base = "p q r s t u v w x y".split()          # 10-token repeat
        d = spark.createDataFrame([
            (1, "f1 f2 f3 " + " ".join(base) + " t1 t2 t3"),
            (2, "g1 g2 g3 g4 g5 " + " ".join(base) + " u1"),
        ], "doc_id long, text string")
        rows = duplicated_spans(d, window=8).collect()
        assert [(r.doc_id, r.span_start, r.span_end) for r in rows] == [(2, 5, 14)]

    def test_short_docs_no_windows(self, spark):
        from python_cdc_component_spark.operators.llm.exactsubstr import (
            duplicated_spans)
        d = spark.createDataFrame(
            [(1, "too short"), (2, "too short")], "doc_id long, text string")
        assert duplicated_spans(d, window=8).count() == 0

    def test_adjacent_runs_merge(self, spark):
        """Two duplicated regions separated by more than L tokens stay
        separate spans; back-to-back ones merge."""
        from python_cdc_component_spark.operators.llm.exactsubstr import (
            duplicated_spans)
        rep1 = "a1 a2 a3 a4 a5 a6 a7 a8".split()
        rep2 = "b1 b2 b3 b4 b5 b6 b7 b8".split()
        gap = [f"x{i}" for i in range(12)]
        d = spark.createDataFrame([
            (1, " ".join(rep1 + ["m1"] + rep2)),
            (2, " ".join(rep1 + gap + rep2)),
        ], "doc_id long, text string")
        rows = sorted(((r.doc_id, r.span_start, r.span_end)
                       for r in duplicated_spans(d, window=8).collect()))
        assert rows == [(2, 0, 7), (2, 20, 27)]

    def test_hot_path_parity_and_no_hot_rank(self, spark, sf_dir):
        """The hot-threshold skew valve must produce byte-identical
        spans to the single-path form on a corpus with a pathological
        hot window (one phrase repeated across many docs), and the hot
        mass must reach dup-marking through a broadcast join, not a
        rank sort."""
        from python_cdc_component_spark.operators.llm.exactsubstr import (
            duplicated_spans)
        from python_cdc_component_spark.plans.explain import plan_summary
        boiler = " ".join(f"b{i}" for i in range(9))     # hot 9-token run
        rows = [(i, f"u{i}a u{i}b " + boiler + f" t{i}") for i in range(60)]
        rows += [(100, "q r s t u v w x y z later copy"),
                 (101, "zz q r s t u v w x y z tail")]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        base = sorted(map(tuple, duplicated_spans(d, window=8).collect()))
        hot = duplicated_spans(d, window=8, hot_threshold=10)
        assert sorted(map(tuple, hot.collect())) == base
        s = plan_summary(hot)
        assert s.text.count("BroadcastHashJoin") >= 2  # hot min + marking


class TestKhopRecursion:
    def test_chain_hop_distances(self, spark):
        """Recursive depth-bounded walk on a 4-node chain (symmetric
        edges — cyclic!): min_hops must be the true hop distance, capped
        at 3, and the recursion must terminate despite the cycles."""
        edges = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)]
        spark.createDataFrame(edges, "s long, d long") \
             .createOrReplaceTempView("__khop_edges")
        rows = spark.sql("""
          WITH RECURSIVE walk(n, m, depth) AS (
            SELECT s, d, 1 FROM __khop_edges
            UNION ALL
            SELECT w.n, e.d, w.depth + 1
            FROM walk w JOIN __khop_edges e ON w.m = e.s
            WHERE w.depth < 3
          )
          SELECT n, m, MIN(depth) AS min_hops
          FROM walk WHERE n <> m GROUP BY n, m
        """).collect()
        got = {(r.n, r.m): r.min_hops for r in rows}
        assert got[(1, 2)] == 1 and got[(1, 3)] == 2 and got[(1, 4)] == 3
        assert got[(4, 1)] == 3 and got[(2, 4)] == 2
        assert (1, 1) not in got

    def test_query_matches_onehop_groups(self, spark, sf_dir):
        """1-hop rows of khop must be exactly the LSH band edges that
        lsh_dup_groups aggregates (consistency across the two surfaces)."""
        from python_cdc_component_spark.queries import QUERIES
        k = QUERIES["khop_dup_neighbors"](spark, sf_dir)
        one = {(r.doc_id, r.nb) for r in k.filter("min_hops = 1").collect()}
        g = QUERIES["lsh_dup_groups"](spark, sf_dir).collect()
        reps = {r.doc_id: r.group_rep for r in g}
        # every 1-hop edge joins two docs in the same component
        comp = {}
        for d, rep in reps.items():
            comp[d] = min(rep, comp.get(d, rep))
        for a, b in one:
            assert reps[a] <= min(a, b) or reps[b] <= min(a, b)
        assert one  # non-empty at this sf


class TestFunnelAndAudit:
    def test_funnel_strictly_increasing_steps(self, spark, sf_dir):
        """A planted user hitting all four steps in order reaches stage
        4; a user whose purchase precedes the click stops at 3; a user
        with only signup stops at 1; view-before-signup doesn't count."""
        import pyspark.sql.functions as F
        from python_cdc_component_spark.queries import QUERIES
        # build a tiny events frame through the same op chain via SQL:
        # reuse the query fn on a temp dir is heavyweight — instead
        # exercise the expression chain directly
        rows = [
            (1, "signup", 100), (1, "view", 200), (1, "click", 300),
            (1, "purchase", 400),
            (2, "signup", 100), (2, "purchase", 150), (2, "view", 200),
            (2, "click", 300),
            (3, "signup", 100),
            (4, "view", 50), (4, "signup", 100),
        ]
        df = spark.createDataFrame(rows, "user_id long, event_type string, tms long")

        def lst(t):
            return F.collect_list(F.when(F.col("event_type") == t, F.col("tms")))
        a = df.groupBy("user_id").agg(
            lst("signup").alias("s"), lst("view").alias("v"),
            lst("click").alias("c"), lst("purchase").alias("p"))
        a = a.withColumn("t1", F.array_min("s"))
        a = a.withColumn("t2", F.array_min(F.filter("v", lambda x: x > F.col("t1"))))
        a = a.withColumn("t3", F.array_min(F.filter("c", lambda x: x > F.col("t2"))))
        a = a.withColumn("t4", F.array_min(F.filter("p", lambda x: x > F.col("t3"))))
        stage = (F.when(F.col("t4").isNotNull(), 4)
                  .when(F.col("t3").isNotNull(), 3)
                  .when(F.col("t2").isNotNull(), 2)
                  .when(F.col("t1").isNotNull(), 1).otherwise(0))
        got = {r.user_id: r.s for r in a.select("user_id", stage.alias("s")).collect()}
        assert got == {1: 4, 2: 3, 3: 1, 4: 1}

    def test_funnel_single_shuffle(self, spark, sf_dir):
        from python_cdc_component_spark.plans.explain import plan_summary
        from python_cdc_component_spark.queries import QUERIES
        s = plan_summary(QUERIES["event_funnel_stages"](spark, sf_dir))
        assert s.shuffles == 1 and s.scans == 1

    def test_audit_partitions_docs_exactly(self, spark, sf_dir):
        """Per (source, lang): kept + lang + gopher + dup == n_docs, and
        totals match the corpus row count (no doc lost in the joins)."""
        import duckdb
        from python_cdc_component_spark.queries import QUERIES
        rows = QUERIES["corpus_audit_by_source"](spark, sf_dir).collect()
        for r in rows:
            assert r.n_kept + r.n_lang_drop + r.n_gopher_drop + r.n_dup_drop \
                == r.n_docs
        want = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchone()[0]
        assert sum(r.n_docs for r in rows) == want


class TestDegenerateDocs:
    """Driver corpora are clean; real corpora aren't. The text operators
    must survive empty/whitespace/single-token/repeated-char documents
    without crashing and with sane (NULL-or-zero, never-exception)
    outputs."""

    def _docs(self, spark):
        rows = [(1, ""), (2, " "), (3, "x"), (4, "a a a a a a a a a a"),
                (5, "normal words appear here with the usual mix of stuff"),
                (6, "\t"), (7, "x " * 200)]
        return spark.createDataFrame(
            [(i, t.strip() if i == 7 else t) for i, t in rows],
            "doc_id long, text string")

    def test_exactsubstr_and_dsir_survive(self, spark):
        import pyspark.sql.functions as F
        from python_cdc_component_spark.operators.llm.exactsubstr import (
            duplicated_spans)
        from python_cdc_component_spark.operators.llm.dsir import dsir_select
        d = self._docs(spark)
        spans = duplicated_spans(d, window=8).collect()
        assert all(r.span_tokens >= 8 for r in spans)
        sel = dsir_select(d, (F.col("doc_id") % 2) == 0, k=10).collect()
        assert len(sel) <= 10
        assert all(r.doc_id % 2 != 0 for r in sel)

    def test_lm_and_buckets_survive(self, spark):
        from python_cdc_component_spark.operators.llm.lm import (
            unigram_fit, doc_perplexity, ppl_buckets)
        import pyspark.sql.functions as F
        d = self._docs(spark).withColumn("lang", F.lit("xx"))
        scored = doc_perplexity(d, unigram_fit(d)).join(
            d.select("doc_id", "lang"), "doc_id")
        out = ppl_buckets(scored, group_col="lang").collect()
        assert out and all(r.ppl_bucket in {"head", "middle", "tail"}
                           for r in out)
        assert all(r.ppl is not None and r.ppl > 0 for r in out)
