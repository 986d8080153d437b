"""Semantic + plan guards for the round-5 session-5 operator batch:
incremental LSH indexing, time-series resample/interpolate, Z-order
layout. Oracle equivalence is covered by scripts/check_oracle.py; these
pin the properties the hash compare can't see."""

from pyspark.sql import functions as F

from python_cdc_component_spark.queries import QUERIES


# ---------------------------------------------------------------------------
# lsh_incremental_pairs


def test_incremental_pairs_subset_of_full_selfjoin(spark, sf_dir):
    """Incremental probe = full self-join restricted to pairs touching
    the new batch — same pairs, same band multiplicity."""
    inc = {(r["doc_a"], r["doc_b"]): r["n_bands"]
           for r in QUERIES["lsh_incremental_pairs"](spark, sf_dir).collect()}
    full = {(r["doc_a"], r["doc_b"]): r["n_bands"]
            for r in QUERIES["minhash_lsh_pairs"](spark, sf_dir).collect()}
    expected = {p: n for p, n in full.items()
                if p[0] % 5 == 0 or p[1] % 5 == 0}
    assert inc == expected


def test_incremental_pairs_never_joins_old_with_old(spark, sf_dir):
    out = QUERIES["lsh_incremental_pairs"](spark, sf_dir)
    both_old = out.filter((F.col("doc_a") % 5 != 0)
                          & (F.col("doc_b") % 5 != 0))
    assert both_old.count() == 0


# ---------------------------------------------------------------------------
# resample_interpolate


def _resampled(spark, sf_dir):
    return QUERIES["resample_interpolate"](spark, sf_dir)


def test_resample_grid_is_dense_per_user(spark, sf_dir):
    """Every user's output days form a contiguous daily range — no gap
    survives the fill."""
    out = _resampled(spark, sf_dir).select(
        "user_id", F.to_date("day").alias("d"))
    span = out.groupBy("user_id").agg(
        F.min("d").alias("lo"), F.max("d").alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("d").alias("nd"))
    bad = span.filter(
        (F.col("n") != F.col("nd"))
        | (F.col("n") != F.datediff("hi", "lo") + 1))
    assert bad.count() == 0


def test_resample_interpolation_bounded_by_neighbors(spark, sf_dir):
    """Interpolated values lie within [min, max] of the two observed
    endpoints (linearity sanity), and observed rows reproduce the raw
    daily mean."""
    pdf = (_resampled(spark, sf_dir).toPandas()
           .sort_values(["user_id", "day"]))
    for _, g in pdf.groupby("user_id"):
        rows = g.to_dict("records")
        obs_positions = [i for i, r in enumerate(rows) if r["observed"]]
        for i, r in enumerate(rows):
            if r["observed"]:
                continue
            lo_pos = max(p for p in obs_positions if p < i)
            hi_pos = min(p for p in obs_positions if p > i)
            lo = rows[lo_pos]["val_filled"]
            hi = rows[hi_pos]["val_filled"]
            assert min(lo, hi) - 1e-6 <= r["val_filled"] <= max(lo, hi) + 1e-6


def test_resample_observed_days_match_raw(spark, sf_dir):
    from python_cdc_component_spark.sources.events import read_events
    out = _resampled(spark, sf_dir)
    n_obs = out.filter("observed").count()
    raw = (read_events(spark, sf_dir)
           .select("user_id", F.to_date("ts").alias("d")).distinct().count())
    assert n_obs == raw


# ---------------------------------------------------------------------------
# zorder layout


def test_zorder_buckets_bounded_in_both_dims(spark, sf_dir):
    """The layout contract: every 6-bit Morton bucket spans < 2^5
    distinct values in EACH dimension — so min/max pruning works for a
    predicate on either one."""
    rows = QUERIES["zorder_layout_stats"](spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["x_max"] - r["x_min"] < 32
        assert r["y_max"] - r["y_min"] < 32


def test_cluster_by_zorder_partitions_are_hyperrectangles(spark, sf_dir):
    """repartitionByRange on the Morton key bounds every partition's
    footprint in both dimensions (the per-file min/max stats a scan
    would prune on), while a single-key sort leaves the other dimension
    unbounded."""
    from python_cdc_component_spark.operators.zorder import cluster_by_zorder
    from python_cdc_component_spark.sources.events import read_events
    ev = read_events(spark, sf_dir).select(
        F.col("user_id").bitwiseAND(F.lit(255)).alias("x"),
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
         .cast("long").bitwiseAND(F.lit(255)).alias("y"))
    parts = (cluster_by_zorder(ev, F.col("x"), F.col("y"),
                               num_partitions=16, bits=8)
             .withColumn("pid", F.spark_partition_id())
             .groupBy("pid")
             .agg((F.max("x") - F.min("x")).alias("xs"),
                  (F.max("y") - F.min("y")).alias("ys"),
                  F.count(F.lit(1)).alias("n"))
             .collect())
    assert len(parts) > 4
    total = sum(p["n"] for p in parts)
    # weighted mean footprint must be far below the full 2D extent
    xext = max(p["xs"] for p in parts)
    mean_area = sum((p["xs"] + 1) * (p["ys"] + 1) * p["n"]
                    for p in parts) / total
    full_area = (ev.agg((F.max("x") - F.min("x") + 1)
                        * (F.max("y") - F.min("y") + 1)).collect()[0][0])
    assert mean_area < full_area / 4


# ---------------------------------------------------------------------------
# embedding_pq_ann_recall


def test_pq_recall_bounds_and_probe_coverage(spark, sf_dir):
    rows = QUERIES["embedding_pq_ann_recall"](spark, sf_dir).collect()
    assert {r["qid"] for r in rows} == {0, 1, 2, 3, 4}
    for r in rows:
        assert 0.0 <= r["recall_at_10"] <= 1.0
    # PQ with 16 codewords x 8 subspaces over structured embeddings
    # should beat random guessing by a wide margin on average
    assert sum(r["recall_at_10"] for r in rows) / len(rows) > 0.3


def test_pq_plan_encode_is_shuffle_free_and_probe_broadcast(spark, sf_dir):
    """The scale contract after the r13 Arrow-kernel rewrite: encode +
    ADC + exact rerank run as ONE shuffle-free Arrow map over the
    candidate scan (codebook and the 5-row probe set ride the closure
    as control-plane collects — no crossJoin, no broadcast relation,
    no row-at-a-time Python), and the only corpus exchanges are the
    conditional input-split spread plus the qid ranking window."""
    plan = (QUERIES["embedding_pq_ann_recall"](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "MapInPandas" in plan            # the Arrow kernel
    assert "BatchEvalPython" not in plan    # never pickled-row Python
    assert "CartesianProduct" not in plan
    assert "Join" not in plan               # scoring needs no join at all
    n_shuffle = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_shuffle <= 2
    # exactly one corpus scan in the scored plan (the codebook/probe
    # collects are separate control-plane jobs, not part of this plan)
    assert plan.count("FileScan") == 1


# ---------------------------------------------------------------------------
# streaming LSH index


def _run_lsh_stream(spark, sf_dir, splits):
    import shutil
    import tempfile
    from pyspark.sql import functions as SF
    from python_cdc_component_spark.streaming.lsh_index import (
        StreamingLshIndex)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    work = tempfile.mkdtemp(prefix="lsh_test_")
    try:
        idx = StreamingLshIndex(index_path=f"{work}/index",
                                num_buckets=16)
        acc = {}
        for pred in splits(SF):
            out = idx.process_batch(spark, docs.filter(pred))
            for r in out.collect():
                key = (r["doc_a"], r["doc_b"])
                assert key not in acc, f"pair {key} emitted twice"
                acc[key] = r["n_bands"]
        return acc
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_streaming_lsh_any_split_matches_full_selfjoin(spark, sf_dir):
    full = {(r["doc_a"], r["doc_b"]): r["n_bands"]
            for r in QUERIES["minhash_lsh_pairs"](spark, sf_dir).collect()}
    two = _run_lsh_stream(
        spark, sf_dir,
        lambda SF: [SF.col("doc_id") < 250, SF.col("doc_id") >= 250])
    five = _run_lsh_stream(
        spark, sf_dir,
        lambda SF: [SF.col("doc_id") % 5 == b for b in range(5)])
    assert two == full
    assert five == full


def test_streaming_lsh_empty_batch_is_noop(spark, sf_dir):
    import shutil
    import tempfile
    from python_cdc_component_spark.streaming.lsh_index import (
        StreamingLshIndex)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    work = tempfile.mkdtemp(prefix="lsh_test_")
    try:
        idx = StreamingLshIndex(index_path=f"{work}/index", num_buckets=8)
        first = idx.process_batch(spark, docs.filter("doc_id < 100"))
        n0 = first.count()
        empty = idx.process_batch(spark, docs.filter("doc_id < 0"))
        assert empty.count() == 0
        again = idx.process_batch(spark, docs.filter("doc_id < 100"))
        assert again.count() >= n0      # re-ingest emits at least as many
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_streaming_lsh_replay_does_not_inflate_band_counts(spark, sf_dir):
    """At-least-once semantics: re-processing a batch re-appends its
    bands (duplicate index rows), but countDistinct(band) makes every
    LATER probe immune — pair band-multiplicities must not inflate."""
    import shutil
    import tempfile
    from python_cdc_component_spark.streaming.lsh_index import (
        StreamingLshIndex)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    b1, b2 = docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")
    works = [tempfile.mkdtemp(prefix="lsh_test_") for _ in range(2)]
    try:
        clean = StreamingLshIndex(index_path=f"{works[0]}/index")
        clean.process_batch(spark, b1)
        ref = {(r["doc_a"], r["doc_b"]): r["n_bands"]
               for r in clean.process_batch(spark, b2).collect()}

        dup = StreamingLshIndex(index_path=f"{works[1]}/index")
        dup.process_batch(spark, b1)
        dup.process_batch(spark, b1)          # crash-replay of batch 1
        got = {(r["doc_a"], r["doc_b"]): r["n_bands"]
               for r in dup.process_batch(spark, b2).collect()}
        assert got == ref
    finally:
        for w in works:
            shutil.rmtree(w, ignore_errors=True)


def test_streaming_lsh_purge_and_update_doc(spark, sf_dir):
    """Document revision = purge old version + re-ingest new text; the
    resulting pair set must equal a fresh index built on the final
    corpus (and the purged doc's pairs must vanish)."""
    import shutil
    import tempfile
    from pyspark.sql import functions as SF
    from python_cdc_component_spark.streaming.lsh_index import (
        StreamingLshIndex)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    # pick a doc that participates in at least one near-dup pair
    full = QUERIES["minhash_lsh_pairs"](spark, sf_dir).collect()
    assert full
    victim = full[0]["doc_a"]
    revised = docs.withColumn(
        "text", SF.when(SF.col("doc_id") == victim,
                        SF.lit("completely new revision text that "
                               "matches nothing else at all"))
                  .otherwise(SF.col("text")))
    works = [tempfile.mkdtemp(prefix="lsh_test_") for _ in range(2)]
    try:
        # incremental: build on the original corpus, then revise the victim
        inc = StreamingLshIndex(index_path=f"{works[0]}/index")
        inc.process_batch(spark, docs)
        inc.purge_docs(spark, [victim])
        late = inc.process_batch(
            spark, revised.filter(SF.col("doc_id") == victim))
        # fresh: index built directly on the revised corpus
        fresh = StreamingLshIndex(index_path=f"{works[1]}/index")
        fresh_pairs = {(r["doc_a"], r["doc_b"]): r["n_bands"]
                       for r in fresh.process_batch(spark, revised)
                                     .collect()}
        # incremental total = pairs not involving victim (from build)
        #                   + pairs the revision completes
        base = {(r["doc_a"], r["doc_b"]): r["n_bands"]
                for r in inc.process_batch(
                    spark, docs.filter("doc_id < 0")).collect()}
        assert base == {}
        inc_pairs = {(r["doc_a"], r["doc_b"]): r["n_bands"]
                     for r in late.collect()}
        surviving = {p: n for p, n in
                     {(r["doc_a"], r["doc_b"]): r["n_bands"]
                      for r in full}.items()
                     if victim not in p}
        assert {**surviving, **inc_pairs} == fresh_pairs
    finally:
        for w in works:
            shutil.rmtree(w, ignore_errors=True)


def test_streaming_lsh_index_layout_is_bucketed(spark, sf_dir):
    import os
    import shutil
    import tempfile
    from python_cdc_component_spark.streaming.lsh_index import (
        StreamingLshIndex, BUCKET_COL)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    work = tempfile.mkdtemp(prefix="lsh_test_")
    try:
        idx = StreamingLshIndex(index_path=f"{work}/index", num_buckets=16)
        idx.process_batch(spark, docs)
        subdirs = [d for d in os.listdir(f"{work}/index")
                   if d.startswith(f"{BUCKET_COL}=")]
        assert len(subdirs) >= 2      # probe reads can path-prune
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# pmi collocations


def test_pmi_top20_are_positive_and_frequent(spark, sf_dir):
    rows = QUERIES["pmi_collocations"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r["c12"] >= 5
    # top-ranked collocations must beat independence
    assert rows[0]["pmi"] if rows else True


# ---------------------------------------------------------------------------
# calibrated quality keep


def test_quality_keep_rate_calibrated_per_language(spark, sf_dir):
    """Every language keeps ~30% (ties aside) — the point of
    calibration; a global threshold would not."""
    out = QUERIES["quality_keep_calibrated"](spark, sf_dir)
    rates = (out.groupBy("lang")
             .agg((F.sum(F.col("keep").cast("int"))
                   / F.count(F.lit(1))).alias("rate"),
                  F.count(F.lit(1)).alias("n"))
             .collect())
    assert rates
    for r in rates:
        if r["n"] >= 20:
            assert 0.15 <= r["rate"] <= 0.45, (r["lang"], r["rate"])


# ---------------------------------------------------------------------------
# persistent IVF index


def test_ivf_index_probe_prunes_cells(spark, sf_dir):
    import os
    import shutil
    import tempfile
    from python_cdc_component_spark.operators.llm.annindex import (
        IvfVectorIndex, CELL_COL)
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("e")))
    work = tempfile.mkdtemp(prefix="ivf_test_")
    try:
        idx = IvfVectorIndex(index_path=f"{work}/index", n_cells=8)
        n_written = idx.build(spark, emb)
        assert n_written == 8
        dirs = [d for d in os.listdir(f"{work}/index")
                if d.startswith(f"{CELL_COL}=")]
        assert len(dirs) >= 4               # corpus spreads over cells
        probes = (emb.filter(F.col("vec_id").isin([5, 6, 7]))
                     .select(F.col("vec_id").alias("qid"),
                             F.col("e").alias("qe")))
        audit = {}
        out = idx.probe(spark, probes, k=5, nprobe=2, audit=audit)
        rows = out.collect()
        # every probe gets exactly k results
        per_q = {}
        for r in rows:
            per_q.setdefault(r["qid"], []).append(r)
        assert set(per_q) == {5, 6, 7} and all(
            len(v) == 5 for v in per_q.values())
        # the probe touched at most nprobe cells per query and strictly
        # fewer than the whole index
        assert all(len(c) == 2 for c in audit["cells_by_qid"].values())
        assert len(audit["cells"]) < len(dirs) or len(dirs) <= 6
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_ivf_index_incremental_add_equals_full_build(spark, sf_dir):
    """build(half) + add_batch(other half) must probe identically to
    build(all) — the stored centroids pin the assignment, so the split
    cannot change any cell or any result."""
    import shutil
    import tempfile
    from python_cdc_component_spark.operators.llm.annindex import (
        IvfVectorIndex)
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("e")))
    probes = (emb.filter(F.col("vec_id").isin([5, 6]))
                 .select(F.col("vec_id").alias("qid"),
                         F.col("e").alias("qe")))
    works = [tempfile.mkdtemp(prefix="ivf_test_") for _ in range(2)]
    try:
        full = IvfVectorIndex(index_path=f"{works[0]}/index", n_cells=8)
        full.build(spark, emb)
        ref = {(r["qid"], r["cid"]): r["sim"]
               for r in full.probe(spark, probes, k=5, nprobe=2).collect()}

        cents = [r["e"] for r in emb.filter("vec_id < 8")
                 .orderBy("vec_id").select("e").collect()]
        inc = IvfVectorIndex(index_path=f"{works[1]}/index", n_cells=8)
        inc.build(spark, emb.filter("vec_id % 2 = 0"), centroids=cents)
        added = inc.add_batch(spark, emb.filter("vec_id % 2 = 1"))
        assert added > 0
        got = {(r["qid"], r["cid"]): r["sim"]
               for r in inc.probe(spark, probes, k=5, nprobe=2).collect()}
        assert got == ref
    finally:
        for w in works:
            shutil.rmtree(w, ignore_errors=True)


def test_ivf_index_trained_centroids_plug_in(spark, sf_dir):
    """kmeans_fit means slot in as the quantizer without layout or
    probe changes — the trained path."""
    import shutil
    import tempfile
    from python_cdc_component_spark.operators.llm.annindex import (
        IvfVectorIndex)
    from python_cdc_component_spark.operators.llm.kmeans import kmeans_fit
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("e")))
    _, cents = kmeans_fit(emb, k=4, iters=2)
    cents = [vec for _cid, vec in cents]        # (cid, k×d) pairs
    work = tempfile.mkdtemp(prefix="ivf_test_")
    try:
        idx = IvfVectorIndex(index_path=f"{work}/index", n_cells=4)
        idx.build(spark, emb, centroids=cents)
        probes = (emb.filter(F.col("vec_id") < 2)
                     .select(F.col("vec_id").alias("qid"),
                             F.col("e").alias("qe")))
        out = idx.probe(spark, probes, k=3, nprobe=1)
        assert out.groupBy("qid").count().filter("count != 3").count() == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# multi-eval decontamination


def test_multi_eval_consistent_with_single_set(spark, sf_dir):
    """The three per-benchmark reports must partition the single-set
    report: every flagged doc appears in both, and the single-set
    distinct-gram count is bounded by the per-set sum (a gram hash can
    belong to several benchmarks) and by each per-set count."""
    multi = QUERIES["multi_eval_decontaminate"](spark, sf_dir).collect()
    single = {r["doc_id"]: r["n_bad_grams"]
              for r in QUERIES["ngram_decontaminate"](spark, sf_dir)
                       .collect()}
    per_doc = {}
    for r in multi:
        per_doc.setdefault(r["doc_id"], []).append(r["n_bad_grams"])
    assert set(per_doc) == set(single)
    for doc, counts in per_doc.items():
        assert max(counts) <= single[doc] <= sum(counts)


# ---------------------------------------------------------------------------
# event analytics batch 2


def test_transition_matrix_rows_are_distributions(spark, sf_dir):
    out = QUERIES["event_transition_matrix"](spark, sf_dir)
    sums = out.groupBy("from_type").agg(F.sum("p").alias("s")).collect()
    assert sums
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-3
    n_total = out.agg(F.sum("n")).collect()[0][0]
    from python_cdc_component_spark.sources.events import read_events
    ev = read_events(spark, sf_dir)
    n_users = ev.select("user_id").distinct().count()
    assert n_total == ev.count() - n_users     # one LEAD-less row per user


def test_funnel_time_to_convert_bounds(spark, sf_dir):
    r = QUERIES["funnel_time_to_convert"](spark, sf_dir).collect()[0]
    from python_cdc_component_spark.sources.events import read_events
    ev = read_events(spark, sf_dir)
    n_signup = (ev.filter("event_type = 'signup'")
                  .select("user_id").distinct().count())
    assert 0 < r["n_converted"] <= n_signup
    assert (r["min_sec"] <= r["median_sec"] <= r["p90_sec"]
            <= r["max_sec"])
    assert r["min_sec"] >= 0


# ---------------------------------------------------------------------------
# temperature mix / winsorize / vocab drift


def test_temperature_weights_normalize_and_flatten(spark, sf_dir):
    rows = QUERIES["temperature_mix_weights"](spark, sf_dir).collect()
    assert abs(sum(r["w_temp"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["tok_share"] for r in rows) - 1.0) < 1e-4
    # alpha < 1 flattens: the smallest language gains weight, the
    # largest loses it
    lo = min(rows, key=lambda r: r["tok_share"])
    hi = max(rows, key=lambda r: r["tok_share"])
    if lo["tok_share"] < hi["tok_share"]:        # distinct shares exist
        assert lo["w_temp"] > lo["tok_share"]
        assert hi["w_temp"] < hi["tok_share"]


def test_winsorize_bounds_and_clip_fraction(spark, sf_dir):
    rows = QUERIES["winsorize_values"](spark, sf_dir).collect()
    for r in rows:
        assert r["p01"] <= r["mean_winsorized"] <= r["p99"]
        # at exact p01/p99, at most ~2% of rows sit outside (plus ties)
        assert r["n_clipped"] <= 0.03 * r["n"] + 2


def test_vocab_drift_jsd_bounds(spark, sf_dir):
    import math
    rows = QUERIES["vocab_drift_jsd"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # JSD in nats is bounded by ln 2; a parity split of one
        # distribution must be near zero, far from the bound
        assert 0.0 <= r["jsd"] <= math.log(2.0)
        assert r["jsd"] < 0.2


def test_vocab_drift_plan_vocab_sized_shuffles_only(spark, sf_dir):
    df = QUERIES["vocab_drift_jsd"](spark, sf_dir)
    df.collect()          # materialize the vocab cache
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the shared vocab count table must be cached and substituted on
    # BOTH its consumers (totals + join probe) — the corpus explode
    # and its (lang,tok) shuffle execute exactly once
    assert plan.count("InMemoryTableScan") >= 2
    # and the corpus text column never appears above the explode+agg:
    # everything downstream is vocab-sized
    assert "Exchange rangepartitioning" not in plan


def test_zorder_plan_is_codegen_no_shuffle_before_agg(spark, sf_dir):
    """The Morton key is pure projection arithmetic: the physical plan
    has exactly ONE exchange (the bucket aggregation) and no sort."""
    plan = (QUERIES["zorder_layout_stats"](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1
    assert "Sort" not in plan
    assert "BatchEvalPython" not in plan
