"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is fully executed via the
"noop" sink (whole plan runs, nothing serialized to the driver), which is
the honest cost of the query at scale — .count() alone can shortcut to
parquet footer metadata.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from python_cdc_component_spark.session import get_spark  # noqa: E402
from python_cdc_component_spark.queries import QUERIES  # noqa: E402

HEADLINE = [
    "cdc_dedup_latest",      # the reference's core compaction (W1)
    "cdc_append",            # ingest passthrough (T9)
    "cdc_chunked_dedup",     # W2+J1 anti-join strategy
    "events_windowed_agg",   # event-time windowed agg
    "q1_pricing_summary",    # scan-heavy agg
    "q3_shipping_priority",  # join + top-k
    "q5_nation_revenue",     # multi-join
    "q6_revenue_delta",      # selective pushdown scan
    "text_quality",          # explode-agg text op
    "minhash_lsh_pairs",     # near-dup LSH pipeline
    "embedding_topk",        # brute-force ANN
    "tfidf_top_terms",       # broadcast-join scoring + per-doc top-k
    "hopping_window_agg",    # sliding event-time windows
    "sessionize_events",     # gaps-and-islands windows
    "disjunctive_pushdown",  # OR-of-ranges parquet pushdown
    # round-2 additions
    "incremental_snapshot_users",    # DBLog watermark chunk merge (S4)
    "q18_large_volume_customers",    # fact-fact join + HAVING + top-k
    "q21_late_supplier_blame",       # window-rollup EXISTS collapse
    "embedding_ivf_ann",             # bucketed ANN (the 100 TB path)
    "winnowing_fingerprints",        # k-gram sliding-min fingerprints
    # round-2 continuation additions
    "segment_dedup_docs",            # C4-style span dedup (2 shuffles)
    "bloom_dedup_incremental",       # cross-run bloom probe (broadcast)
    "q9_nation_year_profit",         # 5-table profit rollup
    # round-4 additions
    "embedding_kmeans",              # Lloyd iterations, k*d driver state
    "semantic_dedup_pairs",          # SemDeDup cluster-local search
    # round-5 additions
    "dsir_select_docs",              # DSIR hashed-ngram importance top-k
    "exact_substr_spans",            # stride-1 duplicated-span detection
    "q2_min_cost_supplier",          # derived-partsupp min-cost (TPC-H 22 done)
    "ngram_decontaminate",           # token 8-gram train/eval decontamination
    "dup_canonical_best",            # components + keep-longest canonical
    "bigram_perplexity",             # interpolated order-2 LM scoring
    "cdc_incremental_mv",            # delta-maintained aggregate view
    # round-5 session-5 additions
    "lsh_incremental_pairs",         # new-batch-only LSH index probe
    "embedding_pq_ann_recall",       # PQ codes + ADC, one-pass recall
    "resample_interpolate",          # daily gap-fill + interpolation
    # round-7 additions
    "hybrid_dedup_keep",             # LSH → verify → components → keep
]


def bench_many_tables(spark, n_tables: int = 150, rows_per_table: int = 10_000,
                      workers: int = 4) -> dict:
    """Reference envelope's many-table scenario (150 tables x 10k rows,
    ex_mysql_cdc/tests/benchmark/benchmark.sql:104-156): per-table
    *small-data* overhead is driver scheduling, not data volume — the
    operational regime where multi-table CDC syncs die. Tables are
    generated once (one partitioned write), then each runs the per-table
    dedup pipeline concurrently on a small thread pool (independent
    per-table jobs, the engine's real orchestration shape)."""
    import shutil
    import statistics
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F
    from python_cdc_component_spark.operators.dedup import dedup_latest

    root = tempfile.mkdtemp(prefix="bench_many_")
    try:
        (spark.range(n_tables * rows_per_table)
         .select((F.col("id") % n_tables).alias("t"),
                 (F.col("id") % 1000).alias("pk"),
                 F.col("id").alias("kbc__batch_event_order"),
                 (F.col("id") % 97).cast("double").alias("v"))
         .write.partitionBy("t").mode("overwrite").parquet(root))

        def one(i: int) -> float:
            t0 = time.time()
            df = spark.read.parquet(f"{root}/t={i}")
            (dedup_latest(df, ["pk"],
                          order_by=[F.col("kbc__batch_event_order").desc()])
             .write.format("noop").mode("overwrite").save())
            return time.time() - t0

        with ThreadPoolExecutor(max_workers=workers) as ex:
            lat = sorted(ex.map(one, range(n_tables)))
        import math
        p99_idx = min(len(lat) - 1, math.ceil(0.99 * len(lat)) - 1)

        # the scale answer (engine.sync_multi_fused): ALL tables in one
        # window over (t, pk) + one write — measures what removing the
        # per-table scheduling overhead is worth
        t0 = time.time()
        allt = spark.read.parquet(root)
        (dedup_latest(allt, ["t", "pk"],
                      order_by=[F.col("kbc__batch_event_order").desc()])
         .write.format("noop").mode("overwrite").save())
        fused_sec = round(time.time() - t0, 3)

        return {
            "n_tables": n_tables, "rows_per_table": rows_per_table,
            "workers": workers,
            "total_sec": round(sum(lat), 3),
            "p50_sec": round(statistics.median(lat), 3),
            "p99_sec": round(lat[p99_idx], 3),
            "max_sec": round(lat[-1], 3),
            "fused_total_sec": fused_sec,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_streaming_fleet(spark, sf_dir: str, n_tables: int = 32,
                          sample_tables: int = 4) -> dict:
    """Streaming fleet fusion (VERDICT r5 #6): the many-tables scenario
    on the BOUNDED STREAMING path. A per-table loop pays one streaming
    query's bring-up (source listing, checkpoint, trigger scheduling)
    per table; ``bounded_sync_multi_fused`` pays it once per
    (schema, mode, keys) group. Here the fleet shares one schema+cfg,
    so the fused path is ONE query over the union of all sources. The
    per-table cost is measured on a sample and extrapolated (running
    all n per-table would just multiply the known constant)."""
    import shutil
    import statistics
    import tempfile

    from pyspark.sql import functions as F
    from python_cdc_component_spark.streaming.bounded import (
        BoundedStreamConfig, bounded_sync, bounded_sync_multi_fused)

    root = tempfile.mkdtemp(prefix="bench_fleet_")
    try:
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        (raw.withColumn("t", F.pmod("event_id", F.lit(n_tables)))
            .write.partitionBy("t").mode("overwrite")
            .parquet(f"{root}/src"))
        dirs = {f"t{i}": f"{root}/src/t={i}" for i in range(n_tables)}
        cfgs = {t: BoundedStreamConfig(mode="DEDUPE",
                                       primary_keys=["user_id"],
                                       max_wait_s=5)
                for t in dirs}

        t0 = time.time()
        stats = bounded_sync_multi_fused(
            spark, dirs, f"{root}/fused_out", f"{root}/fused_ckpt", cfgs)
        fused_sec = round(time.time() - t0, 3)

        lat = []
        for t in list(dirs)[:sample_tables]:
            t0 = time.time()
            bounded_sync(spark, dirs[t], f"{root}/solo/{t}",
                         f"{root}/solo_ckpt/{t}", cfgs[t])
            lat.append(time.time() - t0)
        per_table_p50 = round(statistics.median(lat), 3)
        return {
            "n_tables": n_tables, "n_queries": stats["n_queries"],
            "fused_total_sec": fused_sec,
            "per_table_p50_sec": per_table_p50,
            "per_table_loop_est_sec": round(per_table_p50 * n_tables, 3),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_dedup_groups_sync(spark, sf_dir: str,
                            n_docs: int = 1_000,
                            n_waves: int = 4) -> dict:
    """CDC sync with the dedup-groups side state (VERDICT r7 #5 /
    NOTES_r7 §12.4): a DEDUPE-mode documents table drained through
    ``bounded_sync`` with and without ``dedup_groups_path`` — the row
    prices what maintaining verified near-dup groups costs ON TOP of
    the compaction the sync pays anyway (per batch: LSH probe +
    pruned-verify + incremental component merge, never a corpus-wide
    re-closure)."""
    import shutil
    import tempfile

    from python_cdc_component_spark.streaming.bounded import (
        BoundedStreamConfig, bounded_sync)

    root = tempfile.mkdtemp(prefix="bench_dgroups_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        from python_cdc_component_spark.queries import (
            _stage_docs_as_event_waves)
        docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .select("doc_id", "text").limit(n_docs))
        flat = _stage_docs_as_event_waves(spark, docs, root, n_waves)
        out = {}
        for label, groups_path in (("plain", None),
                                   ("with_groups", f"{root}/groups")):
            cfg = BoundedStreamConfig(
                mode="DEDUPE", primary_keys=["user_id"],
                max_files_per_trigger=1, max_wait_s=5.0,
                dedup_groups_path=groups_path, dedup_groups_buckets=16)
            t0 = time.time()
            bounded_sync(spark, flat, f"{root}/state_{label}",
                         f"{root}/ckpt_{label}", cfg)
            out[f"{label}_sec"] = round(time.time() - t0, 3)
        out["n_docs"] = n_docs
        out["n_batches"] = n_waves
        out["groups_premium_sec"] = round(
            out["with_groups_sec"] - out["plain_sec"], 3)
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(root, ignore_errors=True)


def bench_lexical_index_sync(spark, sf_dir: str,
                             n_docs: int = 1_000,
                             n_waves: int = 4) -> dict:
    """CDC sync with the lexical-index side state (round 12, VERDICT
    r11 #3): the documents table drained through ``bounded_sync`` with
    and without ``lexical_index_path`` — the row prices what
    maintaining postings + doc-stats costs ON TOP of the compaction
    the sync pays anyway (per batch: sidecar-pruned purge, one
    explode/count shuffle, marker) — plus the serving probe itself
    (index-fed BM25, k term partitions, never the corpus). The 3×
    ingest ratio guards linearity."""
    import shutil
    import tempfile

    from python_cdc_component_spark.streaming.bounded import (
        BoundedStreamConfig, bounded_sync)
    from python_cdc_component_spark.streaming.lexical_state import (
        StreamingLexicalIndex)

    root = tempfile.mkdtemp(prefix="bench_lex_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        from python_cdc_component_spark.queries import (
            _stage_docs_as_event_waves)
        out = {}
        for label, n in (("1x", n_docs), ("3x", 3 * n_docs)):
            docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                    .select("doc_id", "text").limit(n))
            flat = _stage_docs_as_event_waves(
                spark, docs, f"{root}/{label}", n_waves)
            for mode, lex_path in (("plain", None),
                                   ("with_lex", f"{root}/{label}/lex")):
                cfg = BoundedStreamConfig(
                    mode="DEDUPE", primary_keys=["user_id"],
                    max_files_per_trigger=1, max_wait_s=5.0,
                    lexical_index_path=lex_path, lexical_parts=16)
                t0 = time.time()
                bounded_sync(spark, flat,
                             f"{root}/{label}/state_{mode}",
                             f"{root}/{label}/ckpt_{mode}", cfg)
                out[f"{label}_{mode}_sec"] = round(time.time() - t0, 3)
            out[f"{label}_premium_sec"] = round(
                out[f"{label}_with_lex_sec"]
                - out[f"{label}_plain_sec"], 3)
        lex = StreamingLexicalIndex(f"{root}/3x/lex", num_parts=16)
        t0 = time.time()
        n_hits = lex.bm25_topk(
            spark, ["table", "query", "scan", "merge"], k=15).count()
        out["probe_sec"] = round(time.time() - t0, 3)
        out["probe_rows"] = n_hits
        out["n_docs"] = n_docs
        ratio = (out["3x_premium_sec"] / out["1x_premium_sec"]
                 if out["1x_premium_sec"] > 0.05 else None)
        out["premium_ratio_3x"] = (round(ratio, 2)
                                   if ratio is not None else None)
        # linear-with-headroom bound (fixed per-epoch costs dominate at
        # this size, so sublinear is common; 4.5 ≈ 1.5× linear)
        out["within_bound"] = ratio is None or ratio < 4.5
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(root, ignore_errors=True)


def bench_fused_lexical_sync(spark, sf_dir: str, n_tables: int = 6,
                             docs_per_table: int = 200,
                             n_waves: int = 2) -> dict:
    """Lexical side state on the FUSED fleet path (round 13, VERDICT
    r12 #3): a small fleet where one table wants a maintained index —
    previously that single config forced the whole fleet onto the
    per-table loop (the many_tables bench prices the fused drain 33×
    cheaper). The row compares the per-table ``bounded_sync`` loop
    against ONE ``bounded_sync_multi_fused`` call maintaining the same
    index inside the fused drain (byte-identical content,
    parity-pinned in tests/test_r13_side_epoch.py)."""
    import shutil
    import tempfile

    from python_cdc_component_spark.streaming.bounded import (
        BoundedStreamConfig, bounded_sync, bounded_sync_multi_fused)

    root = tempfile.mkdtemp(prefix="bench_fusedlex_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        from python_cdc_component_spark.queries import (
            _stage_docs_as_event_waves)
        docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .select("doc_id", "text").limit(docs_per_table))
        flats = {}
        for side in ("loop", "fused"):
            for i in range(n_tables):
                flats[(side, i)] = _stage_docs_as_event_waves(
                    spark, docs, f"{root}/{side}_t{i}", n_waves)

        def cfg(side, i):
            lex = (f"{root}/lex_{side}_t{i}" if i == 0 else None)
            return BoundedStreamConfig(
                mode="DEDUPE", primary_keys=["user_id"],
                max_files_per_trigger=1, max_wait_s=5.0,
                lexical_index_path=lex, lexical_parts=16)

        t0 = time.time()
        for i in range(n_tables):
            bounded_sync(spark, flats[("loop", i)],
                         f"{root}/loop_state_{i}",
                         f"{root}/loop_ckpt_{i}", cfg("loop", i))
        loop_sec = round(time.time() - t0, 3)
        t0 = time.time()
        bounded_sync_multi_fused(
            spark, {f"t{i}": flats[("fused", i)]
                    for i in range(n_tables)},
            f"{root}/fused_out", f"{root}/fused_ckpt",
            {f"t{i}": cfg("fused", i) for i in range(n_tables)})
        fused_sec = round(time.time() - t0, 3)
        return {"n_tables": n_tables, "docs_per_table": docs_per_table,
                "per_table_loop_sec": loop_sec,
                "fused_sec": fused_sec,
                "speedup": (round(loop_sec / fused_sec, 2)
                            if fused_sec > 0 else None)}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(root, ignore_errors=True)


def bench_ann_index_sync(spark, sf_dir: str, n_vecs: int = 1_000,
                         n_waves: int = 4) -> dict:
    """CDC sync with the ANN-index side state (round-10 continuation):
    the embeddings table drained through ``bounded_sync`` with and
    without ``ann_index_path`` — the row prices what maintaining the
    serving vector index costs ON TOP of the compaction the sync pays
    anyway (per batch: purge-then-add under stored centroids, epoch
    marker, compaction gate)."""
    import shutil
    import tempfile

    from python_cdc_component_spark.streaming.bounded import (
        BoundedStreamConfig, bounded_sync)

    root = tempfile.mkdtemp(prefix="bench_annsync_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        from python_cdc_component_spark.queries import (
            _stage_docs_as_event_waves)
        from pyspark.sql import functions as F
        emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
               .select(F.col("vec_id").alias("doc_id"),
                       F.to_json(F.col("embedding").cast("array<double>"))
                        .alias("text"))
               .limit(n_vecs))
        flat = _stage_docs_as_event_waves(spark, emb, root, n_waves)
        out = {}
        for label, ann_path in (("plain", None),
                                ("with_ann", f"{root}/ann")):
            cfg = BoundedStreamConfig(
                mode="DEDUPE", primary_keys=["user_id"],
                max_files_per_trigger=1, max_wait_s=5.0,
                ann_index_path=ann_path, ann_index_cells=16)
            t0 = time.time()
            bounded_sync(spark, flat, f"{root}/state_{label}",
                         f"{root}/ckpt_{label}", cfg)
            out[f"{label}_sec"] = round(time.time() - t0, 3)
        out["n_vecs"] = n_vecs
        out["n_batches"] = n_waves
        out["ann_premium_sec"] = round(
            out["with_ann_sec"] - out["plain_sec"], 3)
        # scale pin (the stream_groups_scale discipline): the same
        # pipeline at 3× vectors; per-epoch fixed cost amortizes, so
        # the bound is the standard 1.3 × data ratio
        root3 = tempfile.mkdtemp(prefix="bench_annsync3_")
        try:
            emb3 = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                    .select(F.col("vec_id").alias("doc_id"),
                            F.to_json(F.col("embedding")
                                      .cast("array<double>"))
                             .alias("text"))
                    .limit(3 * n_vecs))
            flat3 = _stage_docs_as_event_waves(spark, emb3, root3,
                                               n_waves)
            cfg3 = BoundedStreamConfig(
                mode="DEDUPE", primary_keys=["user_id"],
                max_files_per_trigger=1, max_wait_s=5.0,
                ann_index_path=f"{root3}/ann", ann_index_cells=16)
            t0 = time.time()
            bounded_sync(spark, flat3, f"{root3}/state",
                         f"{root3}/ckpt", cfg3)
            out["with_ann_x3_sec"] = round(time.time() - t0, 3)
            out["time_ratio_x3"] = round(
                out["with_ann_x3_sec"] / out["with_ann_sec"], 2)
            out["within_bound"] = bool(out["time_ratio_x3"] <= 1.3 * 3)
        finally:
            shutil.rmtree(root3, ignore_errors=True)
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(root, ignore_errors=True)


def bench_boilerplate_guard(spark, sf_dir: str,
                            n_copies: int = 3_000) -> dict:
    """Round-8 exact-duplicate collapse, priced per round: hybrid
    dedup over the sf corpus PLUS one n_copies-strong text-identical
    boilerplate group (the web-corpus shape — license pages, error
    pages, templates). Before the collapse the band self-join emitted
    all n_copies²/2 intra-group candidate pairs (measured 41.9 s at
    3 000 copies vs 4.1 s collapsed); this row keeps the guarded cost
    visible so a regression that reintroduces the quadratic term is
    machine-detectable."""
    from pyspark.sql import functions as F

    from python_cdc_component_spark.operators.llm.hybrid import (
        hybrid_dedup_keep)

    base = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    boiler = " ".join(f"boiler{i} term" for i in range(30))
    group = spark.range(1_000_000, 1_000_000 + n_copies).select(
        F.col("id").alias("doc_id"), F.lit(boiler).alias("text"))
    docs = base.unionByName(group).localCheckpoint(eager=True)
    t0 = time.time()
    out = hybrid_dedup_keep(docs)
    kept = out.count()
    sec = round(time.time() - t0, 3)
    spark.catalog.clearCache()
    return {"n_copies": n_copies, "sec": sec, "keep_rows": kept}


def bench_stream_boilerplate_guard(spark, sf_dir: str,
                                   n_copies: int = 1_200,
                                   n_corpus: int = 200) -> dict:
    """Round-9 streaming twin of ``boilerplate_guard``: a boilerplate-
    heavy corpus (n_copies text-identical docs + n_corpus distinct
    docs, split over two ingest batches) driven through
    ``StreamingDedupGroups`` with the exact-text collapse ON vs OFF.
    Unguarded, the LSH front end emits K²/2 intra-group candidate
    pairs and the verify joins carry them times ~52 shingles each;
    guarded, the group bands once and every duplicate costs one linear
    attach pair. ``pairs_*`` pin the candidate-volume contract so a
    regression is machine-detectable, not just slower."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from python_cdc_component_spark.streaming.dedup_state import (
        StreamingDedupGroups)

    base = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(n_corpus))
    boiler = " ".join(f"boiler{i} term" for i in range(30))
    group = spark.range(2_000_000, 2_000_000 + n_copies).select(
        F.col("id").alias("doc_id"), F.lit(boiler).alias("text"))
    corpus = base.unionByName(group).localCheckpoint(eager=True)
    half = 2_000_000 + n_copies // 2
    batches = [corpus.filter(F.col("doc_id") < half),
               corpus.filter(F.col("doc_id") >= half)]
    root = tempfile.mkdtemp(prefix="bench_sbg_")
    out: dict = {"n_copies": n_copies, "n_corpus": n_corpus}
    try:
        for label, collapse in (("guarded", True), ("unguarded", False)):
            st = StreamingDedupGroups(os.path.join(root, label),
                                      num_buckets=16,
                                      collapse_exact=collapse)
            t0 = time.time()
            n_pairs = 0
            for i, b in enumerate(batches):
                stats = st.process_batch(spark, b, corpus=corpus,
                                         batch_id=i)
                n_pairs += int(stats["n_verified_edges"])
            st.read_groups(spark).count()
            out[f"{label}_sec"] = round(time.time() - t0, 3)
            out[f"pairs_{label}"] = n_pairs
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_stream_semantic_guard(spark, sf_dir: str,
                                n_copies: int = 800,
                                n_corpus: int = 100) -> dict:
    """Round-11 vector twin of ``stream_boilerplate_guard``: an
    identical-VECTOR flood (n_copies copies of one embedding — the
    re-crawled-page / default-vector corpus shape — plus n_corpus
    distinct vectors, over two ingest batches) driven through
    ``StreamingSemanticGroups`` with the vector-exact collapse ON vs
    OFF. Unguarded, same-cell pairing pays K²/2 cosine pairs for the
    flood; guarded, the flood groups under its min-id rep for K−1
    attach edges. ``pairs_*`` pin the candidate-volume contract so a
    regression is machine-detectable, not just slower; both modes must
    reach identical groups (asserted here — the collapse is a cost
    lever, never a semantics change)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from python_cdc_component_spark.streaming.semantic_state import (
        StreamingSemanticGroups)

    base = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id", F.col("embedding").cast("array<double>")
                    .alias("e"))
            .limit(n_corpus))
    dim = len(base.select("e").first()["e"])
    flood_vec = F.array(*[F.lit(1.0 if i == 0 else 0.25)
                          for i in range(dim)])
    flood = spark.range(3_000_000, 3_000_000 + n_copies).select(
        F.col("id").alias("vec_id"), flood_vec.alias("e"))
    corpus = base.unionByName(flood).localCheckpoint(eager=True)
    half = 3_000_000 + n_copies // 2
    batches = [corpus.filter(F.col("vec_id") < half),
               corpus.filter(F.col("vec_id") >= half)]
    root = tempfile.mkdtemp(prefix="bench_ssg_")
    out: dict = {"n_copies": n_copies, "n_corpus": n_corpus}
    try:
        groups = {}
        for label, collapse in (("guarded", True), ("unguarded", False)):
            st = StreamingSemanticGroups(
                os.path.join(root, label), n_cells=8, threshold=0.9,
                num_buckets=16, collapse_identical=collapse)
            t0 = time.time()
            n_pairs = 0
            for i, b in enumerate(batches):
                stats = st.process_batch(spark, b, batch_id=i)
                n_pairs += int(stats["n_verified_edges"])
            groups[label] = {
                (r["component"], r["keep_doc_id"], r["cluster_size"])
                for r in st.read_groups(spark).collect()}
            out[f"{label}_sec"] = round(time.time() - t0, 3)
            out[f"pairs_{label}"] = n_pairs
        out["groups_equal"] = bool(
            groups["guarded"] == groups["unguarded"])
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_skew(spark, n: int = 1_000_000, hot_frac: float = 0.5) -> dict:
    """Inline skew-strategy ladder (plain vs AQE skew-join vs salted vs
    broadcast) so the measured justification for operators/joins.py
    ships with every BENCH record (scripts/bench_skew.py is the
    standalone form)."""
    from pyspark.sql import functions as F
    from python_cdc_component_spark.operators.joins import salted_join

    fact = (spark.range(n)
            .withColumn("key", F.when(F.rand(seed=7) < hot_frac, F.lit(0))
                        .otherwise((F.rand(seed=11) * 10_000).cast("long")))
            .withColumn("payload", F.col("id") % 97))
    dim = (spark.range(10_000)
           .select(F.col("id").alias("key"),
                   (F.col("id") % 5).cast("string").alias("seg")))
    fact.persist().count()
    dim.persist().count()

    def run(df) -> float:
        t0 = time.time()
        (df.groupBy("seg").agg(F.sum("payload").alias("s"))
         .write.format("noop").mode("overwrite").save())
        return round(time.time() - t0, 3)

    timings = {}
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    try:
        # broadcast stays disabled through the salted rung too, so the
        # ladder actually measures the salted SHUFFLE join and not a
        # broadcast plan wearing a salt costume
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        timings["plain_shuffle_join"] = run(
            fact.join(dim.hint("merge"), "key"))
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        timings["aqe_skew_join"] = run(fact.join(dim.hint("merge"), "key"))
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        timings["salted_join"] = run(
            salted_join(fact, dim, on="key", buckets=16, salt_by="id"))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        timings["broadcast_join"] = run(fact.join(F.broadcast(dim), "key"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
        fact.unpersist()
        dim.unpersist()
    return {"rows": n, "hot_frac": hot_frac, "timings": timings}


def bench_q1_decimal_probe(spark, sf_dir: str) -> dict:
    """VERDICT r1 item 10: cost of exact-decimal accumulation in q1.
    Variant keeps exact decimals for money but runs quantity/discount
    through bounded-magnitude long accumulators (quantity is integral,
    discount has 2dp — both provably overflow-safe in a long at any SF).
    """
    from pyspark.sql import functions as F
    from python_cdc_component_spark.queries import QUERIES, _spread

    t0 = time.time()
    QUERIES["q1_pricing_summary"](spark, sf_dir) \
        .write.format("noop").mode("overwrite").save()
    exact = round(time.time() - t0, 3)

    # same conditional input-split spread as the r13 q1 (both variants
    # must parallelize identically or the probe prices the scan split,
    # not the accumulator type)
    li = _spread((spark.read.parquet(f"{sf_dir}/lineitem.parquet")
                  .filter(F.col("l_shipdate") <= "1998-09-02")
                  .select("l_returnflag", "l_linestatus", "l_quantity",
                          "l_extendedprice", "l_discount", "l_tax")),
                 spark)
    DEC = "decimal(18,6)"
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    charge = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              * (1 + F.col("l_tax"))).cast(DEC)
    cnt = F.count(F.lit(1))
    t0 = time.time()
    (li.groupBy("l_returnflag", "l_linestatus")
       .agg((F.sum(F.round("l_quantity").cast("long")).cast("double"))
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
            .alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(F.round("l_quantity").cast("long")) / cnt).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / cnt)
            .alias("avg_price"),
            # round BEFORE the cast: cast alone truncates 28.999... to 28
            (F.sum(F.round(F.col("l_discount") * 100).cast("long"))
             / cnt / 100.0).alias("avg_disc"),
            cnt.alias("count_order"))
       .write.format("noop").mode("overwrite").save())
    longs = round(time.time() - t0, 3)
    return {"exact_decimal_sec": exact, "long_accumulator_sec": longs,
            "delta_sec": round(exact - longs, 3)}


def _machine_control(spark) -> float:
    """Fixed synthetic probe (deterministic range → hash → groupBy →
    noop): prices raw machine speed + one small shuffle, touching NO
    benched query. Emitted into the headline doc as noise context
    (VERDICT r13 #3) so a contaminated window is machine-detectable:
    round-over-round comparisons can discount windows whose control
    time or loadavg is elevated. Quiet-machine reference on the round-14
    dev box: ~0.3-0.5 s; the repo's internal quiet-window criterion
    (q1_pricing_summary ≤ 2.0 s) corresponds to control ≲ 1.0."""
    from pyspark.sql import functions as F
    t0 = time.time()
    (spark.range(20_000_000)
          .select(F.pmod(F.xxhash64("id"), F.lit(1000)).alias("k"))
          .groupBy("k").count()
          .write.format("noop").mode("overwrite").save())
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")

    # warmup: JVM/codegen spin-up + parquet footer reads, so per-query
    # numbers measure the queries rather than session bring-up
    from python_cdc_component_spark.sources.events import read_events
    read_events(spark, sf_dir).count()
    for t in ["lineitem", "orders", "customer", "documents", "embeddings"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    # ... and the Python/Arrow worker pool (daemon fork + pandas import
    # per core, ~2 s once per session): long-lived clusters amortize it
    # across jobs, so the suite should price the operators, not the
    # one-time pool bring-up that lands on whichever Arrow query runs
    # first (semantic_dedup_pairs is the only headline user).
    (spark.range(spark.sparkContext.defaultParallelism)
          .repartition(spark.sparkContext.defaultParallelism)
          .mapInPandas(lambda it: it, "id long")
          .write.format("noop").mode("overwrite").save())

    # best-of-N per query (default 2): single-shot numbers on a shared
    # VM swing ±3-10x run-to-run (one 4-run session saw q1 at 2.4 s,
    # 2.5 s, 2.3 s, 10.1 s with an identical plan) — the min is the
    # standard steady-state estimator under noisy-neighbor contention
    # (criterion/JMH practice). N=1 restores single-shot timing.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    # noise context (VERDICT r13 #3): loadavg + a fixed synthetic
    # control bracketing the headline window — additions-only, no
    # benched query's measured conditions change
    load_start = [round(x, 2) for x in os.getloadavg()]
    control_start = _machine_control(spark)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
        timings[name] = best

    total = round(sum(timings.values()), 3)
    doc = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "load_start": load_start,
        "load_end": [round(x, 2) for x in os.getloadavg()],
        "control_start_sec": control_start,
        "control_end_sec": _machine_control(spark),
    }
    if os.environ.get("SPARK_GRAFT_BENCH_EXTRAS", "1") != "0":
        # extras go on their OWN line, printed BEFORE the core doc:
        # the driver captures a bounded TAIL of stdout, and r7's
        # extras (scale_ratios et al.) grew the single line past the
        # window, pushing the headline total out of capture
        # (BENCH_r07.json parsed: null). The LAST line is always the
        # compact core doc, so the headline number survives any
        # tail-capture width.
        extras = {
            "metric": "bench_extras",
            "many_tables": bench_many_tables(spark),
            "streaming_fleet": bench_streaming_fleet(spark, sf_dir),
            "skew_join": bench_skew(spark),
            "dedup_groups_sync": bench_dedup_groups_sync(spark, sf_dir),
            "ann_index_sync": bench_ann_index_sync(spark, sf_dir),
            "lexical_index_sync": bench_lexical_index_sync(spark,
                                                           sf_dir),
            "fused_lexical_sync": bench_fused_lexical_sync(spark,
                                                           sf_dir),
            "q1_decimal_probe": bench_q1_decimal_probe(spark, sf_dir),
            "boilerplate_guard": bench_boilerplate_guard(spark, sf_dir),
            "stream_boilerplate_guard":
                bench_stream_boilerplate_guard(spark, sf_dir),
            "stream_semantic_guard":
                bench_stream_semantic_guard(spark, sf_dir),
        }
        # round-over-round scale-ratio tracking (VERDICT r6 #5): the
        # 10×/30× adaptive-geometry claims (SCALING.md audit index) as
        # regression-tracked numbers at a bench-affordable 3×
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from bench_scale_queries import TARGETS, scale_ratio_rows
        extras["scale_ratios"] = scale_ratio_rows(
            spark, 3, sf_dir,
            targets=TARGETS + ["hybrid_dedup_keep",
                               # r11: the binary-ANN rung rides the
                               # embeddings blowup (brute-force scored
                               # pass — must stay linear)
                               "embedding_binary_ann"],
            reps=reps)
        # collapse-mode streaming-groups scale curve (VERDICT r9 #2):
        # the facade over the full documents corpus at 3× — the 10×
        # point is pinned standalone in SCALING.md
        from bench_stream_groups_scale import stream_groups_scale
        extras["stream_groups_scale"] = stream_groups_scale(
            spark, sf_dir, factor=3)
        doc["scale_ratio_violations"] = (
            extras["scale_ratios"].get("violations", [])
            if isinstance(extras["scale_ratios"], dict) else [])
        if not extras["stream_groups_scale"].get("within_bound", True):
            doc["scale_ratio_violations"].append("stream_groups_scale")
        if not extras["ann_index_sync"].get("within_bound", True):
            doc["scale_ratio_violations"].append("ann_index_sync")
        if not extras["lexical_index_sync"].get("within_bound", True):
            doc["scale_ratio_violations"].append("lexical_index_sync")
        print(json.dumps(extras, separators=(",", ":")))
    print(json.dumps(doc, separators=(",", ":")))


if __name__ == "__main__":
    main()
