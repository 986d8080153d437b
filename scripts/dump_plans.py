"""Regenerate PLANS.md: the executed physical plan of every bench
headline query at the bench scale factor — the auditable artifact behind
SCALING.md's plan-shape claims. Usage::

    python scripts/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from python_cdc_component_spark.session import get_spark          # noqa: E402
from python_cdc_component_spark.queries import QUERIES            # noqa: E402
from python_cdc_component_spark.plans.explain import plan_summary  # noqa: E402
from bench import HEADLINE                                        # noqa: E402


# plan-audited but not timed in the headline suite (operator evidence:
# bucketed similarity join, map-only sampling, broadcast anti-join)
AUDIT_EXTRA = ["embedding_dup_pairs", "stratified_sample_docs",
               "decontaminate_train_docs",
               # round-2 additions: watermark snapshot merge + the two
               # heaviest TPC-H joins
               "incremental_snapshot_users", "q7_nation_volume",
               "q21_late_supplier_blame", "q18_large_volume_customers",
               # round-2 continuation: training-pipeline batch 3 + TPC-H
               # fill-in + the event-time interval join
               "pii_redact", "unigram_perplexity",
               "interval_join_clicks_buys", "q10_returned_items",
               "q14_promo_revenue", "q19_discounted_revenue",
               # corpus analytics + sketches + ANN evaluation
               "quality_weighted_sample", "source_overlap_matrix",
               "countmin_heavy_hitters", "embedding_ann_recall",
               "profile_orders",
               # round-4: format/bucketing surface (the bucketed join's
               # Exchange-free plan is the headline exhibit) + the
               # snapshot-mode lifecycle entry
               "bucketed_join_revenue", "grouped_agg_pandas_median",
               "orc_roundtrip_events",
               # round-4: the Postgres-envelope dedup flavor (k-means +
               # SemDeDup joined HEADLINE in round 4)
               "cdc_pg_dedup_latest",
               # round-5: quality cascade, int8 ANN, BPE encode,
               # text-analysis batch, DSIR + CCNet buckets
               "quality_filter_chain", "gopher_quality_filter",
               "embedding_int8_ann_recall", "bpe_encode_tokens",
               "repetition_stats", "char_entropy_quality",
               "doc_chunk_split", "dsir_select_docs",
               "ccnet_ppl_buckets", "variant_shred_events",
               "exact_substr_spans", "khop_dup_neighbors",
               "event_funnel_stages", "corpus_audit_by_source",
               "xml_roundtrip_events",
               # round-5 session 3: TPC-H completion + curation staples
               "q11_important_stock", "q16_parts_supplier_relationship",
               "q20_potential_promotion", "dup_components",
               "kcenter_diverse_select", "cdc_time_travel",
               "cohort_retention", "events_anomaly_zscore",
               "leakage_safe_split", "topk_sample_per_group",
               "text_normalize", "gdpr_forget_keys",
               # round-5 session 4/5: k-NN join, classifier, zorder,
               # drift monitor, winsorize, temperature mix, PMI
               "knn_join_ivf", "quality_classifier_score",
               "zorder_layout_stats", "vocab_drift_jsd",
               "winsorize_values", "temperature_mix_weights",
               "pmi_collocations", "cohort_retention",
               # session-5 late batch: LATERAL SQL surface + event
               # path analytics
               "lateral_topk_per_customer", "event_transition_matrix",
               "funnel_time_to_convert",
               # session-5 block 2: curation + feature assembly
               "multi_eval_decontaminate", "fuzzy_eval_decontaminate",
               "semantic_eval_decontaminate", "quality_keep_calibrated",
               # round-10 continuation: filtered vector search (the
               # scan-pushed label predicate is the exhibit) +
               # hard-negative mining + vector-index erasure
               "embedding_filtered_ann", "contrastive_hard_negatives",
               "ann_index_forget_probe", "cdc_ann_index_sync",
               "semantic_groups_stream", "cdc_semantic_groups_sync",
               "doremi_mix_weights", "user_feature_export",
               "doc_feature_join", "hll_distinct_contract",
               # round-6: operator-extracted scale paths under their
               # oracle pins
               "knn_join_kmeans", "embedding_hyperplane_lsh_pairs",
               "dup_canonical_best", "containment_dup_pairs",
               # round-7: single-entry hybrid dedup (LSH → verify →
               # components → keep; the no-full-corpus-join exhibit),
               # its streaming-shaped twin, and the fused curation
               # pipeline cascade
               "hybrid_dedup_keep", "lsh_incremental_verified_pairs",
               "curation_pipeline_keep",
               # round-11: blocked record linkage (inequality inside
               # the join condition), the binary/Matryoshka ANN rungs
               # (one scored pass, two windows on one partitioning),
               # integer-domain margin mining, and the retrained-probe
               # lifecycle exhibit
               "entity_match_customers", "embedding_binary_ann",
               "embedding_matryoshka_recall", "bitext_mine_margin",
               "ann_index_retrain_probe",
               # round-11 second wave: hybrid retrieval (BM25's
               # map-only tf pass + one broadcast stats row +
               # TakeOrderedAndProject; RRF's two-ranking single pass)
               "bm25_topk_docs", "rrf_hybrid_search",
               # round-12: positional phrase/proximity search (the
               # zero-shuffle map-only + TakeOrderedAndProject exhibit)
               # and the CDC-fed lexical-index probe
               "phrase_proximity_search", "lexical_index_bm25_sync",
               "lexical_index_phrase_sync",
               # round-13: index-fed proximity + the fused-drain
               # hybrid RRF probe (both serve from maintained side
               # state; plans print as ExistingRDD past the
               # localCheckpoint boundary — audited at source)
               "lexical_index_near_sync", "hybrid_index_rrf_sync"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("plans")
    out = ["# PLANS — executed physical plans of the bench headline suite",
           "",
           f"Generated by `scripts/dump_plans.py` at `{sf_dir}`. "
           "Summary counts use `plans/explain.py` (shuffles exclude "
           "broadcast exchanges).", ""]
    seen: set[str] = set()
    for name in HEADLINE + AUDIT_EXTRA:
        if name in seen:
            continue
        seen.add(name)
        df = QUERIES[name](spark, sf_dir)
        s = plan_summary(df)
        out.append(f"## {name}")
        out.append("")
        line = (f"shuffles={s.shuffles} broadcasts={s.broadcasts} "
                f"sorts={s.sorts} scans={s.scans}")
        if (s.uniq_shuffles, s.uniq_scans) != (s.shuffles, s.scans):
            # cached subtrees print under every consumer; the executed
            # (distinct-node) counts are what actually runs
            line += (f" | executed: shuffles={s.uniq_shuffles} "
                     f"sorts={s.uniq_sorts} scans={s.uniq_scans}")
        out.append(line)
        out.append("")
        out.append("```")
        out.append(s.text.rstrip())
        out.append("```")
        out.append("")
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote PLANS.md ({len(seen)} plans)")


if __name__ == "__main__":
    main()
