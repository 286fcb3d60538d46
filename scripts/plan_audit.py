"""Regenerate the PLANS.md physical-plan table: run each audited query
at sf0.01, then count join/exchange/scan nodes in the AQE-final executed
plan.

Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from k8stream_spark.analytics import _cache  # noqa: E402
from k8stream_spark.session import get_spark  # noqa: E402

# A finalized (localCheckpoint-ed) output is an RDD scan — nothing to
# audit.  Flip the escape hatch so the finalize-using operators (kNN
# graphs, CMS, bigram LM, span removal, replayable semantic dedup)
# return their lazy plans; the clearCache() between queries releases
# the intermediates they leave persisted.
_cache.EAGER = False

AUDITED = [
    "p5_eligibility",
    "p6_l9event_projection",
    "d1_dedup_first_seen",
    "j1_enrich_involved_object",
    "j4_label_selector_join",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority_check",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q12_priority_by_flag",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q18_large_volume_customers",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_part_value",
    "q16_supplier_count",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "window_top_orders_per_customer",
    "events_sessionize",
    "events_rolling_stats",
    "events_asof_last_purchase",
    "events_funnel",
    "text_term_stats",
    "text_redact_pii",
    "text_rare_token_ratio",
    "text_top_terms",
    "text_repetition_metrics",
    "emb_quantize_int8",
    "docs_pack_chunks",
    "docs_pack_chunks_sharded",
    "docs_dataset_split",
    "emb_class_centroids",
    "docs_dedup_minhash_lsh",
    "emb_cosine_topk",
    "emb_cosine_near_dup_lsh",
    "mm_blob_meta",
    "mm_audio_features",
    "mm_image_decode",
    "docs_remove_boilerplate",
    "docs_c4_quality_filters",
    "docs_temperature_sample",
    "docs_global_shuffle",
    "text_ngram_novelty",
    "text_corpus_top_ngrams",
    "mm_resize_image",
    "docs_gopher_quality",
    "docs_token_length_histogram",
    "docs_chunk_overlap",
    "docs_dsir_importance",
    "events_retention_cohorts",
    "docs_shard_manifest",
    "emb_pq_encode",
    "emb_pq_adc_topk",
    "docs_split_leakage",
    "docs_quality_classifier",
    "emb_ivf_pq_topk",
    "docs_bm25_topk",
    "docs_hybrid_rrf",
    "docs_dedup_incremental",
    "events_window_range_counts",
    "events_salted_distinct_counts",
    "docs_source_lang_cube",
    "text_bpe_merge_pairs",
    "text_bigram_lm_score",
    "emb_random_projection",
    "emb_knn_graph_mutual",
    "emb_knn_graph_mutual_lsh",
    "text_cms_token_counts",
    "docs_remove_duplicate_spans",
    "docs_quality_yield_curve",
    "text_vocab_coverage",
    "emb_mean_center",
    "emb_standardize",
    "events_anomaly_zscore",
    # r8 surface
    "docs_semantic_dedup",
    "events_approx_user_counts",
    "events_value_quantiles_sketch",
    "docs_containment_pairs",
    "docs_containment_dedup",
    # r10 surface
    "docs_quality_yield_curve_approx",
    "docs_minhash_recall_report",
    "emb_adc_recall_report",
    "emb_ivfpq_recall_report",
    "emb_pca_covariance",
    "emb_pca_top_component",
    "emb_pca_project",
    "emb_pca_var_explained",
    "docs_snapshot_delta",
    "docs_reembed_worklist",
    "emb_pca_top2_components",
    "emb_pca_project2d",
    "docs_mixture_plan",
    "emb_maha_outliers",
    "emb_pca_by_label",
    "emb_pca_project_by_label",
]
# docs_dedup_clusters (and docs_cluster_keep_longest, which builds on
# it), emb_semantic_clusters, emb_semantic_clusters_lsh,
# docs_curation_pipeline, docs_containment_roots (r9) and
# text_bpe_apply (r10, driver-side merge-training loop) are iterative
# (driver-controlled fixpoint loop); a single executed plan doesn't
# describe them — see the connected_components / containment_roots
# docstrings instead.


def audit(df) -> dict[str, int]:
    # collect() executes THIS DataFrame's QueryExecution (count() would
    # build a separate one, leaving this plan's AQE non-finalized).
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # An executed AdaptiveSparkPlan prints the final plan followed by an
    # "== Initial Plan ==" section; count only the final one.
    plan = plan.split("== Initial Plan ==")[0]
    return {
        "shuffles": len(re.findall(r"Exchange hashpartitioning", plan)),
        # Global orderBy windows / global limits gather to ONE partition —
        # the honest scale flag for "this stage is sequential".
        "1p": len(re.findall(r"Exchange SinglePartition", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "topk": len(re.findall(r"TakeOrderedAndProject", plan)),
    }


# Hard scale assertions: these queries' safety rests on a Catalyst
# rewrite (global-window rank filter → distributed TakeOrderedAndProject,
# verified on Spark 4.1.2).  An innocent expression change could silently
# defeat the rewrite and re-introduce an O(customers) single-partition
# window — fail the audit loudly instead of letting PLANS.md drift.
ASSERT_TOPK_REWRITE = {
    "q10_returned_items",
    "q18_large_volume_customers",
    # orderBy().limit() must stay TakeOrderedAndProject (per-partition
    # heaps + merge), never a global sort of the n-gram table.
    "text_corpus_top_ngrams",
    # same contract over the char-pair table
    "text_bpe_merge_pairs",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    qs = entrymod.queries()
    print("| query | shuffles | 1p | bhj | smj | bnlj | scans | pushed |")
    print("|---|---|---|---|---|---|---|---|")
    failures: list[str] = []
    for name in AUDITED:
        counts = audit(qs[name](spark, sf_dir))
        spark.catalog.clearCache()
        print(
            f"| {name} | {counts['shuffles']} | {counts['1p']} | "
            f"{counts['bhj']} | {counts['smj']} | {counts['bnlj']} | "
            f"{counts['scans']} | {counts['pushed']} |"
        )
        if name in ASSERT_TOPK_REWRITE:
            if counts["1p"] != 0:
                failures.append(f"{name}: Exchange SinglePartition = {counts['1p']} (want 0)")
            if counts["topk"] == 0:
                failures.append(f"{name}: TakeOrderedAndProject rewrite did not fire")
    spark.stop()
    if failures:
        print("\nPLAN AUDIT FAILURES:")
        for f in failures:
            print(" -", f)
        sys.exit(1)


if __name__ == "__main__":
    main()
