"""Benchmark harness — prints ONE JSON line with headline query times.

Contract (driver): runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; output is
a single JSON line:
  {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (full execution,
no collection/driver materialization cost in the measurement).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import medallion_architecture_using_apache_iceberg_table_buckets_spark as mats
from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import (
    llm_queries as L,
    relational as R,
)

HEADLINE = {
    "q1_pricing_summary": R.q1_pricing_summary,
    "q3_shipping_priority": R.q3_shipping_priority,
    "q5_region_revenue": R.q5_region_revenue,
    "w1_latest_per_key": R.w1_latest_per_key,
    "o1_topk_latest": R.o1_topk_latest,
    "join_broadcast_brand_stats": R.join_broadcast_brand_stats,
    "agg_rollup_orders": R.agg_rollup_orders,
    "asof_click_purchase": R.asof_click_purchase,
    "events_daily_summary": R.events_daily_summary,
    "medallion_merge_state": R.medallion_merge_state,
    "dedup_minhash_lsh_pairs": L.dedup_minhash_lsh_pairs,
    "dedup_simhash_pairs": L.dedup_simhash_pairs,
    "ann_bruteforce_topk": L.ann_bruteforce_topk,
    "text_quality": L.text_quality,
    # round-3 additions: cover the newer machinery so regressions in
    # it show up in the per-round bench record
    "dedup_embedding_lsh_pairs": L.dedup_embedding_lsh_pairs,
    "string_distance_pairs": L.string_distance_pairs,
    "sql_dispatch_pipeline": L.sql_dispatch_pipeline,
    "sql_ctas_time_travel": L.sql_ctas_time_travel,
    "range_join_incidents": L.range_join_incidents,
    "text_top_ngrams": L.text_top_ngrams,
    # round-3 curation surface: group closure (iterative), quality
    # filter, TF-IDF, chunk+pack, z-order key
    "dedup_components": L.dedup_components,
    "text_quality_filter": L.text_quality_filter,
    "text_tfidf_topk": L.text_tfidf_topk,
    "pack_training_sequences": L.pack_training_sequences,
    "zorder_cluster_events": L.zorder_cluster_events,
    # round-3 TPC-H sweep + decontamination: the heaviest of the new
    # shapes (fact-fact late join, outer-join histogram, disjunctive
    # residual join, double-correlated semi/anti, 8-gram broadcast probe)
    "q12_late_lines_by_status": R.q12_late_lines_by_status,
    "q13_customer_order_distribution": R.q13_customer_order_distribution,
    "q19_disjunctive_predicates": R.q19_disjunctive_predicates,
    "q21_waiting_supplier": R.q21_waiting_supplier,
    "text_decontaminate": L.text_decontaminate,
    # round-4 fold-in: the rest of the registry's heavy/representative
    # tail, so a regression in any rotated-out query moves a recorded
    # number, not just an oracle. (Trivial scans and the streaming
    # drains — availableNow checkpoint setup dominates their time —
    # stay out; the oracle mirror covers them.)
    "q4_priority_late_exists": R.q4_priority_late_exists,
    "q6_forecast_revenue": R.q6_forecast_revenue,
    "q7_volume_shipping": R.q7_volume_shipping,
    "q8_market_share": R.q8_market_share,
    "q10_returned_items": R.q10_returned_items,
    "q14_promo_revenue_share": R.q14_promo_revenue_share,
    "q15_top_supplier": R.q15_top_supplier,
    "q17_small_quantity_revenue": R.q17_small_quantity_revenue,
    "q18_large_orders": R.q18_large_orders,
    "q22_dormant_customers": R.q22_dormant_customers,
    "join_semi_big_spenders": R.join_semi_big_spenders,
    "join_anti_never_ordered": R.join_anti_never_ordered,
    "agg_cube_status_priority": R.agg_cube_status_priority,
    "agg_percentiles": R.agg_percentiles,
    "dedup_exact_groups": L.dedup_exact_groups,
    "dedup_ngram_jaccard_pairs": L.dedup_ngram_jaccard_pairs,
    "dedup_embedding_pairs_brute": L.dedup_embedding_pairs_brute,
    "ann_lsh_topk": L.ann_lsh_topk,
    "ann_ivf_topk": L.ann_ivf_topk,
    "skew_salted_agg": L.skew_salted_agg,
    "medallion_gold_mart": L.medallion_gold_mart,
    "curation_end_to_end": L.curation_end_to_end,
    "sample_mixture_documents": L.sample_mixture_documents,
    "sketch_hll_rollup_merge": L.sketch_hll_rollup_merge,
    "sketch_quantiles": L.sketch_quantiles,
    # round-4 additions
    "text_repetition_scores": L.text_repetition_scores,
    "text_leakage_safe_split": L.text_leakage_safe_split,
    # round-5 additions: real image decode + ANN recall evidence
    "multimodal_decode_image": L.multimodal_decode_image,
    # NOTE: since r6 this trains all four ANN variants (LSH, IVF,
    # PQ, IVF-PQ) against the brute ground truth in one query —
    # ~12s at sf0.1 is four quantizer trainings' worth of QUALITY
    # evidence, not a hot-path regression (each variant's own
    # search-path time is its separate bench entry).
    "ann_recall_at_k": L.ann_recall_at_k,
    # round-5 TPC-H completion (derived-partsupp shapes) + PII scrub
    # + paragraph dedup
    "q2_min_cost_supplier": R.q2_min_cost_supplier,
    "q9_product_type_profit": R.q9_product_type_profit,
    "q11_important_part_value": R.q11_important_part_value,
    "q16_parts_supplier_counts": R.q16_parts_supplier_counts,
    "q20_promotable_suppliers": R.q20_promotable_suppliers,
    "text_pii_scrub": L.text_pii_scrub,
    "text_paragraph_dedup": L.text_paragraph_dedup,
    "text_token_rarity": L.text_token_rarity,
    "dedup_containment_pairs": L.dedup_containment_pairs,
    "dedup_incremental_probe": L.dedup_incremental_probe,
    "corpus_data_card": L.corpus_data_card,
    "multimodal_decode_audio": L.multimodal_decode_audio,
    "multimodal_decode_video": L.multimodal_decode_video,
    # round-5 late additions: theta set algebra, KLL rollup-merge,
    # branch-staged WAP, SemDeDup
    "sketch_theta_set_ops": L.sketch_theta_set_ops,
    "sketch_kll_rollup_quantiles": L.sketch_kll_rollup_quantiles,
    "sql_branch_wap": L.sql_branch_wap,
    "dedup_semantic": L.dedup_semantic,
    # round-5 final block: position deletes, SCD2 family, mixture
    # weights, bloom point lookups, changelog gold, sort-order
    # lineage, partition-spec evolution, BPE induction
    "position_delete_mor": L.position_delete_mor,
    "scd2_user_status_history": L.scd2_user_status_history,
    "scd2_temporal_enrich": L.scd2_temporal_enrich,
    "corpus_mixture_weights": L.corpus_mixture_weights,
    "bloom_point_lookup": L.bloom_point_lookup,
    "incremental_gold_rollup": L.incremental_gold_rollup,
    "write_ordered_lineage": L.write_ordered_lineage,
    "partition_evolution_scan": L.partition_evolution_scan,
    "bpe_vocab_merges": L.bpe_vocab_merges,
    "ann_pq_topk": L.ann_pq_topk,
    "type_promotion_scan": L.type_promotion_scan,
    "cdc_changelog_diff": L.cdc_changelog_diff,
    "mor_update_positions": L.mor_update_positions,
    "incremental_join_view": L.incremental_join_view,
    "text_repeated_spans": L.text_repeated_spans,
    "range_join_event_windows": R.range_join_event_windows,
    "table_quality_checks": R.table_quality_checks,
    "sketch_cms_frequencies": L.sketch_cms_frequencies,
    # round-6 additions: real PNG decode (zlib inflate + unfilter),
    # bigram-LM surprisal scoring, composed IVF-PQ search
    "multimodal_decode_png": L.multimodal_decode_png,
    "text_ngram_lm_score": L.text_ngram_lm_score,
    "ann_ivfpq_topk": L.ann_ivfpq_topk,
    "multimodal_resize_pixels": L.multimodal_resize_pixels,
    "text_bm25_topk": L.text_bm25_topk,
    "bpe_encode_tokens": L.bpe_encode_tokens,
    "sample_weighted_by_source": L.sample_weighted_by_source,
    # round-7 additions: hybrid BM25+IVFPQ reciprocal-rank fusion,
    # residual-encoded IVF-PQ, real baseline JPEG codec
    "hybrid_bm25_ann_topk": L.hybrid_bm25_ann_topk,
    "ann_ivfpq_residual_topk": L.ann_ivfpq_residual_topk,
    "multimodal_decode_jpeg": L.multimodal_decode_jpeg,
    "ann_ivfsq_topk": L.ann_ivfsq_topk,
    "curation_ccnet_buckets": L.curation_ccnet_buckets,
    "decontaminate_semantic": L.decontaminate_semantic,
    "multimodal_audio_features": L.multimodal_audio_features,
    "multimodal_video_motion": L.multimodal_video_motion,
    "sample_epoch_shuffle": L.sample_epoch_shuffle,
    "tokenizer_unigram_vocab": L.tokenizer_unigram_vocab,
    "tokenizer_unigram_encode": L.tokenizer_unigram_encode,
    "tokenizer_wordpiece_vocab": L.tokenizer_wordpiece_vocab,
    "tokenizer_wordpiece_encode": L.tokenizer_wordpiece_encode,
    "sample_doremi_mixture": L.sample_doremi_mixture,
    "curation_nb_classifier": L.curation_nb_classifier,
    "text_cdc_chunks": L.text_cdc_chunks,
    "dedup_cdc_chunk_pairs": L.dedup_cdc_chunk_pairs,
    "dedup_keep_best_quality": L.dedup_keep_best_quality,
    "metadata_agg_pushdown": L.metadata_agg_pushdown,
    # round-8 additions: MOR-count manifest fold, paletted PNG decode
    "metadata_agg_mor_count": L.metadata_agg_mor_count,
    "multimodal_decode_png_palette": L.multimodal_decode_png_palette,
    "text_sparse_retrieval_topk": L.text_sparse_retrieval_topk,
    "sample_dsir_selection": L.sample_dsir_selection,
    "text_kn_lm_score": L.text_kn_lm_score,
    "multimodal_decode_gif": L.multimodal_decode_gif,
    "multimodal_decode_mulaw": L.multimodal_decode_mulaw,
    "text_phrase_retrieval": L.text_phrase_retrieval,
    "metadata_ndv_sketch": L.metadata_ndv_sketch,
    "maintenance_rewrite_posdeletes": L.maintenance_rewrite_posdeletes,
    "events_funnel": R.events_funnel,
    "events_cohort_retention": R.events_cohort_retention,
    "sample_temperature_mixture": L.sample_temperature_mixture,
    "graph_pagerank_dedup": L.graph_pagerank_dedup,
    "ann_matryoshka_recall": L.ann_matryoshka_recall,
    "ann_index_health": L.ann_index_health,
    "text_langid_confusion": L.text_langid_confusion,
    "dedup_source_matrix": L.dedup_source_matrix,
    # round-9 additions: ExactSubstr verbatim dedup, Adam7 PNG,
    # winnowing (MOSS) fingerprints + pairs, encoding screen, robust
    # outliers, reservoir sampling, novelty, cluster histogram,
    # cosine range search, attribution, funnel latency, Heaps curve,
    # channel stats, LTV deciles, SQL views
    "dedup_exact_substr_pairs": L.dedup_exact_substr_pairs,
    "multimodal_decode_png_interlaced": L.multimodal_decode_png_interlaced,
    "text_winnowing_fingerprints": L.text_winnowing_fingerprints,
    "text_mojibake_score": L.text_mojibake_score,
    "text_length_outliers": L.text_length_outliers,
    "sample_reservoir_source": L.sample_reservoir_source,
    "dedup_ngram_novelty": L.dedup_ngram_novelty,
    "dedup_cluster_size_histogram": L.dedup_cluster_size_histogram,
    "ann_range_search": L.ann_range_search,
    "events_attribution": R.events_attribution,
    "events_funnel_latency": R.events_funnel_latency,
    "dedup_winnowing_pairs": L.dedup_winnowing_pairs,
    "corpus_heaps_law": L.corpus_heaps_law,
    "multimodal_channel_stats": L.multimodal_channel_stats,
    "events_user_ltv_deciles": R.events_user_ltv_deciles,
    "sql_view_dispatch": L.sql_view_dispatch,
    "dedup_exact_substr_removal": L.dedup_exact_substr_removal,
    "multimodal_decode_png16": L.multimodal_decode_png16,
    "multimodal_decode_png_sub8": L.multimodal_decode_png_sub8,
    # round-10 additions: within-doc ExactSubstr unified removal,
    # winnowing pairs closed to components, interlaced GIF decode,
    # plus three previously-unbenched non-trivial entries folded in
    # (the r9 verdict's bench-coverage audit)
    "dedup_exact_substr_self": L.dedup_exact_substr_self,
    "dedup_winnowing_components": L.dedup_winnowing_components,
    "multimodal_decode_gif_interlaced": L.multimodal_decode_gif_interlaced,
    "sessionize_events": R.sessionize_events,
    "mor_merge_compact": L.mor_merge_compact,
    "maintenance_procedures": L.maintenance_procedures,
    "retrieval_hard_negatives": L.retrieval_hard_negatives,
    "dedup_prefix_filter_pairs": L.dedup_prefix_filter_pairs,
    "dedup_exact_substr_apply": L.dedup_exact_substr_apply,
    "graph_triangle_count": L.graph_triangle_count,
    "text_feature_hashing": L.text_feature_hashing,
    "dedup_lsh_recall": L.dedup_lsh_recall,
    "multimodal_decode_qoi": L.multimodal_decode_qoi,
    "source_webdataset_roundtrip": L.source_webdataset_roundtrip,
    "embedding_gram_matrix": L.embedding_gram_matrix,
    "events_markov_transitions": R.events_markov_transitions,
    "dedup_minhash_estimator_error": L.dedup_minhash_estimator_error,
    "text_source_divergence": L.text_source_divergence,
    "multimodal_transcode_qoi": L.multimodal_transcode_qoi,
    "corpus_token_budget": L.corpus_token_budget,
    # round-10 third window: association mining, robust anomaly
    # screen, governance audits, and the three new codec families
    "events_basket_lift": R.events_basket_lift,
    "events_rfm_segments": R.events_rfm_segments,
    "events_rolling_mad_anomaly": R.events_rolling_mad_anomaly,
    "events_user_diversity": R.events_user_diversity,
    "events_kanonymity": R.events_kanonymity,
    "dedup_split_leakage": L.dedup_split_leakage,
    "multimodal_decode_adpcm": L.multimodal_decode_adpcm,
    "multimodal_decode_tiff": L.multimodal_decode_tiff,
    "multimodal_decode_tga": L.multimodal_decode_tga,
    "events_churn_hazard": R.events_churn_hazard,
    "graph_kcore_dedup": L.graph_kcore_dedup,
    "dedup_image_phash_pairs": L.dedup_image_phash_pairs,
    "dedup_image_phash_components": L.dedup_image_phash_components,
    "text_segment_ttr": L.text_segment_ttr,
    # round-11 additions: incremental IVF index maintenance (new-batch
    # assignment to stale centroids + full-corpus drift audit) and
    # incremental dup-group components (supernode contraction)
    "ann_incremental_ivf_append": L.ann_incremental_ivf_append,
    "dedup_incremental_components": L.dedup_incremental_components,
    # round-12 additions: the sampled-history staleness audit (the
    # O(|hist|/m + |batch|) configuration a scheduled maintenance job
    # runs — benched next to the exact audit so the saving is a
    # recorded number, not a docstring claim) and the delta output
    # contract (only changed+new labels, the MERGE-able upsert set —
    # benched next to the full-rewrite mode for the same reason)
    "ann_incremental_ivf_sampled": L.ann_incremental_ivf_sampled,
    "dedup_incremental_delta": L.dedup_incremental_delta,
    # the statistics members of the incremental family: stored
    # gram-count table merged by one batch-only pass, and the
    # maintained per-slice data card (touched-slices-only upsert)
    "lm_incremental_gram_update": L.lm_incremental_gram_update,
    "card_incremental_update": L.card_incremental_update,
    # the retrieval member: BM25 answered from the maintained
    # (appended per-doc index + additively merged stats) artifacts
    "retrieval_incremental_bm25": L.retrieval_incremental_bm25,
    # LASER-style margin-based bitext mining: one probe-shard
    # broadcast scan, two neighborhood windows, exact-integer margins
    "mine_bitext_margin": L.mine_bitext_margin,
}

# Registry entries deliberately NOT benched, each with its reason (the
# no-silent-caps rule: the bench record carries this list verbatim so
# coverage is auditable). Classes:
#   trivial    — single-scan / scalar-expression / one-window shapes
#                whose cost is a strict subset of a benched query;
#                `sibling` names the benched query that covers the
#                machinery.
#   streaming  — availableNow checkpoint setup dominates wall time;
#                measuring it benchmarks the checkpoint dir, not the
#                operator (oracle mirror + streaming suites cover
#                correctness; micro-latency is not a batch-bench fit).
EXCLUDED_REASONS = {
    "a1_count_star": ("trivial", "q1_pricing_summary"),
    "s1_scan_filter_project": ("trivial", "q1_pricing_summary"),
    "f3_derive_partition_date": ("trivial", "events_daily_summary"),
    "scalar_string_math": ("trivial", "q1_pricing_summary"),
    "date_arithmetic": ("trivial", "q1_pricing_summary"),
    "array_map_funcs": ("trivial", "text_quality"),
    "json_extract_events": ("trivial", "events_daily_summary"),
    "subquery_max_order": ("trivial", "q15_top_supplier"),
    "set_union_segments": ("trivial", "join_semi_big_spenders"),
    "set_intersect_building_buyers": ("trivial", "join_semi_big_spenders"),
    "set_except_nonbuyers": ("trivial", "join_anti_never_ordered"),
    "window_running_totals": ("trivial", "w1_latest_per_key"),
    "window_moving_avg": ("trivial", "w1_latest_per_key"),
    "window_rank_functions": ("trivial", "w1_latest_per_key"),
    "agg_collect_sorted": ("trivial", "agg_rollup_orders"),
    "agg_distinct_customers": ("trivial", "agg_rollup_orders"),
    "agg_grouping_sets": ("trivial", "agg_cube_status_priority"),
    "pivot_event_counts": ("trivial", "events_daily_summary"),
    "join_full_outer_spend": ("trivial", "join_semi_big_spenders"),
    "catalog_history_metadata": ("trivial", "sql_ctas_time_travel"),
    "incremental_scan_changelog": ("trivial", "cdc_changelog_diff"),
    "schema_evolution_sql": ("trivial", "sql_ctas_time_travel"),
    "multimodal_meta": ("trivial", "multimodal_decode_image"),
    "multimodal_frames": ("trivial", "multimodal_decode_video"),
    "multimodal_resize": ("trivial", "multimodal_resize_pixels"),
    "multimodal_embed_dims": ("trivial", "ann_bruteforce_topk"),
    "text_fingerprint": ("trivial", "text_quality"),
    "text_langid": ("trivial", "text_langid_confusion"),
    "text_token_counts": ("trivial", "text_quality"),
    "text_chunk_windows": ("trivial", "text_cdc_chunks"),
    "text_chunk_texts": ("trivial", "pack_training_sequences"),
    "text_boilerplate_ngrams": ("trivial", "text_top_ngrams"),
    "text_quality_percentile_cut": ("trivial", "text_quality_filter"),
    "sample_hash_events": ("trivial", "sample_mixture_documents"),
    "sample_stratified_events": ("trivial", "sample_mixture_documents"),
    "dedup_keep_list": ("trivial", "dedup_components"),
    "dedup_normalized_groups": ("trivial", "dedup_exact_groups"),
    "sketch_hll_distinct": ("trivial", "sketch_hll_rollup_merge"),
    "streaming_windowed_counts": ("streaming", None),
    "streaming_topk_trending": ("streaming", None),
    "streaming_sessionize": ("streaming", None),
    "streaming_dedup": ("streaming", None),
    "streaming_interval_join": ("streaming", None),
    "streaming_static_enrich": ("streaming", None),
    "streaming_incremental_grams": ("streaming", None),
}

# the 14 queries recorded since round 1 — their sum is the anchored
# baseline comparison (BASELINE.md: r01 = 20.605s at sf0.1)
R01_SUBSET = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "w1_latest_per_key", "o1_topk_latest", "join_broadcast_brand_stats",
    "agg_rollup_orders", "asof_click_purchase", "events_daily_summary",
    "medallion_merge_state", "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs", "ann_bruteforce_topk", "text_quality",
]


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


# Per-query session overrides: the TPC-H-shape scans read one ~10 MB
# parquet file each — an 8 MB split parallelizes the scan across local
# cores (halves q1/q3/q5 measured warm), while the default 128 MB stays
# right for every other query (and for real TB-scale inputs).
QUERY_CONF = {
    "q1_pricing_summary": {"spark.sql.files.maxPartitionBytes": "8m"},
    "q3_shipping_priority": {"spark.sql.files.maxPartitionBytes": "8m"},
    "q5_region_revenue": {"spark.sql.files.maxPartitionBytes": "8m"},
    "join_broadcast_brand_stats": {"spark.sql.files.maxPartitionBytes": "8m"},
    # The two heaviest ANN trainings plan ~70-285 TINY exchanges
    # (codebook/LUT/probe broadcasts, quantized aggregates with
    # predictable uniform-key sizes). AQE materializes each as its
    # own job — pure per-job scheduling latency on this shape, with
    # nothing for AQE to re-plan (no skew, no surprise sizes).
    # Measured at sf0.1: ann_recall_at_k 100 jobs/21s -> 28 jobs/15s;
    # ann_ivfpq_residual_topk 73 jobs/12.3s -> 20 jobs/8.3s. The
    # other ANN queries keep AQE (neutral or better there).
    "ann_recall_at_k": {"spark.sql.adaptive.enabled": "false"},
    "ann_ivfpq_residual_topk": {"spark.sql.adaptive.enabled": "false"},
}


def audited_exclusions() -> dict:
    """Cross-check HEADLINE against the live registry: every registry
    entry is either benched or carries an explicit reason in
    EXCLUDED_REASONS — a new query landing in __spark_entry__ without
    a bench decision fails the bench run loudly instead of silently
    shrinking coverage. Returns {name: 'class:sibling-or-'} for the
    record."""
    import __spark_entry__ as entrymod

    registry = set(entrymod.queries())
    benched = set(HEADLINE)
    unbenched = registry - benched
    undocumented = sorted(unbenched - set(EXCLUDED_REASONS))
    stale = sorted(set(EXCLUDED_REASONS) - unbenched)
    if undocumented:
        raise SystemExit(
            f"bench coverage gap: {undocumented} are in the registry "
            "but neither benched nor excluded-with-reason"
        )
    if stale:
        raise SystemExit(
            f"stale EXCLUDED_REASONS entries (now benched or gone): {stale}"
        )
    return {
        name: f"{cls}:{sib}" if sib else cls
        for name, (cls, sib) in sorted(EXCLUDED_REASONS.items())
    }


def sample_excluded(spark, sf_dir: str) -> dict:
    """Empirically validate a rotating ~10 of the EXCLUDED_REASONS
    entries each round (r10 verdict item 5): one timed end-to-end run
    apiece, so every exclusion class carries measured evidence (a
    'trivial' entry should cost a fraction of its benched sibling; a
    'streaming' entry's time is checkpoint setup, not operator work).
    The rotation chunk defaults to the count of committed BENCH_r
    records (one per round) so successive rounds sample successive
    chunks without manual state; override with
    $SPARK_GRAFT_EXCL_CHUNK."""
    import glob

    import __spark_entry__ as entrymod

    registry = entrymod.queries()
    names = sorted(EXCLUDED_REASONS)
    here = os.path.dirname(os.path.abspath(__file__))
    default_chunk = len(glob.glob(os.path.join(here, "BENCH_r[0-9][0-9].json")))
    chunk = int(os.environ.get("SPARK_GRAFT_EXCL_CHUNK", default_chunk))
    n_chunks = max(1, (len(names) + 9) // 10)
    start = (chunk % n_chunks) * 10
    sampled = names[start : start + 10]
    # every round additionally samples ONE rotating `streaming`-class
    # exclusion (r11 verdict item 4): the class rationale ("the
    # AvailableNow drain's time is checkpoint setup, not operator
    # work") gets measured evidence each round, exactly like the
    # trivial class — not only when the alphabetical chunk happens to
    # reach the streaming_* block
    streaming = [n for n in names if EXCLUDED_REASONS[n][0] == "streaming"]
    if streaming and not any(n in streaming for n in sampled):
        sampled = sampled + [streaming[chunk % len(streaming)]]
    out = {}
    for name in sampled:
        cls, sib = EXCLUDED_REASONS[name]
        # cold-ish sample, matching the headline protocol: persisted
        # intermediates left by earlier headline runs (cents/assigned/
        # brute shortlists) must not deflate the sampled time
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        force(registry[name](spark, sf_dir))
        out[name] = {
            "sec": round(time.perf_counter() - t0, 3),
            "class": f"{cls}:{sib}" if sib else cls,
        }
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # Note on split sizing: 4 MB maxPartitionBytes parallelizes the
    # single-file sf0.1 scans and speeds up warmed-up Q1 ~2x in
    # isolation, but measured end-to-end across the whole suite the
    # extra task-scheduling overhead costs more than it saves
    # (25.4s -> 27-29s total), so the default split size stays.
    # retainedJobs raised so the status tracker can still answer
    # getJobIdsForGroup for the FIRST queries after ~120 queries x 3
    # runs have executed (default retention is 1000 jobs)
    spark = mats.get_spark(
        app_name="mats-bench",
        extra_conf={"spark.ui.retainedJobs": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JIT/codegen + file listing + whole-stage-codegen compile
    # for an agg-shaped plan, not measured
    force(R.a1_count_star(spark, sf_dir))
    force(R.q1_pricing_summary(spark, sf_dir))

    # environment probe recorded WITH the numbers: median wall time of
    # a trivial 1-partition SQL count job. A healthy local-mode JVM
    # schedules this in ~10-30 ms; this box has been observed at
    # 50-150 ms (PLANS.md bench-environment note), which inflates
    # every stage/job-count-heavy query by (jobs x this latency)
    # while leaving data-path queries untouched — read cross-round
    # per-query deltas against this number.
    probes = []
    for _ in range(9):
        t0 = time.perf_counter()
        spark.range(0, 1, 1, 1).count()
        probes.append(time.perf_counter() - t0)
    sched_probe_ms = round(sorted(probes)[len(probes) // 2] * 1000, 1)

    times: dict[str, float] = {}
    spreads: dict[str, float] = {}
    n_jobs: dict[str, int] = {}
    sc = spark.sparkContext
    for name, fn in HEADLINE.items():
        overrides = QUERY_CONF.get(name, {})
        saved = {k: spark.conf.get(k) for k in overrides}
        for k, v in overrides.items():
            spark.conf.set(k, v)
        try:
            # min of three runs: steady-state time, robust to
            # background load spikes on a shared box (single runs
            # varied +/-20%, ~+/-1.5s on the suite total).
            # clearCache between runs so operators that persist
            # intermediates don't get a free warm-cache second run.
            runs, run_jobs = [], []
            for i in range(3):
                spark.catalog.clearCache()
                # one job group per run: the status tracker then
                # yields this run's Spark JOB COUNT, so cross-round
                # per-query deltas can be corrected to
                # wall - n_jobs x sched_probe (scheduler-latency
                # adjudication by arithmetic, not argument). Jobs
                # launched from OTHER threads (streaming drains)
                # don't inherit the group and undercount — none of
                # the headline queries are streaming.
                group = f"{name}#run{i}"
                sc.setJobGroup(group, name)
                t0 = time.perf_counter()
                force(fn(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
                run_jobs.append(
                    len(sc.statusTracker().getJobIdsForGroup(group))
                )
            best = min(range(len(runs)), key=runs.__getitem__)
            times[name] = round(runs[best], 3)
            spreads[name] = round(max(runs) - min(runs), 3)
            n_jobs[name] = run_jobs[best]
        finally:
            sc.setJobGroup("", "")
            for k, v in saved.items():
                spark.conf.set(k, v)

    total = round(sum(times.values()), 3)
    # anchored comparison: same 14 queries recorded every round
    # since r01 (BASELINE.md) — compare THIS against 20.605
    r01_subset = round(sum(times[q] for q in R01_SUBSET if q in times), 3)
    # protocol: per-query min of 3 cache-cleared runs; spread =
    # max-min observed, so round-over-round diffs smaller than the
    # spread are box noise, not regressions
    spread = round(sum(spreads.values()), 3)

    # Truncation-proofing (BENCH_r04 lost its headline `value` when the
    # 57-query line outgrew the driver's tail-capture window, which keeps
    # line ENDS): (a) the big per-query dicts come FIRST in the full
    # record so the headline scalars sit at the tail-survivable end, and
    # (b) a compact summary record is printed LAST so at least one fully
    # parseable JSON line always survives any front-truncation.
    excluded_sampled = sample_excluded(spark, sf_dir)

    full = {
        "metric": "headline_queries_total",
        "unit": "sec",
        "sf": sf,
        "protocol": "min-of-3, clearCache between runs",
        "excluded": audited_exclusions(),
        "queries": times,
        "query_spread": spreads,
        "query_n_jobs": n_jobs,
        "excluded_sampled": excluded_sampled,
        "value_r01_subset": r01_subset,
        "spread": spread,
        "sched_probe_ms": sched_probe_ms,
        "value": total,
    }
    print(json.dumps(full))
    # Capture-safe per-query record (r12 verdict item 1): the driver's
    # tail capture keeps only the last few KB of output, so the big
    # single-line `full` record above loses its per-query map to
    # front-truncation. Re-emit the SAME per-query seconds as chunked
    # JSON lines (each < 1 KB, independently parseable, additive — the
    # full record and the compact summary are unchanged), ordered by
    # ASCENDING cost so the most expensive queries sit in the LAST
    # chunks, nearest the guaranteed-surviving end of the stream:
    # whatever suffix of the output survives the driver's window
    # always covers the heaviest (comparison-relevant) queries.
    chunk_items = sorted(times.items(), key=lambda kv: (kv[1], kv[0]))
    chunks: list[dict] = []
    cur: dict[str, float] = {}
    for qname, qsec in chunk_items:
        cur[qname] = qsec
        if len(json.dumps({"queries": cur})) > 820:
            chunks.append(cur)
            cur = {}
    if cur:
        chunks.append(cur)
    for i, ch in enumerate(chunks):
        print(json.dumps({
            "metric": "headline_queries_chunk",
            "part": i + 1,
            "parts": len(chunks),
            "sf": sf,
            "queries": ch,
        }))
    # the compact record prints LAST so it survives any
    # front-truncation of the driver's tail capture — it carries the
    # r01-anchored per-query seconds (r10 verdict item 6) so
    # cross-round per-query comparisons never depend on the big
    # first line surviving
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "value_r01_subset": r01_subset,
        "queries_r01_subset": {
            q: times[q] for q in R01_SUBSET if q in times
        },
        "spread": spread,
        "sched_probe_ms": sched_probe_ms,
        "n_queries": len(times),
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
