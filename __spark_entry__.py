"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001. ``queries()``
exposes one callable per implemented operator (SURVEY.md §2 plus the
LLM-pipeline extension surface); ``oracle_sql()`` gives each one a
DuckDB-equivalent ANSI SQL twin over the same parquet tables.

Column-name and value-determinism rules are documented in
medallion_architecture_using_apache_iceberg_table_buckets_spark/operators/relational.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import (  # noqa: E402
    llm_queries as L,
    relational as R,
)

_MONEY = "round(CAST(sum(CAST({x} AS DECIMAL(18,4))) AS DOUBLE), 2)"

# Decimal-first revenue: cast each 2-decimal factor to a narrow decimal
# BEFORE multiplying so the product is exact in both engines (twin of
# relational._revenue). Casting the double *product* rounds per-row,
# where Spark (HALF_UP) and DuckDB (nearest-even) can disagree.
_REV = ("CAST(l_extendedprice AS DECIMAL(12,2))"
        " * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(4,2)))")
_CHARGE = _REV + " * (CAST(1 AS DECIMAL(2,0)) + CAST(l_tax AS DECIMAL(4,2)))"


def _money(x: str) -> str:
    return _MONEY.format(x=x)


def _money_exact(expr: str) -> str:
    """Sum of an already-exact decimal expression -> double, 2dp."""
    return f"round(CAST(sum({expr}) AS DOUBLE), 2)"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: multi-join revenue rollup (TPC-H Q5 shape)."""
    return R.q5_region_revenue(spark, "/root/testdata/sf0.001")


#: the driver's ~50-entry correctness sample for round 13 — see the
#: ordering NOTE in queries(). Touched-this-optimization-window
#: queries first, then the r12-window coverage gaps, then the
#: r08-vintage rotation backlog.
_R13_WINDOW = [
    "ann_pq_topk", "ann_ivfpq_topk", "ann_ivfpq_residual_topk",
    "ann_recall_at_k", "hybrid_bm25_ann_topk",
    "retrieval_hard_negatives", "dedup_image_phash_pairs",
    "dedup_image_phash_components", "curation_end_to_end",
    "ann_incremental_ivf_append", "ann_incremental_ivf_sampled",
    "dedup_exact_substr_pairs", "dedup_exact_substr_removal",
    "dedup_exact_substr_self", "dedup_exact_substr_apply",
    "bpe_vocab_merges", "bpe_encode_tokens",
    "tokenizer_wordpiece_vocab", "tokenizer_wordpiece_encode",
    "dedup_semantic", "multimodal_decode_jpeg",
    "dedup_incremental_components",
    "multimodal_decode_gif", "multimodal_decode_mulaw",
    "text_phrase_retrieval", "sketch_theta_set_ops",
    "sketch_kll_rollup_quantiles", "sql_branch_wap",
    "position_delete_mor", "scd2_user_status_history",
    "corpus_mixture_weights", "bloom_point_lookup",
    "incremental_gold_rollup", "write_ordered_lineage",
    "partition_evolution_scan", "scd2_temporal_enrich",
    "type_promotion_scan", "cdc_changelog_diff",
    "mor_update_positions", "incremental_join_view",
    "text_repeated_spans", "range_join_event_windows",
    "table_quality_checks", "sketch_cms_frequencies",
    "text_quality_percentile_cut", "window_rank_functions",
    "text_boilerplate_ngrams", "agg_grouping_sets",
    "q12_late_lines_by_status", "pack_training_sequences",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NOTE on ordering: the driver's correctness gate samples a bounded
    # prefix of this registry (~50 rows per round). Each round a fresh
    # slice rotates into positions 1-50 so every entry earns a driver
    # row on recent code; rotated-out entries stay covered by the full
    # local mirror (tools/check_oracles.py) and pytest.
    base = {
        # r12 window (positions 1-50), per the r11 verdict item 1 —
        # this finishes the rotation backlog for good:
        #   1-7   = the seven entries with no driver row yet: the
        #           three r12 additions (streaming gram maintenance,
        #           margin bitext mining, incremental-index BM25) and
        #           the four added after the r11 driver ran (sampled
        #           IVF staleness audit, delta-output incremental
        #           components, LM gram-count merge, data-card slice
        #           upsert);
        #   8-45  = ALL 38 remaining r07-vintage entries in tail
        #           order (decontaminate_semantic ..
        #           join_broadcast_brand_stats) — after this round no
        #           entry's latest driver row is older than r08;
        #   46-50 = the 5 oldest r08-vintage entries
        #           (metadata_agg_mor_count .. text_kn_lm_score).
        #
        # r13 window: realized by _R13_WINDOW below (the dict here
        # keeps its r12 order; the prefix is rebuilt at return time).
        # Per the r12 verdict item 7, the optimization round's touched
        # queries come FIRST so every r12/r13 optimization claim gets
        # a driver-oracle row on current code (the PQ family, recall,
        # hybrid/hard-negatives, phash pair/components, curation,
        # incremental IVF, ExactSubstr, the tokenizers, plus
        # dedup_semantic / multimodal_decode_jpeg /
        # dedup_incremental_components from the r12 window gap);
        # the remaining slots continue the r08-vintage backlog in
        # registry order, exactly as planned last round.
        "streaming_incremental_grams": L.streaming_incremental_grams,
        "mine_bitext_margin": L.mine_bitext_margin,
        "retrieval_incremental_bm25": L.retrieval_incremental_bm25,
        "ann_incremental_ivf_sampled": L.ann_incremental_ivf_sampled,
        "dedup_incremental_delta": L.dedup_incremental_delta,
        "lm_incremental_gram_update": L.lm_incremental_gram_update,
        "card_incremental_update": L.card_incremental_update,
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
        "dedup_minhash_lsh_pairs": L.dedup_minhash_lsh_pairs,
        "dedup_simhash_pairs": L.dedup_simhash_pairs,
        "dedup_keep_list": L.dedup_keep_list,
        "dedup_embedding_lsh_pairs": L.dedup_embedding_lsh_pairs,
        "ann_bruteforce_topk": L.ann_bruteforce_topk,
        "ann_lsh_topk": L.ann_lsh_topk,
        "ann_ivf_topk": L.ann_ivf_topk,
        "medallion_merge_state": R.medallion_merge_state,
        "medallion_gold_mart": L.medallion_gold_mart,
        "sql_dispatch_pipeline": L.sql_dispatch_pipeline,
        "catalog_history_metadata": R.catalog_history_metadata,
        "w1_latest_per_key": R.w1_latest_per_key,
        "window_running_totals": R.window_running_totals,
        "window_moving_avg": R.window_moving_avg,
        "o1_topk_latest": R.o1_topk_latest,
        "q1_pricing_summary": R.q1_pricing_summary,
        "q3_shipping_priority": R.q3_shipping_priority,
        "q5_region_revenue": R.q5_region_revenue,
        "q7_volume_shipping": R.q7_volume_shipping,
        "q10_returned_items": R.q10_returned_items,
        "q18_large_orders": R.q18_large_orders,
        "join_semi_big_spenders": R.join_semi_big_spenders,
        "join_anti_never_ordered": R.join_anti_never_ordered,
        "join_broadcast_brand_stats": R.join_broadcast_brand_stats,
        "metadata_agg_mor_count": L.metadata_agg_mor_count,
        "multimodal_decode_png_palette": L.multimodal_decode_png_palette,
        "text_sparse_retrieval_topk": L.text_sparse_retrieval_topk,
        "sample_dsir_selection": L.sample_dsir_selection,
        "text_kn_lm_score": L.text_kn_lm_score,
        "multimodal_decode_gif": L.multimodal_decode_gif,
        "multimodal_decode_mulaw": L.multimodal_decode_mulaw,
        "text_phrase_retrieval": L.text_phrase_retrieval,
        "ann_incremental_ivf_append": L.ann_incremental_ivf_append,
        "dedup_incremental_components": L.dedup_incremental_components,
        "sketch_theta_set_ops": L.sketch_theta_set_ops,
        "sketch_kll_rollup_quantiles": L.sketch_kll_rollup_quantiles,
        "sql_branch_wap": L.sql_branch_wap,
        "dedup_semantic": L.dedup_semantic,
        "position_delete_mor": L.position_delete_mor,
        "scd2_user_status_history": L.scd2_user_status_history,
        "corpus_mixture_weights": L.corpus_mixture_weights,
        "bloom_point_lookup": L.bloom_point_lookup,
        "incremental_gold_rollup": L.incremental_gold_rollup,
        "write_ordered_lineage": L.write_ordered_lineage,
        "partition_evolution_scan": L.partition_evolution_scan,
        "bpe_vocab_merges": L.bpe_vocab_merges,
        "scd2_temporal_enrich": L.scd2_temporal_enrich,
        "ann_pq_topk": L.ann_pq_topk,
        "type_promotion_scan": L.type_promotion_scan,
        "cdc_changelog_diff": L.cdc_changelog_diff,
        "mor_update_positions": L.mor_update_positions,
        "incremental_join_view": L.incremental_join_view,
        "text_repeated_spans": L.text_repeated_spans,
        "range_join_event_windows": R.range_join_event_windows,
        "table_quality_checks": R.table_quality_checks,
        "sketch_cms_frequencies": L.sketch_cms_frequencies,
        "text_quality_percentile_cut": L.text_quality_percentile_cut,
        "window_rank_functions": R.window_rank_functions,
        "text_boilerplate_ngrams": L.text_boilerplate_ngrams,
        "agg_grouping_sets": R.agg_grouping_sets,
        "q12_late_lines_by_status": R.q12_late_lines_by_status,
        "pack_training_sequences": L.pack_training_sequences,
        "curation_end_to_end": L.curation_end_to_end,
        "sketch_hll_distinct": L.sketch_hll_distinct,
        "sketch_hll_rollup_merge": L.sketch_hll_rollup_merge,
        "sketch_quantiles": L.sketch_quantiles,
        "dedup_embedding_pairs_brute": L.dedup_embedding_pairs_brute,
        "dedup_exact_groups": L.dedup_exact_groups,
        "dedup_normalized_groups": L.dedup_normalized_groups,
        "dedup_ngram_jaccard_pairs": L.dedup_ngram_jaccard_pairs,
        "multimodal_decode_png": L.multimodal_decode_png,
        "text_ngram_lm_score": L.text_ngram_lm_score,
        "ann_ivfpq_topk": L.ann_ivfpq_topk,
        "multimodal_resize_pixels": L.multimodal_resize_pixels,
        "text_bm25_topk": L.text_bm25_topk,
        "bpe_encode_tokens": L.bpe_encode_tokens,
        "sample_weighted_by_source": L.sample_weighted_by_source,
        "hybrid_bm25_ann_topk": L.hybrid_bm25_ann_topk,
        "ann_ivfpq_residual_topk": L.ann_ivfpq_residual_topk,
        "multimodal_decode_jpeg": L.multimodal_decode_jpeg,
        "ann_ivfsq_topk": L.ann_ivfsq_topk,
        "curation_ccnet_buckets": L.curation_ccnet_buckets,
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
        "join_full_outer_spend": R.join_full_outer_spend,
        "agg_rollup_orders": R.agg_rollup_orders,
        "agg_distinct_customers": R.agg_distinct_customers,
        "agg_cube_status_priority": R.agg_cube_status_priority,
        "agg_percentiles": R.agg_percentiles,
        "agg_collect_sorted": R.agg_collect_sorted,
        "pivot_event_counts": R.pivot_event_counts,
        "subquery_max_order": R.subquery_max_order,
        "json_extract_events": R.json_extract_events,
        "array_map_funcs": R.array_map_funcs,
        "events_daily_summary": R.events_daily_summary,
        "scalar_string_math": R.scalar_string_math,
        "date_arithmetic": R.date_arithmetic,
        "set_union_segments": R.set_union_segments,
        "set_intersect_building_buyers": R.set_intersect_building_buyers,
        "set_except_nonbuyers": R.set_except_nonbuyers,
        "text_repetition_scores": L.text_repetition_scores,
        "text_leakage_safe_split": L.text_leakage_safe_split,
        "multimodal_decode_image": L.multimodal_decode_image,
        "ann_recall_at_k": L.ann_recall_at_k,
        "s1_scan_filter_project": R.s1_scan_filter_project,
        "a1_count_star": R.a1_count_star,
        "f3_derive_partition_date": R.f3_derive_partition_date,
        "asof_click_purchase": R.asof_click_purchase,
        "sessionize_events": R.sessionize_events,
        "skew_salted_agg": L.skew_salted_agg,
        "string_distance_pairs": L.string_distance_pairs,
        "text_langid": L.text_langid,
        "text_quality": L.text_quality,
        "text_token_counts": L.text_token_counts,
        "text_fingerprint": L.text_fingerprint,
        "multimodal_meta": L.multimodal_meta,
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
        "sql_view_dispatch": L.sql_view_dispatch,
        "dedup_exact_substr_removal": L.dedup_exact_substr_removal,
        "multimodal_decode_png16": L.multimodal_decode_png16,
        "multimodal_decode_png_sub8": L.multimodal_decode_png_sub8,
        "multimodal_frames": L.multimodal_frames,
        "multimodal_resize": L.multimodal_resize,
        "multimodal_embed_dims": L.multimodal_embed_dims,
        "sql_ctas_time_travel": L.sql_ctas_time_travel,
        "incremental_scan_changelog": L.incremental_scan_changelog,
        "mor_merge_compact": L.mor_merge_compact,
        "schema_evolution_sql": L.schema_evolution_sql,
        "maintenance_procedures": L.maintenance_procedures,
        "streaming_windowed_counts": L.streaming_windowed_counts,
        "streaming_sessionize": L.streaming_sessionize,
        "streaming_dedup": L.streaming_dedup,
        "streaming_interval_join": L.streaming_interval_join,
        "range_join_incidents": L.range_join_incidents,
        "text_top_ngrams": L.text_top_ngrams,
        "dedup_components": L.dedup_components,
        "text_quality_filter": L.text_quality_filter,
        "sample_hash_events": L.sample_hash_events,
        "sample_stratified_events": L.sample_stratified_events,
        "sample_mixture_documents": L.sample_mixture_documents,
        "text_chunk_windows": L.text_chunk_windows,
        "text_chunk_texts": L.text_chunk_texts,
        "text_tfidf_topk": L.text_tfidf_topk,
        "zorder_cluster_events": L.zorder_cluster_events,
        "q4_priority_late_exists": R.q4_priority_late_exists,
        "q6_forecast_revenue": R.q6_forecast_revenue,
        "q13_customer_order_distribution": R.q13_customer_order_distribution,
        "q14_promo_revenue_share": R.q14_promo_revenue_share,
        "q17_small_quantity_revenue": R.q17_small_quantity_revenue,
        "q19_disjunctive_predicates": R.q19_disjunctive_predicates,
        "q21_waiting_supplier": R.q21_waiting_supplier,
        "q22_dormant_customers": R.q22_dormant_customers,
        "events_basket_lift": R.events_basket_lift,
        "events_rfm_segments": R.events_rfm_segments,
        "dedup_split_leakage": L.dedup_split_leakage,
        "multimodal_decode_adpcm": L.multimodal_decode_adpcm,
        "multimodal_decode_tiff": L.multimodal_decode_tiff,
        "events_rolling_mad_anomaly": R.events_rolling_mad_anomaly,
        "multimodal_decode_tga": L.multimodal_decode_tga,
        "events_user_diversity": R.events_user_diversity,
        "events_kanonymity": R.events_kanonymity,
        "events_churn_hazard": R.events_churn_hazard,
        "graph_kcore_dedup": L.graph_kcore_dedup,
        "dedup_image_phash_pairs": L.dedup_image_phash_pairs,
        "dedup_image_phash_components": L.dedup_image_phash_components,
        "text_segment_ttr": L.text_segment_ttr,
        "graph_triangle_count": L.graph_triangle_count,
        "text_feature_hashing": L.text_feature_hashing,
        "dedup_lsh_recall": L.dedup_lsh_recall,
        "multimodal_decode_qoi": L.multimodal_decode_qoi,
        "multimodal_transcode_qoi": L.multimodal_transcode_qoi,
        "source_webdataset_roundtrip": L.source_webdataset_roundtrip,
        "embedding_gram_matrix": L.embedding_gram_matrix,
        "events_markov_transitions": R.events_markov_transitions,
        "dedup_minhash_estimator_error": L.dedup_minhash_estimator_error,
        "text_source_divergence": L.text_source_divergence,
        "streaming_topk_trending": L.streaming_topk_trending,
        "corpus_token_budget": L.corpus_token_budget,
        "dedup_exact_substr_self": L.dedup_exact_substr_self,
        "dedup_exact_substr_apply": L.dedup_exact_substr_apply,
        "dedup_winnowing_components": L.dedup_winnowing_components,
        "multimodal_decode_gif_interlaced": L.multimodal_decode_gif_interlaced,
        "dedup_prefix_filter_pairs": L.dedup_prefix_filter_pairs,
        "retrieval_hard_negatives": L.retrieval_hard_negatives,
        "events_user_ltv_deciles": R.events_user_ltv_deciles,
        "q8_market_share": R.q8_market_share,
        "q15_top_supplier": R.q15_top_supplier,
        "text_decontaminate": L.text_decontaminate,
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
        "streaming_static_enrich": L.streaming_static_enrich,
        "multimodal_decode_audio": L.multimodal_decode_audio,
        "multimodal_decode_video": L.multimodal_decode_video,
    }
    head = {name: base[name] for name in _R13_WINDOW}
    # dict.update never moves an existing key, so the window is the
    # prefix and every other entry keeps its previous relative order
    head.update(base)
    return head


# ---------------------------------------------------------------------------
# Extension-surface oracle SQL builders (shared fragments)
# ---------------------------------------------------------------------------

_NORM = (
    "trim(regexp_replace(regexp_replace(lower({t}), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)
_TOKEN_ID = "(('0x' || substr(md5({t}), 1, 15))::BIGINT % 2147483647)"

_PLANT_TAIL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' extra token tail' AS text
  FROM documents WHERE doc_id < 30
)
"""

# word 8-gram over a split array `w` (1-indexed; i ranges so i+7 <= len)
_GRAM8 = " || ' ' || ".join(["w[i]"] + [f"w[i + {k}]" for k in range(1, 8)])

_SHINGLES = f"""
norm AS (
  SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w FROM corpus
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
    FROM norm)
),
sids AS (
  SELECT DISTINCT doc_id, {_TOKEN_ID.format(t='shingle')} AS sid FROM sh
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sids GROUP BY doc_id)
"""

def _qf_rules() -> list[tuple[str, str]]:
    """Quality rules as (name, SQL condition over the feature CTE) —
    the single source both quality oracles derive from."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.text import (
        QF_MAX_AVG_WLEN,
        QF_MAX_WORD_LEN,
        QF_MAX_WORDS,
        QF_MIN_ALPHA_PCT,
        QF_MIN_AVG_WLEN,
        QF_MIN_DISTINCT_PCT,
        QF_MIN_STOP_HITS,
        QF_MIN_WORDS,
    )

    return [
        ("word_count", f"(n_words >= {QF_MIN_WORDS} AND n_words <= {QF_MAX_WORDS})"),
        ("avg_word_len", f"(word_chars >= {QF_MIN_AVG_WLEN} * n_words"
                         f" AND word_chars <= {QF_MAX_AVG_WLEN} * n_words)"),
        ("alpha_ratio", f"(alpha_chars * 100 >= {QF_MIN_ALPHA_PCT} * n_chars)"),
        ("stopwords", f"(stop_cnt >= {QF_MIN_STOP_HITS})"),
        ("max_word_len", f"(max_wlen <= {QF_MAX_WORD_LEN})"),
        ("repetition", f"(n_distinct * 100 >= {QF_MIN_DISTINCT_PCT} * n_words)"),
    ]


def _qf_features_sql(src: str) -> str:
    """Feature CTE body for the quality rules over table/CTE ``src``
    (must expose doc_id, text)."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.text import (
        EN_STOPWORDS,
    )

    stops = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    return f"""
          SELECT doc_id,
                 len(w) AS n_words,
                 length(text) AS n_chars,
                 length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha_chars,
                 coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS word_chars,
                 len(list_filter(w, x -> list_contains([{stops}], x))) AS stop_cnt,
                 coalesce(list_max(list_transform(w, x -> length(x))), 0) AS max_wlen,
                 len(list_distinct(w)) AS n_distinct
          FROM (SELECT doc_id, text,
                       string_split({_NORM.format(t='text')}, ' ') AS w
                FROM {src})
    """


def _quality_filter_oracle() -> str:
    """Twin of text.quality_filter: same integer cross-multiplied
    rules (no float thresholds), flags cast to int, first-failed rule
    in declaration order."""
    rules = _qf_rules()
    flag_defs = ",\n              ".join(
        f"{cond} AS ok_{name}" for name, cond in rules
    )
    flag_casts = ",\n              ".join(
        f"CAST(ok_{name} AS INTEGER) AS ok_{name}" for name, _ in rules
    )
    keep = " AND ".join(f"ok_{name}" for name, _ in rules)
    reason = " ".join(f"WHEN NOT ok_{name} THEN '{name}'" for name, _ in rules)
    return f"""
        WITH f AS (
          {_qf_features_sql('documents')}
        ), r AS (
          SELECT doc_id, n_words,
              {flag_defs}
          FROM f
        )
        SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
              {flag_casts},
              CAST(({keep}) AS INTEGER) AS keep,
              CASE {reason} ELSE NULL END AS drop_reason
        FROM r
    """


def _curation_oracle() -> str:
    """Twin of llm_queries.curation_end_to_end: quality keep ->
    minhash keep-list -> chunk -> pack -> per-sequence stats, built
    from the same fragments as the standalone oracles (the filtered
    corpus is named `corpus` so _SHINGLES reads it unchanged)."""
    keep = " AND ".join(cond for _, cond in _qf_rules())
    return f"""
        WITH corpus_raw AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text || ' extra token tail' AS text
          FROM documents WHERE doc_id < 30
        ),
        f AS (
          {_qf_features_sql('corpus_raw')}
        ),
        q AS (SELECT doc_id FROM f WHERE {keep}),
        corpus AS (
          SELECT r.doc_id, r.text FROM corpus_raw r JOIN q USING (doc_id)
        ),
        {_SHINGLES},
        seeds AS (SELECT * FROM (VALUES {_MINHASH_SEEDS}) s(j, a, b)),
        mh AS (
          SELECT doc_id, j, min((a * sid + b) % 2147483647) AS mh
          FROM sids CROSS JOIN seeds GROUP BY doc_id, j
        ),
        bands AS (
          SELECT doc_id, j // 3 AS band,
                 string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j) AS key
          FROM mh GROUP BY doc_id, j // 3
        ),
        cands AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        ),
        inter AS (
          SELECT c.doc_a, c.doc_b, count(*) AS inter
          FROM cands c
          JOIN sids sa ON sa.doc_id = c.doc_a
          JOIN sids sb ON sb.doc_id = c.doc_b AND sb.sid = sa.sid
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT i.doc_a, i.doc_b
          FROM inter i
          JOIN sizes sa ON sa.doc_id = i.doc_a
          JOIN sizes sb ON sb.doc_id = i.doc_b
          WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.5
        ),
        survivors AS (
          SELECT doc_id FROM corpus
          WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
        ),
        cs AS (
          SELECT nm.doc_id, len(nm.w) AS doc_tokens,
                 unnest(generate_series(1, greatest(len(nm.w) - 8, 1), 24)) AS start
          FROM norm nm JOIN survivors USING (doc_id)
        ),
        c AS (
          SELECT doc_id,
                 CAST((start - 1) // 24 AS INTEGER) AS chunk_id,
                 least(32, doc_tokens - start + 1) AS n_tokens,
                 doc_id // 100 AS shard_id
          FROM cs
        ),
        p AS (
          SELECT *, coalesce(sum(n_tokens) OVER (
                      PARTITION BY shard_id ORDER BY doc_id, chunk_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
          FROM c
        )
        SELECT shard_id, CAST(cum // 256 AS BIGINT) AS seq_id, count(*) AS n_chunks,
               CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
               count(DISTINCT doc_id) AS n_docs
        FROM p GROUP BY 1, 2
    """


def _boilerplate_oracle() -> str:
    """Twin of llm_queries.text_boilerplate_ngrams — same planted
    footer constant, trigram split, df >= 3 commonality."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.llm_queries import (
        BOILER_FOOTER,
    )

    gram3 = "w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]"
    return f"""
        WITH corpus AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 4 = 0 THEN text || '{BOILER_FOOTER}'
                      ELSE text END AS text
          FROM documents
        ),
        nw AS (SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w
               FROM corpus),
        sh AS (
          SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(w) - 1),
                          i -> {gram3})) AS shingle
            FROM nw)
        ),
        common AS (
          SELECT shingle FROM sh GROUP BY shingle HAVING count(*) >= 3
        )
        SELECT s.doc_id,
               count(*) AS n_shingles,
               count(c.shingle) AS n_boiler,
               round(CAST(count(c.shingle) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 4) AS boiler_frac
        FROM sh s LEFT JOIN common c ON s.shingle = c.shingle
        GROUP BY s.doc_id
    """


def _mixture_oracle() -> str:
    """Twin of llm_queries.sample_mixture_documents: per-domain
    thresholds computed by the SAME int(rate * 16^15) expression the
    Spark operator compiles into its literal map, so the keep decision
    cannot drift between engines."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.llm_queries import (
        MIXTURE_RATES,
    )
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.sampling import (
        HASH_SPACE,
    )

    whens = " ".join(
        f"WHEN '{d}' THEN {int(r * HASH_SPACE)}"
        for d, r in sorted(MIXTURE_RATES.items())
    )
    return f"""
        SELECT doc_id, lang, source FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              < CASE lang {whens} END
    """


def _zorder_oracle() -> str:
    """Twin of llm_queries.zorder_cluster_events: the SQL interleave
    comes from the same generator (functions/zorder.py:zorder_sql) as
    the Spark expression, so bit layouts cannot drift apart."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.functions.zorder import (
        zorder_sql,
    )

    return f"""
        SELECT event_id, user_id, day,
               {zorder_sql(['user_id', 'day'])} AS zkey
        FROM (SELECT event_id, user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
              FROM events)
    """


def _bpe_rounds_cte(num_merges: int = 6) -> str:
    """The shared WITH-chain replaying operators/bpe.py's merge
    rounds (w0 word table, p{r} pair counts, b{r} argmax, pat{r}
    replace patterns, w{r} fixpoint-merged table) — the prefix of
    both the merge-list oracle and the encode oracle."""
    parts = [
        """
        WITH w0 AS MATERIALIZED (
          SELECT ' ' || array_to_string(regexp_extract_all(word, '.'), ' ')
                 || ' </w> ' AS sym,
                 CAST(count(*) AS BIGINT) AS c
          FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
                       AS word FROM documents)
          GROUP BY 1
        )"""
    ]
    for r in range(1, num_merges + 1):
        parts.append(
            f"""
        , p{r} AS MATERIALIZED (
          SELECT z[1] AS l, z[2] AS r, CAST(sum(c) AS BIGINT) AS cnt
          FROM (
            SELECT unnest(list_zip(L, L[2:])) AS z, c
            FROM (SELECT string_split(trim(sym), ' ') AS L, c
                  FROM w{r - 1})
          )
          WHERE z[2] IS NOT NULL
          GROUP BY 1, 2
        ), b{r} AS MATERIALIZED (
          SELECT l, r, cnt FROM p{r} ORDER BY cnt DESC, l, r LIMIT 1
        ), pat{r} AS MATERIALIZED (
          SELECT ' ' || l || ' ' || r || ' ' AS pat,
                 ' ' || l || r || ' ' AS rep
          FROM b{r}
        ), w{r} AS MATERIALIZED (
          -- replace to FIXPOINT: one pass under-merges consecutive
          -- runs (shared-delimiter block); iterating is exactly the
          -- textbook left-to-right merge (operators/bpe.py
          -- _apply_merge). Word chains are disjoint (distinct
          -- words), so the fixed-point rows are the round's result.
          WITH RECURSIVE fx AS (
            SELECT sym, c FROM w{r - 1}
            UNION ALL
            SELECT replace(sym, (SELECT pat FROM pat{r}),
                           (SELECT rep FROM pat{r})), c
            FROM fx
            WHERE replace(sym, (SELECT pat FROM pat{r}),
                          (SELECT rep FROM pat{r})) <> sym
          )
          SELECT sym, c FROM fx
          WHERE replace(sym, (SELECT pat FROM pat{r}),
                        (SELECT rep FROM pat{r})) = sym
        )"""
        )
    return "".join(parts)


def _bpe_oracle(num_merges: int = 6) -> str:
    """Merge-list oracle: the round chain, then one row per merge.
    The merge decision is inherently sequential, so the oracle is
    GENERATED — one CTE block per round."""
    selects = " UNION ALL ".join(
        f"SELECT {r} AS rank, l AS \"left\", r AS \"right\", "
        f"l || r AS merged, cnt AS pair_count FROM b{r}"
        for r in range(1, num_merges + 1)
    )
    return (
        _bpe_rounds_cte(num_merges)
        + f" SELECT * FROM ({selects}) ORDER BY rank"
    )


def _bpe_encode_oracle(num_merges: int = 6) -> str:
    """Encode oracle: learn the merges (same round chain), then
    segment every document by applying each merge as ONE
    left-to-right non-overlapping replace per word — the exact
    semantics of bpe.bpe_segment's expression chain (single pass per
    merge, no fixpoint). Emits order-sensitive evidence: token count
    and an md5 fingerprint of the full in-order token stream."""
    pat_cols = ", ".join(
        f"pat{r}.pat AS p{r}, pat{r}.rep AS q{r}"
        for r in range(1, num_merges + 1)
    )
    pat_from = ", ".join(f"pat{r}" for r in range(1, num_merges + 1))
    chain = "' ' || array_to_string(regexp_extract_all(w, '.'), ' ') || ' </w> '"
    for r in range(1, num_merges + 1):
        chain = f"replace({chain}, p{r}, q{r})"
    return (
        _bpe_rounds_cte(num_merges)
        + f"""
        , pats AS MATERIALIZED (SELECT {pat_cols} FROM {pat_from})
        , segged AS (
          SELECT doc_id, words,
                 flatten(list_transform(words,
                   w -> string_split(trim({chain}), ' '))) AS flat
          FROM (SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z]+') AS words
                FROM documents)
          CROSS JOIN pats
        )
        SELECT doc_id,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(len(flat) AS BIGINT) AS n_tokens,
               md5(array_to_string(flat, '|')) AS token_fp
        FROM segged
        """
    )


def _wordpiece_rounds_cte(num_merges: int = 6) -> str:
    """GENERATED WITH-chain replaying operators/wordpiece.py's merge
    rounds — the BPE round chain with WordPiece's two differences:
    the ##-prefixed no-end-marker symbol seeding, and a likelihood
    argmax (cnt / (u_left * u_right) in IEEE doubles from exact
    BIGINT counts — both engines divide identical doubles, ties by
    pair text). Word cap 16 mirrors wp_word_table."""
    parts = [
        """
        WITH w0 AS MATERIALIZED (
          SELECT word,
                 ' ' || substr(word, 1, 1) ||
                 CASE WHEN length(word) > 1
                      THEN ' ##' || array_to_string(
                        regexp_extract_all(substr(word, 2), '.'), ' ##')
                      ELSE '' END || ' ' AS sym,
                 CAST(count(*) AS BIGINT) AS c
          FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
                       AS word FROM documents)
          WHERE length(word) <= 16
          GROUP BY 1
        )"""
    ]
    for r in range(1, num_merges + 1):
        parts.append(
            f"""
        , u{r} AS MATERIALIZED (
          SELECT s, CAST(sum(c) AS BIGINT) AS u
          FROM (SELECT unnest(string_split(trim(sym), ' ')) AS s, c
                FROM w{r - 1})
          GROUP BY 1
        ), p{r} AS MATERIALIZED (
          SELECT z[1] AS l, z[2] AS r, CAST(sum(c) AS BIGINT) AS cnt
          FROM (
            SELECT unnest(list_zip(L, L[2:])) AS z, c
            FROM (SELECT string_split(trim(sym), ' ') AS L, c
                  FROM w{r - 1})
          )
          WHERE z[2] IS NOT NULL
          GROUP BY 1, 2
        ), b{r} AS MATERIALIZED (
          SELECT p.l, p.r, p.cnt, ul.u AS ul, ur.u AS ur
          FROM p{r} p
          JOIN u{r} ul ON ul.s = p.l
          JOIN u{r} ur ON ur.s = p.r
          ORDER BY CAST(p.cnt AS DOUBLE)
                   / (CAST(ul.u AS DOUBLE) * CAST(ur.u AS DOUBLE)) DESC,
                   p.l, p.r
          LIMIT 1
        ), pat{r} AS MATERIALIZED (
          SELECT ' ' || l || ' ' || r || ' ' AS pat,
                 ' ' || l || substr(r, 3) || ' ' AS rep,
                 l || substr(r, 3) AS merged
          FROM b{r}
        ), w{r} AS MATERIALIZED (
          -- replace to FIXPOINT (the bpe-oracle reasoning verbatim)
          WITH RECURSIVE fx AS (
            SELECT word, sym, c FROM w{r - 1}
            UNION ALL
            SELECT word, replace(sym, (SELECT pat FROM pat{r}),
                                 (SELECT rep FROM pat{r})), c
            FROM fx
            WHERE replace(sym, (SELECT pat FROM pat{r}),
                          (SELECT rep FROM pat{r})) <> sym
          )
          SELECT word, sym, c FROM fx
          WHERE replace(sym, (SELECT pat FROM pat{r}),
                        (SELECT rep FROM pat{r})) = sym
        )"""
        )
    return "".join(parts)


def _wordpiece_oracle(num_merges: int = 6) -> str:
    """Merge-list oracle: one row per likelihood-scored merge, exact
    integers only (rank, pair, merged text, pair/left/right counts)."""
    selects = " UNION ALL ".join(
        f"SELECT {r} AS rank, b.l AS \"left\", b.r AS \"right\", "
        f"p.merged, b.cnt AS pair_count, b.ul AS left_count, "
        f"b.ur AS right_count FROM b{r} b, pat{r} p"
        for r in range(1, num_merges + 1)
    )
    return (
        _wordpiece_rounds_cte(num_merges)
        + f" SELECT * FROM ({selects}) ORDER BY rank"
    )


def _wordpiece_encode_oracle(num_merges: int = 6) -> str:
    """Encode oracle: learn the merges (same round chain), then
    replay BERT's greedy longest-match-first segmenter as 16
    unrolled match steps (each consumes >= 1 char of a <= 16-char
    word): per step, join live (word, pos) states against the final
    symbol inventory on substring equality with the ##/word-initial
    split, keep the longest match (unique per length, so the argmax
    is total), and advance; a live word with no match that step is
    [UNK] wholesale. Then the position-exploded corpus join with
    [UNK] fallback for over-cap words — the unigram-encode evidence
    shape."""
    R = num_merges
    L = 16
    merged_sel = " UNION ALL ".join(
        f"SELECT merged AS s FROM pat{r}" for r in range(1, R + 1)
    )
    parts = [_wordpiece_rounds_cte(R)]
    parts.append(f"""
    , voc AS MATERIALIZED (
      SELECT DISTINCT s AS vsym,
             CASE WHEN s LIKE '##%' THEN substr(s, 3) ELSE s END AS vcontent,
             (s LIKE '##%') AS is_cont,
             length(CASE WHEN s LIKE '##%' THEN substr(s, 3) ELSE s END)
               AS vlen
      FROM (
        SELECT unnest(string_split(trim(sym), ' ')) AS s FROM w0
        UNION ALL {merged_sel}
      )
    ),
    g0 AS (SELECT word, 0 AS pos FROM w0)""")
    for s in range(1, L + 1):
        parts.append(f"""
    , m{s} AS MATERIALIZED (
      SELECT word, pos, vsym, vlen FROM (
        SELECT t.word, t.pos, v.vsym, v.vlen,
               row_number() OVER (PARTITION BY t.word
                 ORDER BY v.vlen DESC) AS rn
        FROM g{s - 1} t JOIN voc v
          ON v.is_cont = (t.pos > 0)
         AND v.vlen <= length(t.word) - t.pos
         AND substr(t.word, t.pos + 1, v.vlen) = v.vcontent
      ) WHERE rn = 1
    ), unk{s} AS (
      SELECT word FROM g{s - 1} EXCEPT SELECT word FROM m{s}
    ), g{s} AS MATERIALIZED (
      SELECT word, pos + vlen AS pos FROM m{s}
      WHERE pos + vlen < length(word)
    )""")
    allm = " UNION ALL ".join(
        f"SELECT word, pos, vsym FROM m{s}" for s in range(1, L + 1)
    )
    allunk = " UNION ALL ".join(
        f"SELECT word FROM unk{s}" for s in range(1, L + 1)
    )
    parts.append(f"""
    , allm AS MATERIALIZED ({allm}),
    unkw AS MATERIALIZED ({allunk}),
    wp AS MATERIALIZED (
      SELECT a.word,
             string_agg(a.vsym, '|' ORDER BY a.pos) AS pieces_str,
             CAST(count(*) AS BIGINT) AS n_pieces
      FROM allm a
      WHERE a.word NOT IN (SELECT word FROM unkw)
      GROUP BY a.word
    ),
    docw AS (
      SELECT doc_id, CAST(i AS INTEGER) AS pos, ws[i + 1] AS word
      FROM (
        SELECT doc_id, ws, unnest(range(len(ws))) AS i
        FROM (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z]+') AS ws
              FROM documents))
    ),
    per AS (
      SELECT e.doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(COALESCE(wp.n_pieces, 1)) AS BIGINT) AS n_tokens,
             md5(string_agg(COALESCE(wp.pieces_str, '[UNK]'),
                            '|' ORDER BY e.pos)) AS token_fp
      FROM docw e LEFT JOIN wp ON wp.word = e.word
      GROUP BY e.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_words, 0) AS BIGINT) AS n_words,
           CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           COALESCE(p.token_fp, md5('')) AS token_fp
    FROM documents d LEFT JOIN per p USING (doc_id)
    """)
    return "".join(parts)


def _semantic_dedup_oracle(eps: float = 0.4, n_centroids: int = 16) -> str:
    """Exact oracle for dedup.semantic_dedup: the _ann_ivf_oracle
    clustering CTEs (rank-spaced seeds, one Lloyd step with
    round(avg,6) means, deterministic assignment), then the SemDeDup
    keep rule — within a cluster, every pair at cos>=eps (round 4)
    drops the member with the HIGHER round-6 centroid similarity
    (ties drop the higher id)."""
    assign = """
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT r.vec_id, r.embedding, c.centroid_id,
               row_number() OVER (PARTITION BY r.vec_id
                 ORDER BY round(list_cosine_similarity(
                            CAST(r.embedding AS DOUBLE[]), c.cv), 6) DESC,
                          c.centroid_id ASC) AS rn
        FROM embeddings r CROSS JOIN {cents} c)
      WHERE rn = 1
    """
    return f"""
    WITH params AS (SELECT greatest(1, count(*) // {n_centroids}) AS step FROM embeddings),
    seeds AS (
      SELECT CAST(rk - 1 AS INTEGER) AS centroid_id, cv FROM (
        SELECT CAST(embedding AS DOUBLE[]) AS cv,
               row_number() OVER (ORDER BY vec_id) AS rk
        FROM embeddings, params WHERE vec_id % step = 0)
      WHERE rk <= {n_centroids}
    ),
    assign0 AS ({assign.format(cents='seeds')}),
    cells AS (
      SELECT a.centroid_id, CAST(t.range AS INTEGER) AS d,
             CAST(a.embedding AS DOUBLE[])[t.range] AS x
      FROM assign0 a CROSS JOIN range(1, 65) t
    ),
    cents AS (
      SELECT centroid_id, list(m ORDER BY d) AS cv FROM (
        SELECT centroid_id, d, round(avg(x), 6) AS m
        FROM cells GROUP BY centroid_id, d)
      GROUP BY centroid_id
    ),
    lists AS ({assign.format(cents='cents')}),
    scored AS (
      SELECT l.vec_id, l.embedding, l.centroid_id,
             round(list_cosine_similarity(
               CAST(l.embedding AS DOUBLE[]), c.cv), 6) AS cent_sim
      FROM lists l JOIN cents c USING (centroid_id)
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             a.cent_sim AS ca, b.cent_sim AS cb
      FROM scored a JOIN scored b
        ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]), 4) >= {eps}
    ),
    dropped AS (
      SELECT DISTINCT CASE WHEN ca > cb THEN id_a ELSE id_b END AS vec_id
      FROM pairs
    )
    SELECT s.vec_id, s.centroid_id, s.cent_sim,
           CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INTEGER)
               AS is_kept
    FROM scored s LEFT JOIN dropped d USING (vec_id)
    """


def _lsh_bucket_sql(dim: int = 64, n_planes: int = 8) -> str:
    """Hyperplane-LSH bucket id, replicating
    similarity.hyperplane_buckets bit-for-bit: same +/-1 signs
    (closed form, no RNG) and the same left-to-right double summation
    order, so the sign bits are identical in both engines."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.similarity import (
        _plane_sign,
    )

    parts = []
    for j in range(n_planes):
        terms = "".join(
            ("+" if _plane_sign(j, d) > 0 else "-") + f"e[{d + 1}]"
            for d in range(dim)
        )
        parts.append(f"(CASE WHEN (0.0{terms}) >= 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(parts)


def _ann_lsh_oracle(k: int = 5, n_planes: int = 8) -> str:
    """Exact oracle for the deterministic LSH pipeline: same buckets,
    same Hamming-1 multiprobe, same (rounded cosine, id) ranking."""
    probes = ", ".join(["bucket"] + [f"xor(bucket, {1 << j})" for j in range(n_planes)])
    return f"""
    WITH base AS (
      SELECT vec_id, embedding, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    b AS (
      SELECT vec_id, embedding, CAST({_lsh_bucket_sql()} AS INTEGER) AS bucket
      FROM base
    ),
    qb AS (
      SELECT vec_id AS query_id, embedding AS qv, unnest([{probes}]) AS bucket
      FROM b WHERE vec_id < 10
    ),
    scored AS (
      SELECT qb.query_id, b.vec_id AS neighbor_id,
             round(list_cosine_similarity(qb.qv::DOUBLE[],
                                          b.embedding::DOUBLE[]), 4) AS cos_sim
      FROM b JOIN qb ON b.bucket = qb.bucket AND b.vec_id != qb.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rnk
      FROM scored)
    WHERE rnk <= {k}
    """


def _embedding_lsh_pairs_oracle(threshold: float = 0.4, n_planes: int = 8) -> str:
    """Exact oracle for the bucketed near-dup pairs: reproduces the
    deterministic LSH candidate set (own bucket + Hamming-1 probes on
    the a-side), then the same cosine-threshold verify."""
    probes = ", ".join(["bucket"] + [f"xor(bucket, {1 << j})" for j in range(n_planes)])
    return f"""
    WITH base AS (
      SELECT vec_id, embedding, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    b AS (
      SELECT vec_id, embedding, CAST({_lsh_bucket_sql()} AS INTEGER) AS bucket
      FROM base
    ),
    probes AS (
      SELECT vec_id AS id_a, embedding AS va, unnest([{probes}]) AS bucket FROM b
    )
    SELECT id_a, id_b, cos_sim FROM (
      SELECT p.id_a, b.vec_id AS id_b,
             round(list_cosine_similarity(p.va::DOUBLE[],
                                          b.embedding::DOUBLE[]), 4) AS cos_sim
      FROM probes p JOIN b ON b.bucket = p.bucket AND p.id_a < b.vec_id)
    WHERE cos_sim >= {threshold}
    """


def _ann_ivf_oracle(k: int = 5, n_centroids: int = 16, nprobe: int = 4) -> str:
    """Exact oracle for the deterministic IVF pipeline: rank-seeded
    centroids, one Lloyd step with round(avg, 6)-quantized means
    (mirrors similarity.ivf_centroids), nprobe inverted lists."""
    assign = """
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT r.vec_id, r.embedding, c.centroid_id,
               row_number() OVER (PARTITION BY r.vec_id
                 ORDER BY round(list_cosine_similarity(
                            CAST(r.embedding AS DOUBLE[]), c.cv), 6) DESC,
                          c.centroid_id ASC) AS rn
        FROM embeddings r CROSS JOIN {cents} c)
      WHERE rn = 1
    """
    return f"""
    WITH params AS (SELECT greatest(1, count(*) // {n_centroids}) AS step FROM embeddings),
    seeds AS (
      SELECT CAST(rk - 1 AS INTEGER) AS centroid_id, cv FROM (
        SELECT CAST(embedding AS DOUBLE[]) AS cv,
               row_number() OVER (ORDER BY vec_id) AS rk
        FROM embeddings, params WHERE vec_id % step = 0)
      WHERE rk <= {n_centroids}
    ),
    assign0 AS ({assign.format(cents='seeds')}),
    cells AS (
      SELECT a.centroid_id, CAST(t.range AS INTEGER) AS d,
             CAST(a.embedding AS DOUBLE[])[t.range] AS x
      FROM assign0 a CROSS JOIN range(1, 65) t
    ),
    cents AS (
      SELECT centroid_id, list(m ORDER BY d) AS cv FROM (
        SELECT centroid_id, d, round(avg(x), 6) AS m
        FROM cells GROUP BY centroid_id, d)
      GROUP BY centroid_id
    ),
    lists AS ({assign.format(cents='cents')}),
    probes AS (
      SELECT query_id, qv, centroid_id FROM (
        SELECT q.vec_id AS query_id, q.embedding AS qv, c.centroid_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(
                            CAST(q.embedding AS DOUBLE[]), c.cv), 6) DESC,
                          c.centroid_id ASC) AS rn
        FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 10)
      WHERE rn <= {nprobe}
    ),
    scored AS (
      SELECT p.query_id, l.vec_id AS neighbor_id,
             round(list_cosine_similarity(p.qv::DOUBLE[],
                                          l.embedding::DOUBLE[]), 4) AS cos_sim
      FROM lists l
      JOIN probes p ON l.centroid_id = p.centroid_id AND l.vec_id != p.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rnk
      FROM scored)
    WHERE rnk <= {k}
    """


def _ivf_train_ctes(corpus: str, sfx: str, n_centroids: int = 16) -> str:
    """CTE fragment training IVF centroids over ``corpus`` (mirrors
    similarity.ivf_centroids exactly: rank-spaced seeds, one Lloyd
    step with round(avg,6)-quantized means); emits ``cents{sfx}``."""
    assign = f"""
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT r.vec_id, r.embedding, c.centroid_id,
               row_number() OVER (PARTITION BY r.vec_id
                 ORDER BY round(list_cosine_similarity(
                            CAST(r.embedding AS DOUBLE[]), c.cv), 6) DESC,
                          c.centroid_id ASC) AS rn
        FROM {corpus} r CROSS JOIN seeds{sfx} c)
      WHERE rn = 1
    """
    return f"""
    params{sfx} AS (
      SELECT greatest(1, count(*) // {n_centroids}) AS step FROM {corpus}),
    seeds{sfx} AS (
      SELECT CAST(rk - 1 AS INTEGER) AS centroid_id, cv FROM (
        SELECT CAST(embedding AS DOUBLE[]) AS cv,
               row_number() OVER (ORDER BY vec_id) AS rk
        FROM {corpus}, params{sfx} WHERE vec_id % step = 0)
      WHERE rk <= {n_centroids}
    ),
    assign0{sfx} AS ({assign}),
    cells{sfx} AS (
      SELECT a.centroid_id, CAST(t.range AS INTEGER) AS d,
             CAST(a.embedding AS DOUBLE[])[t.range] AS x
      FROM assign0{sfx} a CROSS JOIN range(1, 65) t
    ),
    cents{sfx} AS (
      SELECT centroid_id, list(m ORDER BY d) AS cv FROM (
        SELECT centroid_id, d, round(avg(x), 6) AS m
        FROM cells{sfx} GROUP BY centroid_id, d)
      GROUP BY centroid_id
    )"""


def _ivf_incremental_oracle(
    n_centroids: int = 16, sample_mod: int | None = None
) -> str:
    """Exact oracle for similarity.ivf_incremental_assign: batch =
    vec_id%8==5, stale centroids trained on the history (the rest),
    refreshed centroids on history+batch — or, with ``sample_mod``,
    on the 1-in-m systematic history sample plus the batch — nearest-
    centroid pick with the round-6/centroid-id tie-break on both
    codebooks, and the label-invariant drift flag (round-4 cosine
    improvement > IVF_DRIFT_EPS)."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.similarity import (
        IVF_DRIFT_EPS,
    )

    def pick(cents: str) -> str:
        return f"""
      SELECT vec_id, centroid_id, cent_sim FROM (
        SELECT b.vec_id, c.centroid_id,
               round(list_cosine_similarity(
                 CAST(b.embedding AS DOUBLE[]), c.cv), 6) AS cent_sim,
               row_number() OVER (PARTITION BY b.vec_id
                 ORDER BY round(list_cosine_similarity(
                            CAST(b.embedding AS DOUBLE[]), c.cv), 6) DESC,
                          c.centroid_id ASC) AS rn
        FROM batch b CROSS JOIN {cents} c)
      WHERE rn = 1
    """

    hist_sample = f" WHERE vec_id % {sample_mod} = 0" if sample_mod else ""
    return f"""
    WITH hist AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 8 != 5),
    batch AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 8 = 5),
    fresh_corpus AS MATERIALIZED (
      SELECT vec_id, embedding FROM hist{hist_sample}
      UNION ALL
      SELECT vec_id, embedding FROM batch),
    {_ivf_train_ctes('hist', '_h', n_centroids)},
    {_ivf_train_ctes('fresh_corpus', '_f', n_centroids)},
    a_stale AS ({pick('cents_h')}),
    a_fresh AS ({pick('cents_f')})
    SELECT s.vec_id, s.centroid_id AS stale_centroid,
           s.cent_sim AS stale_sim,
           f.centroid_id AS fresh_centroid,
           f.cent_sim AS fresh_sim,
           CAST(CASE WHEN round(f.cent_sim - s.cent_sim, 4)
                          > {IVF_DRIFT_EPS}
                THEN 1 ELSE 0 END AS INTEGER) AS drifted
    FROM a_stale s JOIN a_fresh f USING (vec_id)
    """


def _incremental_cc_oracle(delta: bool = False) -> str:
    """Full-recompute oracle for dedup.incremental_components over
    the _incremental_cc_fixture corpus: the recursive min-label
    closure of the combined corpus's MinHash pair graph. With
    ``delta`` the result is EXCEPT-ed against the history-only
    closure (MinHash signatures are per-doc, so restricting the
    combined pair graph to history ids equals closing history alone)
    — the exact changed+new row set the delta output mode contracts
    to emit."""
    # is_hist: base history docs (id%4!=0) or the +300000 plants
    hist_pred = (
        "({c} % 4 != 0 AND {c} < 300000) OR ({c} >= 300000 AND {c} < 400000)"
    )
    delta_ctes = f""",
            hist_pairs AS (
              SELECT doc_a, doc_b FROM pairs
              WHERE ({hist_pred.format(c='doc_a')})
                AND ({hist_pred.format(c='doc_b')})
            ),
            hedges AS (
              SELECT doc_a AS src, doc_b AS dst FROM hist_pairs
              UNION
              SELECT doc_b, doc_a FROM hist_pairs
            ),
            hreach(id, lbl) AS (
              SELECT DISTINCT src, src FROM hedges
              UNION
              SELECT e.dst, r.lbl FROM hreach r JOIN hedges e ON e.src = r.id
            )"""
    full_tail = """
            SELECT id AS doc_id, min(lbl) AS component_id
            FROM reach GROUP BY id"""
    delta_tail = """
            SELECT id AS doc_id, min(lbl) AS component_id
            FROM reach GROUP BY id
            EXCEPT
            SELECT id AS doc_id, min(lbl) AS component_id
            FROM hreach GROUP BY id"""
    return f"""
            WITH RECURSIVE corpus AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 4 != 0
              UNION ALL
              SELECT doc_id + 300000 AS doc_id,
                     text || ' extra token tail' AS text
              FROM documents WHERE doc_id % 4 != 0 AND doc_id < 20
              UNION ALL
              SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0
              UNION ALL
              SELECT doc_id + 400000 AS doc_id,
                     text || ' extra token tail' AS text
              FROM documents WHERE doc_id % 4 != 0 AND doc_id < 30
            ), {_SHINGLES},
            seeds AS (SELECT * FROM (VALUES {_MINHASH_SEEDS}) s(j, a, b)),
            mh AS (
              SELECT doc_id, j, min((a * sid + b) % 2147483647) AS mh
              FROM sids CROSS JOIN seeds GROUP BY doc_id, j
            ),
            bands AS (
              SELECT doc_id, j // 3 AS band,
                     string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j) AS key
              FROM mh GROUP BY doc_id, j // 3
            ),
            cands AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
            ),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS inter
              FROM cands c
              JOIN sids sa ON sa.doc_id = c.doc_a
              JOIN sids sb ON sb.doc_id = c.doc_b AND sb.sid = sa.sid
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT i.doc_a, i.doc_b
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b
              WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.5
            ),
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION
              SELECT doc_b, doc_a FROM pairs
            ),
            reach(id, lbl) AS (
              SELECT DISTINCT src, src FROM edges
              UNION
              SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
            ){delta_ctes if delta else ''}
            {delta_tail if delta else full_tail}
        """


_BRUTE_TOPK_PAIRS = """
    SELECT query_id, neighbor_id FROM (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                     e.embedding::DOUBLE[]), 4) DESC,
                        e.vec_id ASC) AS INTEGER) AS rnk
      FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
      WHERE q.vec_id < 10
    ) WHERE rnk <= 5
"""


def _ann_pq_oracle(
    k: int = 5,
    n_sub: int = 8,
    k_sub: int = 16,
    dim: int = 64,
    rerank: int = 100,
) -> str:
    """Exact oracle for the PQ pipeline: rank-spaced seeds, one Lloyd
    step per subspace (round(avg,6) means, round-6 L2 assignment with
    lower-code tie-break), ADC scoring through the (subspace, code)
    lookup table with exact DECIMAL partial sums, then the exact
    rerank of the ADC shortlist — mirrors
    similarity.pq_train_encode/cosine_topk_pq term for term."""
    sd = dim // n_sub
    l2 = (
        "round(list_sum(list_transform(list_zip(b.sv, c.cv), "
        "z -> (z[1]-z[2])*(z[1]-z[2]))), 6)"
    )
    assign = f"""
      SELECT vec_id, subspace, code, sv FROM (
        SELECT b.vec_id, b.subspace, c.code, b.sv,
               row_number() OVER (PARTITION BY b.vec_id, b.subspace
                 ORDER BY {l2} ASC, c.code ASC) AS rn
        FROM subs b JOIN {{cb}} c ON c.subspace = b.subspace)
      WHERE rn = 1
    """
    return f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    params AS (SELECT greatest(1, count(*) // {k_sub}) AS step FROM e),
    seed_ids AS MATERIALIZED (
      SELECT seed_id, CAST(rk - 1 AS INTEGER) AS code FROM (
        SELECT vec_id AS seed_id,
               row_number() OVER (ORDER BY vec_id) AS rk
        FROM e, params WHERE vec_id % step = 0)
      WHERE rk <= {k_sub}
    ),
    subs AS MATERIALIZED (
      SELECT vec_id, CAST(s.range AS INTEGER) AS subspace,
             v[s.range * {sd} + 1 : s.range * {sd} + {sd}] AS sv
      FROM e CROSS JOIN range(0, {n_sub}) s
    ),
    seeds AS MATERIALIZED (
      SELECT b.subspace, si.code, b.sv AS cv
      FROM subs b JOIN seed_ids si ON b.vec_id = si.seed_id
    ),
    assign0 AS MATERIALIZED ({assign.format(cb='seeds')}),
    cells AS (
      SELECT subspace, code, CAST(t.range AS INTEGER) AS d,
             sv[t.range] AS x
      FROM assign0 CROSS JOIN range(1, {sd + 1}) t
    ),
    codebooks AS MATERIALIZED (
      SELECT subspace, code, list(m ORDER BY d) AS cv FROM (
        SELECT subspace, code, d, round(avg(x), 6) AS m
        FROM cells GROUP BY subspace, code, d)
      GROUP BY subspace, code
    ),
    codes AS MATERIALIZED (
      SELECT vec_id, subspace, code
      FROM ({assign.format(cb='codebooks')})
    ),
    q AS MATERIALIZED (
      SELECT vec_id AS query_id, v,
             round(sqrt(list_sum(list_transform(v, x -> x * x))), 6)
               AS qnorm
      FROM e WHERE vec_id < 10
    ),
    qsubs AS (
      SELECT query_id, qnorm, CAST(s.range AS INTEGER) AS subspace,
             v[s.range * {sd} + 1 : s.range * {sd} + {sd}] AS qsv
      FROM q CROSS JOIN range(0, {n_sub}) s
    ),
    lut AS MATERIALIZED (
      SELECT query_id, qnorm, c.subspace, c.code,
             CAST(round(list_sum(list_transform(list_zip(qsv, c.cv),
                    z -> z[1] * z[2])), 6) AS DECIMAL(18,6)) AS pdot,
             CAST(round(list_sum(list_transform(list_zip(c.cv, c.cv),
                    z -> z[1] * z[2])), 6) AS DECIMAL(18,6)) AS cn2
      FROM qsubs JOIN codebooks c ON c.subspace = qsubs.subspace
    ),
    scored AS MATERIALIZED (
      SELECT query_id, qnorm, vec_id,
             CAST(sum(pdot) AS DOUBLE) AS sdot,
             CAST(sum(cn2) AS DOUBLE) AS scn2
      FROM codes JOIN lut USING (subspace, code)
      WHERE query_id <> vec_id
      GROUP BY 1, 2, 3
    )
    , shortlist AS MATERIALIZED (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY round(sdot / (qnorm * sqrt(scn2)), 4) DESC,
                          vec_id ASC) AS rnk
        FROM scored)
      WHERE rnk <= {rerank}
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM (
      SELECT s.query_id, s.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.v, e2.v), 4) AS cos_sim,
             CAST(row_number() OVER (PARTITION BY s.query_id
               ORDER BY round(list_cosine_similarity(q.v, e2.v), 4)
                          DESC,
                        s.vec_id ASC) AS INTEGER) AS rnk
      FROM shortlist s
      JOIN e e2 ON e2.vec_id = s.vec_id
      JOIN q ON q.query_id = s.query_id)
    WHERE rnk <= {k}
    ORDER BY query_id, rnk
    """


def _ann_ivfpq_oracle(
    k: int = 5, rerank: int = 50, q_max: int = 10, residual: bool = False
) -> str:
    """IVF-PQ composed oracle: the ann_ivf coarse-quantizer CTEs
    (seeds/assign/Lloyd/lists/probes) + the ann_pq codebook/codes/LUT
    CTEs, ADC scoring restricted to the probed inverted lists, exact
    rerank of the shortlist. Mirrors similarity.cosine_topk_ivfpq
    with the registry configuration (16 lists, nprobe 4, 8
    subspaces); defaults reproduce the ann_ivfpq_topk entry
    (queries vec_id < 10, rerank 50, k 5), the hybrid-fusion oracle
    instantiates it for one query with a deeper final list.

    ``residual=True`` replays the FAISS-proper residual path: the PQ
    half (seeds, codebooks, codes) trains on ``v - centroid(v)``
    (the rv CTE), and ADC scoring adds the per-(query, centroid)
    dot terms (qc) and the (centroid, subspace, code) cross-term
    table (cross_t) of the exact decomposition — every new term a
    round-6 DECIMAL(18,6) summed exactly, mirroring the Spark
    expressions term for term."""
    src = "rv" if residual else "e"
    rv_cte = """
    rv AS MATERIALIZED (
      SELECT l.vec_id,
             list_transform(list_zip(e.v, c.cv), z -> z[1] - z[2]) AS v
      FROM lists l
      JOIN e ON e.vec_id = l.vec_id
      JOIN cents c ON c.centroid_id = l.centroid_id
    ),""" if residual else ""
    if residual:
        resid_ctes = """
    qc AS MATERIALIZED (
      SELECT p.query_id, p.centroid_id,
             CAST(round(list_sum(list_transform(list_zip(q.v, c.cv),
                    z -> z[1] * z[2])), 6) AS DECIMAL(18,6)) AS qcdot,
             CAST(round(list_sum(list_transform(list_zip(c.cv, c.cv),
                    z -> z[1] * z[2])), 6) AS DECIMAL(18,6)) AS cn2c
      FROM probes p
      JOIN q ON q.query_id = p.query_id
      JOIN cents c ON c.centroid_id = p.centroid_id
    ),
    cross_t AS MATERIALIZED (
      SELECT c.centroid_id, cb.subspace, cb.code,
             CAST(round(list_sum(list_transform(
                    list_zip(c.cv[cb.subspace * 8 + 1 : cb.subspace * 8 + 8],
                             cb.cv),
                    z -> z[1] * z[2])), 6) AS DECIMAL(18,6)) AS cdot
      FROM cents c CROSS JOIN codebooks cb
    ),"""
        scored_cte = """
    scored AS MATERIALIZED (
      SELECT p.query_id, lut.qnorm, co.vec_id, li.centroid_id,
             sum(lut.pdot) AS sdot, sum(lut.cn2) AS scn2,
             sum(x.cdot) AS scdot
      FROM codes co
      JOIN lists li ON li.vec_id = co.vec_id
      JOIN probes p ON p.centroid_id = li.centroid_id
      JOIN lut ON lut.query_id = p.query_id
              AND lut.subspace = co.subspace AND lut.code = co.code
      JOIN cross_t x ON x.centroid_id = li.centroid_id
              AND x.subspace = co.subspace AND x.code = co.code
      WHERE p.query_id <> co.vec_id
      GROUP BY 1, 2, 3, 4
    ),
    adc AS MATERIALIZED (
      SELECT s.query_id, s.vec_id,
             round(CAST(qc.qcdot + s.sdot AS DOUBLE)
                   / (s.qnorm
                      * sqrt(CAST(qc.cn2c + 2 * s.scdot + s.scn2
                                  AS DOUBLE))), 4) AS approx_cos
      FROM scored s
      JOIN qc ON qc.query_id = s.query_id
             AND qc.centroid_id = s.centroid_id
    )"""
    else:
        resid_ctes = ""
        scored_cte = """
    scored AS MATERIALIZED (
      SELECT p.query_id, lut.qnorm, co.vec_id,
             CAST(sum(lut.pdot) AS DOUBLE) AS sdot,
             CAST(sum(lut.cn2) AS DOUBLE) AS scn2
      FROM codes co
      JOIN lists li ON li.vec_id = co.vec_id
      JOIN probes p ON p.centroid_id = li.centroid_id
      JOIN lut ON lut.query_id = p.query_id
              AND lut.subspace = co.subspace AND lut.code = co.code
      WHERE p.query_id <> co.vec_id
      GROUP BY 1, 2, 3
    ),
    adc AS MATERIALIZED (
      SELECT query_id, vec_id,
             round(sdot / (qnorm * sqrt(scn2)), 4) AS approx_cos
      FROM scored
    )"""
    return f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    params AS (SELECT greatest(1, count(*) // 16) AS step FROM e),
    iseeds AS (
      SELECT CAST(rk - 1 AS INTEGER) AS centroid_id, v AS cv FROM (
        SELECT v, row_number() OVER (ORDER BY vec_id) AS rk
        FROM e, params WHERE vec_id % step = 0)
      WHERE rk <= 16
    ),
    iassign0 AS MATERIALIZED (
      SELECT vec_id, v, centroid_id FROM (
        SELECT r.vec_id, r.v, c.centroid_id,
               row_number() OVER (PARTITION BY r.vec_id
                 ORDER BY round(list_cosine_similarity(r.v, c.cv), 6)
                          DESC, c.centroid_id ASC) AS rn
        FROM e r CROSS JOIN iseeds c)
      WHERE rn = 1
    ),
    icells AS (
      SELECT centroid_id, CAST(t.range AS INTEGER) AS d,
             v[t.range] AS x
      FROM iassign0 CROSS JOIN range(1, 65) t
    ),
    cents AS MATERIALIZED (
      SELECT centroid_id, list(m ORDER BY d) AS cv FROM (
        SELECT centroid_id, d, round(avg(x), 6) AS m
        FROM icells GROUP BY centroid_id, d)
      GROUP BY centroid_id
    ),
    lists AS MATERIALIZED (
      SELECT vec_id, centroid_id FROM (
        SELECT r.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY r.vec_id
                 ORDER BY round(list_cosine_similarity(r.v, c.cv), 6)
                          DESC, c.centroid_id ASC) AS rn
        FROM e r CROSS JOIN cents c)
      WHERE rn = 1
    ),
    {rv_cte}
    probes AS MATERIALIZED (
      SELECT query_id, centroid_id FROM (
        SELECT q.vec_id AS query_id, c.centroid_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.v, c.cv), 6)
                          DESC, c.centroid_id ASC) AS rn
        FROM e q CROSS JOIN cents c WHERE q.vec_id < {q_max})
      WHERE rn <= 4
    ),
    seed_ids AS MATERIALIZED (
      SELECT seed_id, CAST(rk - 1 AS INTEGER) AS code FROM (
        SELECT vec_id AS seed_id,
               row_number() OVER (ORDER BY vec_id) AS rk
        FROM e, params WHERE vec_id % step = 0)
      WHERE rk <= 16
    ),
    subs AS MATERIALIZED (
      SELECT vec_id, CAST(s.range AS INTEGER) AS subspace,
             v[s.range * 8 + 1 : s.range * 8 + 8] AS sv
      FROM {src} CROSS JOIN range(0, 8) s
    ),
    pseeds AS MATERIALIZED (
      SELECT b.subspace, si.code, b.sv AS cv
      FROM subs b JOIN seed_ids si ON b.vec_id = si.seed_id
    ),
    passign0 AS MATERIALIZED (
      SELECT vec_id, subspace, code, sv FROM (
        SELECT b.vec_id, b.subspace, c.code, b.sv,
               row_number() OVER (PARTITION BY b.vec_id, b.subspace
                 ORDER BY round(list_sum(list_transform(list_zip(b.sv, c.cv), z -> (z[1]-z[2])*(z[1]-z[2]))), 6) ASC, c.code ASC) AS rn
        FROM subs b JOIN pseeds c ON c.subspace = b.subspace)
      WHERE rn = 1
    ),
    pcells AS (
      SELECT subspace, code, CAST(t.range AS INTEGER) AS d,
             sv[t.range] AS x
      FROM passign0 CROSS JOIN range(1, 9) t
    ),
    codebooks AS MATERIALIZED (
      SELECT subspace, code, list(m ORDER BY d) AS cv FROM (
        SELECT subspace, code, d, round(avg(x), 6) AS m
        FROM pcells GROUP BY subspace, code, d)
      GROUP BY subspace, code
    ),
    codes AS MATERIALIZED (
      SELECT vec_id, subspace, code FROM (
        SELECT b.vec_id, b.subspace, c.code,
               row_number() OVER (PARTITION BY b.vec_id, b.subspace
                 ORDER BY round(list_sum(list_transform(list_zip(b.sv, c.cv), z -> (z[1]-z[2])*(z[1]-z[2]))), 6) ASC, c.code ASC) AS rn
        FROM subs b JOIN codebooks c ON c.subspace = b.subspace)
      WHERE rn = 1
    ),
    q AS MATERIALIZED (
      SELECT vec_id AS query_id, v,
             round(sqrt(list_sum(list_transform(v, x -> x * x))), 6)
               AS qnorm
      FROM e WHERE vec_id < {q_max}
    ),
    qsubs AS (
      SELECT query_id, qnorm, CAST(s.range AS INTEGER) AS subspace,
             v[s.range * 8 + 1 : s.range * 8 + 8] AS qsv
      FROM q CROSS JOIN range(0, 8) s
    ),
    lut AS MATERIALIZED (
      SELECT query_id, qnorm, c.subspace, c.code,
             CAST(round(list_sum(list_transform(list_zip(qsv, c.cv),
                    z -> z[1] * z[2])), 6) AS DECIMAL(18,6)) AS pdot,
             CAST(round(list_sum(list_transform(list_zip(c.cv, c.cv),
                    z -> z[1] * z[2])), 6) AS DECIMAL(18,6)) AS cn2
      FROM qsubs JOIN codebooks c ON c.subspace = qsubs.subspace
    ),
    {resid_ctes}{scored_cte},
    shortlist AS MATERIALIZED (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY approx_cos DESC, vec_id ASC) AS rnk
        FROM adc)
      WHERE rnk <= {rerank}
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM (
      SELECT s.query_id, s.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.v, e2.v), 4) AS cos_sim,
             CAST(row_number() OVER (PARTITION BY s.query_id
               ORDER BY round(list_cosine_similarity(q.v, e2.v), 4)
                          DESC,
                        s.vec_id ASC) AS INTEGER) AS rnk
      FROM shortlist s
      JOIN e e2 ON e2.vec_id = s.vec_id
      JOIN q ON q.query_id = s.query_id)
    WHERE rnk <= {k}
    ORDER BY query_id, rnk
        """


def _ann_ivfsq_oracle(
    k: int = 5, rerank: int = 50, nprobe: int = 4, q_max: int = 10
) -> str:
    """IVF-SQ8 oracle: the ann_ivf coarse-quantizer CTEs, a map-only
    int8 encode (round(x*127/max|x|)), the decomposed probe/score
    expressions mirroring similarity.cosine_topk_ivfsq term for term
    (round-6 qnorm, unrounded centroid norm, round-6 probe sim,
    round-4 asymmetric cosine over integer codes), exact rerank."""
    assign = """
      SELECT vec_id, v, centroid_id FROM (
        SELECT r.vec_id, r.v, c.centroid_id,
               row_number() OVER (PARTITION BY r.vec_id
                 ORDER BY round(list_cosine_similarity(r.v, c.cv), 6)
                          DESC, c.centroid_id ASC) AS rn
        FROM e r CROSS JOIN {cents} c)
      WHERE rn = 1
    """
    return f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    params AS (SELECT greatest(1, count(*) // 16) AS step FROM e),
    iseeds AS (
      SELECT CAST(rk - 1 AS INTEGER) AS centroid_id, v AS cv FROM (
        SELECT v, row_number() OVER (ORDER BY vec_id) AS rk
        FROM e, params WHERE vec_id % step = 0)
      WHERE rk <= 16
    ),
    iassign0 AS MATERIALIZED ({assign.format(cents='iseeds')}),
    icells AS (
      SELECT centroid_id, CAST(t.range AS INTEGER) AS d,
             v[t.range] AS x
      FROM iassign0 CROSS JOIN range(1, 65) t
    ),
    cents AS MATERIALIZED (
      SELECT centroid_id, list(m ORDER BY d) AS cv FROM (
        SELECT centroid_id, d, round(avg(x), 6) AS m
        FROM icells GROUP BY centroid_id, d)
      GROUP BY centroid_id
    ),
    lists AS MATERIALIZED (
      SELECT vec_id, centroid_id FROM ({assign.format(cents='cents')})
    ),
    codes AS MATERIALIZED (
      SELECT vec_id, codes,
             round(sqrt(list_sum(list_transform(codes,
                    c -> CAST(c AS DOUBLE) * CAST(c AS DOUBLE)))), 6)
               AS cnorm
      FROM (
        SELECT vec_id,
               -- zero-vector guard twin: max|x|=0 divides by 1
               list_transform(v, x -> CAST(round(
                 x * 127.0 / (CASE
                   WHEN list_max(list_transform(v, y -> abs(y))) = 0
                   THEN 1.0
                   ELSE list_max(list_transform(v, y -> abs(y))) END))
                 AS INTEGER)) AS codes
        FROM e)
    ),
    q AS MATERIALIZED (
      SELECT vec_id AS query_id, v AS qv,
             round(sqrt(list_sum(list_transform(v, x -> x * x))), 6)
               AS qnorm
      FROM e WHERE vec_id < {q_max}
    ),
    probes AS MATERIALIZED (
      SELECT query_id, qv, qnorm, centroid_id FROM (
        SELECT q.query_id, q.qv, q.qnorm, c.centroid_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY (CASE WHEN q.qnorm = 0 OR
                   sqrt(list_sum(list_transform(c.cv,
                        x -> x * x))) = 0 THEN 0.0 ELSE round(
                   list_sum(list_transform(list_zip(q.qv, c.cv),
                            z -> z[1] * z[2]))
                   / (q.qnorm * sqrt(list_sum(list_transform(c.cv,
                        x -> x * x)))), 6) END) DESC,
                   c.centroid_id ASC) AS rn
        FROM q CROSS JOIN cents c)
      WHERE rn <= {nprobe}
    ),
    scored AS MATERIALIZED (
      SELECT p.query_id, co.vec_id,
             -- zero-vector guard twin: cnorm/qnorm 0 scores 0
             CASE WHEN co.cnorm = 0 OR p.qnorm = 0 THEN 0.0
                  ELSE round(
               list_sum(list_transform(list_zip(p.qv, co.codes),
                        z -> z[1] * CAST(z[2] AS DOUBLE)))
               / (p.qnorm * co.cnorm), 4) END AS approx_cos
      FROM codes co
      JOIN lists li ON li.vec_id = co.vec_id
      JOIN probes p ON p.centroid_id = li.centroid_id
      WHERE p.query_id <> co.vec_id
    ),
    shortlist AS MATERIALIZED (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY approx_cos DESC, vec_id ASC) AS rnk
        FROM scored)
      WHERE rnk <= {rerank}
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM (
      SELECT s.query_id, s.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qv, e2.v), 4) AS cos_sim,
             CAST(row_number() OVER (PARTITION BY s.query_id
               ORDER BY round(list_cosine_similarity(q.qv, e2.v), 4)
                          DESC,
                        s.vec_id ASC) AS INTEGER) AS rnk
      FROM shortlist s
      JOIN e e2 ON e2.vec_id = s.vec_id
      JOIN q ON q.query_id = s.query_id)
    WHERE rnk <= {k}
    ORDER BY query_id, rnk
    """


def _unigram_oracle(em_rounds: int = 2, segment: bool = False) -> str:
    """GENERATED oracle for operators/unigram_lm.unigram_lm_vocab —
    the BPE-oracle recipe scaled up: per EM round, 16 unrolled
    integer-exact Viterbi DP CTEs (argmax by the same score*8+k
    encoding, ties to the larger last piece) plus 16 backtrace CTEs
    emitting the chosen pieces, then the add-one-smoothed
    re-estimation. The only float ops are ln (micro-quantized, the
    ngram-LM precedent) and the seed/new-count divisions — the DP
    itself is pure BIGINT arithmetic, so segmentations can never
    drift between engines."""
    L, P, M = 16, 3, 48
    parts = [f"""
    WITH w AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS wcount FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        FROM documents)
      WHERE length(word) <= {L}
      GROUP BY word
    ),
    subs AS MATERIALIZED (
      SELECT word, wcount, j, k, substr(word, j, k) AS piece,
             j + k - 1 AS end_pos
      FROM (
        SELECT word, wcount, CAST(jj.range AS INTEGER) AS j,
               CAST(kk.range AS INTEGER) AS k
        FROM w
        CROSS JOIN range(1, {L + 1}) jj
        CROSS JOIN range(1, {P + 1}) kk
        WHERE jj.range <= length(word)
          AND jj.range + kk.range - 1 <= length(word))
    ),
    counts AS (
      SELECT piece, CAST(sum(wcount) AS BIGINT) AS pcount
      FROM subs GROUP BY piece
    ),
    cands AS MATERIALIZED (
      SELECT piece, pcount FROM counts WHERE length(piece) = 1
      UNION ALL
      SELECT piece, pcount FROM (
        SELECT piece, pcount,
               row_number() OVER (ORDER BY pcount DESC, piece ASC) AS rn
        FROM counts WHERE length(piece) > 1)
      WHERE rn <= {M}
    ),
    lp0 AS MATERIALIZED (
      SELECT piece,
             CAST(round(ln(CAST(pcount AS DOUBLE) / t.tot)
                        * 1000000.0) AS BIGINT) AS lp_micro
      FROM cands,
           (SELECT CAST(sum(pcount) AS DOUBLE) AS tot FROM cands) t
    )"""]
    for r in range(1, em_rounds + 1):
        parts.append(f"""
    , sc{r} AS MATERIALIZED (
      SELECT s.word, s.k, s.end_pos, l.lp_micro
      FROM subs s JOIN lp{r - 1} l USING (piece)
    ),
    b{r}_0 AS (SELECT word, CAST(0 AS BIGINT) AS score, 0 AS bk FROM w)""")
        for j in range(1, L + 1):
            branches = []
            for k in range(1, min(P, j) + 1):
                branches.append(f"""
          SELECT s.word, p.score + s.lp_micro AS score, {k} AS bk
          FROM sc{r} s JOIN b{r}_{j - k} p ON p.word = s.word
          WHERE s.end_pos = {j} AND s.k = {k}""")
            body = " UNION ALL ".join(branches)
            parts.append(f"""
    , b{r}_{j} AS MATERIALIZED (
      SELECT word, score, bk FROM (
        SELECT word, score, bk,
               row_number() OVER (PARTITION BY word
                 ORDER BY score * 8 + bk DESC) AS rn
        FROM ({body}))
      WHERE rn = 1
    )""")
        ball = " UNION ALL ".join(
            f"SELECT word, {j} AS j, bk FROM b{r}_{j}"
            for j in range(1, L + 1)
        )
        parts.append(f"""
    , ball{r} AS MATERIALIZED ({ball}),
    t{r}_0 AS (
      SELECT word, wcount, length(word) AS pos FROM w
      WHERE length(word) > 0
    )""")
        for s in range(1, L + 1):
            parts.append(f"""
    , u{r}_{s} AS MATERIALIZED (
      SELECT t.word, t.wcount,
             substr(t.word, t.pos - b.bk + 1, b.bk) AS piece,
             t.pos - b.bk AS npos
      FROM t{r}_{s - 1} t
      JOIN ball{r} b ON b.word = t.word AND b.j = t.pos
    ),
    t{r}_{s} AS (
      SELECT word, wcount, npos AS pos FROM u{r}_{s} WHERE npos > 0
    )""")
        emitted = " UNION ALL ".join(
            f"SELECT piece, wcount FROM u{r}_{s}" for s in range(1, L + 1)
        )
        parts.append(f"""
    , usage{r} AS (
      SELECT piece, CAST(sum(wcount) AS BIGINT) AS us
      FROM ({emitted}) GROUP BY piece
    ),
    cnt{r} AS MATERIALIZED (
      SELECT c.piece, CAST(COALESCE(u.us, 0) + 1 AS BIGINT) AS count1
      FROM cands c LEFT JOIN usage{r} u USING (piece)
    ),
    lp{r} AS MATERIALIZED (
      SELECT piece,
             CAST(round(ln(CAST(count1 AS DOUBLE) / t.tot)
                        * 1000000.0) AS BIGINT) AS lp_micro
      FROM cnt{r},
           (SELECT CAST(sum(count1) AS DOUBLE) AS tot FROM cnt{r}) t
    )""")
    R = em_rounds
    if not segment:
        parts.append(f"""
    SELECT c.piece, CAST(length(c.piece) AS INTEGER) AS n_chars,
           c.count1 AS final_count, l.lp_micro
    FROM cnt{R} c JOIN lp{R} l USING (piece)
    """)
        return "".join(parts)
    # APPLY variant: one more Viterbi pass under the FINAL model
    # lp{R}, then the word -> in-order piece-stream map and the
    # position-exploded corpus join (twin of unigram_segment_corpus)
    r = R + 1
    parts.append(f"""
    , sc{r} AS MATERIALIZED (
      SELECT s.word, s.k, s.end_pos, l.lp_micro
      FROM subs s JOIN lp{R} l USING (piece)
    ),
    b{r}_0 AS (SELECT word, CAST(0 AS BIGINT) AS score, 0 AS bk FROM w)""")
    for j in range(1, L + 1):
        branches = []
        for k in range(1, min(P, j) + 1):
            branches.append(f"""
          SELECT s.word, p.score + s.lp_micro AS score, {k} AS bk
          FROM sc{r} s JOIN b{r}_{j - k} p ON p.word = s.word
          WHERE s.end_pos = {j} AND s.k = {k}""")
        body = " UNION ALL ".join(branches)
        parts.append(f"""
    , b{r}_{j} AS MATERIALIZED (
      SELECT word, score, bk FROM (
        SELECT word, score, bk,
               row_number() OVER (PARTITION BY word
                 ORDER BY score * 8 + bk DESC) AS rn
        FROM ({body}))
      WHERE rn = 1
    )""")
    ball = " UNION ALL ".join(
        f"SELECT word, {j} AS j, bk FROM b{r}_{j}" for j in range(1, L + 1)
    )
    parts.append(f"""
    , ball{r} AS MATERIALIZED ({ball}),
    t{r}_0 AS (
      SELECT word, wcount, length(word) AS pos FROM w
      WHERE length(word) > 0
    )""")
    for s in range(1, L + 1):
        parts.append(f"""
    , u{r}_{s} AS MATERIALIZED (
      SELECT t.word, t.wcount,
             substr(t.word, t.pos - b.bk + 1, b.bk) AS piece,
             t.pos - b.bk AS npos
      FROM t{r}_{s - 1} t
      JOIN ball{r} b ON b.word = t.word AND b.j = t.pos
    ),
    t{r}_{s} AS (
      SELECT word, wcount, npos AS pos FROM u{r}_{s} WHERE npos > 0
    )""")
    seg_union = " UNION ALL ".join(
        f"SELECT word, {s} AS step, piece FROM u{r}_{s}"
        for s in range(1, L + 1)
    )
    parts.append(f"""
    , wp AS MATERIALIZED (
      SELECT word,
             string_agg(piece, '|' ORDER BY step DESC) AS pieces_str,
             CAST(count(*) AS BIGINT) AS n_pieces
      FROM ({seg_union}) GROUP BY word
    ),
    docw AS (
      SELECT doc_id, CAST(i AS INTEGER) AS pos, ws[i + 1] AS word
      FROM (
        SELECT doc_id, ws, unnest(range(len(ws))) AS i
        FROM (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z]+') AS ws
              FROM documents))
    ),
    per AS (
      SELECT e.doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(COALESCE(wp.n_pieces, length(e.word)))
                  AS BIGINT) AS n_tokens,
             md5(string_agg(
               COALESCE(wp.pieces_str,
                        array_to_string(
                          regexp_extract_all(e.word, '.'), '|')),
               '|' ORDER BY e.pos)) AS token_fp
      FROM docw e LEFT JOIN wp ON wp.word = e.word
      GROUP BY e.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_words, 0) AS BIGINT) AS n_words,
           CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           COALESCE(p.token_fp, md5('')) AS token_fp
    FROM documents d LEFT JOIN per p USING (doc_id)
    """)
    return "".join(parts)


def _semantic_decontam_oracle(threshold: float = 0.4, n_planes: int = 8) -> str:
    """Twin of llm_queries.decontaminate_semantic: same planted
    training side, the deterministic hyperplane buckets
    (_lsh_bucket_sql — bit-for-bit the Spark chain), benchmark-side
    Hamming-1 probes, exact-cosine verify, per-training-vector
    aggregation with a total (0/NULL/0) annotation."""
    probes = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << j})" for j in range(n_planes)]
    )
    return f"""
    WITH bench AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50
    ),
    train AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 50
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, embedding FROM bench
    ),
    tb AS (
      SELECT vec_id, embedding,
             CAST({_lsh_bucket_sql()} AS INTEGER) AS bucket
      FROM (SELECT vec_id, embedding,
                   CAST(embedding AS DOUBLE[]) AS e FROM train)
    ),
    qb0 AS (
      SELECT vec_id AS bench_id, embedding AS qv,
             CAST({_lsh_bucket_sql()} AS INTEGER) AS bucket
      FROM (SELECT vec_id, embedding,
                   CAST(embedding AS DOUBLE[]) AS e FROM bench)
    ),
    qb AS (
      SELECT bench_id, qv, unnest([{probes}]) AS bucket FROM qb0
    ),
    cand AS (
      SELECT DISTINCT t.vec_id, q.bench_id,
             round(list_cosine_similarity(q.qv::DOUBLE[],
                                          t.embedding::DOUBLE[]), 4)
               AS cos_sim
      FROM tb t JOIN qb q ON q.bucket = t.bucket
      WHERE round(list_cosine_similarity(q.qv::DOUBLE[],
                                         t.embedding::DOUBLE[]), 4)
            >= {threshold}
    ),
    hits AS (
      SELECT vec_id, count(DISTINCT bench_id) AS n_bench_matches,
             max(cos_sim) AS max_cos
      FROM cand GROUP BY vec_id
    )
    SELECT t.vec_id,
           COALESCE(h.n_bench_matches, 0) AS n_bench_matches,
           h.max_cos,
           CAST(CASE WHEN h.n_bench_matches IS NULL THEN 0 ELSE 1 END
                AS INTEGER) AS contaminated
    FROM train t LEFT JOIN hits h USING (vec_id)
    """


def _ccnet_buckets_oracle() -> str:
    """Twin of llm_queries.curation_ccnet_buckets: the text_langid
    and text_ngram_lm_score oracle chains composed over one shared
    normalized-token CTE, per-language tercile boundaries via
    quantile_cont rounded to 6 (mirroring the Spark side's rounded
    F.percentile so interpolation ulps cannot flip a comparison),
    then the same three-way CASE."""
    return f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w
      FROM documents
    ),
    toks AS (SELECT doc_id, unnest(w) AS w1 FROM norm),
    uni AS (SELECT w1, count(*) AS cu FROM toks GROUP BY w1),
    v AS (SELECT count(*) AS V FROM uni),
    bg AS (
      SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
      FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
            FROM norm)
    ),
    big AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
    sc AS (
      SELECT bg.doc_id,
             CAST(round(-ln(CAST(cb + 1 AS DOUBLE)
                          / CAST(cu + V AS DOUBLE))
                        * 1000000.0) AS BIGINT) AS s_micro
      FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1)
      CROSS JOIN v
    ),
    per AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             round(CAST(sum(s_micro) AS DOUBLE)
                   / (count(*) * 1000000.0), 6) AS avg_surprisal
      FROM sc GROUP BY doc_id
    ),
    lid AS (
      SELECT doc_id,
        CAST(len(list_filter(w, x -> list_contains(
          ['the','a','of','and','to','in','is'], x))) AS INTEGER) AS score_en,
        CAST(len(list_filter(w, x -> list_contains(
          ['der','die','und','das','ist','nicht'], x))) AS INTEGER) AS score_de,
        CAST(len(list_filter(w, x -> list_contains(
          ['el','los','y','que','es','una'], x))) AS INTEGER) AS score_es,
        CAST(len(list_filter(w, x -> list_contains(
          ['le','les','et','des','est','une'], x))) AS INTEGER) AS score_fr
      FROM norm
    ),
    lang AS (
      SELECT doc_id,
             CASE WHEN greatest(score_en, score_de, score_es, score_fr) <= 0 THEN 'und'
                  WHEN score_en = greatest(score_en, score_de, score_es, score_fr) THEN 'en'
                  WHEN score_de = greatest(score_en, score_de, score_es, score_fr) THEN 'de'
                  WHEN score_es = greatest(score_en, score_de, score_es, score_fr) THEN 'es'
                  ELSE 'fr' END AS predicted_lang
      FROM lid
    ),
    j AS (
      SELECT d.doc_id, l.predicted_lang,
             COALESCE(p.n_bigrams, 0) AS n_bigrams, p.avg_surprisal
      FROM documents d
      JOIN lang l USING (doc_id)
      LEFT JOIN per p USING (doc_id)
    ),
    bounds AS (
      SELECT predicted_lang,
             round(quantile_cont(avg_surprisal, {1 / 3!r}), 6) AS b1,
             round(quantile_cont(avg_surprisal, {2 / 3!r}), 6) AS b2
      FROM j WHERE avg_surprisal IS NOT NULL
      GROUP BY predicted_lang
    )
    SELECT j.doc_id, j.predicted_lang, j.n_bigrams, j.avg_surprisal,
           CASE WHEN j.avg_surprisal IS NULL THEN NULL
                WHEN j.avg_surprisal <= b.b1 THEN 'head'
                WHEN j.avg_surprisal <= b.b2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM j LEFT JOIN bounds b USING (predicted_lang)
    """


def _ann_recall_oracle(k: int = 5) -> str:
    """Recall@k oracle composed from the exact ANN mirrors: brute
    ground truth plus LSH, IVF, PQ, and IVF-PQ all recomputed in
    SQL (the pq/ivfpq full oracles nest as derived tables, their
    inner WITH scopes shadowing cleanly), then the same hit counting
    the Spark query does. Floors mirror
    llm_queries.ANN_RECALL_FLOOR."""
    return f"""
    WITH brute AS ({_BRUTE_TOPK_PAIRS}),
    lshq AS ({_ann_lsh_oracle(k=k)}),
    ivfq AS ({_ann_ivf_oracle(k=k)}),
    pqq AS (SELECT query_id, neighbor_id FROM ({_ann_pq_oracle(k=k)})),
    ivfpqq AS (SELECT query_id, neighbor_id
               FROM ({_ann_ivfpq_oracle(residual=True)})),
    truth AS (SELECT count(*) AS truth FROM brute),
    m AS (
      SELECT 'lsh' AS method, count(*) AS hits
      FROM lshq JOIN brute USING (query_id, neighbor_id)
      UNION ALL
      SELECT 'ivf' AS method, count(*) AS hits
      FROM ivfq JOIN brute USING (query_id, neighbor_id)
      UNION ALL
      SELECT 'pq' AS method, count(*) AS hits
      FROM pqq JOIN brute USING (query_id, neighbor_id)
      UNION ALL
      SELECT 'ivfpq' AS method, count(*) AS hits
      FROM ivfpqq JOIN brute USING (query_id, neighbor_id)
    )
    SELECT method, CAST({k} AS INTEGER) AS k,
           CAST(hits AS BIGINT) AS hits,
           CAST(truth AS BIGINT) AS truth,
           round(hits / truth, 4) AS recall,
           (CASE method {_recall_floor_cases()}
                        ELSE NULL END) AS meets_floor
    FROM m CROSS JOIN truth
    """


def _recall_floor_cases() -> str:
    """Floor WHENs generated from llm_queries.ANN_RECALL_FLOOR — one
    source of truth for Spark and oracle."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators.llm_queries import (
        ANN_RECALL_FLOOR,
    )

    return " ".join(
        f"WHEN '{m}' THEN hits > {f} * truth"
        for m, f in sorted(ANN_RECALL_FLOOR.items())
    )


_MINHASH_SEEDS = ",".join(
    f"({j},{a},{b})"
    for j, (a, b) in enumerate(
        zip([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47],
            [3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41])
    )
)


def _simhash_oracle() -> str:
    # token bit b = bit b of md5 (two 60-bit chunks) — twin of
    # dedup.simhash_signatures' shift+mask scheme
    def bit(b: int) -> str:
        return f"((tid_lo >> {b}) & 1)" if b < 60 else f"((tid_hi >> {b - 60}) & 1)"

    bitsums = ",\n         ".join(
        f"sum({bit(b)}) AS c{b}" for b in range(62)
    )
    simhash = " + ".join(
        f"CASE WHEN 2 * c{b} > n_tok THEN CAST({2 ** b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(62)
    )
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text || ' zzzz' AS text
      FROM documents WHERE doc_id < 30
    ),
    toks AS (
      SELECT DISTINCT doc_id, u.word AS word
      FROM (SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w FROM corpus),
           unnest(w) AS u(word)
    ),
    tids AS (
      SELECT doc_id,
             ('0x' || substr(md5(word), 1, 15))::BIGINT AS tid_lo,
             ('0x' || substr(md5(word), 16, 15))::BIGINT AS tid_hi
      FROM toks
    ),
    counts AS (
      SELECT doc_id, count(*) AS n_tok,
         {bitsums}
      FROM tids GROUP BY doc_id
    ),
    sigs AS (SELECT doc_id, ({simhash}) AS simhash FROM counts)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


_LATEST_PER_USER = """
SELECT user_id, event_id, event_type, value, ts FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


def _bm25_scored_sql() -> str:
    """WITH-chain ending at BM25's ``scored(doc_id, bm25,
    n_matched_terms)`` for the fixed registry terms — the shared
    prefix of the text_bm25_topk oracle and the hybrid-fusion
    oracle. Arithmetic mirrors text.bm25_topk: integer tf/dl/df,
    idf and per-term contributions quantized to micro-unit BIGINTs
    before the exact per-doc sum."""
    return f"""
            WITH norm AS (
              SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents
            ),
            dl AS (
              SELECT doc_id,
                     CASE WHEN len(w) = 1 AND w[1] = '' THEN 0
                          ELSE len(w) END AS dl
              FROM norm
            ),
            stats AS (
              SELECT count(*) AS N, sum(dl) AS sum_dl FROM dl
            ),
            toks AS (
              SELECT doc_id, unnest(w) AS term FROM norm
            ),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM toks
              WHERE term IN ('hash', 'join', 'vector')
              GROUP BY doc_id, term
            ),
            dfreq AS (
              SELECT term, count(*) AS df_t FROM tf GROUP BY term
            ),
            idf AS (
              SELECT term,
                     CAST(round(ln(1.0 + (N - df_t + 0.5) / (df_t + 0.5))
                                * 1000000.0) AS BIGINT) AS idf_micro
              FROM dfreq CROSS JOIN stats
            ),
            contrib AS (
              SELECT tf.doc_id,
                     CAST(round(
                       CAST(idf_micro AS DOUBLE)
                       * (tf * 2.2)
                       / (tf + 1.2 * (0.25
                            + 0.75 * dl
                              / (CAST(sum_dl AS DOUBLE) / N)))
                     ) AS BIGINT) AS contrib_micro
              FROM tf
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats
              JOIN idf ON idf.term = tf.term
            ),
            scored AS (
              SELECT doc_id,
                     round(CAST(sum(contrib_micro) AS DOUBLE)
                           / 1000000.0, 6) AS bm25,
                     CAST(count(*) AS BIGINT) AS n_matched_terms
              FROM contrib GROUP BY doc_id
            )
    """


def _hybrid_oracle(k: int = 10, topn: int = 20, k0: int = 60) -> str:
    """Twin of llm_queries.hybrid_bm25_ann_topk: the BM25 top-``topn``
    list ranked (bm25 DESC, doc_id ASC), the IVF-PQ top-``topn`` list
    for query vec_id=0 (full _ann_ivfpq_oracle instantiated with
    q_max=1), FULL OUTER joined on doc_id, reciprocal-rank-fusion
    scored with the same fixed-order double sum, top-``k``."""
    lex_topn = _bm25_scored_sql() + f"""
            SELECT doc_id, bm25
            FROM scored
            ORDER BY bm25 DESC, doc_id ASC
            LIMIT {topn}
    """
    return f"""
    WITH lex AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)
                  AS INTEGER) AS lex_rank
      FROM ({lex_topn})
    ),
    vec AS (
      SELECT neighbor_id AS doc_id, rnk AS vec_rank
      FROM ({_ann_ivfpq_oracle(k=topn, rerank=50, q_max=1)})
    ),
    fused AS (
      SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
             lex_rank, vec_rank
      FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
    )
    SELECT doc_id, lex_rank, vec_rank,
           round(coalesce(CAST(1.0 AS DOUBLE) / ({k0} + lex_rank), 0.0)
                 + coalesce(CAST(1.0 AS DOUBLE) / ({k0} + vec_rank), 0.0),
                 6) AS rrf
    FROM fused
    ORDER BY rrf DESC, doc_id ASC
    LIMIT {k}
    """


def _hard_negatives_oracle(topn: int = 20) -> str:
    """Twin of llm_queries.retrieval_hard_negatives: the IVF-PQ
    top-``topn`` neighbors of query vec_id=0 anti-joined against the
    BM25 top-``topn`` lexical positive set, re-ranked by vector rank
    (a <= topn-row window)."""
    lex_topn = _bm25_scored_sql() + f"""
            SELECT doc_id, bm25
            FROM scored
            ORDER BY bm25 DESC, doc_id ASC
            LIMIT {topn}
    """
    return f"""
    WITH lex AS (SELECT doc_id FROM ({lex_topn})),
    vec AS (
      SELECT neighbor_id AS doc_id, rnk AS vec_rank
      FROM ({_ann_ivfpq_oracle(k=topn, rerank=50, q_max=1)})
    )
    SELECT v.doc_id,
           CAST(row_number() OVER (ORDER BY v.vec_rank ASC)
                AS INTEGER) AS neg_rank,
           v.vec_rank
    FROM vec v LEFT JOIN lex ON lex.doc_id = v.doc_id
    WHERE lex.doc_id IS NULL
    ORDER BY neg_rank
    """


def oracle_sql() -> dict[str, str]:
    return {
        # r10 third window: segmental TTR — positions from the range
        # subscript (same token stream as the Spark posexplode,
        # interior empties impossible after normalization)
        "text_segment_ttr": f"""
            WITH corpus AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 13 = 0
                          THEN text || ' the same words repeat the same'
                               || ' words repeat the same words repeat'
                               || ' the same words repeat'
                          ELSE text END AS text
              FROM documents
            ),
            nw AS (
              SELECT doc_id,
                     string_split({_NORM.format(t='text')}, ' ') AS w
              FROM corpus
            ),
            toks AS (
              SELECT doc_id, i - 1 AS pos, w[i] AS tok
              FROM nw, unnest(range(1, len(w) + 1)) AS t(i)
              WHERE w[i] <> ''
            )
            SELECT doc_id,
                   CAST(pos // 50 AS BIGINT) AS seg,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(count(DISTINCT tok) AS BIGINT) AS n_types,
                   (1000000 * count(DISTINCT tok)) // count(*) AS ttr_ppm
            FROM toks GROUP BY doc_id, pos // 50
        """,
        # r10 third window: phash pairs -> min-label closure (the
        # dedup_components recursive-reach oracle over the phash
        # edge set; corpus bounded to doc_id < 1500)
        "dedup_image_phash_components": """
            WITH RECURSIVE dims AS (
              SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h,
                     CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 3 END AS ch
              FROM documents WHERE doc_id < 1500
            ),
            cells AS (
              SELECT doc_id, w, h, ch, y.y, x.x
              FROM dims, unnest(range(8)) AS y(y), unnest(range(8)) AS x(x)
            ),
            samp AS (
              SELECT doc_id, y * 8 + x AS b,
                     CASE WHEN ch = 1
                          THEN (7 * ((y*h)//8*w + (x*w)//8) + doc_id) % 256
                          ELSE ((7 * (3*((y*h)//8*w + (x*w)//8)) + doc_id) % 256
                              + (7 * (3*((y*h)//8*w + (x*w)//8) + 1) + doc_id) % 256
                              + (7 * (3*((y*h)//8*w + (x*w)//8) + 2) + doc_id) % 256
                               ) // 3
                     END AS g
              FROM cells
            ),
            tot AS (SELECT doc_id, sum(g) AS total FROM samp GROUP BY doc_id),
            bits AS (
              SELECT s.doc_id, s.b,
                     CASE WHEN 64 * s.g > t.total THEN 1 ELSE 0 END AS bit
              FROM samp s JOIN tot t USING (doc_id)
            ),
            bnd AS (
              SELECT doc_id, b // 16 AS bi,
                     CAST(sum(bit * (1 << (15 - (b % 16)))) AS BIGINT) AS bv
              FROM bits GROUP BY 1, 2
            ),
            hashes AS MATERIALIZED (
              SELECT doc_id,
                     max(CASE WHEN bi = 0 THEN bv END) AS b0,
                     max(CASE WHEN bi = 1 THEN bv END) AS b1,
                     max(CASE WHEN bi = 2 THEN bv END) AS b2,
                     max(CASE WHEN bi = 3 THEN bv END) AS b3
              FROM bnd GROUP BY doc_id
            ),
            prs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
                  + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
                  <= 3
            ),
            edges AS MATERIALIZED (
              SELECT doc_a AS src, doc_b AS dst FROM prs
              UNION
              SELECT doc_b, doc_a FROM prs
            ),
            reach(id, lbl) AS (
              SELECT DISTINCT src, src FROM edges
              UNION
              SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
            )
            SELECT id AS doc_id, min(lbl) AS component_id
            FROM reach GROUP BY id
        """,
        # r10 third window: perceptual-hash image dedup — the oracle
        # replays pixels -> integer grayscale -> 8x8 nearest
        # subsample -> division-free threshold -> 16-bit bands ->
        # naive all-pairs Hamming; the Spark side's banded LSH is
        # lossless at radius 3 by pigeonhole, so equality IS the claim
        "dedup_image_phash_pairs": """
            WITH dims AS (
              SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h,
                     CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 3 END AS ch
              FROM documents
            ),
            cells AS (
              SELECT doc_id, w, h, ch, y.y, x.x
              FROM dims, unnest(range(8)) AS y(y), unnest(range(8)) AS x(x)
            ),
            samp AS (
              SELECT doc_id, y * 8 + x AS b,
                     CASE WHEN ch = 1
                          THEN (7 * ((y*h)//8*w + (x*w)//8) + doc_id) % 256
                          ELSE ((7 * (3*((y*h)//8*w + (x*w)//8)) + doc_id) % 256
                              + (7 * (3*((y*h)//8*w + (x*w)//8) + 1) + doc_id) % 256
                              + (7 * (3*((y*h)//8*w + (x*w)//8) + 2) + doc_id) % 256
                               ) // 3
                     END AS g
              FROM cells
            ),
            tot AS (SELECT doc_id, sum(g) AS total FROM samp GROUP BY doc_id),
            bits AS (
              SELECT s.doc_id, s.b,
                     CASE WHEN 64 * s.g > t.total THEN 1 ELSE 0 END AS bit
              FROM samp s JOIN tot t USING (doc_id)
            ),
            bands AS (
              SELECT doc_id, b // 16 AS bi,
                     CAST(sum(bit * (1 << (15 - (b % 16)))) AS BIGINT) AS bv
              FROM bits GROUP BY 1, 2
            ),
            hashes AS (
              SELECT doc_id,
                     max(CASE WHEN bi = 0 THEN bv END) AS b0,
                     max(CASE WHEN bi = 1 THEN bv END) AS b1,
                     max(CASE WHEN bi = 2 THEN bv END) AS b2,
                     max(CASE WHEN bi = 3 THEN bv END) AS b3
              FROM bands GROUP BY doc_id
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.b0, b.b0))
                      + bit_count(xor(a.b1, b.b1))
                      + bit_count(xor(a.b2, b.b2))
                      + bit_count(xor(a.b3, b.b3)) AS INTEGER) AS hamming
            FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
                + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
                <= 3
        """,
        # r10 third window: discrete hazard (life table) — exact ppm
        # integer hazard; the cumsum runs over the bounded lifetime
        # histogram, never user cardinality
        "events_churn_hazard": """
            WITH per_user AS (
              SELECT user_id,
                     CAST(datediff('day', min(CAST(ts AS DATE)),
                                   max(CAST(ts AS DATE))) AS BIGINT)
                       AS lifetime_days
              FROM events GROUP BY user_id
            ),
            hist AS (
              SELECT lifetime_days, CAST(count(*) AS BIGINT) AS n_churned
              FROM per_user GROUP BY 1
            ),
            cum AS (
              SELECT lifetime_days, n_churned,
                     CAST(sum(n_churned) OVER (
                       ORDER BY lifetime_days DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS n_at_risk
              FROM hist
            )
            SELECT lifetime_days, n_churned, n_at_risk,
                   (1000000 * n_churned) // n_at_risk AS hazard_ppm
            FROM cum
        """,
        # r10 third window: bounded-round k-core — the peel unrolled
        # round by round over the same exact edge set (pagerank
        # precedent); converged compares the last two live sets
        "graph_kcore_dedup": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, text || ' extra token tail'
              FROM documents WHERE doc_id < 30
              UNION ALL
              SELECT doc_id + 200000, text || ' extra tail too'
              FROM documents WHERE doc_id < 10
              UNION ALL
              SELECT doc_id + 300000, text || ' extra token too'
              FROM documents WHERE doc_id < 5
            ),
            {_SHINGLES},
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
              FROM sids a JOIN sids b
                ON a.sid = b.sid AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            prs AS (
              SELECT doc_a, doc_b
              FROM inter
              JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b
              WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.5
            ),
            edges AS MATERIALIZED (
              -- six degree rounds read this CTE; materialize it so
              -- the engine cannot re-inline the shingle self-join
              -- once per round
              SELECT doc_a AS src, doc_b AS dst FROM prs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM prs
            ),
            live0 AS (SELECT DISTINCT src AS node FROM edges),
            d1 AS (
              SELECT e.src, count(*) AS c FROM edges e
              JOIN live0 a ON a.node = e.src
              JOIN live0 b ON b.node = e.dst GROUP BY e.src
            ),
            live1 AS (SELECT src AS node FROM d1 WHERE c >= 3),
            d2 AS (
              SELECT e.src, count(*) AS c FROM edges e
              JOIN live1 a ON a.node = e.src
              JOIN live1 b ON b.node = e.dst GROUP BY e.src
            ),
            live2 AS (SELECT src AS node FROM d2 WHERE c >= 3),
            d3 AS (
              SELECT e.src, count(*) AS c FROM edges e
              JOIN live2 a ON a.node = e.src
              JOIN live2 b ON b.node = e.dst GROUP BY e.src
            ),
            live3 AS (SELECT src AS node FROM d3 WHERE c >= 3),
            d4 AS (
              SELECT e.src, count(*) AS c FROM edges e
              JOIN live3 a ON a.node = e.src
              JOIN live3 b ON b.node = e.dst GROUP BY e.src
            ),
            live4 AS (SELECT src AS node FROM d4 WHERE c >= 3),
            degf AS (
              SELECT e.src, count(*) AS c FROM edges e
              JOIN live4 a ON a.node = e.src
              JOIN live4 b ON b.node = e.dst GROUP BY e.src
            )
            SELECT l.node,
                   CAST(coalesce(d.c, 0) AS BIGINT) AS degree,
                   CAST(CASE WHEN (SELECT count(*) FROM live4)
                                  = (SELECT count(*) FROM live3)
                        THEN 1 ELSE 0 END AS INTEGER) AS converged
            FROM live4 l LEFT JOIN degf d ON d.src = l.node
        """,
        # r10 third window: rolling robust anomaly screen — median and
        # MAD replayed from the identical sorted-frame arithmetic
        # (list window agg + average-of-middles), so the 3-MAD flag is
        # bit-exact across engines
        "events_rolling_mad_anomaly": """
            WITH fr AS (
              SELECT user_id, event_id, value,
                     list_sort(list(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS fr
              FROM events
            ),
            m AS (
              SELECT user_id, event_id, value, len(fr) AS n, fr,
                     CASE WHEN len(fr) % 2 = 1
                          THEN fr[(len(fr) + 1) // 2]
                          ELSE (fr[len(fr) // 2] + fr[len(fr) // 2 + 1])
                               / 2.0 END AS med
              FROM fr
            ),
            d AS (
              SELECT user_id, event_id, value, n, med,
                     list_sort(list_transform(fr, x -> abs(x - med)))
                       AS devs
              FROM m
            ),
            md AS (
              SELECT user_id, event_id, value, n, med,
                     CASE WHEN n % 2 = 1
                          THEN devs[(n + 1) // 2]
                          ELSE (devs[n // 2] + devs[n // 2 + 1]) / 2.0
                     END AS mad
              FROM d
            )
            SELECT user_id, event_id,
                   round(value, 4) AS value,
                   CAST(n AS INTEGER) AS n_in_frame,
                   round(med, 4) AS med,
                   round(mad, 4) AS mad,
                   CAST(CASE WHEN abs(value - med) > 3 * mad
                        THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
            FROM md
        """,
        # r10 third window: TGA — closed-form replay; pixel_possum
        # pins the bottom-up flip, BGR undo, and RLE packet math
        "multimodal_decode_tga": """
            WITH dims AS (
              SELECT doc_id,
                     doc_id % 7 + 2 AS w,
                     doc_id % 4 + 2 AS h,
                     CASE WHEN doc_id % 2 = 1 THEN 3 ELSE 1 END AS ch
              FROM documents
            ),
            px AS (SELECT doc_id, unnest(range(w * h * ch)) AS i FROM dims),
            sums AS (
              SELECT doc_id,
                     CAST(sum((11 * i + 3 * doc_id) % 256) AS BIGINT)
                       AS pixel_sum,
                     CAST(sum((i + 1) * ((11 * i + 3 * doc_id) % 256))
                          AS BIGINT) AS pixel_possum
              FROM px GROUP BY doc_id
            )
            SELECT d.doc_id,
                   'tga' AS img_format,
                   CAST(d.w AS INTEGER) AS width,
                   CAST(d.h AS INTEGER) AS height,
                   CAST(d.ch AS INTEGER) AS channels,
                   s.pixel_sum,
                   s.pixel_possum
            FROM dims d JOIN sums s USING (doc_id)
        """,
        # r10 third window: Gini-Simpson diversity in exact ppm
        # integer arithmetic — no log, no float
        "events_user_diversity": """
            WITH per_type AS (
              SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2
            ),
            agg AS (
              SELECT user_id,
                     CAST(sum(c) AS BIGINT) AS n_events,
                     CAST(count(*) AS BIGINT) AS n_types,
                     CAST(sum(c * c) AS BIGINT) AS sum_sq
              FROM per_type GROUP BY user_id
            )
            SELECT user_id, n_events, n_types,
                   1000000 - (1000000 * sum_sq) // (n_events * n_events)
                     AS diversity_ppm
            FROM agg
        """,
        # r10 third window: k-anonymity equivalence classes over the
        # (type, value-bucket, day) quasi-identifier
        "events_kanonymity": """
            WITH per_user AS (
              SELECT event_type,
                     CAST(floor(value / 100) AS BIGINT) AS value_bucket,
                     CAST(ts AS DATE) AS day,
                     user_id,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2, 3, 4
            )
            SELECT event_type, value_bucket,
                   strftime(day, '%Y-%m-%d') AS day,
                   CAST(sum(n) AS BIGINT) AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_users,
                   CAST(CASE WHEN count(*) < 5 THEN 1 ELSE 0 END
                        AS INTEGER) AS at_risk
            FROM per_user GROUP BY 1, 2, 3
        """,
        # r10 third window: A-priori market-basket pairs — the ppm
        # metrics are BIGINT floor divisions (`div`/`//`), exact in
        # both engines, never floor-of-a-double
        "events_basket_lift": """
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            freq AS (
              SELECT l_partkey, CAST(count(*) AS BIGINT) AS part_cnt
              FROM op GROUP BY 1 HAVING count(*) >= 25
            ),
            fop AS (
              SELECT o.l_orderkey, o.l_partkey, f.part_cnt
              FROM op o JOIN freq f USING (l_partkey)
            ),
            n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op),
            pairs AS (
              SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                     CAST(count(*) AS BIGINT) AS pair_cnt,
                     CAST(min(a.part_cnt) AS BIGINT) AS cnt_a,
                     CAST(min(b.part_cnt) AS BIGINT) AS cnt_b
              FROM fop a
              JOIN fop b ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= 3
            )
            SELECT part_a, part_b, pair_cnt, cnt_a, cnt_b,
                   (1000000 * pair_cnt) // n_orders AS support_ppm,
                   (1000000 * pair_cnt) // cnt_a AS confidence_ppm,
                   (1000000 * pair_cnt * n_orders) // (cnt_a * cnt_b)
                     AS lift_ppm
            FROM pairs, n
        """,
        # r10 third window: RFM quintiles — the oracle states the
        # SEMANTICS (plain ntile over deterministic total orders);
        # the Spark side proves the partition-safe distributed-rank
        # formulation computes the identical cut
        "events_rfm_segments": """
            WITH per_user AS (
              SELECT user_id,
                     max(CAST(ts AS DATE)) AS last_day,
                     CAST(sum(CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END) AS BIGINT) AS freq,
                     coalesce(sum(CASE WHEN event_type = 'purchase'
                                       THEN CAST(value AS DECIMAL(18,4)) END),
                              CAST(0 AS DECIMAL(18,4))) AS monetary
              FROM events GROUP BY user_id
            ),
            mx AS (SELECT max(last_day) AS d FROM per_user),
            u AS (
              SELECT user_id, freq, monetary,
                     CAST(datediff('day', last_day, d) AS BIGINT)
                       AS recency_days
              FROM per_user, mx
            ),
            q AS (
              SELECT user_id, freq, monetary,
                     ntile(5) OVER (ORDER BY recency_days DESC, user_id)
                       AS r_q,
                     ntile(5) OVER (ORDER BY freq ASC, user_id) AS f_q,
                     ntile(5) OVER (ORDER BY monetary ASC, user_id) AS m_q
              FROM u
            )
            SELECT CAST(r_q AS INTEGER) AS r_q,
                   CAST(f_q AS INTEGER) AS f_q,
                   CAST(m_q AS INTEGER) AS m_q,
                   CAST(count(*) AS BIGINT) AS n_users,
                   round(CAST(sum(monetary) AS DOUBLE), 4) AS monetary,
                   CAST(sum(freq) AS BIGINT) AS n_purchases
            FROM q GROUP BY 1, 2, 3
        """,
        # r10 third window: near-dup pairs straddling the content-hash
        # train/val cut — pairs replayed lossless (the prefix-filter
        # oracle's exact join), split replayed from the same md5
        # bucket formula as text_leakage_safe_split
        "dedup_split_leakage": f"""
            WITH {_PLANT_TAIL}, {_SHINGLES},
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
              FROM sids a JOIN sids b
                ON a.sid = b.sid AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT doc_a, doc_b,
                     round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
              FROM inter
              JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b
              WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.8
            ),
            sp AS (
              SELECT doc_id,
                     CASE WHEN ('0x' || substr(md5({_NORM.format(t='text')}), 1, 15))::BIGINT
                               % 100 < 10
                          THEN 'val' ELSE 'train' END AS split
              FROM corpus
            )
            SELECT p.doc_a, p.doc_b, p.jaccard,
                   a.split AS split_a, b.split AS split_b,
                   CAST(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END
                        AS INTEGER) AS is_leak
            FROM pairs p
            JOIN sp a ON a.doc_id = p.doc_a
            JOIN sp b ON b.doc_id = p.doc_b
        """,
        # r10 third window: IMA ADPCM — the oracle is an INDEPENDENT
        # second implementation of the spec: the exact nonlinear
        # (predictor, step-index) recurrence replayed per sample by a
        # recursive CTE over the public IMA reference tables
        "multimodal_decode_adpcm": """
            WITH RECURSIVE dims AS (
              SELECT doc_id,
                     ((37 * doc_id) % 4001) - 2000 AS p0,
                     doc_id % 89 AS i0,
                     2 * (doc_id % 24 + 8) AS n
              FROM documents
            ),
            tabs AS (
              SELECT [7,8,9,10,11,12,13,14,16,17,
                      19,21,23,25,28,31,34,37,41,45,
                      50,55,60,66,73,80,88,97,107,118,
                      130,143,157,173,190,209,230,253,279,307,
                      337,371,408,449,494,544,598,658,724,796,
                      876,963,1060,1166,1282,1411,1552,1707,1878,2066,
                      2272,2499,2749,3024,3327,3660,4026,4428,4871,5358,
                      5894,6484,7132,7845,8630,9493,10442,11487,12635,13899,
                      15289,16818,18500,20350,22385,24623,27086,29794,32767]
                       AS st,
                     [-1,-1,-1,-1,2,4,6,8,-1,-1,-1,-1,2,4,6,8] AS it
            ),
            rec AS (
              SELECT doc_id, 0 AS i, p0 AS pred, i0 AS idx, n FROM dims
              UNION ALL
              SELECT doc_id, i + 1, pred2, idx2, n
              FROM (
                SELECT r.doc_id, r.i, r.n,
                       greatest(-32768, least(32767,
                         r.pred
                         + CASE WHEN ((7 * r.i + r.doc_id) % 16) >= 8
                                THEN -1 ELSE 1 END
                         * ((t.st[r.idx + 1] >> 3)
                            + CASE WHEN (((7 * r.i + r.doc_id) % 16) & 1) = 1
                                   THEN t.st[r.idx + 1] >> 2 ELSE 0 END
                            + CASE WHEN (((7 * r.i + r.doc_id) % 16) & 2) = 2
                                   THEN t.st[r.idx + 1] >> 1 ELSE 0 END
                            + CASE WHEN (((7 * r.i + r.doc_id) % 16) & 4) = 4
                                   THEN t.st[r.idx + 1] ELSE 0 END)
                       )) AS pred2,
                       greatest(0, least(88,
                         r.idx + t.it[((7 * r.i + r.doc_id) % 16) + 1]
                       )) AS idx2
                FROM rec r, tabs t
                WHERE r.i < r.n
              ) np(doc_id, i, n, pred2, idx2)
            )
            SELECT doc_id,
                   CAST(8000 AS INTEGER) AS sample_rate,
                   CAST(1 AS INTEGER) AS channels,
                   CAST(4 AS INTEGER) AS bits,
                   CAST(max(n) + 1 AS BIGINT) AS n_samples,
                   CAST(sum(abs(pred)) AS BIGINT) AS abs_sum
            FROM rec GROUP BY doc_id
        """,
        # r10 third window: baseline TIFF — closed-form replay of the
        # generator's sample arithmetic; pixel_possum pins strip
        # order, short final strips, and PackBits run boundaries
        "multimodal_decode_tiff": """
            WITH dims AS (
              SELECT doc_id,
                     doc_id % 6 + 2 AS w,
                     doc_id % 5 + 2 AS h,
                     CASE WHEN doc_id % 2 = 1 THEN 3 ELSE 1 END AS ch
              FROM documents
            ),
            px AS (SELECT doc_id, unnest(range(w * h * ch)) AS i FROM dims),
            sums AS (
              SELECT doc_id,
                     CAST(sum((7 * i + doc_id) % 256) AS BIGINT)
                       AS pixel_sum,
                     CAST(sum((i + 1) * ((7 * i + doc_id) % 256)) AS BIGINT)
                       AS pixel_possum
              FROM px GROUP BY doc_id
            )
            SELECT d.doc_id,
                   'tiff' AS img_format,
                   CAST(d.w AS INTEGER) AS width,
                   CAST(d.h AS INTEGER) AS height,
                   CAST(d.ch AS INTEGER) AS channels,
                   s.pixel_sum,
                   s.pixel_possum
            FROM dims d JOIN sums s USING (doc_id)
        """,
        "s1_scan_filter_project": """
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_totalprice > 450000.0
        """,
        "f3_derive_partition_date": """
            SELECT o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
                   CAST(year(o_orderdate) AS INTEGER) AS order_year,
                   CAST(month(o_orderdate) AS INTEGER) AS order_month,
                   CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
                   CAST(day(o_orderdate) AS INTEGER) AS order_day
            FROM orders
        """,
        "a1_count_star": "SELECT count(*) AS cnt FROM lineitem",
        "w1_latest_per_key": _LATEST_PER_USER,
        "o1_topk_latest": """
            SELECT event_id, user_id, event_type, ts
            FROM events ORDER BY ts DESC, event_id DESC LIMIT 10
        """,
        "window_running_totals": f"""
            SELECT o_custkey, o_orderkey,
                   row_number() OVER w AS order_seq,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                         OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS DOUBLE), 2) AS running_spend,
                   lag(o_totalprice) OVER w AS prev_price,
                   rank() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS spend_rank
            FROM orders WHERE o_custkey <= 200
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        "q1_pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   {_money('l_quantity')} AS sum_qty,
                   {_money('l_extendedprice')} AS sum_base_price,
                   {_money_exact(_REV)} AS sum_disc_price,
                   {_money_exact(_CHARGE)} AS sum_charge,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_qty,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_price,
                   round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": f"""
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   {_money_exact(_REV)} AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "q5_region_revenue": f"""
            SELECT n_name,
                   {_money_exact(_REV)} AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
            GROUP BY n_name
        """,
        "q7_volume_shipping": f"""
            SELECT supp_nation, cust_nation, l_year,
                   {_money_exact(_REV)} AS revenue
            FROM (
              SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     CAST(year(l_shipdate) AS INTEGER) AS l_year,
                     l_extendedprice, l_discount
              FROM lineitem
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
            ) GROUP BY supp_nation, cust_nation, l_year
        """,
        "q10_returned_items": f"""
            SELECT c_custkey, c_name, n_name,
                   {_money_exact(_REV)} AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "q18_large_orders": """
            SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
            FROM (
              SELECT l_orderkey,
                     round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) > 300.0
            ) big
            JOIN orders   ON big.l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
        """,
        "q4_priority_late_exists": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
            GROUP BY o_orderpriority
        """,
        "q6_forecast_revenue": """
            SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                                  * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q12_late_lines_by_status": """
            SELECT l_linestatus,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
            GROUP BY l_linestatus
        """,
        "q13_customer_order_distribution": """
            SELECT c_count, count(*) AS custdist
            FROM (
              SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer
              LEFT OUTER JOIN orders
                ON c_custkey = o_custkey
               AND o_orderpriority <> '4-NOT SPECIFIED'
              GROUP BY c_custkey
            ) per_cust
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "q14_promo_revenue_share": f"""
            SELECT round(100.0
                     * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV}
                                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                     / CAST(sum({_REV}) AS DOUBLE), 4) AS promo_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
        """,
        "q17_small_quantity_revenue": """
            WITH lp AS (
              SELECT l_partkey, l_quantity, l_extendedprice
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_brand = 'Brand#23' AND p_size <= 10
            ),
            stats AS (
              SELECT l_partkey AS sp_partkey,
                     sum(CAST(l_quantity AS DECIMAL(18,4))) AS qty_sum,
                     count(*) AS qty_n
              FROM lp GROUP BY l_partkey
            )
            SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 2)
                   AS avg_yearly
            FROM lp JOIN stats ON l_partkey = sp_partkey
            WHERE CAST(l_quantity AS DECIMAL(18,4)) * 5 * qty_n < qty_sum
        """,
        "q19_disjunctive_predicates": f"""
            SELECT round(CAST(sum({_REV}) AS DOUBLE), 2) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "q21_waiting_supplier": """
            WITH late AS (
              SELECT l_orderkey, l_suppkey
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_orderstatus = 'F'
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY
            )
            SELECT s_name, count(*) AS numwait
            FROM late l1
            JOIN supplier ON l1.l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM late l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey)
            GROUP BY s_name
            ORDER BY numwait DESC, s_name ASC
            LIMIT 20
        """,
        "q22_dormant_customers": """
            WITH pool AS (
              SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
              WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD', 'MACHINERY')
            ),
            thresh AS (
              SELECT sum(CAST(c_acctbal AS DECIMAL(18,4))) AS bal_tot,
                     count(*) AS bal_n
              FROM pool WHERE c_acctbal > 0.0
            )
            SELECT c_mktsegment, count(*) AS numcust,
                   round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 2) AS totacctbal
            FROM pool, thresh
            WHERE CAST(c_acctbal AS DECIMAL(18,4)) * bal_n > bal_tot
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '2000-01-01')
            GROUP BY c_mktsegment
        """,
        "q8_market_share": f"""
            SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   round(CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN {_REV}
                                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                         / CAST(sum({_REV}) AS DOUBLE), 4) AS mkt_share
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY o_year
        """,
        "agg_grouping_sets": """
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2)
                       AS total_spend
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        "window_rank_functions": """
            SELECT o_orderstatus, o_orderkey,
                   ntile(4) OVER w AS spend_quartile,
                   round(percent_rank() OVER w, 6) AS pct_rank,
                   round(cume_dist() OVER w, 6) AS cume,
                   dense_rank() OVER w AS drank
            FROM orders
            WHERE o_custkey <= 300
            WINDOW w AS (PARTITION BY o_orderstatus
                         ORDER BY o_totalprice DESC, o_orderkey ASC)
        """,
        "q15_top_supplier": f"""
            WITH revenue AS (
              SELECT l_suppkey AS supplier_no,
                     {_money_exact(_REV)} AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate <  TIMESTAMP '1996-07-01'
              GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_revenue
            FROM revenue JOIN supplier ON supplier_no = s_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        """,
        "join_semi_big_spenders": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 450000.0)
        """,
        "join_anti_never_ordered": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)
        """,
        "join_broadcast_brand_stats": f"""
            SELECT p_brand,
                   count(*) AS n_items,
                   {_money('l_extendedprice')} AS brand_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "agg_rollup_orders": f"""
            SELECT coalesce(o_orderstatus, 'ALL') AS status,
                   coalesce(o_orderpriority, 'ALL') AS priority,
                   count(*) AS n_orders,
                   {_money('o_totalprice')} AS total_spend
            FROM orders
            GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "agg_cube_status_priority": """
            SELECT coalesce(o_orderstatus, 'ALL') AS status,
                   coalesce(o_orderpriority, 'ALL') AS priority,
                   count(*) AS n_orders
            FROM orders
            GROUP BY CUBE(o_orderstatus, o_orderpriority)
        """,
        "agg_percentiles": """
            SELECT o_orderstatus,
                   round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
                   round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
            FROM orders GROUP BY o_orderstatus
        """,
        "agg_collect_sorted": """
            SELECT o_custkey,
                   array_to_string(list_sort(list(o_orderpriority)), ',') AS priorities,
                   count(*) AS n_orders
            FROM orders WHERE o_custkey <= 50 GROUP BY o_custkey
        """,
        "pivot_event_counts": """
            SELECT user_id,
                   count(*) FILTER (WHERE event_type = 'click') AS click,
                   count(*) FILTER (WHERE event_type = 'view') AS view,
                   count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                   count(*) FILTER (WHERE event_type = 'signup') AS signup,
                   count(*) FILTER (WHERE event_type = 'error') AS error
            FROM events GROUP BY user_id
        """,
        "window_moving_avg": f"""
            WITH daily AS (
              SELECT CAST(ts AS DATE) AS day, event_type,
                     {_money('value')} AS day_value
              FROM events GROUP BY 1, 2
            )
            SELECT day, event_type, day_value,
                   round(avg(day_value) OVER (
                     PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
            FROM daily
        """,
        "join_full_outer_spend": f"""
            SELECT c_custkey, c_name, o_custkey, spend
            FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 100) c
            FULL OUTER JOIN (
              SELECT o_custkey, {_money('o_totalprice')} AS spend
              FROM orders WHERE o_custkey BETWEEN 50 AND 150
              GROUP BY o_custkey) o
            ON c.c_custkey = o.o_custkey
        """,
        "subquery_max_order": """
            SELECT c_custkey, c_name,
                   (SELECT round(max(o_totalprice), 2) FROM orders o
                    WHERE o.o_custkey = c.c_custkey) AS max_order
            FROM customer c WHERE c_custkey <= 200
        """,
        "catalog_history_metadata": """
            SELECT * FROM (VALUES
              (CAST(1 AS BIGINT), CAST(NULL AS BIGINT), 'create', true),
              (CAST(2 AS BIGINT), CAST(1 AS BIGINT), 'append', true),
              (CAST(3 AS BIGINT), CAST(2 AS BIGINT), 'append', true),
              (CAST(4 AS BIGINT), CAST(3 AS BIGINT), 'merge', true)
            ) t(snapshot_id, parent_id, operation, is_current_ancestor)
        """,
        "agg_distinct_customers": """
            SELECT o_orderstatus,
                   count(DISTINCT o_custkey) AS uniq_customers,
                   count(*) AS n_orders,
                   round(min(o_totalprice), 2) AS min_price,
                   round(max(o_totalprice), 2) AS max_price
            FROM orders GROUP BY o_orderstatus
        """,
        "set_union_segments": """
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            UNION
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        """,
        "set_intersect_building_buyers": """
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0
        """,
        "set_except_nonbuyers": """
            SELECT c_custkey FROM customer
            EXCEPT
            SELECT o_custkey FROM orders
        """,
        "scalar_string_math": """
            SELECT p_partkey,
                   upper(p_brand) AS brand_u,
                   substring(p_name, 1, 8) AS name_prefix,
                   CAST(length(p_name) AS INTEGER) AS name_len,
                   round(p_retailprice * 1.1, 2) AS bumped_price,
                   abs(p_size - 25) AS size_dist,
                   CASE WHEN p_size > 25 THEN 'L'
                        WHEN p_size > 10 THEN 'M'
                        ELSE 'S' END AS size_class,
                   concat_ws('-', p_brand, p_type) AS brand_type
            FROM part WHERE p_name LIKE '%a%'
        """,
        "json_extract_events": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
            FROM events
        """,
        "array_map_funcs": """
            SELECT event_id,
                   l[3] AS arr_third,
                   list_contains(l, user_id) AS has_user,
                   CAST(len(list_filter(l, x -> x % 2 = 0)) AS INTEGER) AS n_even,
                   list_transform(l, x -> x * 2)[1] AS first_doubled,
                   user_id AS map_uid,
                   list_max(l) AS arr_max,
                   array_to_string(list_sort(l, 'DESC'), ',') AS arr_sorted_desc
            FROM (SELECT event_id, user_id,
                         [event_id, user_id, event_id + user_id] AS l
                  FROM events WHERE event_id < 2000)
        """,
        "date_arithmetic": """
            SELECT o_orderkey,
                   CAST(date_diff('day', d, DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
                   d + 30 AS due_date,
                   CAST(d + INTERVAL 3 MONTH AS DATE) AS quarter_later,
                   last_day(d) AS month_end,
                   CAST(date_trunc('month', d) AS DATE) AS month_start,
                   CAST(dayofyear(d) AS INTEGER) AS doy,
                   CAST(weekofyear(d) AS INTEGER) AS woy
            FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
                  FROM orders WHERE o_orderkey < 3000)
        """,
        "events_daily_summary": f"""
            SELECT CAST(ts AS DATE) AS day, event_type,
                   count(*) AS n_events,
                   {_money('value')} AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "asof_click_purchase": """
            SELECT click_id, user_id, click_ts, purchase_id, purchase_value
            FROM (
              SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
                     p.event_id AS purchase_id, p.value AS purchase_value,
                     row_number() OVER (PARTITION BY c.event_id
                                        ORDER BY p.ts DESC, p.event_id DESC) AS rn
              FROM (SELECT * FROM events WHERE event_type = 'click') c
              LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
                ON p.user_id = c.user_id AND p.ts <= c.ts
            ) WHERE rn = 1
        """,
        "medallion_merge_state": _LATEST_PER_USER,
        "sessionize_events": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                               - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id, ts,
                     CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS session_id
              FROM g
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM s GROUP BY user_id, session_id
        """,
        "text_boilerplate_ngrams": _boilerplate_oracle(),
        "text_decontaminate": f"""
            WITH base AS (SELECT doc_id, text FROM documents),
            bench AS (SELECT doc_id, text FROM base WHERE doc_id % 25 = 3),
            train AS (
              SELECT doc_id, text FROM base WHERE doc_id % 25 <> 3
              UNION ALL
              SELECT doc_id + 200000 AS doc_id,
                     'intro snippet ' || text AS text
              FROM bench WHERE doc_id < 150
            ),
            tw AS (SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w
                   FROM train),
            tsh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(w) - 6),
                              i -> {_GRAM8})) AS shingle
                FROM tw)
            ),
            bw AS (SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w
                   FROM bench),
            bsh AS (
              SELECT DISTINCT shingle FROM (
                SELECT unnest(list_transform(range(1, len(w) - 6),
                              i -> {_GRAM8})) AS shingle
                FROM bw)
            ),
            sizes AS (SELECT doc_id, count(*) AS n_shingles FROM tsh GROUP BY doc_id),
            hits AS (
              SELECT t.doc_id, count(*) AS n_shared
              FROM tsh t JOIN bsh USING (shingle)
              GROUP BY t.doc_id
            )
            SELECT h.doc_id, n_shared, n_shingles,
                   round(CAST(n_shared AS DOUBLE) / CAST(n_shingles AS DOUBLE), 4)
                     AS frac_shared
            FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
        """,
        "dedup_exact_groups": """
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, text FROM documents WHERE doc_id < 20
            )
            SELECT md5(text) AS content_hash, count(*) AS n_docs,
                   min(doc_id) AS keeper_id
            FROM corpus GROUP BY md5(text)
        """,
        "dedup_normalized_groups": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, upper(text) || '!!!' FROM documents
              WHERE doc_id < 20
            )
            SELECT md5({_NORM.format(t='text')}) AS content_hash,
                   count(*) AS n_docs, min(doc_id) AS keeper_id
            FROM corpus GROUP BY 1
        """,
        "dedup_ngram_jaccard_pairs": f"""
            WITH {_PLANT_TAIL}, {_SHINGLES},
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
              FROM sids a JOIN sids b
                ON a.sid = b.sid AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.5
        """,
        # r10 AllPairs/PPJoin: the prefix + positional filters are
        # LOSSLESS, so the oracle is the naive exact-Jaccard join at
        # the same t=0.8 — equality IS the correctness claim
        "dedup_prefix_filter_pairs": f"""
            WITH {_PLANT_TAIL}, {_SHINGLES},
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
              FROM sids a JOIN sids b
                ON a.sid = b.sid AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.8
        """,
        # r10 triangles: the Spark side's degree-ordered orientation
        # counts each triangle once at its lowest-ordered vertex; the
        # oracle is the naive three-edge join over the same exact
        # all-pairs edge set (u < v canonical), so equality proves
        # the orientation loses and double-counts nothing
        "graph_triangle_count": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, text || ' extra token tail'
              FROM documents WHERE doc_id < 30
              UNION ALL
              SELECT doc_id + 200000, text || ' extra tail too'
              FROM documents WHERE doc_id < 10
              UNION ALL
              SELECT doc_id + 300000, text || ' extra token too'
              FROM documents WHERE doc_id < 5
            ),
            {_SHINGLES},
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
              FROM sids a JOIN sids b
                ON a.sid = b.sid AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            edges AS (
              SELECT doc_a AS u, doc_b AS v
              FROM inter
              JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b
              WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.5
            ),
            tri AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM edges e1
              JOIN edges e2 ON e2.u = e1.v
              JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
            FROM (
              SELECT a AS doc_id FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri
            )
            GROUP BY doc_id
        """,
        # r10 hashing trick: bucket from the top-60-bit md5 slice mod
        # 64, sign from hex digit 16 parity — disjoint digest bits,
        # mirrored bit-for-bit on the Spark side (conv(substring(..)))
        "text_feature_hashing": f"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split({_NORM.format(t='text')}, ' ')) AS tok
              FROM documents WHERE doc_id < 200
            ),
            sel AS (
              SELECT doc_id,
                     ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS bucket,
                     CASE WHEN ('0x' || substr(md5(tok), 16, 1))::BIGINT % 2 = 0
                          THEN 1 ELSE -1 END AS sign
              FROM toks WHERE tok <> ''
            )
            SELECT doc_id,
                   CAST(bucket AS INT) AS bucket,
                   CAST(sum(sign) AS BIGINT) AS weight,
                   CAST(count(*) AS BIGINT) AS n_terms
            FROM sel
            GROUP BY doc_id, bucket
            HAVING sum(sign) <> 0
        """,
        # r10 recall audit: the exact side is the lossless all-pairs
        # join; the LSH side replays the banding + exact verify, so
        # the quotient is pure banding recall
        "dedup_lsh_recall": f"""
            WITH {_PLANT_TAIL}, {_SHINGLES},
            exact AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
              FROM sids a JOIN sids b
                ON a.sid = b.sid AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            exact_pairs AS (
              SELECT doc_a, doc_b FROM exact
              JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b
              WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.8
            ),
            seeds AS (SELECT * FROM (VALUES {_MINHASH_SEEDS}) s(j, a, b)),
            mh AS (
              SELECT doc_id, j, min((a * sid + b) % 2147483647) AS mh
              FROM sids CROSS JOIN seeds GROUP BY doc_id, j
            ),
            bands AS (
              SELECT doc_id, j // 3 AS band,
                     string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j) AS key
              FROM mh GROUP BY doc_id, j // 3
            ),
            cands AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
            ),
            linter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS inter
              FROM cands c
              JOIN sids sa ON sa.doc_id = c.doc_a
              JOIN sids sb ON sb.doc_id = c.doc_b AND sb.sid = sa.sid
              GROUP BY 1, 2
            ),
            lsh_pairs AS (
              SELECT i.doc_a, i.doc_b FROM linter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b
              WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.8
            )
            SELECT CAST((SELECT count(*) FROM exact_pairs) AS BIGINT) AS n_exact,
                   CAST((SELECT count(*) FROM lsh_pairs) AS BIGINT) AS n_lsh,
                   round((SELECT count(*) FROM lsh_pairs)
                         / (SELECT count(*) FROM exact_pairs), 4) AS recall4
        """,
        "dedup_minhash_lsh_pairs": f"""
            WITH {_PLANT_TAIL}, {_SHINGLES},
            seeds AS (SELECT * FROM (VALUES {_MINHASH_SEEDS}) s(j, a, b)),
            mh AS (
              SELECT doc_id, j, min((a * sid + b) % 2147483647) AS mh
              FROM sids CROSS JOIN seeds GROUP BY doc_id, j
            ),
            bands AS (
              SELECT doc_id, j // 3 AS band,
                     string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j) AS key
              FROM mh GROUP BY doc_id, j // 3
            ),
            cands AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
            ),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS inter
              FROM cands c
              JOIN sids sa ON sa.doc_id = c.doc_a
              JOIN sids sb ON sb.doc_id = c.doc_b AND sb.sid = sa.sid
              GROUP BY 1, 2
            )
            SELECT i.doc_a, i.doc_b,
                   round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.doc_a
            JOIN sizes sb ON sb.doc_id = i.doc_b
            WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.5
        """,
        "dedup_simhash_pairs": _simhash_oracle(),
        "dedup_keep_list": f"""
            WITH {_PLANT_TAIL}, {_SHINGLES},
            seeds AS (SELECT * FROM (VALUES {_MINHASH_SEEDS}) s(j, a, b)),
            mh AS (
              SELECT doc_id, j, min((a * sid + b) % 2147483647) AS mh
              FROM sids CROSS JOIN seeds GROUP BY doc_id, j
            ),
            bands AS (
              SELECT doc_id, j // 3 AS band,
                     string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j) AS key
              FROM mh GROUP BY doc_id, j // 3
            ),
            cands AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
            ),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS inter
              FROM cands c
              JOIN sids sa ON sa.doc_id = c.doc_a
              JOIN sids sb ON sb.doc_id = c.doc_b AND sb.sid = sa.sid
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT i.doc_a, i.doc_b
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b
              WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.5
            )
            SELECT doc_id FROM corpus
            WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
        """,
        "dedup_components": f"""
            WITH RECURSIVE {_PLANT_TAIL}, {_SHINGLES},
            seeds AS (SELECT * FROM (VALUES {_MINHASH_SEEDS}) s(j, a, b)),
            mh AS (
              SELECT doc_id, j, min((a * sid + b) % 2147483647) AS mh
              FROM sids CROSS JOIN seeds GROUP BY doc_id, j
            ),
            bands AS (
              SELECT doc_id, j // 3 AS band,
                     string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j) AS key
              FROM mh GROUP BY doc_id, j // 3
            ),
            cands AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
            ),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS inter
              FROM cands c
              JOIN sids sa ON sa.doc_id = c.doc_a
              JOIN sids sb ON sb.doc_id = c.doc_b AND sb.sid = sa.sid
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT i.doc_a, i.doc_b
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b
              WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.5
            ),
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION
              SELECT doc_b, doc_a FROM pairs
            ),
            reach(id, lbl) AS (
              SELECT DISTINCT src, src FROM edges
              UNION
              SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
            )
            SELECT id AS doc_id, min(lbl) AS component_id
            FROM reach GROUP BY id
        """,
        "dedup_keep_best_quality": f"""
            WITH RECURSIVE {_PLANT_TAIL}, {_SHINGLES},
            seeds AS (SELECT * FROM (VALUES {_MINHASH_SEEDS}) s(j, a, b)),
            mh AS (
              SELECT doc_id, j, min((a * sid + b) % 2147483647) AS mh
              FROM sids CROSS JOIN seeds GROUP BY doc_id, j
            ),
            bands AS (
              SELECT doc_id, j // 3 AS band,
                     string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j) AS key
              FROM mh GROUP BY doc_id, j // 3
            ),
            cands AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
            ),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS inter
              FROM cands c
              JOIN sids sa ON sa.doc_id = c.doc_a
              JOIN sids sb ON sb.doc_id = c.doc_b AND sb.sid = sa.sid
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT i.doc_a, i.doc_b
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b
              WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.5
            ),
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION
              SELECT doc_b, doc_a FROM pairs
            ),
            reach(id, lbl) AS (
              SELECT DISTINCT src, src FROM edges
              UNION
              SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
            ),
            comp AS (
              SELECT id AS doc_id, min(lbl) AS component_id
              FROM reach GROUP BY id
            ),
            q AS (
              SELECT doc_id,
                     round(least(1.0, len(w) / 120.0) * 0.5
                           + len(list_filter(w, x -> list_contains(
                               ['the','a','an','of','and','to','in','is',
                                'it','for'], x)))
                             / len(w) * 0.3
                           + length(regexp_replace(lower(text), '[^a-z]',
                                                   '', 'g'))
                             / length(text) * 0.2, 4) AS quality_score
              FROM (SELECT doc_id, text,
                           string_split({_NORM.format(t='text')}, ' ') AS w
                    FROM corpus)
            ),
            labeled AS (
              SELECT c.doc_id,
                     COALESCE(cm.component_id, c.doc_id) AS component_id,
                     q.quality_score
              FROM (SELECT doc_id FROM corpus) c
              LEFT JOIN comp cm USING (doc_id)
              JOIN q USING (doc_id)
            )
            SELECT doc_id, component_id, quality_score,
                   CAST(row_number() OVER (PARTITION BY component_id
                     ORDER BY quality_score DESC, doc_id) = 1 AS INTEGER)
                     AS keep
            FROM labeled
        """,
        # langid confusion matrix: the langid oracle's prediction
        # joined to the labeled lang column, counted per cell
        "text_langid_confusion": f"""
            WITH scored AS (
              SELECT doc_id,
                CAST(len(list_filter(w, x -> list_contains(
                  ['the','a','of','and','to','in','is'], x)))
                  AS INTEGER) AS score_en,
                CAST(len(list_filter(w, x -> list_contains(
                  ['der','die','und','das','ist','nicht'], x)))
                  AS INTEGER) AS score_de,
                CAST(len(list_filter(w, x -> list_contains(
                  ['el','los','y','que','es','una'], x)))
                  AS INTEGER) AS score_es,
                CAST(len(list_filter(w, x -> list_contains(
                  ['le','les','et','des','est','une'], x)))
                  AS INTEGER) AS score_fr
              FROM (SELECT doc_id,
                           string_split({_NORM.format(t='text')}, ' ') AS w
                    FROM documents)
            ),
            pred AS (
              SELECT doc_id,
                   CASE WHEN greatest(score_en, score_de, score_es,
                                      score_fr) <= 0 THEN 'und'
                        WHEN score_en = greatest(score_en, score_de,
                                  score_es, score_fr) THEN 'en'
                        WHEN score_de = greatest(score_en, score_de,
                                  score_es, score_fr) THEN 'de'
                        WHEN score_es = greatest(score_en, score_de,
                                  score_es, score_fr) THEN 'es'
                        ELSE 'fr' END AS predicted_lang
              FROM scored
            )
            SELECT d.lang, p.predicted_lang,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM documents d JOIN pred p USING (doc_id)
            GROUP BY d.lang, p.predicted_lang
            ORDER BY d.lang, p.predicted_lang
        """,
        # cross-source contamination matrix over the minhash pairs
        # (clone ids map back via doc_id % 100000)
        "dedup_source_matrix": f"""
            WITH {_PLANT_TAIL}, {_SHINGLES},
            seeds AS (SELECT * FROM (VALUES {_MINHASH_SEEDS}) s(j, a, b)),
            mh AS (
              SELECT doc_id, j, min((a * sid + b) % 2147483647) AS mh
              FROM sids CROSS JOIN seeds GROUP BY doc_id, j
            ),
            bands AS (
              SELECT doc_id, j // 3 AS band,
                     string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j)
                       AS key
              FROM mh GROUP BY doc_id, j // 3
            ),
            cands AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.key = b.key
               AND a.doc_id < b.doc_id
            ),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS inter
              FROM cands c
              JOIN sids sa ON sa.doc_id = c.doc_a
              JOIN sids sb ON sb.doc_id = c.doc_b AND sb.sid = sa.sid
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT i.doc_a, i.doc_b
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b
              WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.5
            )
            SELECT least(da.source, db.source) AS source_a,
                   greatest(da.source, db.source) AS source_b,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM pairs p
            JOIN documents da ON da.doc_id = p.doc_a % 100000
            JOIN documents db ON db.doc_id = p.doc_b % 100000
            GROUP BY 1, 2
            ORDER BY source_a, source_b
        """,
        # LSH index health: per-bucket occupancy from the exact
        # sign-chain bucket ids
        "ann_index_health": f"""
            WITH base AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings
            ),
            b AS (
              SELECT vec_id, CAST({_lsh_bucket_sql()} AS INTEGER)
                       AS bucket
              FROM base
            ),
            occ AS (
              SELECT bucket, count(*) AS n_vectors FROM b GROUP BY bucket
            ),
            tot AS (
              SELECT sum(n_vectors) AS total,
                     count(*) AS n_buckets_used
              FROM occ
            )
            SELECT CAST(bucket AS INTEGER) AS bucket,
                   CAST(n_vectors AS BIGINT) AS n_vectors,
                   round(CAST(n_vectors AS DOUBLE)
                         / CAST(total AS DOUBLE), 6) AS share,
                   CAST(n_vectors * 256 > 2 * total AS INTEGER) AS hot,
                   CAST(n_buckets_used AS INTEGER) AS n_buckets_used
            FROM occ CROSS JOIN tot
            ORDER BY bucket
        """,
        # Matryoshka truncation recall: exact top-k per prefix dim vs
        # the full-dim truth, hit counts replayed with list slices
        "ann_matryoshka_recall": """
            WITH topk AS (
              SELECT d, query_id, neighbor_id FROM (
                SELECT d.d AS d, q.vec_id AS query_id,
                       e.vec_id AS neighbor_id,
                       CAST(row_number() OVER (
                         PARTITION BY d.d, q.vec_id
                         ORDER BY round(list_cosine_similarity(
                             (q.embedding::DOUBLE[])[1:d.d],
                             (e.embedding::DOUBLE[])[1:d.d]), 4) DESC,
                           e.vec_id ASC) AS INTEGER) AS rnk
                FROM embeddings q
                JOIN embeddings e ON e.vec_id != q.vec_id
                CROSS JOIN (SELECT unnest([64, 32, 16, 8]) AS d) d
                WHERE q.vec_id < 10
              ) WHERE rnk <= 5
            ),
            t AS (SELECT query_id, neighbor_id FROM topk WHERE d = 64),
            tc AS (SELECT count(*) AS truth FROM t),
            hits AS (
              SELECT a.d AS d, count(*) AS n_hits
              FROM topk a JOIN t USING (query_id, neighbor_id)
              GROUP BY a.d
            )
            -- drive from the dim list so a truncation dim with ZERO
            -- hits still yields its row (engine emits hits=0 rows)
            SELECT CAST(dd.d AS INTEGER) AS trunc_dim,
                   CAST(5 AS INTEGER) AS k,
                   CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS hits,
                   CAST(tc.truth AS BIGINT) AS truth,
                   round(COALESCE(h.n_hits, 0) / tc.truth, 4) AS recall
            FROM (SELECT unnest([64, 32, 16, 8]) AS d) dd
            LEFT JOIN hits h ON h.d = dd.d
            CROSS JOIN tc
            ORDER BY trunc_dim DESC
        """,
        # ExactSubstr (Lee et al. 2022) as aligned-k-shingle diagonal
        # runs: positioned 8-gram ids, df<=32 heavy-hitter cap, seed
        # equi-join, gaps-and-islands per (pair, diagonal); a run of
        # m consecutive seeds = m+7 shared verbatim tokens
        "dedup_exact_substr_pairs": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id,
                     'zz plant prefix qq ' ||
                     array_to_string(
                       (string_split({_NORM.format(t='text')}, ' '))[6:25],
                       ' ') ||
                     ' zz plant suffix qq' AS text
              FROM documents WHERE doc_id < 10
            ),
            norm AS (
              SELECT doc_id,
                     string_split({_NORM.format(t='text')}, ' ') AS w
              FROM corpus
            ),
            sh0 AS (
              SELECT doc_id, s.pos AS pos, s.gid AS gid FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(w) - 6),
                         i -> struct_pack(pos := i,
                           gid := {_TOKEN_ID.format(
                               t="array_to_string(w[i:i+7], ' ')")})))
                         AS s
                FROM norm)
            ),
            keepg AS (
              SELECT gid FROM sh0 GROUP BY gid HAVING count(*) <= 32
            ),
            sh AS (SELECT sh0.* FROM sh0 JOIN keepg USING (gid)),
            seeds AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.pos AS pos_a, b.pos AS pos_b
              FROM sh a JOIN sh b
                ON a.gid = b.gid AND a.doc_id < b.doc_id
            ),
            isl AS (
              SELECT doc_a, doc_b, pos_a - pos_b AS diag,
                     pos_a - row_number() OVER (
                       PARTITION BY doc_a, doc_b, pos_a - pos_b
                       ORDER BY pos_a) AS island
              FROM seeds
            ),
            runs AS (
              SELECT doc_a, doc_b,
                     CAST(count(*) + 7 AS BIGINT) AS match_tokens
              FROM isl GROUP BY doc_a, doc_b, diag, island
            )
            SELECT doc_a, doc_b,
                   CAST(max(match_tokens) AS BIGINT)
                     AS longest_match_tokens,
                   CAST(count(*) AS BIGINT) AS n_runs
            FROM runs
            WHERE match_tokens >= 15
            GROUP BY doc_a, doc_b
            ORDER BY doc_a, doc_b
        """,
        # ======== round-9 additions ========
        # Winnowing (MOSS): positioned 5-gram ids, each gram covers
        # its 4 window starts (full windows only), per-start min with
        # RIGHTMOST argmin tie-break, distinct selections
        "text_winnowing_fingerprints": f"""
            WITH norm AS (
              SELECT doc_id,
                     string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents
            ),
            g AS (
              SELECT doc_id, s.pos AS pos, s.gid AS gid FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(w) - 3),
                         i -> struct_pack(pos := i,
                           gid := {_TOKEN_ID.format(
                               t="array_to_string(w[i:i+4], ' ')")})))
                         AS s
                FROM norm)
            ),
            ng AS (
              SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id
            ),
            cov0 AS (
              SELECT doc_id, gid, pos,
                     unnest(range(greatest(pos - 3, 1), pos + 1)) AS start
              FROM g
            ),
            cov AS (
              SELECT c.* FROM cov0 c JOIN ng USING (doc_id)
              WHERE c.start <= ng.n_grams - 3
            ),
            wmin AS (
              SELECT doc_id, start, min(gid) AS mh
              FROM cov GROUP BY 1, 2
            ),
            sel AS (
              SELECT DISTINCT doc_id, mh, sel_pos FROM (
                SELECT c.doc_id, c.start, w.mh, max(c.pos) AS sel_pos
                FROM cov c JOIN wmin w
                  ON w.doc_id = c.doc_id AND w.start = c.start
                     AND c.gid = w.mh
                GROUP BY 1, 2, 3)
            ),
            fps AS (
              SELECT doc_id,
                     CAST(count(*) AS BIGINT) AS n_fingerprints,
                     CAST(sum(mh) AS BIGINT) AS fp_checksum
              FROM sel GROUP BY doc_id
            )
            SELECT ng.doc_id,
                   CAST(ng.n_grams AS BIGINT) AS n_grams,
                   COALESCE(f.n_fingerprints, 0) AS n_fingerprints,
                   COALESCE(f.fp_checksum, 0) AS fp_checksum
            FROM ng LEFT JOIN fps f USING (doc_id)
            ORDER BY doc_id
        """,
        # mojibake marks = codepoint sequences a CP1252 misdecode
        # produces; counts via length-difference, no regex engine
        "text_mojibake_score": """
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000,
                     text || ' caf' || chr(195) || chr(169) || ' don'
                          || chr(226) || chr(8364) || chr(8482)
                          || 't ' || chr(65533)
              FROM documents WHERE doc_id < 15
            ),
            m AS (
              SELECT doc_id,
                CAST(length(text) - length(replace(text, chr(195), ''))
                     AS BIGINT)
                + CAST(length(text) - length(replace(text, chr(194), ''))
                       AS BIGINT)
                + CAST((length(text)
                        - length(replace(text, chr(226) || chr(8364),
                                         ''))) / 2 AS BIGINT) AS n_marks,
                CAST(length(text) - length(replace(text, chr(65533), ''))
                     AS BIGINT) AS n_repl
              FROM corpus
            )
            SELECT doc_id,
                   n_marks AS n_mojibake_marks,
                   n_repl AS n_replacement_chars,
                   CAST(n_marks + n_repl > 0 AS INTEGER) AS damaged
            FROM m ORDER BY doc_id
        """,
        # robust median/MAD outlier screen in exact half-integer
        # arithmetic: adev2 = 2|x-med| is integral, the z cut is
        # adev2*10000 > 88956*mad2/2 (= 3 * 1.4826 scaled)
        "text_length_outliers": """
            WITH corpus AS (
              SELECT doc_id, source, n_chars FROM documents
              UNION ALL
              SELECT doc_id + 100000, source, n_chars * 7
              FROM documents WHERE doc_id < 20
            ),
            med AS (
              SELECT source, quantile_cont(n_chars, 0.5) AS med,
                     count(*) AS n_docs
              FROM corpus GROUP BY source
            ),
            dev AS (
              SELECT c.source,
                     CAST(abs(c.n_chars - m.med) * 2 AS BIGINT) AS adev2
              FROM corpus c JOIN med m USING (source)
            ),
            mad AS (
              SELECT source, quantile_cont(adev2, 0.5) AS mad2
              FROM dev GROUP BY source
            ),
            outl AS (
              SELECT d.source,
                     CAST(sum(CASE WHEN d.adev2 * 10000
                                        > 88956 * a.mad2 / 2
                                   THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_outliers
              FROM dev d JOIN mad a USING (source) GROUP BY d.source
            )
            SELECT m.source,
                   CAST(m.n_docs AS BIGINT) AS n_docs,
                   round(m.med, 1) AS median_len,
                   round(a.mad2 / 2, 2) AS mad_len,
                   o.n_outliers
            FROM med m JOIN mad a USING (source) JOIN outl o USING (source)
            ORDER BY m.source
        """,
        # bottom-k-by-md5 per group = deterministic reservoir
        "sample_reservoir_source": """
            SELECT source, doc_id, rk FROM (
              SELECT source, doc_id,
                     CAST(row_number() OVER (PARTITION BY source
                       ORDER BY md5('r1|' || CAST(doc_id AS VARCHAR)),
                                doc_id) AS INTEGER) AS rk
              FROM documents
            ) WHERE rk <= 5 ORDER BY source, rk
        """,
        # novelty: a shingle is novel for the smallest doc_id holding
        # it; planted near-dup copies score ~0 against their sources
        "dedup_ngram_novelty": f"""
            WITH {_PLANT_TAIL}, {_SHINGLES},
            firstd AS (
              SELECT shingle, min(doc_id) AS first_doc
              FROM sh GROUP BY shingle
            ),
            per AS (
              SELECT s.doc_id,
                     CAST(count(*) AS BIGINT) AS n_grams,
                     CAST(sum(CASE WHEN s.doc_id = f.first_doc
                                   THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_novel
              FROM sh s JOIN firstd f USING (shingle)
              GROUP BY s.doc_id
            )
            SELECT doc_id, n_grams, n_novel,
                   round(n_novel / n_grams, 4) AS novelty_ratio
            FROM per ORDER BY doc_id
        """,
        # cluster-size rollup over the same recursive components
        # closure dedup_components uses
        "dedup_cluster_size_histogram": f"""
            WITH RECURSIVE {_PLANT_TAIL}, {_SHINGLES},
            seeds AS (SELECT * FROM (VALUES {_MINHASH_SEEDS}) s(j, a, b)),
            mh AS (
              SELECT doc_id, j, min((a * sid + b) % 2147483647) AS mh
              FROM sids CROSS JOIN seeds GROUP BY doc_id, j
            ),
            bands AS (
              SELECT doc_id, j // 3 AS band,
                     string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j) AS key
              FROM mh GROUP BY doc_id, j // 3
            ),
            cands AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
            ),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS inter
              FROM cands c
              JOIN sids sa ON sa.doc_id = c.doc_a
              JOIN sids sb ON sb.doc_id = c.doc_b AND sb.sid = sa.sid
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT i.doc_a, i.doc_b
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b
              WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.5
            ),
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION
              SELECT doc_b, doc_a FROM pairs
            ),
            reach(id, lbl) AS (
              SELECT DISTINCT src, src FROM edges
              UNION
              SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
            ),
            comp AS (
              SELECT id, min(lbl) AS component_id FROM reach GROUP BY id
            ),
            csize AS (
              SELECT component_id, count(*) AS cluster_size
              FROM comp GROUP BY 1
            )
            SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
                   CAST(count(*) AS BIGINT) AS n_clusters,
                   CAST(cluster_size * count(*) AS BIGINT) AS n_dup_docs
            FROM csize GROUP BY cluster_size ORDER BY cluster_size
        """,
        # fixed-radius dual of ann_bruteforce_topk: threshold on the
        # identically rounded cosine, no rank window
        "ann_range_search": """
            SELECT query_id, neighbor_id, cos_sim FROM (
              SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                     round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                  e.embedding::DOUBLE[]),
                           4) AS cos_sim
              FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
              WHERE q.vec_id < 10
            ) WHERE cos_sim >= 0.3
            ORDER BY query_id, neighbor_id
        """,
        # last-touch: latest click at-or-before each purchase (ties ->
        # larger click_id, the asof_join right_order rule), 7-day
        # lookback, per-day conversions + exact decimal revenue
        "events_attribution": """
            WITH p AS (
              SELECT event_id AS purchase_id, user_id, ts AS p_ts,
                     value AS revenue
              FROM events WHERE event_type = 'purchase'
            ),
            c AS (
              SELECT user_id, ts AS c_ts, event_id AS click_id
              FROM events WHERE event_type = 'click'
            ),
            j AS (
              SELECT p.purchase_id, p.revenue, p.p_ts, c.c_ts,
                     row_number() OVER (PARTITION BY p.purchase_id
                       ORDER BY c.c_ts DESC, c.click_id DESC) AS rn
              FROM p JOIN c
                ON c.user_id = p.user_id AND c.c_ts <= p.p_ts
            ),
            best AS (SELECT * FROM j WHERE rn = 1),
            att AS (
              SELECT p.purchase_id, p.revenue,
                     CASE WHEN b.c_ts IS NOT NULL
                               AND date_diff('second', b.c_ts, p.p_ts)
                                   <= 7 * 86400
                          THEN CAST(b.c_ts AS DATE) END
                       AS attribution_day
              FROM p LEFT JOIN best b USING (purchase_id)
            )
            SELECT attribution_day,
                   CAST(count(*) AS BIGINT) AS n_conversions,
                   round(CAST(sum(CAST(revenue AS DECIMAL(18,4)))
                              AS DOUBLE), 4) AS attributed_revenue
            FROM att GROUP BY attribution_day
            ORDER BY attribution_day NULLS FIRST
        """,
        # click -> first-later-purchase latency percentiles over
        # integer seconds (interpolated halves are engine-exact)
        "events_funnel_latency": """
            WITH e AS (
              SELECT user_id, event_type, ts FROM events
              WHERE event_type IN ('click', 'purchase')
            ),
            t1 AS (
              SELECT user_id, min(ts) AS t_click
              FROM e WHERE event_type = 'click' GROUP BY user_id
            ),
            t2 AS (
              SELECT e.user_id, min(e.ts) AS t_purchase
              FROM e JOIN t1 USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > t1.t_click
              GROUP BY e.user_id
            ),
            lat AS (
              SELECT date_diff('second', t1.t_click, t2.t_purchase)
                       AS secs
              FROM t1 JOIN t2 USING (user_id)
            )
            SELECT CAST(count(*) AS BIGINT) AS n_converted,
                   round(quantile_cont(secs, 0.5), 1) AS median_secs,
                   round(quantile_cont(secs, 0.9), 1) AS p90_secs
            FROM lat
        """,
        # ExactSubstr APPLY: same run construction as
        # dedup_exact_substr_pairs (two adjacent planted slices so
        # the interval union merges), later-doc copies cut, per-doc
        # before/removed/kept accounting
        "dedup_exact_substr_removal": f"""
            WITH plantsrc AS (
              SELECT doc_id,
                     string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents WHERE doc_id < 10
            ),
            corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id,
                     'zz plant prefix qq ' ||
                     array_to_string(w[6:25], ' ') || ' ' ||
                     array_to_string(w[16:35], ' ') ||
                     ' zz plant suffix qq' AS text
              FROM plantsrc
            ),
            norm AS (
              SELECT doc_id,
                     string_split({_NORM.format(t='text')}, ' ') AS w
              FROM corpus
            ),
            sh0 AS (
              SELECT doc_id, s.pos AS pos, s.gid AS gid FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(w) - 6),
                         i -> struct_pack(pos := i,
                           gid := {_TOKEN_ID.format(
                               t="array_to_string(w[i:i+7], ' ')")})))
                         AS s
                FROM norm)
            ),
            keepg AS (
              SELECT gid FROM sh0 GROUP BY gid HAVING count(*) <= 32
            ),
            sh AS (SELECT sh0.* FROM sh0 JOIN keepg USING (gid)),
            seeds AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.pos AS pos_a, b.pos AS pos_b
              FROM sh a JOIN sh b
                ON a.gid = b.gid AND a.doc_id < b.doc_id
            ),
            isl AS (
              SELECT doc_a, doc_b, pos_a - pos_b AS diag, pos_b,
                     pos_a - row_number() OVER (
                       PARTITION BY doc_a, doc_b, pos_a - pos_b
                       ORDER BY pos_a) AS island
              FROM seeds
            ),
            runs AS (
              SELECT doc_a, doc_b,
                     CAST(count(*) + 7 AS BIGINT) AS match_tokens,
                     CAST(min(pos_b) AS BIGINT) AS start_b
              FROM isl GROUP BY doc_a, doc_b, diag, island
            ),
            -- DISTINCT is load-bearing: tied (s, e) spans from two
            -- source docs would let the two window passes order the
            -- peers differently and split one merged interval
            sp AS (
              SELECT DISTINCT doc_b AS doc_id, start_b AS s,
                     start_b + match_tokens - 1 AS e
              FROM runs WHERE match_tokens >= 15
            ),
            mk AS (
              SELECT doc_id, s, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS prev_max_e
              FROM sp
            ),
            ivl AS (
              SELECT doc_id, s, e,
                     sum(CASE WHEN prev_max_e IS NULL
                                   OR s > prev_max_e + 1
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS iv
              FROM mk
            ),
            mg AS (
              SELECT doc_id, iv, max(e) - min(s) + 1 AS cut_len
              FROM ivl GROUP BY 1, 2
            ),
            rem AS (
              SELECT doc_id,
                     CAST(sum(cut_len) AS BIGINT) AS n_removed,
                     CAST(count(*) AS BIGINT) AS n_spans
              FROM mg GROUP BY doc_id
            ),
            sz AS (
              SELECT doc_id,
                     CAST(len(string_split({_NORM.format(t='text')},
                                           ' ')) AS BIGINT) AS n_tokens
              FROM corpus
            )
            SELECT r.doc_id, z.n_tokens, r.n_spans, r.n_removed,
                   z.n_tokens - r.n_removed AS n_kept
            FROM rem r JOIN sz z USING (doc_id)
            ORDER BY r.doc_id
        """,
        # UNIFIED ExactSubstr removal (r10): cross-doc later-copy cuts
        # UNION within-doc later-occurrence cuts (self-join at repeat
        # distance pos_b - pos_a) feeding ONE interval union; the
        # plant repeats the same 20-token slice twice per copy
        "dedup_exact_substr_self": f"""
            WITH plantsrc AS (
              SELECT doc_id,
                     string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents WHERE doc_id < 10
            ),
            corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id,
                     'zz plant prefix qq ' ||
                     array_to_string(w[6:25], ' ') ||
                     ' mm filler middle nn ' ||
                     array_to_string(w[6:25], ' ') ||
                     ' zz plant suffix qq' AS text
              FROM plantsrc
            ),
            norm AS (
              SELECT doc_id,
                     string_split({_NORM.format(t='text')}, ' ') AS w
              FROM corpus
            ),
            sh0 AS (
              SELECT doc_id, s.pos AS pos, s.gid AS gid FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(w) - 6),
                         i -> struct_pack(pos := i,
                           gid := {_TOKEN_ID.format(
                               t="array_to_string(w[i:i+7], ' ')")})))
                         AS s
                FROM norm)
            ),
            keepg AS (
              SELECT gid FROM sh0 GROUP BY gid HAVING count(*) <= 32
            ),
            sh AS (SELECT sh0.* FROM sh0 JOIN keepg USING (gid)),
            xseeds AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.pos AS pos_a, b.pos AS pos_b
              FROM sh a JOIN sh b
                ON a.gid = b.gid AND a.doc_id < b.doc_id
            ),
            xisl AS (
              SELECT doc_a, doc_b, pos_a - pos_b AS diag, pos_b,
                     pos_a - row_number() OVER (
                       PARTITION BY doc_a, doc_b, pos_a - pos_b
                       ORDER BY pos_a) AS island
              FROM xseeds
            ),
            xruns AS (
              SELECT doc_b AS doc_id,
                     CAST(count(*) + 7 AS BIGINT) AS match_tokens,
                     CAST(min(pos_b) AS BIGINT) AS start_b
              FROM xisl GROUP BY doc_a, doc_b, diag, island
            ),
            sseeds AS (
              SELECT a.doc_id AS doc_id,
                     a.pos AS pos_a, b.pos AS pos_b
              FROM sh a JOIN sh b
                ON a.gid = b.gid AND a.doc_id = b.doc_id
                   AND a.pos < b.pos
            ),
            sisl AS (
              SELECT doc_id, pos_b - pos_a AS diag, pos_b,
                     pos_a - row_number() OVER (
                       PARTITION BY doc_id, pos_b - pos_a
                       ORDER BY pos_a) AS island
              FROM sseeds
            ),
            sruns AS (
              SELECT doc_id,
                     CAST(count(*) + 7 AS BIGINT) AS match_tokens,
                     CAST(min(pos_b) AS BIGINT) AS start_b
              FROM sisl GROUP BY doc_id, diag, island
            ),
            sp AS (
              SELECT DISTINCT doc_id, start_b AS s,
                     start_b + match_tokens - 1 AS e
              FROM (SELECT * FROM xruns UNION ALL SELECT * FROM sruns)
              WHERE match_tokens >= 15
            ),
            mk AS (
              SELECT doc_id, s, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS prev_max_e
              FROM sp
            ),
            ivl AS (
              SELECT doc_id, s, e,
                     sum(CASE WHEN prev_max_e IS NULL
                                   OR s > prev_max_e + 1
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS iv
              FROM mk
            ),
            mg AS (
              SELECT doc_id, iv, max(e) - min(s) + 1 AS cut_len
              FROM ivl GROUP BY 1, 2
            ),
            rem AS (
              SELECT doc_id,
                     CAST(sum(cut_len) AS BIGINT) AS n_removed,
                     CAST(count(*) AS BIGINT) AS n_spans
              FROM mg GROUP BY doc_id
            ),
            sz AS (
              SELECT doc_id,
                     CAST(len(string_split({_NORM.format(t='text')},
                                           ' ')) AS BIGINT) AS n_tokens
              FROM corpus
            )
            SELECT r.doc_id, z.n_tokens, r.n_spans, r.n_removed,
                   z.n_tokens - r.n_removed AS n_kept
            FROM rem r JOIN sz z USING (doc_id)
            ORDER BY r.doc_id
        """,
        # r10 PRODUCE step: same span pipeline as _self, then merged
        # intervals -> positioned-token anti-join -> ordered
        # string_agg of the surviving normalized tokens
        "dedup_exact_substr_apply": f"""
            WITH plantsrc AS (
              SELECT doc_id,
                     string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents WHERE doc_id < 10
            ),
            corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id,
                     'zz plant prefix qq ' ||
                     array_to_string(w[6:25], ' ') ||
                     ' mm filler middle nn ' ||
                     array_to_string(w[6:25], ' ') ||
                     ' zz plant suffix qq' AS text
              FROM plantsrc
            ),
            norm AS (
              SELECT doc_id,
                     string_split({_NORM.format(t='text')}, ' ') AS w
              FROM corpus
            ),
            sh0 AS (
              SELECT doc_id, s.pos AS pos, s.gid AS gid FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(w) - 6),
                         i -> struct_pack(pos := i,
                           gid := {_TOKEN_ID.format(
                               t="array_to_string(w[i:i+7], ' ')")})))
                         AS s
                FROM norm)
            ),
            keepg AS (
              SELECT gid FROM sh0 GROUP BY gid HAVING count(*) <= 32
            ),
            sh AS (SELECT sh0.* FROM sh0 JOIN keepg USING (gid)),
            xseeds AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.pos AS pos_a, b.pos AS pos_b
              FROM sh a JOIN sh b
                ON a.gid = b.gid AND a.doc_id < b.doc_id
            ),
            xisl AS (
              SELECT doc_a, doc_b, pos_a - pos_b AS diag, pos_b,
                     pos_a - row_number() OVER (
                       PARTITION BY doc_a, doc_b, pos_a - pos_b
                       ORDER BY pos_a) AS island
              FROM xseeds
            ),
            xruns AS (
              SELECT doc_b AS doc_id,
                     CAST(count(*) + 7 AS BIGINT) AS match_tokens,
                     CAST(min(pos_b) AS BIGINT) AS start_b
              FROM xisl GROUP BY doc_a, doc_b, diag, island
            ),
            sseeds AS (
              SELECT a.doc_id AS doc_id,
                     a.pos AS pos_a, b.pos AS pos_b
              FROM sh a JOIN sh b
                ON a.gid = b.gid AND a.doc_id = b.doc_id
                   AND a.pos < b.pos
            ),
            sisl AS (
              SELECT doc_id, pos_b - pos_a AS diag, pos_b,
                     pos_a - row_number() OVER (
                       PARTITION BY doc_id, pos_b - pos_a
                       ORDER BY pos_a) AS island
              FROM sseeds
            ),
            sruns AS (
              SELECT doc_id,
                     CAST(count(*) + 7 AS BIGINT) AS match_tokens,
                     CAST(min(pos_b) AS BIGINT) AS start_b
              FROM sisl GROUP BY doc_id, diag, island
            ),
            sp AS (
              SELECT DISTINCT doc_id, start_b AS s,
                     start_b + match_tokens - 1 AS e
              FROM (SELECT * FROM xruns UNION ALL SELECT * FROM sruns)
              WHERE match_tokens >= 15
            ),
            mk AS (
              SELECT doc_id, s, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS prev_max_e
              FROM sp
            ),
            ivl AS (
              SELECT doc_id, s, e,
                     sum(CASE WHEN prev_max_e IS NULL
                                   OR s > prev_max_e + 1
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS iv
              FROM mk
            ),
            mg AS (
              SELECT doc_id, iv, min(s) AS ms, max(e) AS me
              FROM ivl GROUP BY 1, 2
            ),
            toks AS (
              SELECT doc_id, s.pos AS pos, s.tok AS tok FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(w) + 1),
                         i -> struct_pack(pos := i, tok := w[i]))) AS s
                FROM norm)
            ),
            keptt AS (
              SELECT t.* FROM toks t
              WHERE NOT EXISTS (
                SELECT 1 FROM mg
                WHERE mg.doc_id = t.doc_id
                  AND t.pos BETWEEN mg.ms AND mg.me)
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                   string_agg(tok, ' ' ORDER BY pos) AS kept_text
            FROM keptt GROUP BY doc_id ORDER BY doc_id
        """,
        # MOSS's dedup application: distinct winnowed hashes per doc,
        # stop-hash cap 32, fp equi-join, >= 2 shared
        "dedup_winnowing_pairs": f"""
            WITH {_PLANT_TAIL},
            norm AS (
              SELECT doc_id,
                     string_split({_NORM.format(t='text')}, ' ') AS w
              FROM corpus
            ),
            g AS (
              SELECT doc_id, s.pos AS pos, s.gid AS gid FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(w) - 3),
                         i -> struct_pack(pos := i,
                           gid := {_TOKEN_ID.format(
                               t="array_to_string(w[i:i+4], ' ')")})))
                         AS s
                FROM norm)
            ),
            ng AS (
              SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id
            ),
            cov0 AS (
              SELECT doc_id, gid, pos,
                     unnest(range(greatest(pos - 3, 1), pos + 1)) AS start
              FROM g
            ),
            cov AS (
              SELECT c.* FROM cov0 c JOIN ng USING (doc_id)
              WHERE c.start <= ng.n_grams - 3
            ),
            wmin AS (
              SELECT doc_id, start, min(gid) AS mh
              FROM cov GROUP BY 1, 2
            ),
            fp AS (SELECT DISTINCT doc_id, mh FROM wmin),
            keepfp AS (
              SELECT mh FROM fp GROUP BY mh HAVING count(*) <= 32
            ),
            live AS (SELECT fp.* FROM fp JOIN keepfp USING (mh))
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS shared_fps
            FROM live a JOIN live b
              ON a.mh = b.mh AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 2
            ORDER BY doc_a, doc_b
        """,
        # r10: the winnowing pair graph closed to duplicate groups by
        # the SAME min-label closure the MinHash chain uses
        "dedup_winnowing_components": f"""
            WITH RECURSIVE {_PLANT_TAIL},
            norm AS (
              SELECT doc_id,
                     string_split({_NORM.format(t='text')}, ' ') AS w
              FROM corpus
            ),
            g AS (
              SELECT doc_id, s.pos AS pos, s.gid AS gid FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(w) - 3),
                         i -> struct_pack(pos := i,
                           gid := {_TOKEN_ID.format(
                               t="array_to_string(w[i:i+4], ' ')")})))
                         AS s
                FROM norm)
            ),
            ng AS (
              SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id
            ),
            cov0 AS (
              SELECT doc_id, gid, pos,
                     unnest(range(greatest(pos - 3, 1), pos + 1)) AS start
              FROM g
            ),
            cov AS (
              SELECT c.* FROM cov0 c JOIN ng USING (doc_id)
              WHERE c.start <= ng.n_grams - 3
            ),
            wmin AS (
              SELECT doc_id, start, min(gid) AS mh
              FROM cov GROUP BY 1, 2
            ),
            fp AS (SELECT DISTINCT doc_id, mh FROM wmin),
            keepfp AS (
              SELECT mh FROM fp GROUP BY mh HAVING count(*) <= 32
            ),
            live AS (SELECT fp.* FROM fp JOIN keepfp USING (mh)),
            wpairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM live a JOIN live b
                ON a.mh = b.mh AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING count(*) >= 2
            ),
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM wpairs
              UNION
              SELECT doc_b, doc_a FROM wpairs
            ),
            reach(id, lbl) AS (
              SELECT DISTINCT src, src FROM edges
              UNION
              SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
            )
            SELECT id AS doc_id, min(lbl) AS component_id
            FROM reach GROUP BY id ORDER BY doc_id
        """,
        # Heaps' law: cumulative vocab vs tokens at 10 id-order
        # prefixes; cutoffs from max(doc_id), all-integer
        "corpus_heaps_law": f"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split({_NORM.format(t='text')}, ' '))
                       AS w
              FROM documents
            ),
            toksf AS (SELECT * FROM toks WHERE w != ''),
            nmax AS (SELECT max(doc_id) AS max_id FROM documents),
            cuts AS (
              SELECT CAST(b AS INTEGER) AS bucket,
                     CAST((max_id + 1) * b // 10 - 1 AS BIGINT)
                       AS cutoff_doc
              FROM (SELECT max_id, unnest(range(1, 11)) AS b FROM nmax)
            ),
            dt AS (
              SELECT doc_id, count(*) AS n_tokens
              FROM toksf GROUP BY doc_id
            ),
            ct AS (
              SELECT c.bucket, c.cutoff_doc,
                     CAST(sum(d.n_tokens) AS BIGINT) AS cum_tokens
              FROM dt d JOIN cuts c ON d.doc_id <= c.cutoff_doc
              GROUP BY 1, 2
            ),
            fd AS (
              SELECT w, min(doc_id) AS first_doc FROM toksf GROUP BY w
            ),
            cv AS (
              SELECT c.bucket, CAST(count(*) AS BIGINT) AS cum_vocab
              FROM fd f JOIN cuts c ON f.first_doc <= c.cutoff_doc
              GROUP BY 1
            )
            SELECT ct.bucket, ct.cutoff_doc, ct.cum_tokens, cv.cum_vocab
            FROM ct JOIN cv USING (bucket) ORDER BY bucket
        """,
        # channel c of the PNG corpus holds samples i with i mod C = c
        "multimodal_channel_stats": """
            WITH dims AS (
              SELECT doc_id,
                     doc_id % 8 + 2 AS w,
                     doc_id % 6 + 2 AS h,
                     CASE doc_id % 3 WHEN 0 THEN 1
                                     WHEN 1 THEN 3
                                     ELSE 4 END AS ch
              FROM documents
            ),
            px AS (
              SELECT doc_id, ch, unnest(range(ch * w * h)) AS i FROM dims
            )
            SELECT doc_id,
                   CAST(i % ch AS INTEGER) AS channel,
                   CAST(count(*) AS BIGINT) AS n_samples,
                   CAST(sum((11 * i + 3 * doc_id) % 256) AS BIGINT)
                     AS sample_sum,
                   CAST(min((11 * i + 3 * doc_id) % 256) AS INTEGER)
                     AS sample_min,
                   CAST(max((11 * i + 3 * doc_id) % 256) AS INTEGER)
                     AS sample_max
            FROM px GROUP BY doc_id, i % ch
            ORDER BY doc_id, channel
        """,
        # the two stored view bodies composed in plain SQL over the
        # FULL table (the engine appends the odd half before reading,
        # proving views re-resolve against live snapshots)
        "sql_view_dispatch": """
            WITH prio_rev AS (
              SELECT o_orderpriority,
                     CAST(count(*) AS BIGINT) AS n_orders,
                     sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
              FROM orders GROUP BY o_orderpriority
            )
            SELECT o_orderpriority, n_orders,
                   round(CAST(rev AS DOUBLE), 2) AS revenue
            FROM prio_rev WHERE n_orders > 0
            ORDER BY o_orderpriority
        """,
        # ntile over the deterministic (rev desc, user) total order
        "events_user_ltv_deciles": """
            WITH rev AS (
              SELECT user_id, sum(CAST(value AS DECIMAL(18,4))) AS rev
              FROM events WHERE event_type = 'purchase'
              GROUP BY user_id
            ),
            cut AS (
              SELECT user_id, rev,
                     CAST(ntile(10) OVER (ORDER BY rev DESC, user_id)
                          AS INTEGER) AS decile
              FROM rev
            )
            SELECT decile,
                   CAST(count(*) AS BIGINT) AS n_users,
                   round(CAST(sum(rev) AS DOUBLE), 4) AS revenue
            FROM cut GROUP BY decile ORDER BY decile
        """,
        # PageRank over the exact-Jaccard pair graph: 3 unrolled
        # rounds, nano-quantized integer contributions, integer-
        # percent damping — bit-exact replay
        "graph_pagerank_dedup": f"""
            WITH {_PLANT_TAIL}, {_SHINGLES},
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*) AS inter
              FROM sids a JOIN sids b
                ON a.sid = b.sid AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT doc_a, doc_b FROM inter
              JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b
              WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.5
            ),
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM pairs
            ),
            nodes AS (SELECT DISTINCT src AS node FROM edges),
            scal AS (
              SELECT count(*) AS n,
                     1000000000 // count(*) AS base,
                     (CAST(15 AS BIGINT) * 1000000000) // 100
                       // count(*) AS tele
              FROM nodes
            ),
            deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY src),
            pr0 AS (
              SELECT node, CAST(base AS BIGINT) AS pr_nano
              FROM nodes CROSS JOIN scal
            ),
            c1 AS (
              SELECT e.dst AS node,
                     CAST(floor(CAST(p.pr_nano AS DOUBLE) / d.degree)
                          AS BIGINT) AS c
              FROM edges e JOIN pr0 p ON p.node = e.src
              JOIN deg d ON d.src = e.src
            ),
            s1 AS (SELECT node, CAST(sum(c) AS BIGINT) AS s FROM c1
                   GROUP BY node),
            pr1 AS (
              SELECT n.node,
                     CAST(tele + CAST(floor(COALESCE(s.s, 0) * 85 / 100)
                                      AS BIGINT) AS BIGINT) AS pr_nano
              FROM nodes n LEFT JOIN s1 s USING (node) CROSS JOIN scal
            ),
            c2 AS (
              SELECT e.dst AS node,
                     CAST(floor(CAST(p.pr_nano AS DOUBLE) / d.degree)
                          AS BIGINT) AS c
              FROM edges e JOIN pr1 p ON p.node = e.src
              JOIN deg d ON d.src = e.src
            ),
            s2 AS (SELECT node, CAST(sum(c) AS BIGINT) AS s FROM c2
                   GROUP BY node),
            pr2 AS (
              SELECT n.node,
                     CAST(tele + CAST(floor(COALESCE(s.s, 0) * 85 / 100)
                                      AS BIGINT) AS BIGINT) AS pr_nano
              FROM nodes n LEFT JOIN s2 s USING (node) CROSS JOIN scal
            ),
            c3 AS (
              SELECT e.dst AS node,
                     CAST(floor(CAST(p.pr_nano AS DOUBLE) / d.degree)
                          AS BIGINT) AS c
              FROM edges e JOIN pr2 p ON p.node = e.src
              JOIN deg d ON d.src = e.src
            ),
            s3 AS (SELECT node, CAST(sum(c) AS BIGINT) AS s FROM c3
                   GROUP BY node),
            pr3 AS (
              SELECT n.node,
                     CAST(tele + CAST(floor(COALESCE(s.s, 0) * 85 / 100)
                                      AS BIGINT) AS BIGINT) AS pr_nano
              FROM nodes n LEFT JOIN s3 s USING (node) CROSS JOIN scal
            )
            SELECT p.node, p.pr_nano, CAST(d.degree AS BIGINT) AS degree
            FROM pr3 p JOIN deg d ON d.src = p.node
            ORDER BY p.node
        """,
        # ordered funnel: conditional-min chain (click strictly after
        # the first view, purchase strictly after that click)
        "events_funnel": """
            WITH fe AS (
              SELECT user_id, event_type, ts FROM events
              WHERE event_type IN ('view', 'click', 'purchase')
            ),
            t1 AS (
              SELECT user_id, min(ts) AS t_view FROM fe
              WHERE event_type = 'view' GROUP BY user_id
            ),
            t2 AS (
              SELECT fe.user_id, min(ts) AS t_click
              FROM fe JOIN t1 USING (user_id)
              WHERE event_type = 'click' AND ts > t_view
              GROUP BY fe.user_id
            ),
            t3 AS (
              SELECT fe.user_id, min(ts) AS t_purchase
              FROM fe JOIN t2 USING (user_id)
              WHERE event_type = 'purchase' AND ts > t_click
              GROUP BY fe.user_id
            )
            SELECT t1.user_id, t_view, t_click, t_purchase,
                   CAST(1 + CAST(t_click IS NOT NULL AS INTEGER)
                          + CAST(t_purchase IS NOT NULL AS INTEGER)
                        AS INTEGER) AS stage_reached
            FROM t1 LEFT JOIN t2 USING (user_id)
                    LEFT JOIN t3 USING (user_id)
            ORDER BY user_id
        """,
        # cohort retention: first-activity day x day-offset matrix
        "events_cohort_retention": """
            WITH active AS (
              SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
              FROM events
            ),
            cohort AS (
              SELECT user_id, min(day) AS cohort_day FROM active
              GROUP BY user_id
            )
            SELECT cohort_day,
                   CAST(day - cohort_day AS INTEGER) AS day_offset,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM active JOIN cohort USING (user_id)
            GROUP BY cohort_day, day_offset
            ORDER BY cohort_day, day_offset
        """,
        # temperature mixture: (n_i/N)^0.3 normalized (alpha sampling)
        "sample_temperature_mixture": """
            WITH counts AS (
              SELECT source, count(*) AS n_docs FROM documents
              GROUP BY source
            ),
            tot AS (SELECT sum(n_docs) AS total FROM counts),
            z AS (
              SELECT sum(pow(CAST(n_docs AS DOUBLE)
                             / CAST(total AS DOUBLE), 0.3)) AS zz
              FROM counts CROSS JOIN tot
            )
            SELECT source, n_docs,
                   round(CAST(n_docs AS DOUBLE)
                         / CAST(total AS DOUBLE), 6) AS share,
                   round(pow(CAST(n_docs AS DOUBLE)
                             / CAST(total AS DOUBLE), 0.3) / zz, 6)
                     AS weight,
                   CAST(round(pow(CAST(n_docs AS DOUBLE)
                             / CAST(total AS DOUBLE), 0.3) / zz
                         * CAST(total AS DOUBLE)) AS BIGINT)
                     AS epoch_docs
            FROM counts CROSS JOIN tot CROSS JOIN z
            ORDER BY source
        """,
        # posdelete consolidation: the live set after two overlapping
        # MOR deletes, answered from the REWRITTEN manifest (data and
        # delete bytes wiped first); multiples of 5 or 3 are deleted.
        # Only the scale-independent `consolidated` flag (file count
        # shrank) is pinned — AQE may legitimately size the rewritten
        # delete set to >1 file on a larger corpus
        "maintenance_rewrite_posdeletes": """
            SELECT o_orderpriority,
                   count(*) AS n_live,
                   CAST(1 AS INTEGER) AS consolidated
            FROM orders
            WHERE NOT (o_orderkey % 5 = 0 OR o_orderkey % 3 = 0)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        # Puffin-twin NDV: the estimate comes from manifest-stored
        # HLL registers (data bytes wiped first); the oracle proves
        # the exact count and the in-query bound flag
        "metadata_ndv_sketch": """
            SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                     AS exact_distinct,
                   CAST(1 AS INTEGER) AS within_bounds
            FROM events
        """,
        # COUNT(*) under MOR position deletes: the query deletes every
        # data byte (delete files included) before aggregating, so the
        # per-priority live counts can only come from the manifest's
        # per-target delete counts; the oracle recomputes the same
        # live set from the raw table
        "metadata_agg_mor_count": """
            SELECT o_orderpriority, count(*) AS n_live
            FROM orders
            WHERE NOT (o_orderkey % 7 = 0 OR o_orderkey % 2 = 0)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        # metadata_agg_pushdown answers from manifest stats; the
        # oracle is the equivalent real scan — agreeing proves the
        # stats fold exact
        "metadata_agg_pushdown": """
            SELECT o_orderpriority,
                   count(*) AS n_orders,
                   min(o_orderdate) AS min_date,
                   max(o_totalprice) AS max_price,
                   count(o_custkey) AS n_cust
            FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '5-LOW')
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "text_quality_filter": _quality_filter_oracle(),
        "zorder_cluster_events": _zorder_oracle(),
        "sample_hash_events": f"""
            SELECT event_id, event_type FROM events
            WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
                  < {int(0.05 * 16 ** 15)}
        """,
        "sample_mixture_documents": _mixture_oracle(),
        "sample_stratified_events": """
            WITH d AS (
              SELECT event_id, event_type,
                     ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
              FROM events
            ), r AS (
              SELECT event_id, event_type,
                     row_number() OVER (PARTITION BY event_type ORDER BY h, event_id) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS cnt
              FROM d
            )
            SELECT event_id, event_type FROM r
            WHERE rn <= CAST(ceil(cnt * 0.1) AS BIGINT)
        """,
        "text_chunk_windows": f"""
            WITH norm AS (
              SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents
            ), s AS (
              SELECT doc_id, len(w) AS doc_tokens,
                     unnest(generate_series(1, greatest(len(w) - 8, 1), 24)) AS start
              FROM norm
            )
            SELECT doc_id,
                   CAST((start - 1) // 24 AS INTEGER) AS chunk_id,
                   CAST(least(32, doc_tokens - start + 1) AS INTEGER) AS n_tokens
            FROM s
        """,
        "text_chunk_texts": f"""
            WITH norm AS (
              SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents WHERE doc_id < 100
            ), s AS (
              SELECT doc_id, w,
                     unnest(generate_series(1, greatest(len(w) - 8, 1), 24)) AS start
              FROM norm
            )
            SELECT doc_id,
                   CAST((start - 1) // 24 AS INTEGER) AS chunk_id,
                   array_to_string(list_slice(w, start, start + 31), ' ') AS chunk_text
            FROM s
        """,
        "curation_end_to_end": _curation_oracle(),
        "pack_training_sequences": f"""
            WITH norm AS (
              SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents
            ), s AS (
              SELECT doc_id, len(w) AS doc_tokens,
                     unnest(generate_series(1, greatest(len(w) - 8, 1), 24)) AS start
              FROM norm
            ), c AS (
              SELECT doc_id,
                     CAST((start - 1) // 24 AS INTEGER) AS chunk_id,
                     CAST(least(32, doc_tokens - start + 1) AS INTEGER) AS n_tokens,
                     doc_id // 100 AS shard_id
              FROM s
            ), q AS (
              SELECT *, coalesce(sum(n_tokens) OVER (
                          PARTITION BY shard_id ORDER BY doc_id, chunk_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
              FROM c
            )
            SELECT doc_id, chunk_id, n_tokens, shard_id,
                   CAST(cum // 256 AS BIGINT) AS seq_id,
                   CAST(cum % 256 AS BIGINT) AS seq_offset
            FROM q
        """,
        # DSIR importance selection: hashed-bigram buckets via the
        # md5-conv twin; bucket log-ratios micro-quantized once in a
        # 1024-row model table; doc scores are integer dot products
        "sample_dsir_selection": f"""
            WITH toked AS (
              SELECT doc_id,
                     string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents
            ), grams AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(w)),
                            i -> w[i] || ' ' || w[i + 1])) AS gram
              FROM toked WHERE len(w) >= 2
            ), doc_b AS (
              SELECT doc_id,
                     ('0x' || substr(md5(gram), 1, 15))::BIGINT % 1024
                       AS b,
                     count(*) AS n
              FROM grams GROUP BY 1, 2
            ), t_counts AS (
              SELECT b, sum(n) AS ct FROM doc_b
              WHERE doc_id % 17 = 0 GROUP BY 1
            ), r_counts AS (
              SELECT b, sum(n) AS cr FROM doc_b GROUP BY 1
            ), model AS (
              SELECT r.range AS b,
                     COALESCE(t.ct, 0) AS ct,
                     COALESCE(c.cr, 0) AS cr
              FROM range(1024) r
              LEFT JOIN t_counts t ON t.b = r.range
              LEFT JOIN r_counts c ON c.b = r.range
            ), tot AS (
              SELECT sum(ct) AS tt, sum(cr) AS tr FROM model
            ), lp AS (
              SELECT b,
                     CAST(round((
                         ln(CAST(ct + 1 AS DOUBLE)
                            / CAST(tt + 1024 AS DOUBLE))
                       - ln(CAST(cr + 1 AS DOUBLE)
                            / CAST(tr + 1024 AS DOUBLE))
                     ) * 1000000.0) AS BIGINT) AS lr_micro
              FROM model CROSS JOIN tot
            ), scored AS (
              SELECT d.doc_id,
                     CAST(sum(d.n * l.lr_micro) AS BIGINT) AS dsir_micro,
                     CAST(sum(d.n) AS BIGINT) AS n_grams
              FROM doc_b d JOIN lp l USING (b)
              GROUP BY 1
            ), full_t AS (
              SELECT doc_id,
                     COALESCE(s.n_grams, 0) AS n_grams,
                     COALESCE(s.dsir_micro, 0) AS dsir_micro
              FROM documents LEFT JOIN scored s USING (doc_id)
            ), ranked AS (
              SELECT *, row_number() OVER (
                        ORDER BY dsir_micro DESC, doc_id) AS rk
              FROM full_t
            )
            SELECT doc_id, n_grams, dsir_micro,
                   CAST(rk <= 100 AS INTEGER) AS selected
            FROM ranked ORDER BY doc_id
        """,
        # sparse TF-IDF cosine retrieval: integer milli-weights make
        # dots/norms order-free integer sums (DuckDB int128 vs Spark
        # DECIMAL(38,0) — both exact); sqrt/divide are the only floats
        "text_sparse_retrieval_topk": f"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split({_NORM.format(t='text')}, ' '))
                       AS term
              FROM documents
            ), tf AS (
              SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
            ), dfreq AS (
              SELECT term, count(*) AS df FROM tf GROUP BY 1
            ), nd AS (
              SELECT count(DISTINCT doc_id) AS n_docs FROM documents
            ), w AS (
              SELECT doc_id, term,
                     CAST(round(tf * n_docs * 1000.0 / df) AS BIGINT) AS w
              FROM tf JOIN dfreq USING (term) CROSS JOIN nd
            ), norms AS (
              SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY 1
            ), qw AS (
              SELECT doc_id AS query_id, term, w AS qw
              FROM w WHERE doc_id < 10
            ), dots AS (
              SELECT q.query_id, w.doc_id, sum(q.qw * w.w) AS dot
              FROM w JOIN qw q USING (term)
              WHERE w.doc_id <> q.query_id
              GROUP BY 1, 2
            ), scored AS (
              SELECT d.query_id, d.doc_id,
                     round(CAST(d.dot AS DOUBLE)
                           / (sqrt(CAST(qn.n2 AS DOUBLE))
                              * sqrt(CAST(n.n2 AS DOUBLE))), 6) AS cos_sim
              FROM dots d
              JOIN norms n ON d.doc_id = n.doc_id
              JOIN norms qn ON d.query_id = qn.doc_id
            )
            SELECT query_id, doc_id, cos_sim, CAST(rnk AS INTEGER) AS rnk
            FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                          ORDER BY cos_sim DESC, doc_id) AS rnk
              FROM scored)
            WHERE rnk <= 10
            ORDER BY query_id, rnk
        """,
        "text_tfidf_topk": f"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split({_NORM.format(t='text')}, ' ')) AS term
              FROM documents
            ), tf AS (
              SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
            ), dfreq AS (
              SELECT term, count(*) AS df FROM tf GROUP BY 1
            ), nd AS (
              SELECT count(DISTINCT doc_id) AS n_docs FROM documents
            ), scored AS (
              SELECT doc_id, term, tf, df,
                     round(tf * n_docs / df, 4) AS tfidf
              FROM tf JOIN dfreq USING (term) CROSS JOIN nd
            )
            SELECT doc_id, term, tf, df, tfidf, CAST(rk AS INTEGER) AS rk
            FROM (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                          ORDER BY tfidf DESC, term) AS rk
              FROM scored
            ) WHERE rk <= 5
        """,
        "sql_branch_wap": """
            SELECT
              CAST((SELECT count(*) FROM orders WHERE o_orderkey < 1000)
                   AS BIGINT) AS n_base,
              CAST((SELECT count(*) FROM orders WHERE o_orderkey < 2000)
                   AS BIGINT) AS n_published,
              CAST((SELECT count(*) FROM orders WHERE o_orderkey < 2000)
                   AS BIGINT) AS n_staged_rejected,
              CAST(0 AS INTEGER) AS bad_published,
              CAST(1 AS INTEGER) AS good_published
        """,
        "sql_ctas_time_travel": """
            WITH base AS (
              SELECT event_id, event_type, value FROM events
              WHERE event_id < 2000
            ),
            cur AS (
              SELECT event_id, event_type,
                     CASE WHEN event_type = 'signup' THEN value * 2
                          ELSE value END AS value
              FROM base WHERE event_type <> 'error'
            ),
            mart AS (
              SELECT event_type, count(*) AS n_now,
                     round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
                         AS total_now
              FROM cur GROUP BY event_type
            ),
            old AS (
              SELECT event_type, count(*) AS n_v1 FROM base GROUP BY event_type
            )
            SELECT m.event_type, m.n_now, m.total_now, old.n_v1,
                   CAST(4 AS BIGINT) AS n_commits
            FROM mart m JOIN old ON m.event_type = old.event_type
        """,
        "incremental_scan_changelog": """
            SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
            WHERE o_orderkey >= 1000
        """,
        "mor_merge_compact": """
            WITH base AS (
              SELECT event_id, event_type, value FROM events
              WHERE event_id < 2000
            )
            SELECT event_id, event_type,
                   CASE WHEN event_id < 500 THEN value * 2 ELSE value END
                       AS value
            FROM base
            WHERE NOT (event_id >= 500 AND event_id < 700)
        """,
        "schema_evolution_sql": """
            SELECT c_custkey AS custkey, c_name AS cust_name,
                   CASE WHEN c_custkey >= 500 THEN c_mktsegment END AS segment
            FROM customer WHERE c_custkey < 1000
        """,
        "maintenance_procedures": """
            SELECT p_partkey, p_brand, CAST(1 AS BIGINT) AS n_snapshots
            FROM part WHERE p_brand <> 'Brand#11'
        """,
        "range_join_incidents": """
            WITH inc AS (
              SELECT event_id AS incident_id, event_type,
                     ts AS start_ts, ts + INTERVAL 2 HOUR AS end_ts
              FROM events WHERE event_id < 300
            )
            SELECT i.incident_id, e.event_id, e.event_type, e.ts
            FROM inc i JOIN events e
              ON e.event_type = i.event_type
             AND e.ts >= i.start_ts AND e.ts <= i.end_ts
        """,
        "text_top_ngrams": f"""
            WITH norm AS (
              SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, gram FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(w)),
                              i -> w[i] || ' ' || w[i + 1])) AS gram
                FROM norm)
            )
            SELECT gram, count(*) AS df FROM sh GROUP BY gram
            ORDER BY df DESC, gram ASC LIMIT 20
        """,
        # r10 trending: rank over the drained windowed counts —
        # deterministic, so the streaming composition keeps an exact
        # oracle (same tie-break as the Spark side)
        "streaming_topk_trending": """
            WITH c AS (
              SELECT date_trunc('hour', ts) AS window_start,
                     event_type,
                     count(*) AS n_events
              FROM events GROUP BY 1, 2
            ),
            r AS (
              SELECT window_start, event_type,
                     CAST(n_events AS BIGINT) AS n_events,
                     CAST(row_number() OVER (
                       PARTITION BY window_start
                       ORDER BY n_events DESC, event_type
                     ) AS INTEGER) AS rk
              FROM c
            )
            SELECT * FROM r WHERE rk <= 3
        """,
        "streaming_windowed_counts": """
            SELECT date_trunc('hour', ts) AS window_start,
                   date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
                   event_type,
                   count(*) AS n_events,
                   round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
                       AS sum_value
            FROM events GROUP BY 1, 2, 3
        """,
        "streaming_dedup": """
            SELECT event_id, user_id, event_type, value, ts FROM events
        """,
        "streaming_interval_join": """
            SELECT c.user_id,
                   c.event_id AS click_id,
                   p.event_id AS purchase_id,
                   c.ts AS click_ts,
                   p.ts AS purchase_ts
            FROM events c JOIN events p
              ON c.user_id = p.user_id
             AND c.event_type = 'click' AND p.event_type = 'purchase'
             AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        """,
        "streaming_sessionize": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                               - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id, ts,
                     CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS session_id
              FROM g
            ), agg AS (
              SELECT user_id, session_id, count(*) AS n_events,
                     date_trunc('second', min(ts)) AS session_start,
                     date_trunc('second', max(ts)) AS session_end
              FROM s GROUP BY user_id, session_id
            )
            SELECT user_id, session_id, n_events, session_start, session_end
            FROM agg
            WHERE session_id < (SELECT max(a2.session_id) FROM agg a2
                                WHERE a2.user_id = agg.user_id)
        """,
        "dedup_embedding_pairs_brute": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 4) AS cos_sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[]), 4) >= 0.4
        """,
        "ann_bruteforce_topk": """
            SELECT query_id, neighbor_id, cos_sim, rnk FROM (
              SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                     round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                  e.embedding::DOUBLE[]), 4) AS cos_sim,
                     CAST(row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                             e.embedding::DOUBLE[]), 4) DESC,
                                e.vec_id ASC) AS INTEGER) AS rnk
              FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
              WHERE q.vec_id < 10
            ) WHERE rnk <= 5
        """,
        "dedup_embedding_lsh_pairs": _embedding_lsh_pairs_oracle(),
        "ann_lsh_topk": _ann_lsh_oracle(),
        "ann_ivf_topk": _ann_ivf_oracle(),
        "ann_incremental_ivf_append": _ivf_incremental_oracle(),
        "ann_incremental_ivf_sampled": _ivf_incremental_oracle(sample_mod=4),
        "dedup_semantic": _semantic_dedup_oracle(),
        "position_delete_mor": """
            SELECT o_orderstatus,
                   count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                              AS DOUBLE), 2) AS sum_price
            FROM orders
            WHERE o_orderkey <= 8000
              AND NOT (o_totalprice > 150000)
            GROUP BY o_orderstatus
            ORDER BY o_orderstatus
        """,
        "scd2_user_status_history": """
            WITH ordered AS (
              SELECT user_id, event_type, ts, event_id,
                     CASE WHEN lag(event_type) OVER w IS NULL
                          OR lag(event_type) OVER w <> event_type
                          THEN 1 ELSE 0 END AS chg
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), runs AS (
              SELECT *, SUM(chg) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS run
              FROM ordered
            ), versions AS (
              SELECT user_id, run,
                     min(ts) AS valid_from,
                     min(event_type) AS event_type
              FROM runs GROUP BY user_id, run
            )
            SELECT user_id, CAST(run AS INTEGER) AS version, event_type,
                   valid_from,
                   lead(valid_from) OVER w2 AS valid_to,
                   lead(valid_from) OVER w2 IS NULL AS is_current
            FROM versions
            WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from)
            ORDER BY user_id, version
        """,
        "corpus_mixture_weights": r"""
            WITH dom AS (
              SELECT source, count(*) AS n_docs,
                     CAST(sum(len(string_split_regex(trim(text), '\s+')))
                          AS BIGINT) AS n_tokens
              FROM documents GROUP BY source
            ), tot AS (
              SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
                     count(*) AS n_domains
              FROM dom
            )
            SELECT source, n_docs, n_tokens,
                   round(n_tokens / CAST(tot_tokens AS DOUBLE), 6) AS share,
                   round(1.0 / n_domains, 6) AS target_share,
                   round(least((1.0 / n_domains)
                               / (n_tokens / CAST(tot_tokens AS DOUBLE)),
                               5.0), 6) AS weight,
                   CAST(round(n_tokens * round(least((1.0 / n_domains)
                               / (n_tokens / CAST(tot_tokens AS DOUBLE)),
                               5.0), 6)) AS BIGINT) AS expected_tokens
            FROM dom CROSS JOIN tot
            ORDER BY source
        """,
        "bloom_point_lookup": """
            SELECT doc_id, lang, source, n_chars
            FROM documents
            WHERE doc_id IN (7, 42, 123, 404, 499)
            ORDER BY doc_id
        """,
        "incremental_gold_rollup": """
            SELECT event_type,
                   count(*) AS n,
                   round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE),
                         4) AS total,
                   round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                         / count(value), 4) AS avg_v,
                   round(CAST(min(value) AS DOUBLE), 4) AS lo,
                   round(CAST(max(value) AS DOUBLE), 4) AS hi
            FROM events
            GROUP BY event_type
            ORDER BY event_type
        """,
        "write_ordered_lineage": """
            SELECT c_custkey, c_name,
                   CAST(row_number() OVER (ORDER BY c_name DESC) - 1
                        AS BIGINT) AS "_pos"
            FROM customer
            WHERE c_custkey <= 200
            ORDER BY c_custkey
        """,
        "partition_evolution_scan": """
            SELECT event_type,
                   count(*) AS n_events,
                   round(CAST(sum(CAST(value AS DECIMAL(18,4)))
                              AS DOUBLE), 2) AS sum_value
            FROM events
            GROUP BY event_type
            ORDER BY event_type
        """,
        "bpe_vocab_merges": _bpe_oracle(6),
        "bpe_encode_tokens": _bpe_encode_oracle(6),
        "ann_pq_topk": _ann_pq_oracle(),
        "incremental_join_view": """
            SELECT c_mktsegment,
                   count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                              AS DOUBLE), 2) AS sum_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
            ORDER BY c_mktsegment
        """,
        "mor_update_positions": """
            SELECT l_returnflag,
                   count(*) AS n_items,
                   round(CAST(sum(CAST(CASE WHEN q1 > 140 THEN q1 * 2
                                            ELSE q1 END
                                       AS DECIMAL(18,4))) AS DOUBLE),
                         2) AS sum_qty
            FROM (
              SELECT l_returnflag,
                     CASE WHEN l_returnflag = 'R'
                          THEN l_quantity + 100
                          ELSE l_quantity END AS q1
              FROM lineitem WHERE l_orderkey <= 2000
            )
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "cdc_changelog_diff": """
            WITH base AS (
              SELECT o_orderkey AS k, o_totalprice AS p
              FROM orders WHERE o_orderkey <= 6000
            ), ins AS (
              SELECT o_orderkey AS k, o_totalprice AS p
              FROM orders
              WHERE o_orderkey > 6000 AND o_orderkey <= 6500
            ), changes AS (
              -- net INSERT: inserted and not deleted afterwards
              SELECT 'INSERT' AS ct, p FROM ins WHERE k % 97 <> 0
              UNION ALL
              -- net DELETE: payload as of the START snapshot (a row
              -- updated then deleted still nets to its old row)
              SELECT 'DELETE', p FROM base WHERE k % 97 = 0
              UNION ALL
              SELECT 'UPDATE_BEFORE', p FROM base
              WHERE k % 100 = 0 AND k % 97 <> 0
              UNION ALL
              SELECT 'UPDATE_AFTER', p * 2 FROM base
              WHERE k % 100 = 0 AND k % 97 <> 0
            )
            SELECT ct AS _change_type,
                   count(*) AS n_rows,
                   round(CAST(sum(CAST(p AS DECIMAL(18,4))) AS DOUBLE),
                         2) AS sum_price
            FROM changes
            GROUP BY ct
            ORDER BY ct
        """,
        "type_promotion_scan": """
            SELECT o_orderstatus,
                   count(*) AS n_orders,
                   CAST(max(o_custkey) AS BIGINT) AS max_cust,
                   CAST(min(o_custkey) AS BIGINT) AS min_cust
            FROM orders
            WHERE o_orderkey <= 8000
            GROUP BY o_orderstatus
            ORDER BY o_orderstatus
        """,
        "scd2_temporal_enrich": """
            WITH ordered AS (
              SELECT user_id, event_type, ts, event_id,
                     CASE WHEN lag(event_type) OVER w IS NULL
                          OR lag(event_type) OVER w <> event_type
                          THEN 1 ELSE 0 END AS chg
              FROM events WHERE event_type <> 'purchase'
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), runs AS (
              SELECT *, SUM(chg) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS run
              FROM ordered
            ), versions AS (
              SELECT user_id, run, min(ts) AS valid_from,
                     min(event_type) AS status_at_time
              FROM runs GROUP BY user_id, run
            ), hist AS (
              SELECT user_id, status_at_time, valid_from,
                     lead(valid_from) OVER (
                       PARTITION BY user_id ORDER BY valid_from
                     ) AS valid_to
              FROM versions
            )
            SELECT h.status_at_time,
                   count(*) AS n_purchases,
                   count(DISTINCT p.user_id) AS n_users
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            JOIN hist h
              ON p.user_id = h.user_id
             AND p.ts >= h.valid_from
             AND (h.valid_to IS NULL OR p.ts < h.valid_to)
            GROUP BY h.status_at_time
            ORDER BY h.status_at_time
        """,
        "ann_recall_at_k": _ann_recall_oracle(),
        "skew_salted_agg": """
            SELECT l_returnflag,
                   count(*) AS n_items,
                   round(max(l_extendedprice), 2) AS max_price,
                   round(min(l_quantity), 2) AS min_qty
            FROM lineitem GROUP BY l_returnflag
        """,
        "text_repetition_scores": f"""
            WITH corpus AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0 THEN text || ' ' || text
                          ELSE text END AS text
              FROM documents
            ),
            nw AS (
              SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w
              FROM corpus
            ),
            g AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(w)),
                            i -> w[i] || ' ' || w[i + 1])) AS gram
              FROM nw WHERE len(w) >= 2
            ),
            pg AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
            pd AS (
              SELECT doc_id,
                     CAST(sum(cnt) AS BIGINT) AS n_grams,
                     CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END)
                          AS BIGINT) AS dup_occ,
                     max(cnt) AS top_cnt
              FROM pg GROUP BY 1
            )
            SELECT d.doc_id,
                   coalesce(n_grams, 0) AS n_grams,
                   round(coalesce(CAST(dup_occ AS DOUBLE) / n_grams, 0.0), 4)
                     AS dup_gram_frac,
                   round(coalesce(CAST(top_cnt AS DOUBLE) / n_grams, 0.0), 4)
                     AS top_gram_frac
            FROM (SELECT DISTINCT doc_id FROM corpus) d
            LEFT JOIN pd USING (doc_id)
        """,
        "text_leakage_safe_split": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 200000 AS doc_id,
                     '  ' || upper(text) || '   ' AS text
              FROM documents WHERE doc_id < 40
            ),
            s AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5({_NORM.format(t='text')}), 1, 15))::BIGINT
                          % 100 AS INTEGER) AS bucket
              FROM corpus
            ),
            sp AS (
              SELECT doc_id, bucket,
                     CASE WHEN bucket < 10 THEN 'val' ELSE 'train' END AS split
              FROM s
            ),
            pairs AS (
              SELECT doc_id - 200000 AS doc_id, split AS copy_split
              FROM sp WHERE doc_id >= 200000
            )
            SELECT sp.doc_id, sp.bucket, sp.split,
                   CAST(coalesce(sp.split = p.copy_split, TRUE) AS INTEGER)
                     AS copy_same_side
            FROM sp LEFT JOIN pairs p USING (doc_id)
        """,
        # Sketch family: the Spark side computes the exact figure AND
        # an in-query proof that the engine-specific estimate landed
        # inside its error bound; the oracle claims the proof holds
        # (flag = 1). The estimate itself is never hashed, so the two
        # engines' different sketch implementations cannot cause a
        # spurious mismatch — but a broken sketch or a wrong exact
        # aggregate still turns the row red.
        "sketch_hll_distinct": """
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
                   CAST(1 AS INTEGER) AS within_bounds
            FROM events GROUP BY event_type
        """,
        "sketch_hll_rollup_merge": """
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
                   CAST(1 AS INTEGER) AS within_bounds
            FROM events GROUP BY event_type
        """,
        "sketch_quantiles": """
            SELECT event_type,
                   count(*) AS n_rows,
                   CAST(1 AS INTEGER) AS p50_ok,
                   CAST(1 AS INTEGER) AS p95_ok,
                   CAST(1 AS INTEGER) AS p99_ok
            FROM events GROUP BY event_type
        """,
        "sketch_theta_set_ops": """
            SELECT 'click' AS seg_a, 'purchase' AS seg_b,
                   CAST(count(*) AS BIGINT) AS exact_union,
                   CAST(sum(in_a * in_b) AS BIGINT) AS exact_intersection,
                   CAST(sum(in_a * (1 - in_b)) AS BIGINT) AS exact_difference,
                   CAST(1 AS INTEGER) AS union_ok,
                   CAST(1 AS INTEGER) AS intersection_ok,
                   CAST(1 AS INTEGER) AS difference_ok
            FROM (
                SELECT user_id,
                       max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
                       max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
                FROM events
                WHERE event_type IN ('click', 'purchase')
                GROUP BY user_id
            )
        """,
        "sketch_kll_rollup_quantiles": """
            SELECT event_type,
                   count(*) AS n_rows,
                   CAST(1 AS INTEGER) AS p50_ok,
                   CAST(1 AS INTEGER) AS p95_ok,
                   CAST(1 AS INTEGER) AS p99_ok
            FROM events GROUP BY event_type
        """,
        "medallion_gold_mart": """
            SELECT event_type,
                   count(*) AS n_events,
                   round(CAST(sum(CAST(CASE WHEN event_id = 0 THEN 999.99
                                            ELSE value END
                                       AS DECIMAL(18,4))) AS DOUBLE), 4)
                     AS total_value
            FROM events GROUP BY event_type
        """,
        "sql_dispatch_pipeline": """
            WITH base AS (
              SELECT event_id, event_type, value FROM events
              WHERE event_id < 3000
            ),
            merged AS (
              SELECT event_id, event_type,
                     CASE WHEN event_id < 1000 THEN value * 2
                          ELSE value END AS value
              FROM base
            ),
            kept AS (
              SELECT * FROM merged
              WHERE event_type != 'error' OR event_type IS NULL
            )
            SELECT event_id, event_type,
                   CASE WHEN event_type = 'signup' THEN value + 1
                        ELSE value END AS value
            FROM kept
        """,
        # blocking on the Spark side is lossless, so the oracle is
        # the plain all-distinct-pairs form
        "string_distance_pairs": """
            WITH names AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
            FROM names a JOIN names b ON a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= 3
        """,
        "text_langid": f"""
            WITH scored AS (
              SELECT doc_id,
                CAST(len(list_filter(w, x -> list_contains(
                  ['the','a','of','and','to','in','is'], x))) AS INTEGER) AS score_en,
                CAST(len(list_filter(w, x -> list_contains(
                  ['der','die','und','das','ist','nicht'], x))) AS INTEGER) AS score_de,
                CAST(len(list_filter(w, x -> list_contains(
                  ['el','los','y','que','es','una'], x))) AS INTEGER) AS score_es,
                CAST(len(list_filter(w, x -> list_contains(
                  ['le','les','et','des','est','une'], x))) AS INTEGER) AS score_fr
              FROM (SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w
                    FROM documents)
            )
            SELECT doc_id, score_en, score_de, score_es, score_fr,
                   CASE WHEN greatest(score_en, score_de, score_es, score_fr) <= 0 THEN 'und'
                        WHEN score_en = greatest(score_en, score_de, score_es, score_fr) THEN 'en'
                        WHEN score_de = greatest(score_en, score_de, score_es, score_fr) THEN 'de'
                        WHEN score_es = greatest(score_en, score_de, score_es, score_fr) THEN 'es'
                        ELSE 'fr' END AS predicted_lang
            FROM scored
        """,
        "text_quality": f"""
            WITH feat AS (
              SELECT doc_id,
                     CAST(length(text) AS INTEGER) AS n_chars,
                     CAST(len(w) AS INTEGER) AS n_words,
                     length(replace({_NORM.format(t='text')}, ' ', '')) AS nospace_chars,
                     length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha_chars,
                     len(list_filter(w, x -> list_contains(
                       ['the','a','an','of','and','to','in','is','it','for'], x))) AS stop_cnt
              FROM (SELECT doc_id, text,
                           string_split({_NORM.format(t='text')}, ' ') AS w
                    FROM documents)
            )
            SELECT doc_id, n_chars, n_words,
                   round(nospace_chars / n_words, 4) AS avg_word_len,
                   round(alpha_chars / n_chars, 4) AS alpha_ratio,
                   round(stop_cnt / n_words, 4) AS stop_ratio,
                   round(least(1.0, n_words / 120.0) * 0.5
                         + stop_cnt / n_words * 0.3
                         + alpha_chars / n_chars * 0.2, 4) AS quality_score
            FROM feat
        """,
        "text_quality_percentile_cut": f"""
            WITH scored AS (
              SELECT doc_id,
                     round(least(1.0, len(w) / 120.0) * 0.5
                           + len(list_filter(w, x -> list_contains(
                               ['the','a','an','of','and','to','in','is','it','for'], x)))
                             / len(w) * 0.3
                           + length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                             / length(text) * 0.2, 4) AS quality_score
              FROM (SELECT doc_id, text,
                           string_split({_NORM.format(t='text')}, ' ') AS w
                    FROM documents)
            ),
            t AS (SELECT quantile_cont(quality_score, 0.25) AS q25 FROM scored)
            SELECT doc_id, quality_score, q25
            FROM scored, t
            WHERE quality_score >= q25
        """,
        "text_token_counts": r"""
            SELECT doc_id,
                   CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS ws_tokens,
                   CAST(len(regexp_extract_all(lower(text),
                        '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS re_tokens
            FROM documents
        """,
        "text_fingerprint": f"""
            SELECT doc_id,
                   md5({_NORM.format(t='text')}) AS fp_md5,
                   list_reduce(
                     list_prepend(CAST(7 AS BIGINT),
                       list_transform(string_split({_NORM.format(t='text')}, ' '),
                                      t -> {_TOKEN_ID.format(t='t')})),
                     (acc, x) -> (acc * 31 + x) % 144115188075855872) AS fp_rolling
            FROM documents
        """,
        "multimodal_meta": """
            SELECT doc_id, 'text/plain' AS media_type,
                   CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
                   sha256(text) AS sha256
            FROM documents
        """,
        "multimodal_frames": """
            WITH media AS (
              SELECT doc_id, octet_length(encode(text)) AS byte_len FROM documents
            ),
            n AS (
              SELECT doc_id, byte_len,
                     least(8, byte_len // 200 + 1) AS n_frames
              FROM media
            )
            SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
                   CAST(i * 1000 AS BIGINT) AS frame_ts_ms,
                   CAST(i * byte_len // n_frames AS BIGINT) AS byte_offset
            FROM (SELECT doc_id, byte_len, n_frames,
                         unnest(range(n_frames)) AS i
                  FROM n)
        """,
        "multimodal_resize": """
            WITH media AS (
              SELECT doc_id, octet_length(encode(text)) AS len FROM documents
            ),
            dims AS (
              SELECT doc_id, len % 640 + 1 AS w, len % 480 + 1 AS h FROM media
            )
            SELECT doc_id,
                   CAST(w AS INTEGER) AS src_width,
                   CAST(h AS INTEGER) AS src_height,
                   CAST(CASE WHEN greatest(w, h) > 256
                             THEN w * 256 // greatest(w, h) ELSE w END
                        AS INTEGER) AS dst_width,
                   CAST(CASE WHEN greatest(w, h) > 256
                             THEN h * 256 // greatest(w, h) ELSE h END
                        AS INTEGER) AS dst_height
            FROM dims
        """,
        "multimodal_embed_dims": """
            WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents)
            SELECT doc_id,
                   ('0x' || substr(hx, 1, 4))::BIGINT / 65535.0 AS d0,
                   ('0x' || substr(hx, 5, 4))::BIGINT / 65535.0 AS d1,
                   ('0x' || substr(hx, 9, 4))::BIGINT / 65535.0 AS d2,
                   ('0x' || substr(hx, 13, 4))::BIGINT / 65535.0 AS d3,
                   ('0x' || substr(hx, 17, 4))::BIGINT / 65535.0 AS d4,
                   ('0x' || substr(hx, 21, 4))::BIGINT / 65535.0 AS d5,
                   ('0x' || substr(hx, 25, 4))::BIGINT / 65535.0 AS d6,
                   ('0x' || substr(hx, 29, 4))::BIGINT / 65535.0 AS d7
            FROM h
        """,
        # REAL decode check: the Spark side parses synthesized
        # PPM/BMP/PGM container bytes; the oracle recomputes the
        # generator's geometry and pixel-byte arithmetic — any header
        # misparse, BMP row-padding slip, or channel-layout error
        # breaks the hash
        "multimodal_decode_image": """
            WITH dims AS (
              SELECT doc_id,
                     doc_id % 8 + 2 AS w,
                     doc_id % 6 + 2 AS h,
                     CASE WHEN doc_id % 3 = 2
                          THEN (doc_id % 8 + 2) * (doc_id % 6 + 2)
                          ELSE 3 * (doc_id % 8 + 2) * (doc_id % 6 + 2)
                     END AS n
              FROM documents
            ),
            px AS (SELECT doc_id, unnest(range(n)) AS i FROM dims),
            sums AS (
              SELECT doc_id,
                     CAST(sum((7 * i + doc_id) % 256) AS BIGINT) AS pixel_sum
              FROM px GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CASE d.doc_id % 3 WHEN 0 THEN 'ppm'
                                     WHEN 1 THEN 'bmp'
                                     ELSE 'pgm' END AS img_format,
                   CAST(d.w AS INTEGER) AS width,
                   CAST(d.h AS INTEGER) AS height,
                   CAST(CASE WHEN d.doc_id % 3 = 2 THEN 1 ELSE 3 END
                        AS INTEGER) AS channels,
                   s.pixel_sum
            FROM dims d JOIN sums s USING (doc_id)
        """,
        # IVF-PQ composed oracle: the ann_ivf_topk coarse-quantizer
        # CTEs (seeds/assign/Lloyd/lists/probes) + the ann_pq_topk
        # codebook/codes/LUT CTEs, with ADC scoring restricted to the
        # probed inverted lists and exact rerank of the shortlist.
        "ann_ivfpq_topk": _ann_ivfpq_oracle(),
        "ann_ivfpq_residual_topk": _ann_ivfpq_oracle(residual=True),
        "ann_ivfsq_topk": _ann_ivfsq_oracle(),
        "curation_ccnet_buckets": _ccnet_buckets_oracle(),
        "decontaminate_semantic": _semantic_decontam_oracle(),
        # audio frames: closed-form replay of the synth WAV formula
        # (samples ((31i+d)%4001)-2000, 16-sample frames); RMS is
        # floor(sqrt*1e6+0.5) in BOTH engines — no language round
        "multimodal_audio_features": """
            WITH dims AS (
              SELECT doc_id, doc_id % 50 + 10 AS cnt FROM documents
            ),
            s AS (SELECT doc_id, unnest(range(cnt)) AS i FROM dims),
            sv AS (
              SELECT doc_id, i, i // 16 AS frame_id,
                     ((31 * i + doc_id) % 4001) - 2000 AS v
              FROM s
            )
            SELECT doc_id, CAST(frame_id AS INTEGER) AS frame_id,
                   CAST(count(*) AS INTEGER) AS n_samples,
                   CAST(sum(v * v) AS BIGINT) AS sum_sq,
                   CAST(max(abs(v)) AS INTEGER) AS peak,
                   CAST(sum(CASE WHEN i % 16 > 0 AND (
                         (((31 * (i - 1) + doc_id) % 4001) - 2000 < 0
                          AND v > 0)
                      OR (((31 * (i - 1) + doc_id) % 4001) - 2000 > 0
                          AND v < 0))
                      THEN 1 ELSE 0 END) AS INTEGER) AS zero_crossings,
                   CAST(floor(sqrt(CAST(sum(v * v) AS DOUBLE)
                                   / count(*)) * 1000000.0 + 0.5)
                        AS BIGINT) AS rms_micro
            FROM sv GROUP BY doc_id, frame_id
        """,
        # video motion: frame f vs f-1 byte diffs from the synth AVI
        # pixel formula (11i+13f+d)%256 — integer-exact end to end
        # epoch shuffle: two epochs' permutation keys; map-only in
        # Spark, the oracle is the same md5 over a VALUES expansion
        "sample_epoch_shuffle": """
            SELECT doc_id, CAST(e AS INTEGER) AS epoch,
                   md5(CAST(e AS VARCHAR) || '|'
                       || CAST(doc_id AS VARCHAR)) AS shuffle_key
            FROM documents, (VALUES (0), (1)) AS t(e)
        """,
        "tokenizer_unigram_vocab": _unigram_oracle(),
        "tokenizer_unigram_encode": _unigram_oracle(segment=True),
        "tokenizer_wordpiece_vocab": _wordpiece_oracle(6),
        "tokenizer_wordpiece_encode": _wordpiece_encode_oracle(6),
        "multimodal_video_motion": """
            WITH dims AS (
              SELECT doc_id, doc_id % 6 + 2 AS w, doc_id % 4 + 2 AS h,
                     doc_id % 5 + 1 AS nf
              FROM documents
            ),
            pairs AS (
              SELECT doc_id, w, h, unnest(range(1, nf)) AS f FROM dims
            ),
            px AS (
              SELECT doc_id, f, unnest(range(3 * w * h)) AS i
              FROM pairs
            ),
            d AS (
              SELECT doc_id, f,
                     abs(((11 * i + 13 * f + doc_id) % 256)
                         - ((11 * i + 13 * (f - 1) + doc_id) % 256))
                       AS dv
              FROM px
            )
            SELECT doc_id, CAST(f AS INTEGER) AS frame_id,
                   CAST(count(*) AS BIGINT) AS n_px,
                   CAST(sum(dv) AS BIGINT) AS motion_sum,
                   CAST(max(dv) AS INTEGER) AS motion_max
            FROM d GROUP BY doc_id, f
        """,
        # positional phrase retrieval: aligned (doc, pos-i) joins
        "text_phrase_retrieval": f"""
            WITH toked AS (
              SELECT doc_id,
                     string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents
            ), postings AS (
              SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i + 1] AS term
              FROM (SELECT doc_id, w, unnest(range(len(w))) AS i
                    FROM toked)
            ),
            p0 AS (SELECT doc_id, pos AS start FROM postings
                   WHERE term = 'table'),
            p1 AS (SELECT doc_id, pos - 1 AS start FROM postings
                   WHERE term = 'scan'),
            p2 AS (SELECT doc_id, pos - 2 AS start FROM postings
                   WHERE term = 'merge')
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_hits,
                   CAST(min(start) AS BIGINT) AS first_pos
            FROM p0 JOIN p1 USING (doc_id, start)
                    JOIN p2 USING (doc_id, start)
            GROUP BY doc_id ORDER BY doc_id
        """,
        # interpolated Kneser-Ney bigram LM: discounted bigram term +
        # continuation-probability backoff, identical operand order
        "text_kn_lm_score": f"""
            WITH norm AS (
              SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents
            ),
            bg AS (
              SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
              FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                    FROM norm)
            ),
            big AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
            hist AS (
              SELECT w1, sum(cb) AS hn, count(*) AS n1f
              FROM big GROUP BY w1
            ),
            cont AS (SELECT w2, count(*) AS n1b FROM big GROUP BY w2),
            ty AS (SELECT count(*) AS n1all FROM big),
            sc AS (
              SELECT bg.doc_id,
                     CAST(round(-ln(
                         greatest(CAST(cb AS DOUBLE) - 0.75, 0.0)
                           / CAST(hn AS DOUBLE)
                         + 0.75 * CAST(n1f AS DOUBLE)
                           / CAST(hn AS DOUBLE)
                           * (CAST(n1b AS DOUBLE)
                              / CAST(n1all AS DOUBLE))
                       ) * 1000000.0) AS BIGINT) AS s_micro
              FROM bg JOIN big USING (w1, w2) JOIN hist USING (w1)
              JOIN cont USING (w2) CROSS JOIN ty
            ),
            per AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                     round(CAST(sum(s_micro) AS DOUBLE)
                           / (count(*) * 1000000.0), 6)
                       AS avg_kn_surprisal
              FROM sc GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(p.n_bigrams, 0) AS n_bigrams,
                   p.avg_kn_surprisal
            FROM documents d LEFT JOIN per p USING (doc_id)
        """,
        "text_ngram_lm_score": f"""
            WITH norm AS (
              SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents
            ),
            toks AS (SELECT doc_id, unnest(w) AS w1 FROM norm),
            uni AS (SELECT w1, count(*) AS cu FROM toks GROUP BY w1),
            v AS (SELECT count(*) AS V FROM uni),
            bg AS (
              SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
              FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                    FROM norm)
            ),
            big AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
            sc AS (
              SELECT bg.doc_id,
                     CAST(round(-ln(CAST(cb + 1 AS DOUBLE)
                                  / CAST(cu + V AS DOUBLE))
                                * 1000000.0) AS BIGINT) AS s_micro
              FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1)
              CROSS JOIN v
            ),
            per AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                     round(CAST(sum(s_micro) AS DOUBLE)
                           / (count(*) * 1000000.0), 6) AS avg_surprisal
              FROM sc GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(p.n_bigrams, 0) AS n_bigrams,
                   p.avg_surprisal
            FROM documents d LEFT JOIN per p USING (doc_id)
        """,
        "text_cdc_chunks": f"""
            WITH docw AS (
              SELECT doc_id, CAST(i AS INTEGER) AS pos, ws[i + 1] AS w
              FROM (
                SELECT doc_id, ws, unnest(range(len(ws))) AS i
                FROM (SELECT doc_id,
                             string_split({_NORM.format(t='text')}, ' ')
                               AS ws
                      FROM documents))
              WHERE ws[i + 1] <> ''
            ),
            flagged AS (
              SELECT doc_id, pos, w,
                     CASE WHEN ('0x' || substr(md5(w), 1, 15))::BIGINT
                               % 2147483647 % 8 = 0
                          THEN 1 ELSE 0 END AS b
              FROM docw
            ),
            chunked AS (
              SELECT doc_id, pos, w,
                     COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS chunk_id
              FROM flagged
            )
            SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
                   CAST(count(*) AS BIGINT) AS n_words,
                   md5(string_agg(w, ' ' ORDER BY pos)) AS chunk_fp
            FROM chunked GROUP BY doc_id, chunk_id
        """,
        "dedup_cdc_chunk_pairs": f"""
            WITH docw AS (
              SELECT doc_id, CAST(i AS INTEGER) AS pos, ws[i + 1] AS w
              FROM (
                SELECT doc_id, ws, unnest(range(len(ws))) AS i
                FROM (SELECT doc_id,
                             string_split({_NORM.format(t='text')}, ' ')
                               AS ws
                      FROM documents))
              WHERE ws[i + 1] <> ''
            ),
            flagged AS (
              SELECT doc_id, pos, w,
                     CASE WHEN ('0x' || substr(md5(w), 1, 15))::BIGINT
                               % 2147483647 % 8 = 0
                          THEN 1 ELSE 0 END AS b
              FROM docw
            ),
            chunked AS (
              SELECT doc_id, pos, w,
                     COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS chunk_id
              FROM flagged
            ),
            chunks AS (
              SELECT DISTINCT doc_id, chunk_fp FROM (
                SELECT doc_id, chunk_id,
                       md5(string_agg(w, ' ' ORDER BY pos)) AS chunk_fp
                FROM chunked GROUP BY doc_id, chunk_id)
            ),
            live AS (
              SELECT c.doc_id, c.chunk_fp
              FROM chunks c
              JOIN (SELECT chunk_fp FROM chunks GROUP BY chunk_fp
                    HAVING count(*) <= 32) f USING (chunk_fp)
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS shared_chunks
            FROM live a JOIN live b
              ON a.chunk_fp = b.chunk_fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING count(*) >= 2
        """,
        "curation_nb_classifier": f"""
            WITH occ AS (
              SELECT doc_id, w FROM (
                SELECT doc_id,
                       unnest(string_split({_NORM.format(t='text')}, ' '))
                         AS w
                FROM documents)
              WHERE w <> ''
            ),
            docs AS (SELECT doc_id, lang AS label FROM documents),
            tagged AS (
              SELECT o.doc_id, o.w, d.label
              FROM occ o JOIN docs d USING (doc_id)
            ),
            wcnt AS (
              SELECT w, label, CAST(count(*) AS BIGINT) AS cwl
              FROM tagged GROUP BY 1, 2
            ),
            tltab AS (
              SELECT label, CAST(count(*) AS BIGINT) AS tl
              FROM tagged GROUP BY 1
            ),
            voc AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS V FROM occ),
            tdoc AS (SELECT CAST(count(*) AS BIGINT) AS td FROM docs),
            classes AS (
              SELECT d.label AS cls, COALESCE(t.tl, 0) AS tl,
                     CAST(round(ln(CAST(d.nd AS DOUBLE)
                                   / CAST(tdoc.td AS DOUBLE))
                                * 1000000.0) AS BIGINT) AS prior_micro
              FROM (SELECT label, count(*) AS nd FROM docs GROUP BY 1) d
              LEFT JOIN tltab t USING (label)
              CROSS JOIN tdoc
            ),
            sw AS (
              SELECT o.doc_id, c.cls,
                     CAST(round(ln(CAST(COALESCE(wcnt.cwl, 0) + 1 AS DOUBLE)
                                   / CAST(c.tl + v.V AS DOUBLE))
                                * 1000000.0) AS BIGINT) AS s_micro
              FROM occ o CROSS JOIN classes c CROSS JOIN voc v
              LEFT JOIN wcnt ON wcnt.w = o.w AND wcnt.label = c.cls
            ),
            pdc AS (
              SELECT doc_id, cls, CAST(sum(s_micro) AS BIGINT) AS wsum
              FROM sw GROUP BY 1, 2
            ),
            fullsc AS (
              SELECT d.doc_id, d.label, c.cls,
                     c.prior_micro + COALESCE(p.wsum, 0) AS score
              FROM docs d CROSS JOIN classes c
              LEFT JOIN pdc p ON p.doc_id = d.doc_id AND p.cls = c.cls
            )
            SELECT doc_id, label AS lang, cls AS pred_lang,
                   CAST(label = cls AS INTEGER) AS correct
            FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, cls) AS rn FROM fullsc)
            WHERE rn = 1
        """,
        "sample_doremi_mixture": f"""
            WITH norm AS (
              SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents
            ),
            toks AS (SELECT doc_id, unnest(w) AS w1 FROM norm),
            uni AS (SELECT w1, count(*) AS cu FROM toks GROUP BY w1),
            v AS (SELECT count(*) AS V FROM uni),
            bg AS (
              SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
              FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                    FROM norm)
            ),
            big AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
            sc AS (
              SELECT bg.doc_id,
                     CAST(round(-ln(CAST(cb + 1 AS DOUBLE)
                                  / CAST(cu + V AS DOUBLE))
                                * 1000000.0) AS BIGINT) AS s_micro
              FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1)
              CROSS JOIN v
            ),
            sbg AS (
              SELECT d.source,
                     CAST(count(*) AS BIGINT) AS n_bigrams,
                     CAST(sum(sc.s_micro) AS BIGINT) AS sum_s_micro
              FROM sc JOIN documents d USING (doc_id)
              GROUP BY d.source
            ),
            srcs AS (
              SELECT s.source, s.n_docs,
                     COALESCE(b.n_bigrams, 0) AS n_bigrams,
                     COALESCE(b.sum_s_micro, 0) AS sum_s_micro
              FROM (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
                    FROM documents GROUP BY source) s
              LEFT JOIN sbg b USING (source)
            ),
            tot AS (
              SELECT CAST(sum(n_docs) AS BIGINT) AS td,
                     CAST(sum(n_bigrams) AS BIGINT) AS tb,
                     CAST(sum(sum_s_micro) AS BIGINT) AS ts
              FROM srcs
            ),
            calc AS (
              SELECT source, n_docs, n_bigrams, sum_s_micro,
                     CASE WHEN n_bigrams > 0 THEN greatest(
                       0.0,
                       CAST(sum_s_micro AS DOUBLE)
                         / (CAST(n_bigrams AS DOUBLE) * 1000000.0)
                       - CAST(ts AS DOUBLE)
                         / (CAST(tb AS DOUBLE) * 1000000.0))
                     ELSE 0.0 END AS excess_d,
                     CAST(n_docs AS DOUBLE) / CAST(td AS DOUBLE) AS share
              FROM srcs CROSS JOIN tot
            ),
            wr AS (
              SELECT source, n_docs, n_bigrams, sum_s_micro, excess_d,
                     CAST(round(share * exp(1.0 * excess_d)
                                * 1000000000.0) AS BIGINT) AS wr_nano
              FROM calc
            ),
            wt AS (SELECT CAST(sum(wr_nano) AS BIGINT) AS w_tot FROM wr)
            SELECT source, n_docs, n_bigrams, sum_s_micro,
                   round(excess_d, 6) AS excess,
                   round(CAST(wr_nano AS DOUBLE)
                         / CAST(w_tot AS DOUBLE), 6) AS weight
            FROM wr CROSS JOIN wt
        """,
        "sample_weighted_by_source": """
            WITH t AS (
              SELECT doc_id, source, n_chars,
                     CAST(round(
                       ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 15))::BIGINT + 1)
                          / 1152921504606846976.0)
                       / n_chars * 1000000.0) AS BIGINT) AS km
              FROM documents
              WHERE n_chars IS NOT NULL AND n_chars > 0
            )
            SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
            FROM (
              SELECT doc_id, source, n_chars,
                     row_number() OVER (PARTITION BY source
                       ORDER BY km DESC, doc_id) AS rn
              FROM t)
            WHERE rn <= 5
        """,
        "text_bm25_topk": _bm25_scored_sql() + """
            SELECT doc_id, bm25, n_matched_terms
            FROM scored
            ORDER BY bm25 DESC, doc_id ASC
            LIMIT 15
        """,
        "hybrid_bm25_ann_topk": _hybrid_oracle(),
        # r10: ANN neighbors minus lexical positives (hard negatives)
        "retrieval_hard_negatives": _hard_negatives_oracle(),
        "multimodal_resize_pixels": """
            WITH dims AS (
              SELECT doc_id,
                     doc_id % 8 + 2 AS w,
                     doc_id % 6 + 2 AS h,
                     CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 3 END AS ch
              FROM documents
            ),
            geo AS (
              SELECT doc_id, w, h, ch,
                     greatest(1, w // 2) AS dw,
                     greatest(1, h // 2) AS dh
              FROM dims
            ),
            cells AS (
              SELECT g.doc_id, g.w, g.h, g.ch, g.dw, g.dh,
                     y.range AS y, x.range AS x, c.range AS c
              FROM geo g
              CROSS JOIN range(0, 6) y
              CROSS JOIN range(0, 4) x
              CROSS JOIN range(0, 3) c
              WHERE y.range < g.dh AND x.range < g.dw AND c.range < g.ch
            ),
            sums AS (
              SELECT doc_id,
                     CAST(sum(
                       (7 * ((((y * h) // dh) * w + ((x * w) // dw)) * ch
                             + c) + doc_id) % 256
                     ) AS BIGINT) AS pixel_sum
              FROM cells GROUP BY doc_id
            )
            SELECT g.doc_id,
                   CASE g.doc_id % 3 WHEN 0 THEN 'ppm'
                                     WHEN 1 THEN 'bmp'
                                     ELSE 'pgm' END AS img_format,
                   CAST(g.w AS INTEGER) AS src_w,
                   CAST(g.h AS INTEGER) AS src_h,
                   CAST(g.dw AS INTEGER) AS dst_w,
                   CAST(g.dh AS INTEGER) AS dst_h,
                   s.pixel_sum
            FROM geo g JOIN sums s USING (doc_id)
        """,
        # JPEG fixture: every 8x8 block constant -> DC-only DCT,
        # exactly carried by the all-ones quant table, so the oracle
        # replays the full codec chain closed-form. Float constants
        # promote to DOUBLE (products with int columns), matching the
        # Python encoder/decoder's left-associated expressions and
        # floor(x+0.5) rounding term for term.
        "multimodal_decode_jpeg": """
            WITH dims AS (
              SELECT doc_id,
                     8 * (doc_id % 3 + 1) AS w,
                     8 * (doc_id % 2 + 1) AS h,
                     CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 3 END AS ch,
                     (doc_id % 3 + 1) * (doc_id % 2 + 1) AS nb
              FROM documents
            ),
            blocks AS (
              SELECT doc_id, ch, unnest(range(nb)) AS b FROM dims
            ),
            vals AS (
              SELECT doc_id, ch, b,
                     (7 * doc_id + 13 * b) % 256 AS r,
                     (11 * doc_id + 17 * b) % 256 AS g,
                     (5 * doc_id + 19 * b) % 256 AS bl
              FROM blocks
            ),
            ycc AS (
              SELECT doc_id, ch, r,
                     least(255, greatest(0, CAST(floor(
                       CAST(0.299 AS DOUBLE) * r + CAST(0.587 AS DOUBLE) * g
                       + CAST(0.114 AS DOUBLE) * bl + 0.5) AS BIGINT))) AS y,
                     least(255, greatest(0, CAST(floor(
                       CAST(128 AS DOUBLE) - CAST(0.168736 AS DOUBLE) * r
                       - CAST(0.331264 AS DOUBLE) * g
                       + CAST(0.5 AS DOUBLE) * bl + 0.5) AS BIGINT))) AS cb,
                     least(255, greatest(0, CAST(floor(
                       CAST(128 AS DOUBLE) + CAST(0.5 AS DOUBLE) * r
                       - CAST(0.418688 AS DOUBLE) * g
                       - CAST(0.081312 AS DOUBLE) * bl + 0.5) AS BIGINT))) AS cr
              FROM vals
            ),
            rec AS (
              SELECT doc_id, ch,
                     CASE WHEN ch = 1 THEN r
                          ELSE
                       least(255, greatest(0, CAST(floor(
                         y + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5)
                         AS BIGINT)))
                     + least(255, greatest(0, CAST(floor(
                         y - CAST(0.344136 AS DOUBLE) * (cb - 128)
                           - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5)
                         AS BIGINT)))
                     + least(255, greatest(0, CAST(floor(
                         y + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5)
                         AS BIGINT)))
                     END AS pxv
              FROM ycc
            ),
            sums AS (
              SELECT doc_id, CAST(64 * sum(pxv) AS BIGINT) AS pixel_sum
              FROM rec GROUP BY doc_id
            )
            SELECT d.doc_id,
                   'jpeg' AS img_format,
                   CAST(d.w AS INTEGER) AS width,
                   CAST(d.h AS INTEGER) AS height,
                   CAST(d.ch AS INTEGER) AS channels,
                   s.pixel_sum
            FROM dims d JOIN sums s USING (doc_id)
        """,
        # G.711 mu-law: the oracle replays the CCITT integer
        # expansion (bias 132, 3-bit segment shift) per synthesized
        # byte (7i+d)%256
        "multimodal_decode_mulaw": """
            WITH dims AS (
              SELECT doc_id, doc_id % 60 + 20 AS n FROM documents
            ),
            b AS (
              SELECT doc_id,
                     255 - ((7 * unnest(range(n)) + doc_id) % 256) AS u
              FROM dims
            ),
            v AS (
              SELECT doc_id,
                     ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) AS t,
                     u
              FROM b
            ),
            s AS (
              SELECT doc_id,
                     CASE WHEN u >= 128 THEN 132 - t ELSE t - 132 END
                       AS val
              FROM v
            )
            SELECT d.doc_id,
                   CAST(8000 AS INTEGER) AS sample_rate,
                   CAST(1 AS INTEGER) AS channels,
                   CAST(8 AS INTEGER) AS bits,
                   CAST(d.n AS BIGINT) AS n_samples,
                   CAST(sum(abs(s.val)) AS BIGINT) AS abs_sum
            FROM dims d JOIN s USING (doc_id)
            GROUP BY d.doc_id, d.n
        """,
        # GIF: the oracle replays the generator's quadratic index
        # stride -> palette -> RGB sample sum; the REAL LZW round
        # trip happens entirely inside the Spark query
        # r10 Markov transitions: the same deterministic (ts,
        # event_id) total order as the funnel/attribution queries
        "events_markov_transitions": """
            WITH seq AS (
              SELECT event_type,
                     lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS prev_type
              FROM events
            ),
            t AS (
              SELECT prev_type, event_type,
                     CAST(count(*) AS BIGINT) AS n_transitions
              FROM seq WHERE prev_type IS NOT NULL
              GROUP BY 1, 2
            )
            SELECT prev_type, event_type, n_transitions,
                   round(n_transitions / sum(n_transitions)
                         OVER (PARTITION BY prev_type), 4) AS prob4
            FROM t
        """,
        # r10 estimator calibration: per-candidate-pair signature
        # match count vs exact Jaccard, replaying the same seeds/
        # banding CTEs as the LSH-pairs oracle
        "dedup_minhash_estimator_error": f"""
            WITH {_PLANT_TAIL}, {_SHINGLES},
            seeds AS (SELECT * FROM (VALUES {_MINHASH_SEEDS}) s(j, a, b)),
            mh AS (
              SELECT doc_id, j, min((a * sid + b) % 2147483647) AS mh
              FROM sids CROSS JOIN seeds GROUP BY doc_id, j
            ),
            bands AS (
              SELECT doc_id, j // 3 AS band,
                     string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j) AS key
              FROM mh GROUP BY doc_id, j // 3
            ),
            cands AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
            ),
            matches AS (
              SELECT c.doc_a, c.doc_b,
                     CAST(sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_match
              FROM cands c
              JOIN mh ma ON ma.doc_id = c.doc_a
              JOIN mh mb ON mb.doc_id = c.doc_b AND mb.j = ma.j
              GROUP BY 1, 2
            ),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS inter
              FROM cands c
              JOIN sids sa ON sa.doc_id = c.doc_a
              JOIN sids sb ON sb.doc_id = c.doc_b AND sb.sid = sa.sid
              GROUP BY 1, 2
            )
            SELECT m.doc_a, m.doc_b, m.n_match,
                   round(m.n_match / 12.0, 4) AS est4,
                   round(i.inter / (sa.sz + sb.sz - i.inter), 4) AS exact4
            FROM matches m
            JOIN inter i ON i.doc_a = m.doc_a AND i.doc_b = m.doc_b
            JOIN sizes sa ON sa.doc_id = m.doc_a
            JOIN sizes sb ON sb.doc_id = m.doc_b
        """,
        # r10 source drift: integer-exact cross-multiplied TV
        # numerators (DuckDB promotes the bigint sums to HUGEINT);
        # missing-term mass folded closed-form, same as the Spark side
        "text_source_divergence": f"""
            WITH toks AS (
              SELECT source,
                     unnest(string_split({_NORM.format(t='text')}, ' ')) AS tok
              FROM documents
            ),
            tf AS (
              SELECT source, tok, count(*) AS s_cnt
              FROM toks WHERE tok <> '' GROUP BY 1, 2
            ),
            cf AS (SELECT tok, sum(s_cnt) AS c_cnt FROM tf GROUP BY 1),
            ns AS (SELECT source, sum(s_cnt) AS n_s FROM tf GROUP BY 1),
            tot AS (SELECT sum(c_cnt) AS n_all FROM cf),
            per AS (
              SELECT t.source,
                     sum(abs(t.s_cnt * n_all - c.c_cnt * n.n_s))
                       AS present_num,
                     sum(c.c_cnt) AS covered_c,
                     max(n.n_s) AS n_s,
                     max(n_all) AS n_all
              FROM tf t
              JOIN cf c USING (tok)
              JOIN ns n USING (source)
              CROSS JOIN tot
              GROUP BY 1
            )
            SELECT source,
                   CAST(n_s AS BIGINT) AS n_tokens,
                   round(CAST(present_num + n_s * (n_all - covered_c)
                              AS DOUBLE)
                         / (2.0 * CAST(n_s AS DOUBLE)
                            * CAST(n_all AS DOUBLE)), 4) AS tv4
            FROM per
        """,
        # r10 token budget: naive window cumsum replay of the
        # distributed ranked prefix-sum (quality = distinct words,
        # ties by doc_id; greedy whole-doc prefix at 30% of corpus
        # tokens)
        "corpus_token_budget": f"""
            WITH scored AS (
              SELECT doc_id,
                     CAST(len(list_distinct(list_filter(
                       string_split({_NORM.format(t='text')}, ' '),
                       t -> t <> ''))) AS BIGINT) AS n_distinct,
                     CAST(len(list_filter(
                       string_split({_NORM.format(t='text')}, ' '),
                       t -> t <> '')) AS BIGINT) AS n_tokens
              FROM documents
            ),
            cum AS (
              SELECT doc_id, n_tokens,
                     CAST(sum(n_tokens) OVER (
                       ORDER BY n_distinct DESC, doc_id
                     ) AS BIGINT) AS cum_tokens
              FROM scored
            ),
            b AS (
              SELECT CAST(floor(sum(n_tokens) * 0.3) AS BIGINT) AS budget
              FROM scored
            )
            SELECT doc_id, n_tokens, cum_tokens
            FROM cum, b WHERE cum_tokens <= budget
        """,
        # r10 Gram matrix: embedding values quantized to 1e-6 units by
        # TRUNCATION (tie-free, bit-identical across engines — the
        # float32->double widening and *1e6 multiply are exact IEEE
        # ops), integer products summed exactly; only the 2080 output
        # cells see a double division + 4-dp round
        "embedding_gram_matrix": """
            WITH pairs AS (
              SELECT i.i, j.j
              FROM (SELECT unnest(range(64)) AS i) i
              JOIN (SELECT unnest(range(64)) AS j) j ON j.j >= i.i
            ),
            vals AS (
              SELECT p.i, p.j,
                     CAST(trunc(CAST(e.embedding[p.i + 1] AS DOUBLE)
                                * 1000000.0) AS BIGINT)
                     * CAST(trunc(CAST(e.embedding[p.j + 1] AS DOUBLE)
                                  * 1000000.0) AS BIGINT) AS pd
              FROM embeddings e CROSS JOIN pairs p
            )
            SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
                   round(CAST(sum(pd) AS DOUBLE) / 1e12, 4) AS gram4
            FROM vals GROUP BY i, j
        """,
        # r10 WebDataset: every output value flows through the tar
        # container (doc_id + n_bytes parsed from the .json sidecar,
        # txt_bytes from the .txt payload), so the oracle recomputing
        # them straight from documents pins the whole pack/unpack path
        "source_webdataset_roundtrip": """
            SELECT doc_id,
                   doc_id // 64 AS shard_id,
                   CAST(2 AS BIGINT) AS n_members,
                   CAST(octet_length(encode(text)) AS BIGINT) AS txt_bytes,
                   CAST(octet_length(encode(text)) AS BIGINT) AS meta_bytes
            FROM documents
        """,
        # r10 transcode: PNG sample formula replayed closed-form with
        # the x3 gray expansion; geometry/channels from the re-encoded
        # QOI bytes
        "multimodal_transcode_qoi": """
            WITH dims AS (
              SELECT doc_id,
                     doc_id % 8 + 2 AS w,
                     doc_id % 6 + 2 AS h,
                     CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3
                          ELSE 4 END AS ch_in
              FROM documents
            ),
            px AS (
              SELECT doc_id, ch_in,
                     unnest(range(ch_in * w * h)) AS i
              FROM dims
            ),
            sums AS (
              SELECT doc_id,
                     CAST(sum(
                       ((11 * i + 3 * doc_id) % 256)
                       * CASE WHEN ch_in = 1 THEN 3 ELSE 1 END
                     ) AS BIGINT) AS pixel_sum
              FROM px GROUP BY doc_id
            )
            SELECT d.doc_id,
                   'qoi' AS img_format,
                   CAST(d.w AS INTEGER) AS width,
                   CAST(d.h AS INTEGER) AS height,
                   CAST(CASE WHEN d.ch_in = 1 THEN 3 ELSE d.ch_in END
                        AS INTEGER) AS channels,
                   s.pixel_sum
            FROM dims d JOIN sums s USING (doc_id)
        """,
        # r10 QOI: the fixture's pixels are closed-form (multimodal.
        # synth_qois documents the formulas); the oracle replays
        # geometry, channel count, and the per-sample sum — including
        # the stepping alpha on 4-channel docs — without touching the
        # codec, so any op-family decode error mismatches
        "multimodal_decode_qoi": """
            WITH dims AS (
              SELECT doc_id,
                     doc_id % 9 + 2 AS w,
                     doc_id % 5 + 2 AS h,
                     CASE WHEN doc_id % 3 = 0 THEN 4 ELSE 3 END AS ch
              FROM documents
            ),
            px AS (
              SELECT doc_id, ch, unnest(range(w * h)) AS i FROM dims
            ),
            eff AS (
              SELECT doc_id, ch, i, i % 8 AS phi,
                     CASE WHEN (i // 8) % 3 = 2 THEN 0 ELSE i // 8 END AS se
              FROM px
            ),
            offs AS (
              SELECT doc_id, ch, i, se,
                CASE WHEN phi IN (3,4,5) THEN 6 WHEN phi = 6 THEN 3
                     WHEN phi = 7 THEN 1 ELSE 0 END AS ro,
                CASE WHEN phi IN (3,4,5) THEN 5 WHEN phi = 6 THEN 2
                     WHEN phi = 7 THEN 1 ELSE 0 END AS go,
                CASE WHEN phi IN (3,4,5) THEN 3 WHEN phi = 6 THEN 1
                     WHEN phi = 7 THEN 1 ELSE 0 END AS bo
              FROM eff
            ),
            sums AS (
              SELECT doc_id,
                     CAST(sum(
                         (7 * doc_id + 211 * se + ro) % 256
                       + (11 * doc_id + 197 * se + go) % 256
                       + (13 * doc_id + 181 * se + bo) % 256
                       + CASE WHEN ch = 4
                              THEN (5 * doc_id + 23 * (i // 11)) % 256
                              ELSE 0 END
                     ) AS BIGINT) AS pixel_sum
              FROM offs GROUP BY doc_id
            )
            SELECT d.doc_id,
                   'qoi' AS img_format,
                   CAST(d.w AS INTEGER) AS width,
                   CAST(d.h AS INTEGER) AS height,
                   CAST(d.ch AS INTEGER) AS channels,
                   s.pixel_sum
            FROM dims d JOIN sums s USING (doc_id)
        """,
        "multimodal_decode_gif": """
            WITH dims AS (
              SELECT doc_id,
                     doc_id % 11 + 2 AS w,
                     doc_id % 7 + 2 AS h,
                     doc_id % 29 + 2 AS p
              FROM documents
            ),
            px AS (
              SELECT doc_id, p, unnest(range(w * h)) AS i FROM dims
            ),
            sums AS (
              SELECT doc_id,
                     CAST(sum(
                         (5 * ((i * i + doc_id) % p) + 7 * doc_id) % 256
                       + (9 * ((i * i + doc_id) % p) + 11 * doc_id) % 256
                       + (3 * ((i * i + doc_id) % p) + 13 * doc_id) % 256
                     ) AS BIGINT) AS pixel_sum
              FROM px GROUP BY doc_id
            )
            SELECT d.doc_id,
                   'gif' AS img_format,
                   CAST(d.w AS INTEGER) AS width,
                   CAST(d.h AS INTEGER) AS height,
                   CAST(3 AS INTEGER) AS channels,
                   s.pixel_sum
            FROM dims d JOIN sums s USING (doc_id)
        """,
        # r10: interlaced + local-color-table GIF — same closed form
        # as multimodal_decode_gif plus the position-weighted checksum
        # (pixel i's RGB bytes sit at 3i, 3i+1, 3i+2)
        "multimodal_decode_gif_interlaced": """
            WITH dims AS (
              SELECT doc_id,
                     doc_id % 11 + 2 AS w,
                     doc_id % 7 + 2 AS h,
                     doc_id % 29 + 2 AS p
              FROM documents
            ),
            px AS (
              SELECT doc_id, p, unnest(range(w * h)) AS i FROM dims
            ),
            sums AS (
              SELECT doc_id,
                     CAST(sum(
                         (5 * ((i * i + doc_id) % p) + 7 * doc_id) % 256
                       + (9 * ((i * i + doc_id) % p) + 11 * doc_id) % 256
                       + (3 * ((i * i + doc_id) % p) + 13 * doc_id) % 256
                     ) AS BIGINT) AS pixel_sum,
                     CAST(sum(
                         (3 * i + 1) *
                         ((5 * ((i * i + doc_id) % p) + 7 * doc_id) % 256)
                       + (3 * i + 2) *
                         ((9 * ((i * i + doc_id) % p) + 11 * doc_id) % 256)
                       + (3 * i + 3) *
                         ((3 * ((i * i + doc_id) % p) + 13 * doc_id) % 256)
                     ) AS BIGINT) AS pixel_possum
              FROM px GROUP BY doc_id
            )
            SELECT d.doc_id,
                   'gif' AS img_format,
                   CAST(d.w AS INTEGER) AS width,
                   CAST(d.h AS INTEGER) AS height,
                   CAST(3 AS INTEGER) AS channels,
                   s.pixel_sum,
                   s.pixel_possum
            FROM dims d JOIN sums s USING (doc_id)
        """,
        # paletted PNG: the oracle replays the generator's
        # index -> PLTE lookup -> RGB sample sum closed-form
        "multimodal_decode_png_palette": """
            WITH dims AS (
              SELECT doc_id,
                     doc_id % 8 + 2 AS w,
                     doc_id % 6 + 2 AS h,
                     doc_id % 13 + 3 AS p
              FROM documents
            ),
            px AS (
              SELECT doc_id, p, unnest(range(w * h)) AS i FROM dims
            ),
            sums AS (
              SELECT doc_id,
                     CAST(sum(
                         (7 * ((5 * i + doc_id) % p) + 3 * doc_id) % 256
                       + (11 * ((5 * i + doc_id) % p) + 5 * doc_id) % 256
                       + (13 * ((5 * i + doc_id) % p) + 7 * doc_id) % 256
                     ) AS BIGINT) AS pixel_sum
              FROM px GROUP BY doc_id
            )
            SELECT d.doc_id,
                   'png' AS img_format,
                   CAST(d.w AS INTEGER) AS width,
                   CAST(d.h AS INTEGER) AS height,
                   CAST(3 AS INTEGER) AS channels,
                   s.pixel_sum
            FROM dims d JOIN sums s USING (doc_id)
        """,
        "multimodal_decode_png": """
            WITH dims AS (
              SELECT doc_id,
                     doc_id % 8 + 2 AS w,
                     doc_id % 6 + 2 AS h,
                     CASE doc_id % 3 WHEN 0 THEN 1
                                     WHEN 1 THEN 3
                                     ELSE 4 END AS ch
              FROM documents
            ),
            px AS (
              SELECT doc_id, unnest(range(ch * w * h)) AS i FROM dims
            ),
            sums AS (
              SELECT doc_id,
                     CAST(sum((11 * i + 3 * doc_id) % 256) AS BIGINT)
                       AS pixel_sum
              FROM px GROUP BY doc_id
            )
            SELECT d.doc_id,
                   'png' AS img_format,
                   CAST(d.w AS INTEGER) AS width,
                   CAST(d.h AS INTEGER) AS height,
                   CAST(d.ch AS INTEGER) AS channels,
                   s.pixel_sum
            FROM dims d JOIN sums s USING (doc_id)
        """,
        # sub-8-bit / tRNS paletted PNGs: index -> LUT (+per-entry
        # alpha when doc%3=0, channels then 4) replayed closed-form;
        # depth rotates 1/2/4/8 and every second doc is interlaced
        "multimodal_decode_png_sub8": """
            WITH dims AS (
              SELECT doc_id,
                     doc_id % 8 + 2 AS w,
                     doc_id % 6 + 2 AS h,
                     CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
                                     WHEN 2 THEN 4 ELSE 8 END AS depth,
                     least(doc_id % 13 + 3,
                           CASE doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 4
                                           WHEN 2 THEN 16 ELSE 256 END)
                       AS p
              FROM documents
            ),
            px AS (
              SELECT doc_id, p, unnest(range(w * h)) AS i FROM dims
            ),
            vals AS (
              SELECT doc_id, p, (5 * i + doc_id) % p AS idx FROM px
            ),
            sums AS (
              SELECT doc_id,
                     CAST(sum((7 * idx + 3 * doc_id) % 256
                              + (11 * idx + 5 * doc_id) % 256
                              + (13 * idx + 7 * doc_id) % 256
                              + CASE WHEN doc_id % 3 = 0
                                     THEN CASE WHEN idx
                                                    < (doc_id % p) + 1
                                               THEN (17 * idx
                                                     + 9 * doc_id) % 256
                                               ELSE 255 END
                                     ELSE 0 END) AS BIGINT)
                       AS pixel_sum
              FROM vals GROUP BY doc_id
            )
            SELECT d.doc_id,
                   'png' AS img_format,
                   CAST(d.w AS INTEGER) AS width,
                   CAST(d.h AS INTEGER) AS height,
                   CAST(CASE WHEN d.doc_id % 3 = 0 THEN 4 ELSE 3 END
                        AS INTEGER) AS channels,
                   CAST(d.depth AS INTEGER) AS bit_depth,
                   s.pixel_sum
            FROM dims d JOIN sums s USING (doc_id)
        """,
        # 16-bit PNGs: the closed sample form runs mod 65536; the sum
        # over true 16-bit values cannot be matched by a truncating
        # or endian-swapping decoder
        "multimodal_decode_png16": """
            WITH dims AS (
              SELECT doc_id,
                     doc_id % 8 + 2 AS w,
                     doc_id % 6 + 2 AS h,
                     CASE doc_id % 4 WHEN 0 THEN 1
                                     WHEN 1 THEN 2
                                     WHEN 2 THEN 3
                                     ELSE 4 END AS ch
              FROM documents
            ),
            px AS (
              SELECT doc_id, unnest(range(ch * w * h)) AS i FROM dims
            ),
            sums AS (
              SELECT doc_id,
                     CAST(sum((25309 * i + 77 * doc_id) % 65536)
                          AS BIGINT) AS pixel_sum
              FROM px GROUP BY doc_id
            )
            SELECT d.doc_id,
                   'png' AS img_format,
                   CAST(d.w AS INTEGER) AS width,
                   CAST(d.h AS INTEGER) AS height,
                   CAST(d.ch AS INTEGER) AS channels,
                   CAST(16 AS INTEGER) AS bit_depth,
                   s.pixel_sum
            FROM dims d JOIN sums s USING (doc_id)
        """,
        # Adam7-interlaced PNGs share multimodal_decode_png's closed
        # sample form; the position-weighted possum pins the pass-grid
        # scatter (plain pixel_sum is order-invariant and would pass
        # a decoder that unfilters right but scatters wrong)
        "multimodal_decode_png_interlaced": """
            WITH dims AS (
              SELECT doc_id,
                     doc_id % 8 + 2 AS w,
                     doc_id % 6 + 2 AS h,
                     CASE doc_id % 3 WHEN 0 THEN 1
                                     WHEN 1 THEN 3
                                     ELSE 4 END AS ch
              FROM documents
            ),
            px AS (
              SELECT doc_id, unnest(range(ch * w * h)) AS i FROM dims
            ),
            sums AS (
              SELECT doc_id,
                     CAST(sum((11 * i + 3 * doc_id) % 256) AS BIGINT)
                       AS pixel_sum,
                     CAST(sum((i + 1) * ((11 * i + 3 * doc_id) % 256))
                          AS BIGINT) AS pixel_possum
              FROM px GROUP BY doc_id
            )
            SELECT d.doc_id,
                   'png' AS img_format,
                   CAST(d.w AS INTEGER) AS width,
                   CAST(d.h AS INTEGER) AS height,
                   CAST(d.ch AS INTEGER) AS channels,
                   s.pixel_sum,
                   s.pixel_possum
            FROM dims d JOIN sums s USING (doc_id)
        """,
        # --- TPC-H completion (round 5, post-window). partsupp is
        # derived from lineitem (min quoted extendedprice per pair) —
        # min() picks an original 2-decimal value, so the decimal
        # arithmetic below stays exact in both engines. ---
        "q2_min_cost_supplier": """
            WITH ps AS (
              SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                     min(l_extendedprice) AS ps_supplycost
              FROM lineitem GROUP BY 1, 2
            ),
            elig AS (
              SELECT ps_partkey, ps_suppkey, ps_supplycost,
                     s_acctbal, s_name, n_name, p_partkey, p_brand
              FROM ps
              JOIN part ON ps_partkey = p_partkey
              JOIN supplier ON ps_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE' AND p_size = 25
            )
            SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
                   ps_suppkey, ps_supplycost
            FROM elig e
            WHERE ps_supplycost = (SELECT min(e2.ps_supplycost)
                                   FROM elig e2
                                   WHERE e2.ps_partkey = e.ps_partkey)
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, ps_suppkey
            LIMIT 100
        """,
        "q9_product_type_profit": f"""
            WITH ps AS (
              SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                     min(l_extendedprice) AS ps_supplycost
              FROM lineitem GROUP BY 1, 2
            )
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   round(CAST(sum({_REV}
                         - CAST(ps_supplycost AS DECIMAL(12,2))
                           * CAST(l_quantity AS DECIMAL(12,2)))
                         AS DOUBLE), 2) AS sum_profit
            FROM lineitem
            JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%widget%'
            GROUP BY 1, 2
        """,
        "q11_important_part_value": """
            WITH per_part AS (
              SELECT l_partkey,
                     sum(CAST(l_extendedprice AS DECIMAL(12,2))
                         * CAST(l_quantity AS DECIMAL(12,2))) AS value_dec
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE n_name = 'NATION_3'
              GROUP BY l_partkey
            )
            SELECT l_partkey,
                   round(CAST(value_dec AS DOUBLE), 2) AS part_value
            FROM per_part
            WHERE value_dec > (SELECT sum(value_dec) FROM per_part)
                              * CAST('0.001' AS DECIMAL(4,3))
        """,
        "q16_parts_supplier_counts": """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_type <> 'PROMO'
              AND p_size IN (1, 5, 10, 15, 20, 25)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 1000.0)
            GROUP BY 1, 2, 3
        """,
        "q20_promotable_suppliers": """
            SELECT s_suppkey, s_name, s_acctbal
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_19'
              AND s_suppkey IN (
                SELECT l_suppkey
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_name LIKE 'small%'
                GROUP BY l_partkey, l_suppkey
                HAVING sum(CASE WHEN year(l_shipdate) = 1997
                                THEN CAST(l_quantity AS DECIMAL(12,2))
                                ELSE CAST(0 AS DECIMAL(12,2)) END)
                       * CAST(2 AS DECIMAL(2,0))
                       > sum(CAST(l_quantity AS DECIMAL(12,2)))
              )
        """,
        # PII scrub: the planted emails/phones/IPs are mirrored
        # verbatim; patterns use the common Java-regex/RE2 subset and
        # the redaction order (email, ip, phone) matches the operator
        "text_pii_scrub": """
            WITH planted AS (
              SELECT doc_id,
                     text || CASE
                       WHEN doc_id % 5 = 0 THEN ' contact user'
                            || CAST(doc_id AS VARCHAR) || '@example.com now'
                       WHEN doc_id % 7 = 0 THEN ' call 555-'
                            || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                            || '-0199 today'
                       WHEN doc_id % 11 = 0 THEN ' from 10.0.'
                            || CAST(doc_id % 256 AS VARCHAR) || '.'
                            || CAST((doc_id * 7) % 256 AS VARCHAR) || ' logged'
                       ELSE '' END AS text
              FROM documents
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                     AS INTEGER) AS n_emails,
                   CAST(len(regexp_extract_all(text,
                     '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
                     AS INTEGER) AS n_ips,
                   CAST(len(regexp_extract_all(text,
                     '\\b\\d{3}[- .]\\d{3}[- .]\\d{4}\\b'))
                     AS INTEGER) AS n_phones,
                   regexp_replace(regexp_replace(regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                     '[EMAIL]', 'g'),
                     '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                     '[IP]', 'g'),
                     '\\b\\d{3}[- .]\\d{3}[- .]\\d{4}\\b',
                     '[PHONE]', 'g') AS redacted_text,
                   (len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                    + len(regexp_extract_all(text,
                      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
                    + len(regexp_extract_all(text,
                      '\\b\\d{3}[- .]\\d{3}[- .]\\d{4}\\b'))) > 0 AS has_pii
            FROM planted
        """,
        "text_paragraph_dedup": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 300000 AS doc_id,
                     'subscribe to our newsletter click here to continue'
                     || ' reading below ' || text AS text
              FROM documents WHERE doc_id < 40
            ),
            tw AS (SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w
                   FROM corpus),
            numbered AS (
              SELECT doc_id, w,
                     unnest(range(CAST(ceil(len(w) / 10.0) AS BIGINT))) AS i
              FROM tw
            ),
            paras AS (
              SELECT doc_id, CAST(i AS INTEGER) AS para_idx,
                     array_to_string(list_slice(w, i * 10 + 1, i * 10 + 10),
                                     ' ') AS para
              FROM numbered
            ),
            common AS (
              SELECT para FROM paras
              GROUP BY para HAVING count(DISTINCT doc_id) >= 3
            ),
            marked AS (
              SELECT p.doc_id, p.para_idx, p.para, c.para IS NULL AS keep
              FROM paras p LEFT JOIN common c ON p.para = c.para
            )
            SELECT doc_id,
                   coalesce(array_to_string(
                     list(para ORDER BY para_idx) FILTER (WHERE keep), ' '),
                     '') AS clean_text,
                   CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_paras_kept,
                   CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT)
                     AS n_paras_dropped
            FROM marked GROUP BY doc_id
        """,
        # token rarity: integer corpus frequencies joined back, one
        # identical-operand division — exact across engines (the
        # log-prob version of this filter would hit libm ulp skew)
        "text_token_rarity": f"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split({_NORM.format(t='text')}, ' ')) AS tok
              FROM documents
            ),
            toks2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
            freqs AS (SELECT tok, count(*) AS tok_freq
                      FROM toks2 GROUP BY tok)
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   round(CAST(sum(tok_freq) AS DOUBLE) / count(*), 4)
                     AS avg_token_freq,
                   CAST(min(tok_freq) AS BIGINT) AS min_token_freq
            FROM toks2 JOIN freqs USING (tok)
            GROUP BY doc_id
        """,
        # containment works on shingle STRINGS (not hashed sids):
        # intersection over the smaller set, inner = smaller set
        # (tie: smaller id, which is doc_a since a < b)
        "dedup_containment_pairs": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 500000 AS doc_id,
                     'article wrapper intro paragraph begins here ' || text
                     || ' reader commentary section follows the quoted'
                     || ' document' AS text
              FROM documents WHERE doc_id < 20
            ), {_SHINGLES},
            szs AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT CASE WHEN sa.sz <= sb.sz THEN doc_a ELSE doc_b END
                     AS inner_doc,
                   CASE WHEN sa.sz <= sb.sz THEN doc_b ELSE doc_a END
                     AS outer_doc,
                   round(inter / least(sa.sz, sb.sz), 4) AS containment
            FROM inter
            JOIN szs sa ON sa.doc_id = doc_a
            JOIN szs sb ON sb.doc_id = doc_b
            WHERE round(inter / least(sa.sz, sb.sz), 4) >= 0.8
        """,
        # incremental probe: signatures are per-doc, so one corpus-wide
        # minhash chain equals Spark's per-side computation; the band
        # join is then new-side x hist-side only
        "dedup_incremental_probe": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 4 != 0
              UNION ALL
              SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0
              UNION ALL
              SELECT doc_id + 400000 AS doc_id,
                     text || ' extra token tail' AS text
              FROM documents WHERE doc_id % 4 != 0 AND doc_id < 30
            ), {_SHINGLES},
            seeds AS (SELECT * FROM (VALUES {_MINHASH_SEEDS}) s(j, a, b)),
            mh AS (
              SELECT doc_id, j, min((a * sid + b) % 2147483647) AS mh
              FROM sids CROSS JOIN seeds GROUP BY doc_id, j
            ),
            bands AS (
              SELECT doc_id, j // 3 AS band,
                     string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j) AS key
              FROM mh GROUP BY doc_id, j // 3
            ),
            cands AS (
              SELECT DISTINCT n.doc_id AS new_doc, h.doc_id AS hist_doc
              FROM bands n JOIN bands h
                ON n.band = h.band AND n.key = h.key
              WHERE (n.doc_id >= 400000 OR n.doc_id % 4 = 0)
                AND h.doc_id < 400000 AND h.doc_id % 4 != 0
            ),
            inter AS (
              SELECT c.new_doc, c.hist_doc, count(*) AS inter
              FROM cands c
              JOIN sids sn ON sn.doc_id = c.new_doc
              JOIN sids sh2 ON sh2.doc_id = c.hist_doc AND sh2.sid = sn.sid
              GROUP BY 1, 2
            )
            SELECT i.new_doc, i.hist_doc,
                   round(inter / (sn.sz + sh3.sz - inter), 4) AS jaccard
            FROM inter i
            JOIN sizes sn ON sn.doc_id = i.new_doc
            JOIN sizes sh3 ON sh3.doc_id = i.hist_doc
            WHERE round(inter / (sn.sz + sh3.sz - inter), 4) >= 0.5
        """,
        # full-recompute oracles for the INCREMENTAL operator: the
        # recursive closure over the combined corpus's MinHash pair
        # graph (a hash match proves contraction-based incremental
        # maintenance equals closing everything from scratch); the
        # delta row additionally EXCEPTs the history-only closure,
        # proving the emitted delta is exactly the changed+new rows
        "dedup_incremental_components": _incremental_cc_oracle(),
        "dedup_incremental_delta": _incremental_cc_oracle(delta=True),
        # streaming gram maintenance: four foreachBatch delta merges
        # must compose to the from-scratch count over the whole
        # corpus — the oracle IS that full recompute
        "streaming_incremental_grams": f"""
            WITH norm_all AS (
              SELECT string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents
            ),
            uni_all AS (
              SELECT w1, CAST(count(*) AS BIGINT) AS cnt
              FROM (SELECT unnest(w) AS w1 FROM norm_all) GROUP BY w1
            ),
            big_all AS (
              SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt
              FROM (SELECT w[i] AS w1, w[i + 1] AS w2
                    FROM (SELECT w, unnest(range(1, len(w))) AS i
                          FROM norm_all))
              GROUP BY w1, w2
            )
            SELECT 'uni' AS gram_type, w1, '' AS w2, cnt FROM uni_all
            UNION ALL
            SELECT 'big' AS gram_type, w1, w2, cnt FROM big_all
        """,
        # LASER-style margin mining: micro-unit BIGINT cosines make
        # the two neighborhood sums order-free and engine-exact; the
        # margin is one integer ratio -> one IEEE division + round
        "mine_bitext_margin": """
            WITH a AS (
              SELECT vec_id AS query_id, embedding FROM embeddings
              WHERE vec_id % 2 = 0 AND vec_id < 20
            ),
            b AS (
              SELECT vec_id AS match_id, embedding FROM embeddings
              WHERE vec_id % 2 = 1
            ),
            scored AS (
              SELECT query_id, match_id,
                     CAST(round(list_cosine_similarity(
                       a.embedding::DOUBLE[], b.embedding::DOUBLE[]
                     ) * 10000) AS BIGINT) AS cosm
              FROM a CROSS JOIN b
            ),
            fwd AS (
              SELECT query_id, sum(cosm) AS fwd_sum
              FROM (SELECT query_id, cosm,
                           row_number() OVER (PARTITION BY query_id
                             ORDER BY cosm DESC, match_id ASC) AS rn
                    FROM scored)
              WHERE rn <= 4 GROUP BY query_id
            ),
            bwd AS (
              SELECT match_id, sum(cosm) AS bwd_sum
              FROM (SELECT match_id, cosm,
                           row_number() OVER (PARTITION BY match_id
                             ORDER BY cosm DESC, query_id ASC) AS rn
                    FROM scored)
              WHERE rn <= 4 GROUP BY match_id
            ),
            margins AS (
              SELECT s.query_id, s.match_id, s.cosm,
                     round(CAST(s.cosm * 8 AS DOUBLE)
                           / (fwd_sum + bwd_sum), 4) AS margin
              FROM scored s
              JOIN fwd USING (query_id)
              JOIN bwd USING (match_id)
            )
            SELECT query_id, match_id,
                   cosm / 10000.0 AS cos_sim, margin, rnk
            FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY margin DESC, match_id ASC) AS INTEGER) AS rnk
                  FROM margins)
            WHERE rnk <= 3
        """,
        # BM25 from the incrementally maintained index: the oracle is
        # the FULL-corpus recompute (text_bm25_topk's oracle verbatim)
        # — hash equality proves appended-index + additively merged
        # stats serve queries exactly like a from-scratch build
        "retrieval_incremental_bm25": _bm25_scored_sql() + """
            SELECT doc_id, bm25, n_matched_terms
            FROM scored
            ORDER BY bm25 DESC, doc_id ASC
            LIMIT 15
        """,
        # incremental LM-count maintenance: combined-corpus counts
        # semi-joined to the batch's gram set == stored history counts
        # merged with one batch-only pass (counts are additive) — the
        # join-to-batch-grams side proves MINIMALITY of the delta
        "lm_incremental_gram_update": f"""
            WITH norm_all AS (
              SELECT string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents
            ),
            norm_b AS (
              SELECT string_split({_NORM.format(t='text')}, ' ') AS w
              FROM documents WHERE doc_id % 4 = 0
            ),
            uni_all AS (
              SELECT w1, CAST(count(*) AS BIGINT) AS cnt
              FROM (SELECT unnest(w) AS w1 FROM norm_all) GROUP BY w1
            ),
            big_all AS (
              SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt
              FROM (SELECT w[i] AS w1, w[i + 1] AS w2
                    FROM (SELECT w, unnest(range(1, len(w))) AS i
                          FROM norm_all))
              GROUP BY w1, w2
            ),
            ub AS (
              SELECT DISTINCT w1
              FROM (SELECT unnest(w) AS w1 FROM norm_b)
            ),
            bb AS (
              SELECT DISTINCT w1, w2
              FROM (SELECT w[i] AS w1, w[i + 1] AS w2
                    FROM (SELECT w, unnest(range(1, len(w))) AS i
                          FROM norm_b))
            )
            SELECT 'uni' AS gram_type, u.w1, '' AS w2, u.cnt
            FROM uni_all u JOIN ub USING (w1)
            UNION ALL
            SELECT 'big' AS gram_type, b.w1, b.w2, b.cnt
            FROM big_all b JOIN bb USING (w1, w2)
        """,
        # incremental data-card maintenance: from-scratch combined
        # card inner-joined to the batch's slice set == stored history
        # card merged with the batch's additive stats
        "card_incremental_update": f"""
            WITH per AS (
              SELECT source, lang,
                     CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS total_chars,
                     CAST(sum(len(string_split({_NORM.format(t='text')},
                           ' '))) AS BIGINT) AS total_tokens
              FROM documents GROUP BY 1, 2
            ),
            touched AS (
              SELECT DISTINCT source, lang FROM documents
              WHERE doc_id % 4 = 0 AND source IN ('src0', 'src1', 'src2')
            )
            SELECT p.source, p.lang, n_docs, total_chars, total_tokens,
                   round(CAST(total_tokens AS DOUBLE) / n_docs, 4)
                     AS avg_tokens
            FROM per p JOIN touched USING (source, lang)
        """,
        "corpus_data_card": f"""
            WITH per AS (
              SELECT source, lang,
                     CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS total_chars,
                     CAST(sum(len(string_split({_NORM.format(t='text')}, ' ')))
                          AS BIGINT) AS total_tokens,
                     round(CAST(sum(len(string_split({_NORM.format(t='text')},
                           ' '))) AS DOUBLE) / count(*), 4) AS avg_tokens
              FROM documents GROUP BY 1, 2
            )
            SELECT source, lang, n_docs, total_chars, total_tokens,
                   avg_tokens,
                   round(n_docs / (SELECT sum(n_docs) FROM per), 6)
                     AS doc_share
            FROM per
        """,
        "streaming_static_enrich": """
            SELECT coalesce(c_mktsegment, 'UNKNOWN') AS segment,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
                     AS total_value
            FROM events LEFT JOIN customer ON user_id = c_custkey
            GROUP BY 1
        """,
        # audio decode: the oracle recomputes the WAV generator's
        # sample arithmetic — abs of the centered modular sequence
        "multimodal_decode_audio": """
            WITH dims AS (
              SELECT doc_id,
                     8000 + (doc_id % 4) * 4000 AS rate,
                     doc_id % 50 + 10 AS n
              FROM documents
            ),
            px AS (SELECT doc_id, unnest(range(n)) AS i FROM dims),
            sums AS (
              SELECT doc_id,
                     CAST(sum(abs((31 * i + doc_id) % 4001 - 2000))
                          AS BIGINT) AS abs_sum
              FROM px GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(d.rate AS INTEGER) AS sample_rate,
                   CAST(1 AS INTEGER) AS channels,
                   CAST(16 AS INTEGER) AS bits,
                   CAST(d.n AS BIGINT) AS n_samples,
                   s.abs_sum
            FROM dims d JOIN sums s USING (doc_id)
        """,
        # video decode: per-frame pixel bytes (11*i + 13*f + id) % 256
        # summed over all frames — the AVI generator's arithmetic
        "multimodal_decode_video": """
            WITH dims AS (
              SELECT doc_id,
                     doc_id % 6 + 2 AS w,
                     doc_id % 4 + 2 AS h,
                     doc_id % 5 + 1 AS nf
              FROM documents
            ),
            cells AS (
              SELECT doc_id, f.f, i.i
              FROM dims,
                   unnest(range(nf)) AS f(f),
                   unnest(range(3 * w * h)) AS i(i)
            ),
            sums AS (
              SELECT doc_id,
                     CAST(sum((11 * i + 13 * f + doc_id) % 256) AS BIGINT)
                       AS pixel_sum
              FROM cells GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(d.w AS INTEGER) AS width,
                   CAST(d.h AS INTEGER) AS height,
                   CAST(d.nf AS INTEGER) AS n_frames,
                   s.pixel_sum
            FROM dims d JOIN sums s USING (doc_id)
        """,
        # ExactSubstr repeated-span coverage: positional 5-grams,
        # corpus-occurrence >= 2 duplicate set, gaps-and-islands merge
        # (new island when pos > prev + k), island covers
        # max(pos) - min(pos) + k tokens
        "text_repeated_spans": f"""
            WITH corpus AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 11 = 0
                          THEN 'the quick brown fox jumps over the lazy dog'
                               || ' again and again ' || text
                          ELSE text END AS text
              FROM documents
            ),
            nw AS (
              SELECT doc_id, string_split({_NORM.format(t='text')}, ' ') AS w
              FROM corpus
            ),
            nt AS (
              SELECT doc_id,
                     CASE WHEN len(w) = 1 AND w[1] = '' THEN 0
                          ELSE len(w) END AS n_tokens,
                     w
              FROM nw
            ),
            g AS (
              SELECT doc_id, u.i AS pos,
                     array_to_string(w[u.i : u.i + 4], ' ') AS gram
              FROM nt, unnest(range(1, len(w) - 5 + 2)) AS u(i)
              WHERE n_tokens >= 5
            ),
            dup AS (
              SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2
            ),
            m AS (
              SELECT g.doc_id, g.pos,
                     lag(g.pos) OVER (PARTITION BY g.doc_id ORDER BY g.pos)
                       AS prev
              FROM g JOIN dup USING (gram)
            ),
            isl AS (
              SELECT doc_id, pos,
                     sum(CASE WHEN prev IS NULL OR pos > prev + 5
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY pos) AS island
              FROM m
            ),
            sp AS (
              SELECT doc_id, island,
                     max(pos) - min(pos) + 5 AS span_tokens
              FROM isl GROUP BY 1, 2
            ),
            pd AS (
              SELECT doc_id,
                     count(*) AS n_dup_spans,
                     sum(span_tokens) AS dup_tokens
              FROM sp GROUP BY 1
            )
            SELECT t.doc_id,
                   CAST(t.n_tokens AS BIGINT) AS n_tokens,
                   CAST(coalesce(n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
                   CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
                   round(CASE WHEN t.n_tokens > 0
                              THEN CAST(coalesce(dup_tokens, 0) AS DOUBLE)
                                   / t.n_tokens
                              ELSE 0.0 END, 4) AS dup_coverage
            FROM nt t LEFT JOIN pd USING (doc_id)
        """,
        # keyless point-in-interval join: every 97th event anchors a
        # ±30-minute window; closed-interval containment
        "range_join_event_windows": """
            WITH a AS (
              SELECT event_id AS window_id,
                     ts - INTERVAL 30 MINUTE AS w_start,
                     ts + INTERVAL 30 MINUTE AS w_end
              FROM events WHERE event_id % 97 = 0
            )
            SELECT a.window_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
                   CAST(min(e.event_id) AS BIGINT) AS first_event,
                   CAST(max(e.event_id) AS BIGINT) AS last_event
            FROM a JOIN events e
              ON e.ts >= a.w_start AND e.ts <= a.w_end
            GROUP BY 1
        """,
        # data-quality constraint report over planted corruptions:
        # both CASE predicates key on the ORIGINAL l_orderkey (the
        # Spark side computes them in one projection the same way)
        "table_quality_checks": """
            WITH li AS (
              SELECT CASE WHEN l_orderkey % 997 = 0
                          THEN l_orderkey + 1000000000
                          ELSE l_orderkey END AS l_orderkey,
                     CASE WHEN l_orderkey % 1009 = 0
                          THEN -l_quantity ELSE l_quantity END AS l_quantity,
                     l_discount
              FROM lineitem
            ),
            o0 AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 501 = 0 THEN NULL
                          ELSE o_custkey END AS o_custkey,
                     o_orderstatus
              FROM orders
            ),
            ords AS (
              SELECT * FROM o0
              UNION ALL SELECT * FROM o0 WHERE o_orderkey < 100
            ),
            rep AS (
              SELECT 'lineitem_quantity_range' AS check_name,
                     'row' AS kind,
                     CAST(coalesce(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50)
                                            THEN 1 ELSE 0 END), 0) AS BIGINT)
                       AS n_violations
              FROM li
              UNION ALL
              SELECT 'lineitem_discount_range', 'row',
                     CAST(coalesce(sum(CASE WHEN NOT (l_discount BETWEEN 0 AND 0.10)
                                            THEN 1 ELSE 0 END), 0) AS BIGINT)
              FROM li
              UNION ALL
              SELECT 'orders_custkey_not_null', 'row',
                     CAST(coalesce(sum(CASE WHEN o_custkey IS NULL
                                            THEN 1 ELSE 0 END), 0) AS BIGINT)
              FROM ords
              UNION ALL
              SELECT 'orders_status_accepted', 'row',
                     CAST(coalesce(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                                            THEN 1 ELSE 0 END), 0) AS BIGINT)
              FROM ords
              UNION ALL
              SELECT 'orders_pk_unique', 'unique',
                     CAST(coalesce(sum(cnt), 0) AS BIGINT)
              FROM (SELECT o_orderkey, count(*) AS cnt FROM ords
                    GROUP BY 1 HAVING count(*) > 1)
              UNION ALL
              SELECT 'lineitem_orderkey_fk', 'foreign_key',
                     CAST(count(*) AS BIGINT)
              FROM li
              WHERE l_orderkey IS NOT NULL
                AND l_orderkey NOT IN (SELECT o_orderkey FROM ords)
            )
            SELECT check_name, kind, n_violations,
                   n_violations = 0 AS ok
            FROM rep
        """,
        # Count-Min sketch: 4x1024 grid, md5("row:value") buckets —
        # the cell table, global merge, and min-over-rows probe are
        # all exactly recomputable
        "sketch_cms_frequencies": """
            WITH cells AS (
              SELECT o_orderpriority, r.r AS cms_row,
                     ('0x' || substr(md5(r.r::VARCHAR || ':'
                                         || o_custkey::VARCHAR), 1, 15)
                     )::BIGINT % 1024 AS cms_col,
                     count(*) AS cms_count
              FROM orders, unnest([0, 1, 2, 3]) AS r(r)
              GROUP BY 1, 2, 3
            ),
            merged AS (
              SELECT cms_row, cms_col, sum(cms_count) AS cms_count
              FROM cells GROUP BY 1, 2
            ),
            probes AS (
              SELECT DISTINCT o_custkey FROM orders
              WHERE o_custkey % 149 = 0
            ),
            probe_rows AS (
              SELECT p.o_custkey, r.r AS cms_row,
                     ('0x' || substr(md5(r.r::VARCHAR || ':'
                                         || p.o_custkey::VARCHAR), 1, 15)
                     )::BIGINT % 1024 AS cms_col
              FROM probes p, unnest([0, 1, 2, 3]) AS r(r)
            ),
            est AS (
              SELECT pr.o_custkey,
                     CAST(min(coalesce(m.cms_count, 0)) AS BIGINT)
                       AS cms_estimate
              FROM probe_rows pr
              LEFT JOIN merged m USING (cms_row, cms_col)
              GROUP BY 1
            ),
            exact AS (
              SELECT o.o_custkey, CAST(count(*) AS BIGINT) AS exact_count
              FROM orders o JOIN probes USING (o_custkey)
              GROUP BY 1
            )
            SELECT e.o_custkey, e.exact_count, s.cms_estimate,
                   CAST(s.cms_estimate >= e.exact_count AS INTEGER)
                     AS no_undercount
            FROM exact e JOIN est s USING (o_custkey)
        """,
    }
