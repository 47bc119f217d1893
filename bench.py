#!/usr/bin/env python
"""Benchmark harness (driver contract).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "pages_per_sec": ..., "geoms_per_sec": ...}

Headline = the flagship pipeline (read pages parquet → extract text →
mine GeoJSON → parse/validate → broadcast spatial join → tile top-k →
write parquet), streaming end to end. Page-table generation is cached
setup (untimed): the table is the INPUT, not the work.

--scaling: runs the headline twice in fresh processes at
RAY_GRAFT_CPUS_LO/HI on the same (GRAFT_SCALE_MULT x-sized, cached)
input and reports both throughputs + scaling efficiency (the sandbox
substitute for N vs 4N nodes, BASELINE.json north_rule). Defaults are
LO=2/HI=8 — the band where a fixed-work burn test shows near-linear
hardware (burn numbers re-measured each round; see BASELINE.md
"Hardware note"). The scaled input keeps fixed per-pipeline overhead
(~1.5 s) small relative to the low-CPU runtime; one untimed warm-up
run spawns workers/imports, then best-of-2 timed runs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def sf_of(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    return float(name.replace("sf", "")) if name.startswith("sf") else 0.1


def run_headline(pages: str, polys: str, n_pages: int, out_dir: str):
    """One full flagship execution; returns elapsed seconds."""
    import pyarrow.compute as pc

    from ocaml_geojson_ray.pipelines.flagship import parsed_features
    from ocaml_geojson_ray.spatial.join import spatial_join_points

    t0 = time.time()
    feats = parsed_features(pages)

    def only_ok_pts(b):
        return b.filter(pc.and_(pc.equal(b["geom_type"], "Point"), b["ok"]))

    pts = feats.map_batches(only_ok_pts, batch_format="pyarrow")
    joined = spatial_join_points(pts, polys)
    joined.write_parquet(out_dir)
    return time.time() - t0


def run_scaling_child(sf_dir: str, num_cpus: int) -> dict:
    """Scaling mode: 8x-sized pages, warm-up run, then timed run."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocaml_geojson_ray.sources.pages import (
        materialize_pages_parquet,
        page_count_for_sf,
    )
    from ocaml_geojson_ray.sources.polygons import generate_polygon_layer

    sf = sf_of(sf_dir)
    mult = float(os.environ.get("GRAFT_SCALE_MULT", "8"))
    sf_big = sf * mult  # scaled-up pages: fixed per-pipeline overhead
    # (~1.5 s) must be a small fraction of the LOW-cpu runtime for the
    # efficiency ratio to reflect the engine rather than the constant;
    # higher CPU bands need a bigger multiplier (GRAFT_SCALE_MULT)
    pages = materialize_pages_parquet(sf_big, root="/tmp/ogr_data")
    polys = generate_polygon_layer(sf, root="/tmp/ogr_data")
    n_pages = page_count_for_sf(sf_big)
    # untimed warm-up: spawn workers, import the package everywhere;
    # then best-of-2 timed runs (same protocol at both CPU levels so
    # the efficiency ratio is unbiased)
    run_headline(pages, polys, n_pages, f"/tmp/ogr_scale_warm_{num_cpus}")
    sec = min(
        run_headline(pages, polys, n_pages, f"/tmp/ogr_scale_{num_cpus}"),
        run_headline(pages, polys, n_pages, f"/tmp/ogr_scale_{num_cpus}_2"),
    )
    out = {"value": round(sec, 3), "num_cpus": num_cpus, "n_pages": n_pages,
           "pages_per_sec": round(n_pages / sec, 1)}
    ray.shutdown()
    return out


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow.compute as pc

    from ocaml_geojson_ray.pipelines import queries as Q
    from ocaml_geojson_ray.pipelines.flagship import parsed_features
    from ocaml_geojson_ray.sources.pages import (
        materialize_pages_parquet,
        page_count_for_sf,
    )
    from ocaml_geojson_ray.sources.polygons import generate_polygon_layer
    from ocaml_geojson_ray.spatial.join import spatial_join_points
    from ocaml_geojson_ray.stages.tiles_stage import densest_tiles

    sf = sf_of(sf_dir)
    # setup (untimed, cached across runs): the synthetic input tables
    pages = materialize_pages_parquet(sf, root="/tmp/ogr_data")
    polys = generate_polygon_layer(sf, root="/tmp/ogr_data")
    n_pages = page_count_for_sf(sf)

    # warm the page cache so we measure compute, not first-touch disk
    import pyarrow.parquet as pq
    import glob

    for f in glob.glob(os.path.join(pages, "*.parquet")):
        pq.read_metadata(f)

    # -- headline: flagship end-to-end (one untimed warm-up, then two
    # timed runs, best-of — the first timed run still absorbs worker
    # scale-up on a cold session; measured spread 1.3-3.1 s) ----------------
    out_dir = f"/tmp/ogr_bench_out/sf{sf}_cpus{num_cpus}"
    run_headline(pages, polys, n_pages, out_dir + "_warm")
    headline = min(
        run_headline(pages, polys, n_pages, out_dir),
        run_headline(pages, polys, n_pages, out_dir + "_2"),
    )
    # untimed: geometry-row count for the throughput figure (re-runs the
    # parse pipeline; deliberately outside the timed window)
    n_geoms = parsed_features(pages).count()

    # per-query timings (each a separate lazy pipeline)
    queries = {}

    def timed(name, fn):
        t = time.time()
        res = fn(sf_dir)
        try:
            import ray.data as rd

            if isinstance(res, rd.Dataset):
                res.materialize()
        except Exception:
            pass
        queries[name] = round(time.time() - t, 3)

    timed("cell_assign_counts", Q.q_cell_assign_counts)
    timed("hex_cell_counts", Q.q_hex_cell_counts)
    timed("tile_assign_counts", Q.q_tile_assign_counts)
    timed("spatial_join_rect", Q.q_spatial_join_rect)
    timed("envelope_join", Q.q_envelope_join)
    timed("zonal_stats", Q.q_zonal_stats)
    timed("rect_overlay_area", Q.q_rect_overlay_area)
    timed("knn_rect", Q.q_knn_rect)
    timed("knn_points", Q.q_knn_points)
    timed("pricing_summary", Q.q_pricing_summary)
    timed("events_window", Q.q_events_window)
    timed("session_windows", Q.q_session_windows)
    timed("asof_user_order", Q.q_asof_user_order)
    timed("semi_join_segment", Q.q_semi_join_segment)
    timed("hll_distinct_users", Q.q_hll_distinct_users)
    timed("exact_dedup", Q.q_exact_dedup)
    timed("minhash_neardups", Q.q_minhash_neardups)
    timed("ann_cosine_topk", Q.q_ann_cosine_topk)
    timed("interval_join_orders", Q.q_interval_join_orders)
    timed("tfidf_top_terms", Q.q_tfidf_top_terms)
    timed("geohash_cell_counts", Q.q_geohash_cell_counts)
    timed("zorder_partition_bounds", Q.q_zorder_partition_bounds)
    timed("dedup_clusters", Q.q_dedup_clusters)
    timed("hotspot_clusters", Q.q_hotspot_clusters)
    timed("corpus_prep", Q.q_corpus_prep)
    timed("cohort_retention", Q.q_cohort_retention)
    timed("funnel_steps", Q.q_funnel_steps)
    timed("running_totals", Q.q_running_totals)
    timed("revenue_per_nation", Q.q_revenue_per_nation)
    timed("pricing_cube", Q.q_pricing_cube)
    timed("quantile_sketch_prices", Q.q_quantile_sketch_prices)
    timed("decontaminate", Q.q_decontaminate)
    timed("pii_redaction", Q.q_pii_redaction)
    timed("repetition_stats", Q.q_repetition_stats)
    timed("span_dedup", Q.q_span_dedup)
    timed("span_scrub", Q.q_span_scrub)
    timed("url_domain_stats", Q.q_url_domain_stats)
    timed("shard_packing", Q.q_shard_packing)
    timed("source_quota", Q.q_source_quota)
    timed("event_gaps", Q.q_event_gaps)
    timed("geo_distance_pairs", Q.q_geo_distance_pairs)
    timed("geo_knn", Q.q_geo_knn)
    timed("pagerank_parts", Q.q_pagerank_parts)
    timed("importance_scores", Q.q_importance_scores)
    timed("quantile_filter", Q.q_quantile_filter)
    timed("semdedup", Q.q_semdedup)
    timed("kmeans_int_clusters", Q.q_kmeans_int_clusters)
    timed("json_props_stats", Q.q_json_props_stats)
    timed("ntile_docs", Q.q_ntile_docs)
    timed("spike_hours", Q.q_spike_hours)
    timed("curriculum_shards", Q.q_curriculum_shards)
    timed("pq_ann", Q.q_pq_ann)
    timed("moving_window", Q.q_moving_window)
    timed("streaming_dedup", Q.q_streaming_dedup)
    timed("snapshot_merge", Q.q_snapshot_merge)
    timed("table_stats", Q.q_table_stats)
    timed("lead_transitions", Q.q_lead_transitions)
    timed("unpivot_events", Q.q_unpivot_events)
    timed("winnow_fingerprints", Q.q_winnow_fingerprints)
    timed("hash_sample_langs", Q.q_hash_sample_langs)
    timed("user_paths", Q.q_user_paths)
    timed("inverted_index", Q.q_inverted_index)
    timed("triangle_counts", Q.q_triangle_counts)
    timed("skyline_parts", Q.q_skyline_parts)
    timed("tree_rollup", Q.q_tree_rollup)
    timed("rank_correlation", Q.q_rank_correlation)
    timed("zscore_outliers", Q.q_zscore_outliers)
    timed("regression_trend", Q.q_regression_trend)
    timed("cooccur_pairs", Q.q_cooccur_pairs)
    timed("hourly_entropy", Q.q_hourly_entropy)
    timed("decay_scores", Q.q_decay_scores)
    timed("edit_distance_pairs", Q.q_edit_distance_pairs)
    timed("bigram_next_word", Q.q_bigram_next_word)
    timed("mad_outliers", Q.q_mad_outliers)
    timed("bloom_prefilter", Q.q_bloom_prefilter)
    timed("percentile_cont_qty", Q.q_percentile_cont_qty)
    timed("interval_coverage", Q.q_interval_coverage)
    timed("kmv_similarity", Q.q_kmv_similarity)
    timed("conversion_lag", Q.q_conversion_lag)
    timed("value_histogram", Q.q_value_histogram)
    timed("char_trigrams", Q.q_char_trigrams)
    timed("dense_daily_counts", Q.q_dense_daily_counts)
    timed("embedding_norm_stats", Q.q_embedding_norm_stats)
    timed("best_dedup", Q.q_best_dedup)
    timed("knn_classify", Q.q_knn_classify)
    timed("time_weighted_avg", Q.q_time_weighted_avg)
    timed("slot_allocation", Q.q_slot_allocation)
    timed("rolling_distinct_users", Q.q_rolling_distinct_users)
    timed("changepoint_days", Q.q_changepoint_days)
    timed("totals_audit", Q.q_totals_audit)
    timed("ab_experiment_summary", Q.q_ab_experiment_summary)
    timed("cumulative_users", Q.q_cumulative_users)
    timed("resample_ffill", Q.q_resample_ffill)
    timed("rolling_median_daily", Q.q_rolling_median_daily)
    timed("cm_sketch_counts", Q.q_cm_sketch_counts)
    timed("bm25_topk", Q.q_bm25_topk)
    timed("dow_hour_heatmap", Q.q_dow_hour_heatmap)
    timed("ks_statistic", Q.q_ks_statistic)
    timed("gini_by_priority", Q.q_gini_by_priority)
    timed("event_runs", Q.q_event_runs)
    timed("benford_amounts", Q.q_benford_amounts)
    timed("autocorr_daily", Q.q_autocorr_daily)
    timed("heavy_hitters", Q.q_heavy_hitters)
    timed("lang_vocab_overlap", Q.q_lang_vocab_overlap)
    timed("winsorized_mean", Q.q_winsorized_mean)
    timed("rollup_revenue", Q.q_rollup_revenue)
    timed("ecdf_probes", Q.q_ecdf_probes)
    timed("theilsen_trend", Q.q_theilsen_trend)
    timed("active_streaks", Q.q_active_streaks)
    timed("weighted_median_price", Q.q_weighted_median_price)
    timed("crosscorr_types", Q.q_crosscorr_types)
    timed("modal_value", Q.q_modal_value)
    timed("contingency_type_dow", Q.q_contingency_type_dow)
    timed("first_last_matrix", Q.q_first_last_matrix)
    timed("bfs_levels", Q.q_bfs_levels)
    timed("wow_growth", Q.q_wow_growth)
    timed("user_churn_sets", Q.q_user_churn_sets)
    timed("nation_revenue_rank", Q.q_nation_revenue_rank)
    timed("orders_pagination", Q.q_orders_pagination)
    timed("above_avg_orders", Q.q_above_avg_orders)
    timed("degree_histogram", Q.q_degree_histogram)
    timed("id_gaps", Q.q_id_gaps)
    timed("normalized_dedup", Q.q_normalized_dedup)
    timed("assoc_rules", Q.q_assoc_rules)
    timed("event_type_combos", Q.q_event_type_combos)
    timed("table_checksum", Q.q_table_checksum)
    timed("psi_drift", Q.q_psi_drift)
    timed("smoothed_cell_density", Q.q_smoothed_cell_density)
    timed("systematic_sample", Q.q_systematic_sample)
    timed("rfm_segments", Q.q_rfm_segments)
    timed("keyness_terms", Q.q_keyness_terms)
    timed("stratified_sample", Q.q_stratified_sample)
    timed("sequence_motifs", Q.q_sequence_motifs)
    timed("join_cardinality", Q.q_join_cardinality)
    timed("blocking_stats", Q.q_blocking_stats)
    timed("first_touch_attribution", Q.q_first_touch_attribution)
    timed("dau_mau_stickiness", Q.q_dau_mau_stickiness)
    timed("debounce_events", Q.q_debounce_events)
    timed("langid_confusion", Q.q_langid_confusion)
    timed("partition_pruning", Q.q_partition_pruning)
    timed("source_concentration", Q.q_source_concentration)
    timed("degree_correlation", Q.q_degree_correlation)
    timed("trending_brands", Q.q_trending_brands)
    timed("dedup_cluster_sizes", Q.q_dedup_cluster_sizes)
    timed("duplication_by_source", Q.q_duplication_by_source)
    timed("pareto_share", Q.q_pareto_share)
    timed("item_recommendations", Q.q_item_recommendations)
    timed("best_price_supplier", Q.q_best_price_supplier)
    timed("simpsons_check", Q.q_simpsons_check)
    timed("partitioned_export", Q.q_partitioned_export)
    timed("shipping_sla", Q.q_shipping_sla)
    timed("resample_linear", Q.q_resample_linear)
    timed("pps_sample", Q.q_pps_sample)
    timed("borda_parts", Q.q_borda_parts)
    timed("bounce_rate", Q.q_bounce_rate)
    timed("purchase_context", Q.q_purchase_context)
    timed("burst_users", Q.q_burst_users)
    timed("linkage_scores", Q.q_linkage_scores)
    timed("feature_scaling_stats", Q.q_feature_scaling_stats)
    timed("cohort_ltv", Q.q_cohort_ltv)
    timed("grid_coverage", Q.q_grid_coverage)
    timed("weekend_effect", Q.q_weekend_effect)
    timed("all_lines_shipped", Q.q_all_lines_shipped)
    timed("moments_by_lang", Q.q_moments_by_lang)
    timed("substring_scan", Q.q_substring_scan)
    timed("abc_classification", Q.q_abc_classification)
    timed("process_conformance", Q.q_process_conformance)
    timed("forecast_next_day", Q.q_forecast_next_day)
    timed("weekly_percentiles", Q.q_weekly_percentiles)
    timed("kl_terms_by_source", Q.q_kl_terms_by_source)
    timed("return_rates_by_brand", Q.q_return_rates_by_brand)
    timed("error_purchase_sync", Q.q_error_purchase_sync)
    timed("visit_transitions", Q.q_visit_transitions)
    timed("decile_lift", Q.q_decile_lift)
    timed("priority_inversion", Q.q_priority_inversion)
    timed("lexical_richness", Q.q_lexical_richness)
    timed("order_size_dispersion", Q.q_order_size_dispersion)
    timed("survival_risk_table", Q.q_survival_risk_table)
    timed("low_quality_by_source", Q.q_low_quality_by_source)
    timed("ranking_stability", Q.q_ranking_stability)
    timed("peak_days", Q.q_peak_days)
    timed("uniqueness_audit", Q.q_uniqueness_audit)
    timed("activity_ccdf", Q.q_activity_ccdf)
    timed("milestone_days", Q.q_milestone_days)
    timed("dup_cross_source", Q.q_dup_cross_source)
    timed("revenue_drawdown", Q.q_revenue_drawdown)
    timed("conversion_windows", Q.q_conversion_windows)
    timed("smoothed_brand_rates", Q.q_smoothed_brand_rates)
    timed("price_ending_bias", Q.q_price_ending_bias)
    timed("k_anonymity", Q.q_k_anonymity)
    timed("growth_accounting", Q.q_growth_accounting)
    timed("shard_skew", Q.q_shard_skew)
    timed("linenumber_integrity", Q.q_linenumber_integrity)
    timed("engagement_bands", Q.q_engagement_bands)
    timed("price_index", Q.q_price_index)
    timed("basket_twins", Q.q_basket_twins)
    timed("mannwhitney_u", Q.q_mannwhitney_u)
    timed("dwell_times", Q.q_dwell_times)
    timed("open_orders_daily", Q.q_open_orders_daily)
    timed("revenue_proration", Q.q_revenue_proration)
    timed("local_clustering", Q.q_local_clustering)
    timed("brand_triples", Q.q_brand_triples)
    timed("seasonality_index", Q.q_seasonality_index)
    timed("order_interarrival", Q.q_order_interarrival)
    timed("link_prediction_cn", Q.q_link_prediction_cn)
    timed("diff_in_diff", Q.q_diff_in_diff)
    timed("dim_variance_topk", Q.q_dim_variance_topk)
    timed("emd_sources", Q.q_emd_sources)
    timed("tukey_fences", Q.q_tukey_fences)
    timed("price_realization", Q.q_price_realization)
    timed("cusum_alarm", Q.q_cusum_alarm)
    timed("cvar_daily", Q.q_cvar_daily)
    timed("business_day_shift", Q.q_business_day_shift)
    timed("price_volume_decomposition", Q.q_price_volume_decomposition)
    timed("brand_loyalty", Q.q_brand_loyalty)
    timed("multikey_er_clusters", Q.q_multikey_er_clusters)
    timed("term_positions", Q.q_term_positions)
    timed("vocab_growth", Q.q_vocab_growth)
    timed("new_vs_returning_revenue", Q.q_new_vs_returning_revenue)
    timed("lag_features", Q.q_lag_features)
    timed("supplier_spread", Q.q_supplier_spread)
    timed("region_share", Q.q_region_share)
    timed("order_lifecycle", Q.q_order_lifecycle)
    timed("type_overlap_matrix", Q.q_type_overlap_matrix)
    timed("threshold_sweep", Q.q_threshold_sweep)
    timed("dup_distance", Q.q_dup_distance)
    timed("discount_by_qty", Q.q_discount_by_qty)
    timed("price_dispersion_parts", Q.q_price_dispersion_parts)
    timed("gmd_prices", Q.q_gmd_prices)
    timed("best_window_revenue", Q.q_best_window_revenue)
    timed("sorted_neighborhood_pairs", Q.q_sorted_neighborhood_pairs)
    timed("degree_assortativity", Q.q_degree_assortativity)
    timed("runs_test", Q.q_runs_test)
    timed("stationary_types", Q.q_stationary_types)
    timed("pmi_collocations", Q.q_pmi_collocations)
    timed("durbin_watson", Q.q_durbin_watson)
    timed("kendall_tau_grid", Q.q_kendall_tau_grid)
    timed("ewma_daily", Q.q_ewma_daily)
    timed("queue_waits", Q.q_queue_waits)
    timed("haar_energy", Q.q_haar_energy)
    timed("fk_orphans", Q.q_fk_orphans)
    timed("huffman_code_lengths", Q.q_huffman_code_lengths)
    timed("k_core_brands", Q.q_k_core_brands)
    timed("turning_points_test", Q.q_turning_points_test)
    timed("ordinal_patterns", Q.q_ordinal_patterns)
    timed("rich_club", Q.q_rich_club)
    timed("cohens_kappa", Q.q_cohens_kappa)
    timed("wilson_lower_bound", Q.q_wilson_lower_bound)
    timed("eigencentrality_brands", Q.q_eigencentrality_brands)
    timed("rescaled_range_daily", Q.q_rescaled_range_daily)
    timed("delta_bits_audit", Q.q_delta_bits_audit)
    timed("bellman_ford_brands", Q.q_bellman_ford_brands)
    timed("digit_run_stats", Q.q_digit_run_stats)
    timed("abc_xyz_matrix", Q.q_abc_xyz_matrix)
    timed("linear_attribution", Q.q_linear_attribution)
    timed("max_concurrency_users", Q.q_max_concurrency_users)
    timed("holt_trend", Q.q_holt_trend)
    timed("anova_dow", Q.q_anova_dow)
    timed("burstiness_classes", Q.q_burstiness_classes)
    timed("letter_freq_by_lang", Q.q_letter_freq_by_lang)
    timed("funnel_path_counts", Q.q_funnel_path_counts)
    timed("zipf_fit", Q.q_zipf_fit)
    timed("simpson_concentration", Q.q_simpson_concentration)
    timed("capture_recapture_users", Q.q_capture_recapture_users)
    timed("bucket_collision_audit", Q.q_bucket_collision_audit)
    timed("graph_diameter_sweep", Q.q_graph_diameter_sweep)
    timed("sentence_length_hist", Q.q_sentence_length_hist)
    timed("embedding_dim_moments", Q.q_embedding_dim_moments)
    timed("l_diversity_audit", Q.q_l_diversity_audit)
    timed("wilcoxon_weekend", Q.q_wilcoxon_weekend)
    timed("markov_entropy_rate", Q.q_markov_entropy_rate)
    timed("type_covisitation", Q.q_type_covisitation)
    timed("line_inversions", Q.q_line_inversions)
    timed("two_hop_reach_brands", Q.q_two_hop_reach_brands)
    timed("nonascii_stats", Q.q_nonascii_stats)
    timed("quadrant_counts", Q.q_quadrant_counts)
    timed("abc_migration", Q.q_abc_migration)
    timed("giant_component_brands", Q.q_giant_component_brands)
    timed("nchars_integrity", Q.q_nchars_integrity)
    timed("p_chart_weeks", Q.q_p_chart_weeks)
    timed("rate_shift_halves", Q.q_rate_shift_halves)
    timed("part_introduction_curve", Q.q_part_introduction_curve)
    timed("mood_median_test", Q.q_mood_median_test)
    timed("cronbach_alpha_embeddings", Q.q_cronbach_alpha_embeddings)
    timed("freshness_audit", Q.q_freshness_audit)
    timed("mcc_by_lang", Q.q_mcc_by_lang)
    timed("grubbs_daily", Q.q_grubbs_daily)
    timed("tail_ratio_types", Q.q_tail_ratio_types)
    timed("first_day_share", Q.q_first_day_share)
    timed("precedence_matrix", Q.q_precedence_matrix)
    timed("zero_inflation_types", Q.q_zero_inflation_types)
    timed("heaps_fit", Q.q_heaps_fit)
    timed("dup_rate_by_length", Q.q_dup_rate_by_length)
    timed("zero_revenue_runs", Q.q_zero_revenue_runs)
    timed("chow_test_daily", Q.q_chow_test_daily)
    timed("mi_type_dow", Q.q_mi_type_dow)
    timed("forecast_accuracy", Q.q_forecast_accuracy)
    timed("segment_priority_lift", Q.q_segment_priority_lift)
    timed("first_value_ltv_matrix", Q.q_first_value_ltv_matrix)
    timed("priority_runs", Q.q_priority_runs)
    timed("quantization_residual_hist", Q.q_quantization_residual_hist)
    timed("stopword_mass_curve", Q.q_stopword_mass_curve)
    timed("df_band_histogram", Q.q_df_band_histogram)
    timed("lang_mixing_histogram", Q.q_lang_mixing_histogram)
    timed("props_value_regression", Q.q_props_value_regression)
    timed("max_order_share_bands", Q.q_max_order_share_bands)
    timed("yule_k_by_lang", Q.q_yule_k_by_lang)
    timed("trade_matrix", Q.q_trade_matrix)
    timed("kruskal_wallis_qty", Q.q_kruskal_wallis_qty)
    timed("quality_dup_calibration", Q.q_quality_dup_calibration)
    timed("neyman_allocation", Q.q_neyman_allocation)
    timed("compaction_plan", Q.q_compaction_plan)
    timed("rp_norm_preservation", Q.q_rp_norm_preservation)
    timed("token_bucket_drops", Q.q_token_bucket_drops)
    timed("interarrival_exp_fit", Q.q_interarrival_exp_fit)
    timed("seasonal_decompose_daily", Q.q_seasonal_decompose_daily)
    timed("knee_point_ltv", Q.q_knee_point_ltv)
    timed("lttb_downsample", Q.q_lttb_downsample)
    timed("mann_kendall_trend", Q.q_mann_kendall_trend)
    timed("periodogram_power", Q.q_periodogram_power)
    timed("pca_topvec", Q.q_pca_topvec)
    timed("lis_weekly", Q.q_lis_weekly)
    timed("valley_capacity", Q.q_valley_capacity)
    timed("next_higher_day", Q.q_next_higher_day)
    timed("ndcg_weekly_brands", Q.q_ndcg_weekly_brands)
    timed("encoding_stats", Q.q_encoding_stats)
    timed("luhn_audit", Q.q_luhn_audit)
    timed("gumbel_monthly_max", Q.q_gumbel_monthly_max)
    timed("circular_hour_stats", Q.q_circular_hour_stats)
    timed("procurement_auction", Q.q_procurement_auction)
    timed("trigram_branching", Q.q_trigram_branching)
    timed("sax_words", Q.q_sax_words)
    timed("hodges_lehmann_rate", Q.q_hodges_lehmann_rate)
    timed("ljung_box_daily", Q.q_ljung_box_daily)
    timed("lang_term_cosine", Q.q_lang_term_cosine)
    timed("median_polish_dow_week", Q.q_median_polish_dow_week)
    timed("cramers_v_type_dow", Q.q_cramers_v_type_dow)
    timed("term_burstiness", Q.q_term_burstiness)
    timed("gershgorin_brands", Q.q_gershgorin_brands)
    timed("cuped_adjustment", Q.q_cuped_adjustment)
    timed("modularity_brands", Q.q_modularity_brands)
    timed("binary_segmentation_daily", Q.q_binary_segmentation_daily)
    timed("good_turing_terms", Q.q_good_turing_terms)
    timed("hill_tail_users", Q.q_hill_tail_users)
    timed("welch_t_weekend", Q.q_welch_t_weekend)
    timed("seasonal_hw_daily", Q.q_seasonal_hw_daily)
    timed("negbin_fit_users", Q.q_negbin_fit_users)
    timed("kpss_eta_daily", Q.q_kpss_eta_daily)
    timed("component_sweep_brands", Q.q_component_sweep_brands)
    timed("rsi_daily", Q.q_rsi_daily)
    timed("hellinger_hour_terms", Q.q_hellinger_hour_terms)
    timed("pietra_rate", Q.q_pietra_rate)
    timed("length_bias_wait", Q.q_length_bias_wait)
    timed("embedding_dim_corr", Q.q_embedding_dim_corr)
    timed("gini_split_dow", Q.q_gini_split_dow)
    timed("skipgram_type_pairs", Q.q_skipgram_type_pairs)
    timed("harmonic_centrality_brands", Q.q_harmonic_centrality_brands)
    timed("source_bit_profile", Q.q_source_bit_profile)
    timed("pareto_qq_users", Q.q_pareto_qq_users)
    timed("split_half_reliability", Q.q_split_half_reliability)
    timed("shift_share_nations", Q.q_shift_share_nations)
    timed("odds_ratio_weekend_purchase", Q.q_odds_ratio_weekend_purchase)
    timed("term_doc_lift", Q.q_term_doc_lift)
    timed("nation_dow_cosine", Q.q_nation_dow_cosine)
    timed("rbo_weekly_brands", Q.q_rbo_weekly_brands)
    timed("theil_u2_seasonal", Q.q_theil_u2_seasonal)
    timed("ess_daily", Q.q_ess_daily)
    timed("qte_weekend", Q.q_qte_weekend)
    timed("mantel_haenszel_or", Q.q_mantel_haenszel_or)
    timed("coverage_time_nations", Q.q_coverage_time_nations)
    timed("pooling_benefit_nations", Q.q_pooling_benefit_nations)
    timed("bullwhip_ratio", Q.q_bullwhip_ratio)
    timed("newsvendor_nations", Q.q_newsvendor_nations)
    timed("vocab_turnover_halves", Q.q_vocab_turnover_halves)
    timed("lindley_waits", Q.q_lindley_waits)
    timed("cronbach_alpha_dow", Q.q_cronbach_alpha_dow)
    timed("underwater_duration", Q.q_underwater_duration)
    timed("ltv_decile_persistence", Q.q_ltv_decile_persistence)
    timed("vocab_containment_sources", Q.q_vocab_containment_sources)
    timed("km_curve_users", Q.q_km_curve_users)
    timed("newey_west_daily", Q.q_newey_west_daily)
    timed("variance_changepoint_daily", Q.q_variance_changepoint_daily)
    timed("leader_reigns", Q.q_leader_reigns)
    timed("subsample_stability", Q.q_subsample_stability)
    timed("bowley_skew_rate", Q.q_bowley_skew_rate)
    timed("xmr_chart_daily", Q.q_xmr_chart_daily)
    timed("theil_l_nations", Q.q_theil_l_nations)
    timed("pages_tile_topk", lambda d: densest_tiles(
        parsed_features(pages).map_batches(lambda b: b.filter(b["ok"]),
                                           batch_format="pyarrow"),
        zooms=(6,), top=20))

    result = {
        "metric": "flagship pages->extract->mine->parse->join->write sec "
                  "(+ per-query sec)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "n_pages": n_pages,
        "n_geom_rows": int(n_geoms),
        "pages_per_sec": round(n_pages / headline, 1),
        "geoms_per_sec": round(int(n_geoms) / headline, 1),
    }
    ray.shutdown()
    return result


def run_child(ncpu: int, extra=()) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *extra],
        env=env, capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def burn_eff(width: int, tasks: int = 16, iters: int = 4_000_000) -> float:
    """Fixed-work CPU burn efficiency at ``width`` vs 1-wide — the
    tenancy probe BASELINE.md's protocol requires around every scaling
    read (effective cores drift on ~minute timescales; a reading
    without its burn context is uninterpretable)."""
    from concurrent.futures import ProcessPoolExecutor

    def run(w, t):
        t0 = time.time()
        with ProcessPoolExecutor(w) as ex:
            list(ex.map(_burn_task, [iters] * t))
        return time.time() - t0

    per1 = run(1, 8) / 8
    return round(per1 * tasks / width / run(width, tasks), 2)


def _burn_task(n):
    s = 0
    for i in range(n):
        s += i * i
    return s


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling-child" in sys.argv:
        print(json.dumps(run_scaling_child(sf_dir, ncpu)))
        return
    if "--scaling" in sys.argv:
        lo = int(os.environ.get("RAY_GRAFT_CPUS_LO", "2"))
        hi = int(os.environ.get("RAY_GRAFT_CPUS_HI", "8"))
        # pre-generate the 4x input at full width so the low-CPU child
        # doesn't pay generation (it's cached input, not measured work)
        import ray

        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        from ocaml_geojson_ray.sources.pages import materialize_pages_parquet
        from ocaml_geojson_ray.sources.polygons import generate_polygon_layer

        materialize_pages_parquet(
            sf_of(sf_dir) * float(os.environ.get("GRAFT_SCALE_MULT", "8")),
            root="/tmp/ogr_data")
        generate_polygon_layer(sf_of(sf_dir), root="/tmp/ogr_data")
        ray.shutdown()
        # Host tenancy drifts on ~minutes timescales (BASELINE.md
        # hardware note: a squeezed child can mis-read one LEVEL while
        # the other is normal). Interleave the levels twice — lo, hi,
        # lo, hi — and take the best throughput PER LEVEL: a transient
        # squeeze then costs one child, not the ratio. All runs are
        # reported so the noise band stays visible.
        rounds = int(os.environ.get("GRAFT_SCALE_ROUNDS", "2"))
        # burn BOTH levels immediately before the run — the protocol's
        # tenancy context, now part of the record itself
        burn_lo, burn_hi = burn_eff(lo), burn_eff(hi)
        runs_lo, runs_hi = [], []
        for _ in range(rounds):
            runs_lo.append(run_child(lo, ("--scaling-child",)))
            runs_hi.append(run_child(hi, ("--scaling-child",)))
        r_lo = max(runs_lo, key=lambda r: r["pages_per_sec"])
        r_hi = max(runs_hi, key=lambda r: r["pages_per_sec"])
        tp_lo = r_lo["pages_per_sec"]
        tp_hi = r_hi["pages_per_sec"]
        eff = (tp_hi / tp_lo) / (hi / lo)
        print(json.dumps({
            "metric": "scaling efficiency (pages/s ratio vs cpu ratio)",
            "value": round(eff, 3),
            "unit": "efficiency",
            "sf": sf_of(sf_dir),
            "cpus_lo": lo, "cpus_hi": hi,
            "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
            "pages_per_sec_lo": tp_lo, "pages_per_sec_hi": tp_hi,
            "all_runs_lo": [r["pages_per_sec"] for r in runs_lo],
            "all_runs_hi": [r["pages_per_sec"] for r in runs_hi],
            "burn_eff_lo": burn_lo, "burn_eff_hi": burn_hi,
            "n_pages": r_lo["n_pages"],
        }))
        return
    print(json.dumps(run_bench(sf_dir, ncpu)))


if __name__ == "__main__":
    main()
