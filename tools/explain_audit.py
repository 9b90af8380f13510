#!/usr/bin/env python
"""Write EXPLAIN.md: formatted physical plans + the scale-relevant
evidence (pushed filters, pruned read schemas, broadcast joins,
whole-stage-codegen spans, exchange counts) for the flagship queries.

Run: python tools/explain_audit.py  [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AUDIT = [
    "scan_project_filter",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "topk_orders",
    "native_filter_project",
    "window_topk_per_group",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_substring_spans",
    "skew_salted_agg",
    "asof_join_events_orders",
    "asof_join_window",
    "join_bucketed_colocated",
    "kmeans_embeddings",
    "decontaminate_ngram",
    "bm25_topk",
    "pack_sequences",
    "sim_topk_pq",
    "shard_assignment",
    "sample_mixture_temperature",
    "pipeline_end_to_end",
    "text_pii_scrub",
    "hybrid_search_rrf",
    "text_chunking",
    "profile_lineitem",
    "zorder_layout",
    # round-7 late additions
    "sample_weighted_priority",
    "tfidf_cosine_topk",
    "text_quality_classifier",
    "pagerank_user_cooccurrence",
    "events_window_funnel",
    "events_retention_cohorts",
    "events_sequence_match",
    "events_replacing_merge",
    "native_hive_partition_scan",
    "native_block_skip_scan",
    "join_bloom_prefilter",
    "join_salted_skew",
    "rag_pipeline_topk",
    "dq_audit_checks",
    "merge_upsert_customers",
    "events_gap_fill_locf",
    "asof_join_forward_tolerance",
    "weighted_percentiles_price",
    "agg_state_merge",
    # round-8 additions
    "multimodal_real_decode",
    "events_heavy_hitters",
    "sample_domain_cap",
    "sim_topk_int8",
    "sim_int8_recall",
    "events_summing_merge",
    "group_with_totals",
    "events_sequence_count",
    "events_histogram",
    "join_time_window_binned",
    "events_delta_sum",
    "events_heavy_hitters_weighted",
    "text_ngram_vocab",
    "asof_join_nearest_tolerance",
    # round-9 additions
    "dedup_substring_spans_twophase",
    "text_bpe_merge_stats",
    "multimodal_audio_decode",
    "events_limit_by",
    "docs_left_array_join",
    "dict_get_region",
    "events_sum_map",
    "agg_sum_array_combinator",
    "events_topk_values",
    "events_minmax_map",
    "events_running_difference",
    # round-9 late-tranche additions (interval analytics + compat)
    "events_max_intersections",
    "events_interval_length_sum",
    "events_sequence_next_node",
    "events_moving_sum",
    "events_exp_moving_avg",
    "events_lttb_downsample",
    "events_max_intersections_twophase",
    "join_paste_leaderboards",
    "events_bounding_ratio",
    "agg_avg_weighted",
    "window_qualify_topn",
    "scan_remote_rowbinary_nested",
    # SQL-parity conformance forms (defaults are the fast plans since r11)
    "kmeans_embeddings_sql",
    "sim_topk_pq_sql",
    # round-11 additions
    "native_bloom_skip_scan",
    "mutation_delete_update_hive",
    "mutation_ttl_rollup_hive",
    "text_ngram_distance_sql",
    "text_unicode_normalize_dedup",
    # round-5 grading-window additions not already audited above
    "dedup_incremental",
    "dedup_semantic_clusters",
    "sim_ann_recall",
    "media_phash_pairs",
    "select_importance_target",
    "sample_stratified",
    "window_lag_lead",
    "window_ntile_percent",
    "window_time_range_frame",
    "approx_percentile_bounded",
    "argminmax_orders",
    "bitwise_aggregates",
    "collect_sorted_arrays",
    "moments_totalprice",
    "corr_qty_price",
    "filtered_aggregates",
    "stringagg_rich_customers",
    "q4_order_priority",
    "q8_market_share",
    "q11_important_stock",
    "q12_priority_lines",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier",
    "q17_small_quantity",
    "q19_discounted_revenue",
    "q20_promo_suppliers",
    "q21_waiting_supplier",
    "q22_sales_opportunity",
    # r10 additions
    "scan_remote_arrowstream",
    "scan_remote_parquet",
    "native_sql_using_view",
    "events_with_fill_step",
    "events_sequence_match_timed",
    "select_except_modifier",
    "text_ngram_distance",
    "array_cumsum_difference",
    "stats_mann_whitney_u",
    "stats_ks_distance",
    "stats_welch_ttest",
    "approx_hll_union_merge",
    "dedup_substring_spans_window",
    "events_max_intersections_window",
    # r10 tranche-3 additions
    "stats_simple_linreg",
    "agg_entropy_events",
    "agg_sum_foreach",
    "events_group_bitmap",
    "scalar_url_funcs",
    "tf_numbers_range",
    "native_prewhere_scan",
    "text_ngram_search",
    "scan_remote_pushdown_filter",
    "dedup_line_level",
    "events_limit_by_offset",
    "dict_hierarchy_nation",
    "join_any_left",
    "scalar_geo_funcs",
    "docs_array_enumerate_uniq",
    "window_value_functions",
    "scalar_bit_funcs",
    "native_projection_agg",
    "optimize_table_dedup",
    "native_columns_info",
    "text_multi_search",
    "array_set_functions",
    "scalar_encoding_funcs",
    "scalar_ip_funcs",
    "events_cumulative_uniques",
    "mutation_ttl_rollup",
    "events_window_funnel_strict",
    "stats_student_ttest",
    "scalar_transform_func",
    "stats_cramers_v",
    "stats_roc_auc",
    "stats_spearman_corr",
    "mutation_attach_parts",
    "scalar_vector_funcs",
    "quantile_exact_multi",
    "native_sql_insert_into",
    "scalar_format_datetime",
    "scalar_parse_datetime",
    "scalar_date_arithmetic",
    "multimodal_png_decode",
    "multimodal_gif_decode",
    # round-12 additions
    "events_collapsing_merge",
    "events_collapsing_versioned",
    "agg_sum_resample",
    "events_with_fill_interpolate",
    "approx_theta_setops",
    "cte_recursive_calendar",
    "cte_recursive_calendar_sql",
    "native_nested_scan",
    "native_int128_scan",
    "native_json_scan",
    "stats_mad_outliers",
    "stats_benford_digits",
    "sim_matryoshka_topk",
    "native_set_skip_scan",
    "mutation_lightweight_delete",
    "native_trivial_count",
    "mutation_schema_evolution",
    "native_projection_sort",
    "events_nonneg_derivative",
    "agg_sparkbar_hours",
    "stats_two_proportion_z",
    "stream_collapsing_merge",
    "scan_remote_jsonobjects",
    "agg_combinator_matrix",
    # round-12 late-session additions
    "events_retention_matrix",
    "stats_theils_u",
    "stats_anova_f",
    "scalar_format_readable",
    "dict_range_lookup",
    "text_readability",
    "sim_topk_binary",
    "sim_binary_recall",
    "sim_cascade_topk",
    "scan_remote_values",
    "scan_remote_cluster",
    "native_tokenbf_skip_scan",
    "tf_merge_tables",
    "stream_retention",
    "select_replace_modifier",
    "select_columns_apply",
    "scan_remote_tskv",
    "stream_scan_remote_cursor",
    "sim_ann_partition_pruned",
    "query_cache_roundtrip",
    "mutation_column_ttl",
    "mutation_materialize_column",
    "scan_cluster_colocated_join",
    "optimize_dedupe_by",
    "backup_restore_roundtrip",
    "catalog_exchange_tables",
    "scalar_string_pad_split",
    "agg_group_uniq_array",
    "array_fold_has_ops",
    "stats_mean_ztest",
    "quantile_timing_grid",
    "agg_categorical_iv",
    "tf_numbers_lcg",
    "scan_remote_orc",
    "scan_remote_npy",
    "native_sample_clause",
    "dict_complex_key_lookup",
    "agg_group_array_insert_at",
    "agg_summap_filtered",
    "quantile_deterministic",
    "scan_cluster_global_in",
    "stream_quantile_timing",
    "topk_with_ties",
    "events_running_concurrency",
    "array_rotate_shingles",
    "scalar_time_slots",
    "native_into_outfile",
    "window_lag_in_frame",
    "scalar_json_extract_family",
    "array_join_multi",
    "catalog_row_policy",
    "native_describe_table",
    "optimize_compact_hive",
    "mutation_freeze_partition",
    "catalog_check_table",
    "stream_time_slots",
    "dedup_url_canonical",
    # round-15 additions (compressed reads, s3(), Dynamic)
    "tf_file_compressed_scan",
    "tf_url_compressed_scan",
    "tf_s3_scan",
    "native_dynamic_scan",
    "tf_s3_insert_roundtrip",
    "tf_file_archive_scan",
    "tf_file_union_schema_scan",
    # round-15 fourth tranche (agg states, raw-text/JSON formats,
    # generated relations, external stores, Avro)
    "native_aggstate_scan",
    "tf_file_lineasstring_scan",
    "tf_file_regexp_scan",
    "tf_file_ndjson_infer_scan",
    "tf_numbers_offset_step",
    "tf_sqlite_scan",
    "tf_deltalake_scan",
    "tf_file_avro_roundtrip",
    "tf_iceberg_scan",
]


def evidence(plan: str) -> list[str]:
    from collections import Counter

    out = []
    pushed = sorted(set(re.findall(r"PushedFilters: \[[^\]]*\]", plan)))
    for p in pushed:
        if p != "PushedFilters: []":
            out.append(p)
    for m in sorted(set(re.findall(r"ReadSchema: struct<[^>]*>", plan))):
        out.append(m if len(m) < 180 else m[:177] + "...")
    # count operators from the formatted plan's detail headers
    # ("(N) OperatorName") — each physical operator appears exactly once
    # there; a raw substring count would double-count (tree + details)
    ops = Counter(re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, re.M))
    n_bhj = ops["BroadcastHashJoin"]
    n_smj = ops["SortMergeJoin"]
    n_shj = ops["ShuffledHashJoin"]
    if n_bhj or n_smj or n_shj:
        out.append(f"joins: {n_bhj} broadcast, {n_smj} sort-merge, {n_shj} shuffled-hash")
    n_shuffle = ops["Exchange"]
    n_bcast = ops["BroadcastExchange"]
    out.append(f"exchanges: {n_shuffle} shuffle, {n_bcast} broadcast")
    ids = set(re.findall(r"codegen id : (\d+)", plan))
    out.append(f"whole-stage-codegen spans: {len(ids)}")
    if "TakeOrderedAndProject" in plan:
        out.append("top-k planned as TakeOrderedAndProject (no full sort)")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from duckdb_extension_clickhouse_native_spark import get_spark
    import __spark_entry__  # noqa: F401 - populates REGISTRY
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    spark = get_spark(app_name="explain-audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# EXPLAIN audit — physical-plan evidence for the scale claims",
        "",
        f"Generated by `tools/explain_audit.py` at sf dir `{sf_dir}`.",
        "For each flagship query: the pushdown/broadcast/codegen facts a",
        "reviewer would check, then the full formatted plan.",
        "",
    ]
    allq = REGISTRY.all()
    for name in AUDIT:
        df = allq[name].build(spark, sf_dir)
        # AQE wraps the plan in AdaptiveSparkPlan(isFinalPlan=false) with
        # no codegen annotations until execution; snapshot the static
        # plan (physical planning happens at explain time, after this
        # conf flip) so codegen spans are visible
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        lines.append(f"## {name}")
        lines.append("")
        for e in evidence(plan):
            lines.append(f"- `{e}`")
        lines.append("")
        lines.append("<details><summary>formatted plan</summary>")
        lines.append("")
        lines.append("```")
        lines.append(plan.strip())
        lines.append("```")
        lines.append("</details>")
        lines.append("")
    with open(os.path.join(REPO, "EXPLAIN.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"wrote EXPLAIN.md ({len(AUDIT)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
