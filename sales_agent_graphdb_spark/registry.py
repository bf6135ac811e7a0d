"""Query registry: one entry per implemented operator (SURVEY.md §2).

Each query is registered with a Spark callable ``(spark, sf_dir) ->
DataFrame`` and, when SQL-expressible, a DuckDB oracle SQL string over
the same parquet tables. The driver compares row-count + schema +
order-insensitive value-hash, so every computed column is aliased
identically on both sides and floating aggregates go through exact
DECIMAL arithmetic before a final cast to double (summation order then
cannot change the result).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


# Driver-budget ordering. The per-round correctness driver iterates the
# queries() dict in insertion order and stops after a fixed budget
# (rounds 1 and 2 each recorded exactly the first 50 entries). So
# iteration order IS the verification schedule: names in _PRIORITY run
# first (newly-oracled queries and new operators that need their first
# driver row), then every query that still has no green driver row, and
# already-hash-verified names run last — they only re-check if the
# round's budget allows.
_PRIORITY: list[str] = [
    # Round 6: the four rows-only ANN perf twins gained verdict/equality
    # oracles this round (VERDICT r05 #1) — pin them first so the driver
    # records their first hash-green row instead of err:no_oracle.
    "ann_lsh_topk", "ann_ivf_topk",
    "ann_lsh_pruned_topk", "ann_ivf_pruned_topk",
    "dedup_minhash_lsh", "dedup_simhash",
    "dedup_incremental_minhash", "dedup_cluster_canonical",
    # Round 6: new operators needing their first driver row.
    "sql_api_window_topn", "sql_api_exists_in",
    "sql_api_having", "sql_api_cte_rank",
    "s8c_stream_restart_resume", "graph_k_core_fixpoint",
    "dq_drift_chi_square", "join_salted_hot_keys",
    "s14_corrupt_quarantine", "agg_equidepth_histogram",
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items", "tpch_q18_large_volume_customer",
    "st_stream_scd2_enrich",
    "f16_variant_semistructured", "udtf_ngram_expand",
    "s15_api_sink_roundtrip", "sql_api_parameterized",
    "tpch_q4_order_priority", "sql_api_recursive_reachability",
    # Round 6: w5 rewritten (exact distributed ntile, same oracle) —
    # re-earn its green on the new plan.
    "w5_ntile_buckets",
]

# Queries the driver has hash-verified (rows+schema+value-hash green) in
# CORRECTNESS_r01..r04. These run LAST so the budget reaches
# never-checked queries first.
_VERIFIED: frozenset[str] = frozenset({
    # --- green in CORRECTNESS_r05 (46/46 verifiable rows green; all 22
    # new r05 queries non-vacuous) ---
    "agg_mode_per_group", "ann_hard_negatives", "vec_quantize_int8",
    "ann_index_incremental_upsert", "ann_ivf_index_incremental",
    "sample_quality_bins", "corpus_shuffle_epoch",
    "dedup_repeated_passages", "w9_cumulative_distinct_users",
    "graph_label_propagation", "graph_k_core", "mm_resize_plan",
    "m8_cdc_apply", "sql_api_revenue_by_nation", "o5_keyset_pagination",
    "set_ops_bag_semantics", "s13_compact_small_files",
    "ts_downsample_ohlc", "ts_ewma_per_user", "asof_join_nearest",
    "s8b_api_stream_ingest", "st_stream_ewma_exec",
    # --- green in CORRECTNESS_r04 (all 50 rows green; basket_pair_counts
    # re-earned its row NON-vacuously: 1000 rows on both engines) ---
    "basket_pair_counts", "sample_weighted_hash", "dedup_semantic_cell",
    "split_leakage_safe", "rollup_hierarchy", "feature_winsorize",
    "feature_correlation", "graph_triangle_count", "graph_shortest_paths",
    "m6_scd2_history", "m7_table_diff", "data_quality_report",
    "sample_group_topk", "text_tfidf_keywords", "agg_countmin_portable",
    "vec_centroid_per_label", "agg_hll_rollup", "join_runtime_prefilter",
    "join_fuzzy_blocked", "s11_xml_roundtrip", "s12_zorder_pruning",
    "s8_api_source_ingest", "ts_gap_fill_locf", "join_scd2_asof",
    "range_join_grid_bucketed", "range_join_interval_overlap",
    "text_bm25_phrase", "text_vocab_build",
    "w7b_running_sum_single_exchange", "w8_time_range_frame",
    "anomaly_rolling_zscore", "st_stream_dedup",
    "st_stream_interval_join_outer", "st_stream_user_profile",
    "st_stream_static_enrich", "st_stream_sliding_exec",
    # --- green in CORRECTNESS_r03 ---
    "j2_order_items_nested", "pct_approx_value", "dedup_embedding_lsh",
    "dedup_incremental_minhash_portable", "dedup_cluster_canonical_portable",
    "ann_ivf_pruned_portable", "agg_approx_distinct",
    "ann_lsh_pruned_portable", "agg_grouping_sets", "v8_embedding_qc",
    "corpus_token_budget_pack", "dedup_containment", "p4_conjunctive_ilike",
    "p6_isin_status", "p7_compound_key", "p9_client_search_filter",
    "p10_validity_filter", "o1_orderby_desc", "o2_two_key_sort",
    "o4_topk_by_score", "set_union_sources", "set_intersect_except",
    "f2_f3_price_and_surrogate", "f4_f5_dates_numbers", "f6_f8_f9_text_kit",
    "f12_f13_json_coalesce", "f14_f15_validation",
    "s1_s2_csv_roundtrip_scraper_dialect", "s1_s2_csv_roundtrip_golden_dialect",
    "s3_s4_json_envelope_roundtrip", "s10_sorted_scan_pruning",
    "asof_join_last_purchase", "range_join_value_bands", "pct_exact_disc",
    "text_token_count", "text_bpe_token_estimate", "text_quality_score",
    "text_langid", "text_fingerprint", "f11_chunk_documents",
    "text_gopher_repetition", "w1_last6_per_session", "w2_running_sum",
    "w3_topn_per_group", "w4_lag_delta", "w5_ntile_buckets",
    "w7_global_running_sum", "st_stream_tumbling_exec",
    "st_stream_stateful_sessions",
    # --- green in CORRECTNESS_r02 ---
    "graph_pagerank", "p11_result_validity", "ingest_invalidate_pipeline",
    "mm_arrow_fidelity_probe", "text_boilerplate_ngrams", "text_pii_scrub",
    "pipeline_curate_corpus", "text_bm25_search",
    "decontaminate_ngram_overlap", "sample_stratified_hash",
    "corpus_mix_weights", "s9b_orc_roundtrip", "st_stream_interval_join",
    "join_salted_skew", "join_bucketed_collocated", "w6_rank_distributions",
    "s9c_schema_evolution", "graph_brand_projection",
    "st_stream_sessions_complete", "incremental_agg_maintenance",
    "st_stream_foreachbatch_upsert", "agg_pivot_unpivot",
    "funnel_conversion", "retention_cohorts", "feature_zscore_stats",
    "agg_value_histogram", "dedup_minhash_lsh_portable",
    "dedup_simhash_portable", "ann_lsh_topk_portable",
    "ann_ivf_topk_portable", "m4_guarded_cancel", "m5_register_unique",
    "m2_csv_upsert_preserve", "route_dispatch", "p5_multistage_fallback",
    "nl2plan_category_browse", "nl2plan_fuzzy_name",
    "agent_turn_check_order", "nl2plan_broad_scan",
    "flagship_revenue_by_brand", "s6_graph_scan_limit",
    "p1_point_lookup_sku", "p2_lookup_by_email", "p3_ilike_substring",
    # --- rows-only ran in r02, no oracle by design (portable twins carry
    # the hash check); re-run only after the unverified tail ---
    "ann_lsh_pruned_topk", "ann_ivf_pruned_topk",
    "dedup_incremental_minhash", "dedup_cluster_canonical",
    # --- green in CORRECTNESS_r01 ---
    "a1_order_totals", "a2_count_by_group", "a3_distinct_categories",
    "a4_dedup_last_wins", "a5_dedup_normalized_content", "a6_string_agg",
    "agg_rollup", "agg_cube",
    "v1_knn_cosine_top5", "v2_semantic_cache_probe", "v3_cache_upsert",
    "v6_conditional_format", "v4_deterministic_embed",
    "ann_lsh_topk", "ann_ivf_topk",
    "dedup_exact_hash", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_embedding_cosine",
    "st_tumbling_window", "st_sliding_window", "st_session_window",
    "st_late_data_policy",
    "g6_fulltext_fuzzy", "graph_degrees", "graph_2hop_neighbors",
    "graph_connected_components",
    "v5_ingest_chunk_embed", "s7_html_clean", "v7_wipe_recreate",
    "j1_one_hop_traversal", "p8_graph_category_filter",
    "j2_order_nest_strform", "j3_lookup_join", "j4_validation_join",
    "j5_customer_orders", "j6_semi_join_exists", "j7_anti_join",
    "mm_media_features", "mm_frame_sample", "v4b_batch_embed_pandas",
    "g1_merge_create_only", "g2_merge_overwrite", "g3_detach_delete",
    "m1_product_crud", "m3_stock_decrement",
})


# Slow (multi-second, mostly real Structured-Streaming execs) queries to
# run at the END of the unverified block so a time-budgeted driver checks
# many cheap queries before them. Round 5: all former members earned
# green rows in r04 and moved to _VERIFIED, so this only orders NEW
# slow queries registered this round (add their names here).
_SLOW_TAIL: frozenset[str] = frozenset({
    # r05 streaming execs: multi-micro-batch Python stream source
    # drain; stateful EWMA stream.
    "s8b_api_stream_ingest", "st_stream_ewma_exec",
    # r06: two full stream drains across a checkpoint restart; the
    # per-microbatch SCD2 temporal enrichment drain.
    "s8c_stream_restart_resume", "st_stream_scd2_enrich",
})


def _driver_order(names: list[str]) -> list[str]:
    prio = [n for n in _PRIORITY if n in names]
    rest = [n for n in names if n not in prio]
    unverified = [n for n in rest if n not in _VERIFIED]
    cheap = [n for n in unverified if n not in _SLOW_TAIL]
    slow = [n for n in unverified if n in _SLOW_TAIL]
    verified = [n for n in rest if n in _VERIFIED]
    return [*prio, *cheap, *slow, *verified]


def all_queries() -> dict[str, QuerySpec]:
    # Import query modules lazily so registration happens on first use.
    from sales_agent_graphdb_spark import queries as _q  # noqa: F401

    return {n: _REGISTRY[n] for n in _driver_order(list(_REGISTRY))}


def spark_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
