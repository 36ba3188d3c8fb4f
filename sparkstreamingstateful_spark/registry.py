"""Global query registry — the machine-checkable operator inventory.

Every operator from SURVEY.md §2 registers here as a ``(spark, sf_dir) ->
DataFrame`` callable plus (for H-checked rows) the equivalent DuckDB oracle
SQL. ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Operator modules imported (for registration side effects) by collect().
_MODULES = [
    "sparkstreamingstateful_spark.operators.scans",
    "sparkstreamingstateful_spark.operators.projection",
    "sparkstreamingstateful_spark.operators.joins",
    "sparkstreamingstateful_spark.operators.aggregation",
    "sparkstreamingstateful_spark.operators.windows",
    "sparkstreamingstateful_spark.operators.sortset",
    "sparkstreamingstateful_spark.operators.dfstat",
    "sparkstreamingstateful_spark.operators.nested",
    "sparkstreamingstateful_spark.operators.sqlsurface",
    "sparkstreamingstateful_spark.operators.tpch",
    "sparkstreamingstateful_spark.operators.udfs",
    "sparkstreamingstateful_spark.operators.codecs",
    "sparkstreamingstateful_spark.operators.llm_text",
    "sparkstreamingstateful_spark.operators.llm_vector",
    "sparkstreamingstateful_spark.operators.llm_pipeline",
    "sparkstreamingstateful_spark.operators.graphs",
    "sparkstreamingstateful_spark.operators.llm_quality",
    "sparkstreamingstateful_spark.operators.analytics",
    "sparkstreamingstateful_spark.operators.statistics",
    "sparkstreamingstateful_spark.streaming.queries",
]


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in _QUERIES:
        raise ValueError(f"duplicate query key: {name}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def query(name: str, oracle: str | None = None):
    """Decorator: register a query function, optionally with oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        register(name, fn, oracle)
        return fn

    return deco


# Evidence-priority ordering. The correctness driver checks exactly the
# FIRST 50 registered keys each round (count cap, measured r1/r2), so
# iteration order is the lever that decides which keys get hard oracle
# signal. Round-18 window (VERDICT r17 item 1, followed to the letter):
# (a) the 2 keys NEW in r17 with zero driver evidence (TWS MapState +
# registered-timer readers; builder sim green at sf0.001/0.01/0.1 and
# judge-replica green in r17), then (b) the 4 leftover keys whose
# newest driver evidence is r11, then (c) 44 of the 49-key r12-evidence
# cohort, stalest first by (first-seen round, name). Exactly 50; all H.
_KEY_PRIORITY = [
    # r19 window (VERDICT r17's staleness-rotation design, staged by the
    # r18 build session and executed here): the 5 r12-evidence keys that
    # did not fit the r18 window plus the r13 cohort lead; 51 candidates
    # for 50 slots, so the last r13 key (plus the r14+ cohorts below)
    # leads the r20 window. The 50 keys checked in the r18 window
    # (CORRECTNESS_r18, 50/50 green) moved to the BOTTOM as the freshest
    # evidence. r19's changed keys are output-identical at all SFs
    # (OPTIMIZATION_r19.md), so per the CLAUDE.md rule they yield their
    # slots; stateful_sessionize_tws sits in the window anyway via the
    # r13 cohort.
    "stat_sample_by",
    "text_gopher_quality",
    "text_repetition_ngram",
    "udtf_arrow",
    "write_dynamic_partition_overwrite",
    "agg_approx",
    "seq_packing",
    "text_edit_distance",
    "stateful_sessionize_tws",
    "stream_dedup_watermarked",
    "stream_stream_join_left",
    "stream_topk_per_window",
    "stream_window_chained",
    "agg_bitmap_distinct",
    "agg_grouping_id",
    "array_edit_ops",
    "array_explode_outer",
    "cluster_kmeans_fixed",
    "dedup_containment",
    "dq_expectations",
    "embed_ann_recall",
    "embed_pq_adc_topk",
    "embed_pq_codes",
    "events_downsample_lttb",
    "events_ewma_smooth",
    "events_holt_linear",
    "frame_transpose",
    "graph_triangle_count",
    "join_null_safe",
    "json_construct",
    "multimodal_decode_jpeg",
    "multimodal_decode_png",
    "multimodal_decode_wav",
    "scalar_interval",
    "scalar_regexp",
    "scalar_str_to_map",
    "scalar_string_multi",
    "scan_recursive_glob",
    "set_union_by_name_missing",
    "sql_join_hints",
    "sql_lateral_alias",
    "sql_order_by_all_offset",
    "sql_select_except",
    "sql_unpivot_clause",
    "stat_cov_corr",
    "stream_holt_linear",
    "stream_merge_to_table",
    "text_classifier_score",
    "text_url_filter",
    "udtf_table_arg",
    "window_distinct_rolling",
    "filter_basic",
    "filter_conditional",
    "join_broadcast",
    "join_inner",
    "project_compute",
    "scalar_date",
    "scalar_hash",
    "scalar_string",
    "scan_parquet",
    "scan_projection_pushdown",
    "write_roundtrip",
    "embed_pairwise_label",
    "pipeline_end_to_end",
    "cdc_diff_snapshots",
    "cdc_upsert_latest",
    "dedup_minhash_lsh",
    "events_cohort_retention",
    "events_funnel",
    "events_sessionize_batch",
    "map_in_arrow",
    "multimodal_frame_sample",
    "scd2_intervals",
    "udaf_pandas_window",
    "udf_arrow",
    "unpivot_melt",
    "agg_listagg",
    "json_variant",
    "scalar_try_arithmetic",
    "sql_pipe_syntax",
    "stream_stream_join_full",
    "stream_stream_join_right",
    "udtf_analyze",
    "embed_quantize_int8",
    "events_gap_fill",
    "scalar_collation",
    "scan_xml",
    "scd2_point_in_time_join",
    "sql_tpch_q16like",
    "sql_tpch_q2like",
    "stateful_profile_tws",
    "stateful_running_agg_tws_bootstrap",
    "stream_sink_foreach",
    "stream_sink_to_table",
    "stream_stream_join_semi",
    "stream_union_sources",
    "text_unigram_logprob",
    "generator_functions",
    "graph_shortest_path",
    "sql_distribute_cluster",
    "sql_tablesample",
    "agg_collect",
    "agg_conditional_pivot",
    "agg_cube",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_having",
    "agg_rollup",
    "agg_salted_skew",
    "agg_stats",
    "array_explode",
    "array_ops",
    "distinct_rows",
    "join_anti",
    "join_cross",
    "join_multikey",
    "join_semi",
    "join_theta_range",
    "limit_topk",
    "scalar_cast",
    "scalar_math",
    "set_except",
    "set_except_all",
    "set_intersect",
    "set_intersect_all",
    "set_union_all",
    "set_union_distinct",
    "sort_multi",
    "topk_per_group",
    "window_analytic",
    "window_frame_range",
    "window_frame_rows",
    "window_ranking",
    "cte_query",
    "dedup_near",
    "dedup_ngram_jaccard",
    "embed_centroids",
    "dedup_cluster_cc",
    "events_rollup_cascade",
    "join_bucketed_colocated",
    "multimodal_features",
    "scan_partition_pruning",
    "window_time_range",
    "sql_tpch_q18like",
    "sql_tpch_q7like",
    "scan_state_store",
    "sql_lateral_topk",
    "sql_recursive_cte",
    "events_trend_mann_kendall",
    "text_bpe_encode",
    "text_bpe_train",
    "agg_hash_q1",
    "embed_similarity_topk",
    "map_ops",
    "stateful_dedup_keyed",
    "stateful_running_agg",
    "stateful_sessionize",
    "stream_dedup",
    "stream_static_join",
    "stream_stream_join",
    "stream_text_analysis",
    "stream_window_late_drop",
    "stream_window_session",
    "stream_window_sliding",
    "stream_window_tumbling",
    "subquery_correlated_exists",
    "subquery_in",
    "subquery_scalar",
    "vector_ops",
    "stateful_running_agg_tws",
    "stream_cdc_upsert",
    "agg_hll_sketch",
    "array_hof_predicates",
    "dedup_semantic",
    "events_sessionize_dynamic_gap",
    "observe_metrics",
    "scalar_bitwise",
    "scalar_mask",
    "scan_dynamic_partition_pruning",
    "scan_state_changefeed",
    "scan_state_join_side",
    "scan_state_time_travel",
    "sql_agg_filter",
    "sql_identifier_clause",
    "sql_not_in_null",
    "sql_try_cast",
    "stream_static_join_anti",
    "stream_static_join_left",
    "stream_window_session_dynamic",
    "udf_pandas_iter",
    "window_ignore_nulls",
    "text_tokenize_subword",
    "agg_count_min_sketch",
    "graph_bfs_distance",
    "graph_pagerank_lsh",
    "join_asof_nearest",
    "events_trend_mann_kendall_sig",
    "events_trend_sen_slope",
    "maintenance_rebalance",
    "stat_describe",
    "text_inverted_index",
    "scan_state_metadata",
    "scan_state_tws_variables",
    "events_cusum_changepoint",
    "events_acf",
    "text_collocations_lift",
    "join_asof",
    "sample_seeded",
    "corpus_sample_stratified",
    "dedup_cross_source",
    "dedup_exact",
    "dedup_simhash",
    "doc_chunking",
    "doc_fingerprint",
    "embed_ann_ivf",
    "embed_near_dup",
    "json_extract",
    "map_in_pandas",
    "multimodal_binary",
    "pii_scrub",
    "sql_tpch_q3like",
    "sql_tpch_q5like",
    "text_language_id",
    "text_quality_score",
    "text_stats",
    "text_tokenize_wordcount",
    "udaf_applyInPandas",
    "udf_pandas",
    "udf_python",
    "udtf_python",
    "agg_percentiles",
    "events_resample_1h",
    "sql_parameterized",
    "struct_ops",
    "text_token_count",
    "values_inline",
    "window_distribution",
    "scan_csv",
    "scan_json",
    "scan_text",
    "agg_histogram",
    "codec_avro_container",
    "codec_protobuf_roundtrip",
    "decontaminate_ngram",
    "dedup_semantic_capped",
    "events_interpolate_linear",
    "events_resample_ohlc",
    "join_bloom_runtime_filter",
    "join_range_binned",
    "join_skew_aqe",
    "layout_zorder",
    # -- latest evidence r18 (the r17-item-1 rotation window) --
    "scan_state_tws_map",
    "scan_state_tws_timers",
    "map_hof",
    "multimodal_decode_bmp",
    "stream_codec_protobuf",
    "text_bm25_search",
    "join_full",
    "join_left",
    "join_right",
    "scan_orc",
    "scan_python_datasource",
    "sql_group_by_all",
    "stream_python_datasource",
    "stream_sink_python_datasource",
    "udaf_applyInArrow",
    "write_python_datasource",
    "agg_linear_regression",
    "agg_mode",
    "agg_quantile_sketch",
    "corpus_mix_temperature",
    "dedup_passage",
    "dq_profile",
    "events_anomaly_zscore",
    "events_autocorr_lag1",
    "events_changepoint_meanshift",
    "join_asof_tolerance",
    "maintenance_compact_files",
    "scan_csv_malformed",
    "scan_json_corrupt",
    "scan_parquet_merge_schema",
    "sql_ctas_insert",
    "sql_pivot_clause",
    "sql_tpch_q10like",
    "sql_tpch_q11like",
    "sql_tpch_q12like",
    "sql_tpch_q13like",
    "sql_tpch_q14like",
    "sql_tpch_q15like",
    "sql_tpch_q17like",
    "sql_tpch_q19like",
    "sql_tpch_q20like",
    "sql_tpch_q21like",
    "sql_tpch_q22like",
    "sql_tpch_q4like",
    "sql_tpch_q6like",
    "sql_tpch_q8like",
    "sql_tpch_q9like",
    "stat_approx_quantile",
    "stat_crosstab",
    "stat_freq_items",
]


def _ordered(d: dict) -> dict:
    # Tolerant of priority keys whose module didn't import (incremental
    # milestones — mirrors collect()'s ModuleNotFoundError tolerance);
    # typos in _KEY_PRIORITY are caught by tests/test_inventory.py instead.
    pri = {k: d[k] for k in _KEY_PRIORITY if k in d}
    rest = {k: v for k, v in d.items() if k not in pri}
    return {**pri, **rest}


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Import all operator modules (idempotent) and return the inventory,
    highest-evidence-value keys first (see _KEY_PRIORITY)."""
    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            # Module not built yet (incremental milestones) — skip.
            pass
    return _ordered(_QUERIES), _ordered(_ORACLES)
