"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()``
exposes one callable per implemented operator from SURVEY.md §2 (plus
the beyond-reference LLM-pipeline surface); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each (omitted only for operators whose
results are engine-specific by construction, e.g. approx sketches).

Every module is imported unconditionally: a broken import must fail
loudly here rather than silently shrink the query surface (a
swallowed ImportError would make coverage regressions invisible to
the driver's correctness gate).

``queries()`` is ordered so the driver's per-round correctness gate
(which checks entries in dict order, ~50 per round) certifies the
queries that don't yet have a driver-side CORRECTNESS row. Rounds 1-2
hash-checked 97 distinct queries (CORRECTNESS_r01/r02); round 3 leads
with the two re-fixed round-2 red rows, every query whose code/schema
changed this round, and the full set the driver has never reached
(streaming, source chains, UDFs, q2/q9/q11/q13/q16, corpus/k-means
ops). The ~25 operators newly added in round 3 follow — all pass the
identical oracle locally; whatever misses this round's window is
certified in round 4. Prior-round-green queries keep their standing
rows after that.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fxblue_etl_spark.functions import udfs
from fxblue_etl_spark.operators import (
    cleaning,
    corpusops,
    dedup,
    graph,
    indexing,
    merge,
    ml,
    multimodal,
    quality,
    retrieval,
    similarity,
    skew,
    temporal,
    textops,
    tfidf,
    windows,
)
from fxblue_etl_spark.plans import (
    advanced,
    behavior,
    bucketing,
    corpus,
    dq,
    observability,
    profiling,
    relational,
    runtime_filters,
    sinks,
    stats,
    tpch_extra,
    tpch_more,
    zorder,
)
from fxblue_etl_spark.sources import (
    fxblue_csv,
    jsonl,
    pyds_sink,
    rss_datasource,
    rss_feed,
    xlsx_registry,
)
from fxblue_etl_spark.streaming import pipelines


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.flagship_account_pnl(spark, "/root/testdata/sf0.001")


_MODULES = [
    relational,
    advanced,
    tpch_more,
    corpus,
    cleaning,
    merge,
    windows,
    dedup,
    similarity,
    textops,
    multimodal,
    skew,
    temporal,
    graph,
    fxblue_csv,
    rss_feed,
    rss_datasource,
    pipelines,
    udfs,
    tpch_extra,
    xlsx_registry,
    corpusops,
    ml,
    sinks,
    bucketing,
    quality,
    tfidf,
    jsonl,
    runtime_filters,
    zorder,
    dq,
    behavior,
    indexing,
    observability,
    stats,
    pyds_sink,
    profiling,
    retrieval,
]

#: Queries hash-certified by the driver in round 1 (CORRECTNESS_r01.json):
#: its gate stopped at the 50th entry, so everything after needs a row.
_R01_DRIVER_GREEN = {
    "q3_shipping_priority", "q5_region_revenue", "semi_customers_with_urgent",
    "anti_customers_no_orders", "setop_active_nations", "rollup_returns",
    "cube_order_status", "topk_orders_per_customer", "ranking_variants",
    "running_customer_spend", "lag_lead_order_gaps", "events_json_extract",
    "exact_distinct_and_quantiles", "approx_sketches", "pivot_status_by_priority",
    "q6_selective_agg", "scalar_subquery_above_avg", "exists_suppliers_shipping",
    "grouping_sets_status", "rolling_week_spend", "embedding_norm_stats",
    "hourly_event_load", "q4_priority_late_ship", "q7_nation_volume",
    "q10_returned_items", "q14_promo_revenue", "q18_large_volume_orders",
    "q19_disjunctive_predicates", "q15_top_supplier", "q21_sole_late_supplier",
    "q22_dormant_rich_customers", "q8_market_share", "llm_corpus_prep",
    "t1_numeric_coercion", "t2_timestamp_iso", "t3_custom_ts_roundtrip",
    "t4_percent_parse", "t5_sentinel_null", "t6_string_extract",
    "t7_hash_dedup", "p1_p4_rename_project", "p3_null_defaults",
    "f2_f3_record_filters", "csv_normalize_pipeline", "merge_k1_preserve",
    "merge_k2_clobber", "merge_k3_metadata", "d3_last_write_wins",
}


#: queries added in round 4, appended to the gate head as they land
_R4_NEW: list[str] = [
    "dsir_importance_stats",
    "lm_doc_perplexity",
    "split_decontaminate",
    "canonical_doc_selection",
    "ivf_multiprobe_topk",
    "embedding_moment_stats",
    "pyds_manifest_reader_roundtrip",
    "token_frequency_spectrum",
    "gdpr_delete_propagation",
    "schema_evolution_roundtrip",
    "streaming_dlq_split",
    "streaming_static_enrich",
    "hll_accuracy_check",
    "dedup_pagerank",
    "benford_first_digit",
    "approx_quantile_contract",
    "pareto_frontier_parts",
    "embedding_gram_matrix",
    "perplexity_bucket_cutoffs",
    "tokenizer_fertility",
    "weighted_priority_sample",
    "streaming_cdc_scd2",
    "streaming_windowed_topk",
    "pq_encode",
    "pq_adc_topk",
    "lateral_topk_per_nation",
    "recursive_dup_reachability",
    "asof_tolerance_view",
    "corpus_snapshot_diff",
    "bpe_merge_topk",
    "freq_items_contract",
    "setop_multiset_priorities",
    "attribution_first_last",
    "arrow_grouped_value_stats",
    "langid_confusion",
    "quality_lm_calibration",
    "hll_per_group_contract",
    "cross_split_lm_eval",
    "media_frame_schedule",
    "media_dedup_exact",
    "temperature_sweep",
    "pyds_stream_sink_roundtrip",
    "corrupt_file_tolerant_read",
    "pandas_api_lang_stats",
    "corpus_release_manifest",
    "session_window_native",
    "shuffle_hash_segment_revenue",
    "knn_label_eval",
    "udtf_null_profile",
    "streaming_interval_join_outer",
    "ann_recall_report",
    "jl_sign_projection",
    "token_pmi_topk",
    "decimal_money_totals",
    "parquet_agg_pushdown_stats",
    "tz_local_day_rollup",
    "quality_feature_matrix",
    "csv_multiline_roundtrip",
    "streaming_lsh_dedup",
    "sql_udf_percent_parse",
    "collated_group_counts",
    "parameterized_sql_orders",
    "file_metadata_lineage",
    "argmax_order_per_customer",
    "incremental_agg_maintenance",
    "triplet_margin_mining",
    "map_column_stats",
    "map_in_arrow_char_profile",
    "pandas_grouped_agg_gini",
    "capped_waterfill_allocation",
    "ngram_novelty_scores",
    "token_weighted_median_quality",
    "aes_column_roundtrip",
    "formatted_number_parse",
    "xml_roundtrip_extract",
    "semantic_topic_slice",
    "seasonal_naive_backtest",
    "functional_dependency_audit",
    "not_in_null_semantics",
    "integer_division_semantics",
    "fx_ingest_end_to_end",
    "ndv_catalog_sweep",
    "try_function_semantics",
    "portable_bloom_contract",
    "portable_hll_registers",
    "portable_countmin_topk",
    "bm25_rational_topk",
    "rrf_hybrid_fusion",
    "chi2_contingency_cells",
    "observed_ingest_metrics",
    "listagg_top_customers",
    "order_status_transpose",
    "boolean_retrieval_census",
    "split_centroid_drift",
    "join_skew_report",
    "incremental_join_maintenance",
    "knn_graph_build",
    "catalog_snapshot_manifest",
    "join_cardinality_estimate",
    "bitmap_distinct_contract",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
        oracles.update(getattr(mod, "ORACLES", {}))
    # Priority for the driver's ~50-entry gate window (round-3
    # verdict's ask, in its order):
    # 1. the flagship (always certified),
    # 2. the two round-3 red rows, fixed this round (HUGEINT-cast
    #    session_seq; driver-hashable q_csv projection),
    # 3. previously-green queries whose code changed this round
    #    (overflow-proof ppm quotients, explode-offset rolling
    #    window, tournament top-k, real-column chunk tiebreaks,
    #    NULL-explicit roundtrip checksum),
    # 4. the 37 round-3 queries no driver round has ever checked —
    #    after these, EVERY oracle-backed query in the repo has a
    #    driver row (round-3 verdict item 4),
    # 5. operators newly added in round 4 (locally oracle-verified),
    # 6. the prior-round-green remainder (standing rows).
    head = [
        "flagship_account_pnl",
        # round-3 red rows, fixed
        "sessionize_events",
        "embedding_quantize",
        # driver-green in r3 but changed this round — re-certify
        # (compact/jsonl: global money sums converted to e2 ints
        # after an sf0.1 sweep caught cross-engine 4th-decimal drift)
        "compact_small_files",
        "jsonl_tolerant_roundtrip",
        "event_cooccurrence",
        "rolling_active_users",
        # banding factored into minhash_band_rows for the streaming
        # gate (pure refactor, locally parity-verified) — re-certify
        "minhash_lsh_pairs",
        # the 37 never-driver-checked round-3 queries (all changed
        # ones among them lead the block)
        "label_cohesion_stats",
        "session_paths",
        "chunk_boilerplate",
        "rag_corpus_prep",
        "pyds_jsonl_sink_roundtrip",
        "ohlc_bars_hourly",
        "event_transition_matrix",
        "term_salience_topk",
        "rare_token_quality",
        "inverted_index_postings",
        "vocab_coverage",
        "training_order_shuffle",
        "dedup_degree_hist",
        "dedup_component_size_hist",
        "equidepth_histogram",
        "mcv_stats",
        "streaming_ohlc_stateful",
        "containment_pairs",
        "source_overlap_matrix",
        "doc_chunking",
        "dynamic_partition_backfill",
        "type_correlation_stats",
        "daily_anomaly_days",
        "rfm_segmentation",
        "source_length_drift",
        "basket_part_pairs",
        "sampled_histogram",
        "hierarchical_mixture",
        "revenue_wow_delta",
        "per_group_sample",
        "text_normalize",
        "token_bigram_lm",
        "dedup_triangles",
        "interarrival_gaps",
        "order_totals_reconciliation",
        "supplier_concentration",
        "traffic_seasonality",
        # new in round 4 (locally oracle-verified, first driver look)
    ]
    head += _R4_NEW
    out = {k: merged[k] for k in head if k in merged}
    out.update(
        {
            k: v
            for k, v in merged.items()
            if k not in _R01_DRIVER_GREEN and k in oracles
        }
    )
    out.update({k: v for k, v in merged.items() if k not in _R01_DRIVER_GREEN})
    out.update(merged)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(getattr(mod, "ORACLES", {}))
    return out
