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
queries that don't yet have a driver-side CORRECTNESS row: round 1
hash-checked the first 50 entries (through ``d3_last_write_wins``),
so this round leads with the two re-rounded queries plus everything
round 1 never reached; the round-1-green remainder keeps its standing
rows and follows after.
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
    merge,
    ml,
    multimodal,
    quality,
    similarity,
    skew,
    temporal,
    textops,
    windows,
)
from fxblue_etl_spark.plans import (
    advanced,
    bucketing,
    corpus,
    dq,
    relational,
    runtime_filters,
    sinks,
    tpch_extra,
    tpch_more,
    zorder,
)
from fxblue_etl_spark.sources import (
    fxblue_csv,
    jsonl,
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
    jsonl,
    runtime_filters,
    zorder,
    dq,
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
        oracles.update(getattr(mod, "ORACLES", {}))
    # Priority for the driver's ~50-entry gate window:
    # 1. changed-this-round / judge-flagged queries (stale or no row),
    # 2. oracle-backed queries without a round-1 driver row,
    # 3. rows-only queries without a row (can't hash-fail — weakest),
    # 4. the round-1-green remainder (standing rows, unchanged code).
    head = [
        "flagship_account_pnl",
        "q1_pricing_summary",
        "llm_corpus_prep",
        "q17_small_qty_revenue",
        "q20_part_supp_chain",
        "s4_xlsx_registry",
        # new this round — no driver row exists yet, certify first
        "gopher_repetition",
        "contamination_check",
        "temperature_resample",
        "edit_distance_pairs",
        "winsorized_totalprice",
        "bucketed_colocated_join",
        "bloom_filter_join",
        "dpp_monthly_join",
        "zorder_clustering_stats",
        "compact_small_files",
        "jsonl_tolerant_roundtrip",
        "orc_sink_roundtrip",
        "unpivot_lineitem_metrics",
        "mad_outliers",
        "dq_audit",
        "regression_analytics",
        "variant_json_shred",
        "funnel_conversion",
        "quantized_topk",
        "csv_sink_roundtrip",
        "training_shard_roundtrip",
    ]
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
