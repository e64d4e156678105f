"""Scale-behavior tests: plans, not just values — pushdown reaches
the scan, bucketing eliminates the join shuffle, salting preserves
semantics while spreading hot keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from fxblue_etl_spark.operators.skew import salted_count, salted_join


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    from fxblue_etl_spark.plans.advanced import q6_selective_agg

    plan = _executed_plan(q6_selective_agg(spark, sf_dir))
    assert "PushedFilters:" in plan
    # the selective predicates appear as pushed filters, not post-scan only
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice")
    )
    plan = _executed_plan(df)
    # ReadSchema carries only the projected columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_extendedprice" in read_schema
    assert "l_discount" not in read_schema


def test_bucketed_join_eliminates_exchange(spark, sf_dir):
    """Tables bucketed+sorted on the join key join with zero Exchange
    nodes — the co-located join strategy for repeated fact joins."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        (
            o.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("orders_bucketed")
        )
        (
            l.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable("lineitem_bucketed")
        )
        j = spark.table("lineitem_bucketed").join(
            spark.table("orders_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _executed_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # and it still returns the right row count
        assert j.count() == l.join(o, l.l_orderkey == o.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_salted_join_matches_plain_join(spark, sf_dir):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey", "l_extendedprice"
    )
    s = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .withColumnRenamed("s_suppkey", "l_suppkey")
        .select("l_suppkey", "s_nationkey")
    )
    salted = salted_join(l, s, ["l_suppkey"], n_salt=4)
    plain = l.join(s, "l_suppkey")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_count_matches_groupby(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {r.event_type: r.n for r in salted_count(e, ["event_type"]).collect()}
    want = {r.event_type: r["count"] for r in e.groupBy("event_type").count().collect()}
    assert got == want


def test_partition_pruning_on_partitioned_write(spark, sf_dir, tmp_path):
    from fxblue_etl_spark.io import write_partitioned

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    path = str(tmp_path / "orders_part")
    write_partitioned(o, path, ["order_month"])

    back = spark.read.parquet(path).filter(F.col("order_month") == "1996-03")
    plan = _executed_plan(back)
    # the month predicate prunes partitions at scan planning, it is
    # not a post-scan filter
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "order_month" in pf
    assert back.count() == o.filter(F.col("order_month") == "1996-03").count()


def test_no_cross_product_in_relational_headliners(spark, sf_dir):
    """Join-strategy guard: none of the relational headline queries
    may plan a CartesianProduct or a BroadcastNestedLoopJoin — every
    join must be an equi hash/merge join (singleton-scalar broadcast
    crossJoins are deliberately excluded from this set)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in (
        "flagship_account_pnl",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_region_revenue",
        "rollup_returns",
        "topk_orders_per_customer",
        "exact_distinct_and_quantiles",
        "q10_returned_items",
        "q18_large_volume_orders",
        "time_bucket_rollup",
        "sessionize_events",
        "gapfill_daily_locf",
        "hourly_event_load",
    ):
        plan = _executed_plan(qs[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_rfm_windows_are_partitioned_and_scan_prunes(spark, sf_dir):
    """The rewritten rfm_segmentation: every Window node in the
    EXECUTED plan carries partition keys (tie-run-sized frames, never
    a global sort), and the orders scan reads only the three consumed
    columns."""
    from fxblue_etl_spark.plans.behavior import rfm_segmentation

    plan = _executed_plan(rfm_segmentation(spark, sf_dir))
    # every windowspecdefinition's first top-level arg is a partition
    # key (no ASC/DESC marker), per the plan_audit detector
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_audit import _partitionless_windows

    assert _partitionless_windows(plan) == []
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas
    for line in read_schemas:
        assert "o_orderstatus" not in line and "o_orderpriority" not in line


def test_lsh_pair_generation_single_signature_pass(spark, sf_dir):
    """Bucket-grouped LSH pair generation computes the tokenize →
    minhash → band lineage ONCE: the plan has exactly one documents
    scan and no join between two band-table lineages (the old
    self-join shape doubled the signature work — Spark does not
    reuse the exchange across a join's sides)."""
    from fxblue_etl_spark.io import fan_out, table
    from fxblue_etl_spark.operators.dedup import lsh_candidate_pairs

    import re

    plan = _executed_plan(
        lsh_candidate_pairs(fan_out(table(spark, sf_dir, "documents")))
    )
    # node-detail headers like "(1) Scan parquet" — one per scan node
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_scan_counts_stay_at_sweep_fixed_levels(spark, sf_dir):
    """The round-5 redundant-pass sweep fixed these queries' plans to
    a known scan-node count; a regression back to the join-back /
    self-join / per-branch shapes shows up here as extra scans."""
    import re

    import __spark_entry__ as entrymod

    caps = {
        "minhash_lsh_pairs": 1,
        "embedding_near_dup": 1,
        "capped_waterfill_allocation": 1,
        "vocab_coverage": 1,
        "term_salience_topk": 1,
        "knn_graph_build": 3,
        "ann_ivf_topk": 2,
        "quantized_ivf_topk": 3,
        "pq_adc_topk": 1,
        "gdpr_delete_propagation": 3,
        "dedup_triangles": 2,
        "dedup_degree_hist": 2,
        "lm_doc_perplexity": 2,
        "rare_token_quality": 2,
        "token_pmi_topk": 2,
        "span_dedup_stats": 2,
        "retention_cohorts": 2,
        "temperature_resample": 2,
        "temperature_sweep": 2,
        "quality_feature_matrix": 3,
        "quality_lm_calibration": 2,
        "approx_quantile_contract": 2,
        # total across all three tables: one fused orders aggregate,
        # two referential joins (2 sides each), one lineitem aggregate
        "dq_audit": 6,
    }
    qs = entrymod.queries()
    for name, cap in caps.items():
        plan = _executed_plan(qs[name](spark, sf_dir))
        n = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
        assert n <= cap, f"{name}: {n} scan nodes (cap {cap})"
