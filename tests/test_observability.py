"""Observability surface: Observation accumulators, listagg ordering,
DataFrame.transpose shape. Value parity with DuckDB is the oracle
gate's job; these pin the API contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from fxblue_etl_spark.plans.observability import (
    LISTAGG_K,
    listagg_top_customers,
    observed_ingest_metrics,
    order_status_transpose,
)


def test_observed_metrics_equal_direct_aggregate(spark, sf_dir):
    row = observed_ingest_metrics(spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    direct = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty_total"),
        F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).alias(
            "price_e2_total"
        ),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_orderkey").alias("max_orderkey"),
    ).collect()[0]
    for k in ("n_rows", "qty_total", "price_e2_total", "min_orderkey", "max_orderkey"):
        assert row[k] == direct[k]
    assert row["n_status_f"] == li.filter(F.col("l_linestatus") == "F").count()


def test_listagg_is_rank_ordered(spark, sf_dir):
    for r in listagg_top_customers(spark, sf_dir).collect():
        custs = r["top_custs"].split(",")
        assert 1 <= len(custs) <= LISTAGG_K
        assert len(set(custs)) == len(custs)
        # rank order: counts non-increasing, custkey asc within ties
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        counts = {
            str(x["o_custkey"]): x["n"]
            for x in o.filter(F.col("o_orderstatus") == r["status"])
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        pairs = [(-counts[c], int(c)) for c in custs]
        assert pairs == sorted(pairs)
        assert r["top_cust_orders"] == sum(counts[c] for c in custs)


def test_transpose_shape_roundtrip(spark, sf_dir):
    t = order_status_transpose(spark, sf_dir)
    rows = {r["metric"]: r for r in t.collect()}
    assert set(rows) == {"n_orders", "total_e2", "n_customers"}
    statuses = [c for c in t.columns if c != "metric"]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per = {
        r["s"]: r
        for r in o.groupBy(F.lower("o_orderstatus").alias("s"))
        .agg(F.count("*").alias("n_orders"))
        .collect()
    }
    assert set(statuses) == set(per)
    for s in statuses:
        assert rows["n_orders"][s] == per[s]["n_orders"]
