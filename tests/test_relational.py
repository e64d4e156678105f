"""Relational surface smoke + semantics tests (sf0.001)."""

from __future__ import annotations

from fxblue_etl_spark.plans import relational


def test_flagship_returns_rows(spark, sf_dir):
    df = relational.flagship_account_pnl(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"account_id", "nation", "region", "n_trades", "gross_pnl"} <= cols


def test_q1_six_groups(spark, sf_dir):
    rows = relational.q1_pricing_summary(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 6
    for r in rows:
        assert r.count_order > 0
        assert r.sum_qty >= r.avg_qty_e4 / 1e4


def test_topk_at_most_3_per_customer(spark, sf_dir):
    rows = relational.topk_orders_per_customer(spark, sf_dir).collect()
    from collections import Counter

    per_cust = Counter(r.o_custkey for r in rows)
    assert max(per_cust.values()) <= 3
    assert all(r.rk <= 3 for r in rows)


def test_setops_disjoint_partition(spark, sf_dir):
    rows = relational.setop_active_nations(spark, sf_dir).collect()
    union = {r.nationkey for r in rows if r.op == "union"}
    intersect = {r.nationkey for r in rows if r.op == "intersect"}
    except_ = {r.nationkey for r in rows if r.op == "except"}
    assert intersect <= union
    assert except_ <= union
    assert not (intersect & except_)


def test_rollup_has_grand_total(spark, sf_dir):
    rows = relational.rollup_returns(spark, sf_dir).collect()
    grand = [r for r in rows if r.g_flag == 1 and r.g_status == 1]
    assert len(grand) == 1
    assert grand[0].n_rows == sum(
        r.n_rows for r in rows if r.g_flag == 0 and r.g_status == 0
    )


def test_broadcast_join_in_flagship_plan(spark, sf_dir):
    """The account dim join must be broadcast, not a fact shuffle."""
    df = relational.flagship_account_pnl(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_fx_end_to_end_reconciles_sources(spark, sf_dir):
    """The composite must conserve each stage's totals: per-source
    trade counts and pnl sums equal the standalone stage pipelines'."""
    from pyspark.sql import functions as F

    from fxblue_etl_spark.plans.relational import fx_ingest_end_to_end
    from fxblue_etl_spark.sources.fxblue_csv import s2_csv_ingest
    from fxblue_etl_spark.sources.rss_feed import s5_rss_trades_pipeline

    rows = fx_ingest_end_to_end(spark, sf_dir).collect()
    assert len({r["acct"] for r in rows}) == len(rows)
    csv = s2_csv_ingest(spark, sf_dir)
    assert sum(r["n_csv_trades"] for r in rows) == csv.count()
    want_pnl = csv.select(
        F.sum(F.floor(F.col("pnl") * 1e4)).cast("long")
    ).collect()[0][0]
    assert sum(r["csv_pnl_e4"] for r in rows) == want_pnl
    assert sum(r["n_rss_trades"] for r in rows) == s5_rss_trades_pipeline(
        spark, sf_dir
    ).count()
    # every CSV account also exists in the registry keyspace (acct_N ⊂ ids)
    for r in rows:
        if r["in_csv"]:
            assert r["in_registry"] == 1


def test_exact_distinct_keeps_null_event_type_group(spark, tmp_path):
    """Round-8 advice (medium): the split-aggregation rewrite joins
    the two aggregate halves on event_type — a plain equi-join would
    silently DROP a NULL event_type group (NULL != NULL) that both
    the prior single-aggregation semantics and the oracle's GROUP BY
    keep.  The null-safe join must keep it."""
    import pandas as pd

    pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(["2024-01-01"] * 4),
            "user_id": [10, 11, 10, 12],
            "event_type": ["click", "click", None, None],
            "value": [1.0, 3.0, 5.0, 7.0],
            "props": ["{}"] * 4,
        }
    ).to_parquet(tmp_path / "events.parquet")
    rows = relational.exact_distinct_and_quantiles(
        spark, str(tmp_path)
    ).collect()
    by_type = {r.event_type: r for r in rows}
    assert None in by_type, "NULL event_type group was dropped by the join"
    assert by_type[None].n_users == 2
    assert by_type[None].median_value == 5.0
    assert by_type["click"].n_users == 2
