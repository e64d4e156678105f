"""Plan-shape checks for the extra TPC-H-style queries: the point is
not the values (the DuckDB oracle gate covers those) but that the
physical plan is the one we'd want at 100 TB."""

from __future__ import annotations

from fxblue_etl_spark.plans.tpch_more import (
    q4_priority_late_ship,
    q7_nation_volume,
    q10_returned_items,
    q19_disjunctive_predicates,
)


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q4_exists_plans_as_semi_join(spark, sf_dir):
    plan = _executed_plan(q4_priority_late_ship(spark, sf_dir))
    assert "LeftSemi" in plan  # EXISTS must not duplicate order rows


def test_q10_filters_reach_the_scans(spark, sf_dir):
    plan = _executed_plan(q10_returned_items(spark, sf_dir))
    assert "EqualTo(l_returnflag,R)" in plan  # fact filter pushed
    assert "GreaterThanOrEqual(o_orderdate" in plan  # date range pushed


def test_q7_broadcasts_bounded_nation_dim(spark, sf_dir):
    plan = _executed_plan(q7_nation_volume(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q19_prunes_columns_despite_disjunction(spark, sf_dir):
    plan = _executed_plan(q19_disjunctive_predicates(spark, sf_dir))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    lineitem_line = [l for l in read_schema if "l_quantity" in l][0]
    # only the 4 needed lineitem columns are read, not the full table
    assert "l_shipdate" not in lineitem_line
    assert "l_tax" not in lineitem_line
