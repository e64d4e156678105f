"""Bucketed-layout join: correctness is the oracle gate's job; these
tests certify the *plan* — the whole point of bucketing is the absent
shuffle."""

from __future__ import annotations

from fxblue_etl_spark.plans.bucketing import bucketed_colocated_join


def test_bucketed_join_has_no_join_side_exchange(spark, sf_dir):
    df = bucketed_colocated_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # the only Exchange allowed is the final aggregation's; neither
    # join child may re-shuffle bucketed data
    assert plan.count("Exchange") == 1
    assert "Bucketed: true" in plan


def test_bucketed_join_reuses_catalog_tables(spark, sf_dir):
    # second invocation must not rewrite the layout (idempotent via
    # catalog lookup) and must produce an identical result
    a = {tuple(r) for r in bucketed_colocated_join(spark, sf_dir).collect()}
    b = {tuple(r) for r in bucketed_colocated_join(spark, sf_dir).collect()}
    assert a == b and len(a) > 0
