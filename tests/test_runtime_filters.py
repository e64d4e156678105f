"""Bloom-filter runtime join pruning: the oracle certifies values;
this certifies the injected filter actually lands in the plan."""

from __future__ import annotations

from fxblue_etl_spark.plans.runtime_filters import bloom_filter_join


def test_bloom_filter_injected_on_probe_side(spark, sf_dir):
    df = bloom_filter_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan, plan[:2000]
    assert df.count() > 0
