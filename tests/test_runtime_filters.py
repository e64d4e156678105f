"""Bloom-filter runtime join pruning: the oracle certifies values;
this certifies the injected filter actually lands in the plan."""

from __future__ import annotations

from fxblue_etl_spark.plans.runtime_filters import bloom_filter_join


def test_bloom_filter_injected_on_probe_side(spark, sf_dir):
    df = bloom_filter_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan, plan[:2000]
    assert df.count() > 0


def test_portable_bloom_no_false_negatives_and_fp_in_band(spark, sf_dir):
    """The Bloom contract: zero false negatives ALWAYS; the measured
    false-positive rate sits in a generous band around the
    (1 - e^{-kn/m})^k expectation for this geometry."""
    import math

    from fxblue_etl_spark.plans.runtime_filters import (
        BLOOM_K,
        BLOOM_M,
        portable_bloom_contract,
    )

    r = portable_bloom_contract(spark, sf_dir).collect()[0]
    assert r["false_negatives"] == 0
    n_neg = r["n_probes"] - r["n_members"]
    assert n_neg > 0
    expect = (1 - math.exp(-BLOOM_K * r["n_members"] / BLOOM_M)) ** BLOOM_K
    got = r["false_positives"] / n_neg
    assert 0.3 * expect <= got <= 1.8 * expect, (got, expect)
