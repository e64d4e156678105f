"""Optimizer-stats collection: value parity is the oracle gate's job;
these pin the histogram/MCV invariants."""

from __future__ import annotations

from fxblue_etl_spark.plans.stats import (
    MCV_K,
    N_BUCKETS,
    equidepth_histogram,
    mcv_stats,
)


def test_equidepth_buckets_are_balanced_and_ordered(spark, sf_dir):
    rows = sorted(equidepth_histogram(spark, sf_dir).collect(), key=lambda r: r["bucket"])
    assert len(rows) == N_BUCKETS
    sizes = [r["n_rows"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # ntile balance guarantee
    for prev, cur in zip(rows, rows[1:]):
        assert prev["lo_e2"] <= prev["hi_e2"]
        # bucket bounds never regress (equal is fine: a heavy value
        # can span a bucket boundary)
        assert prev["hi_e2"] <= cur["lo_e2"] or prev["hi_e2"] == cur["lo_e2"]


def test_mcv_ranked_and_bounded(spark, sf_dir):
    rows = sorted(mcv_stats(spark, sf_dir).collect(), key=lambda r: r["rank"])
    assert 0 < len(rows) <= MCV_K
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert r["freq_ppm"] == (1_000_000 * r["n"]) // r["n_total"]
        assert r["n_distinct"] >= len(rows)
