"""Behavioral analytics: value parity is the oracle gate's job; these
pin the semantic invariants of the retention matrix and the
co-occurrence statistics."""

from __future__ import annotations

from fxblue_etl_spark.plans.behavior import event_cooccurrence, retention_cohorts


def test_retention_day_zero_is_full_cohort(spark, sf_dir):
    rows = retention_cohorts(spark, sf_dir).collect()
    assert rows
    day0 = [r for r in rows if r["day_offset"] == 0]
    cohorts = {r["cohort_day"] for r in rows}
    # every cohort has a day-0 row, and on day 0 everyone is active
    assert {r["cohort_day"] for r in day0} == cohorts
    for r in day0:
        assert r["n_active"] == r["cohort_size"]
        assert r["retained_ppm"] == 1_000_000
    for r in rows:
        assert r["day_offset"] >= 0
        assert 0 < r["n_active"] <= r["cohort_size"]


def test_cooccurrence_bounds_and_symmetric_closure(spark, sf_dir):
    rows = event_cooccurrence(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]  # unordered pairs, one row each
        assert 0 < r["n_both"] <= min(r["n_a"], r["n_b"])
        assert max(r["n_a"], r["n_b"]) <= r["n_users"]
        assert r["lift_ppm"] == (1_000_000 * r["n_both"] * r["n_users"]) // (
            r["n_a"] * r["n_b"]
        )


def test_rolling_active_users_bounds(spark, sf_dir):
    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.plans.behavior import rolling_active_users
    from pyspark.sql import functions as F

    rows = {r["day"]: r["active_7d"] for r in rolling_active_users(spark, sf_dir).collect()}
    assert rows
    e = table(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    )
    daily = {
        r["d"]: r["n"]
        for r in e.distinct()
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("d"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    total_users = e.select("user_id").distinct().count()
    for day, a7 in rows.items():
        # rolling window dominates the single day and never exceeds the population
        assert daily[day] <= a7 <= total_users


def test_type_correlation_stats_cauchy_schwarz(spark, sf_dir):
    from fxblue_etl_spark.plans.behavior import type_correlation_stats

    rows = type_correlation_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n = r["n_hours"]
        assert n >= 1
        # derived correlation must be a valid correlation
        cov = n * r["sum_xy"] - r["sum_x"] * r["sum_y"]
        vx = n * r["sum_xx"] - r["sum_x"] ** 2
        vy = n * r["sum_yy"] - r["sum_y"] ** 2
        assert vx >= 0 and vy >= 0
        assert cov * cov <= vx * vy  # |corr| <= 1, integer-exact


def test_rfm_segment_population_conserved(spark, sf_dir):
    from fxblue_etl_spark.plans.behavior import rfm_segmentation

    rows = rfm_segmentation(spark, sf_dir).collect()
    n_cust = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        for k in ("r_score", "f_score", "m_score"):
            assert 1 <= r[k] <= 5


def test_source_length_drift_bounds(spark, sf_dir):
    from fxblue_etl_spark.plans.dq import source_length_drift

    rows = source_length_drift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # KS is a probability-scale statistic: ppm within [0, 1e6]
        assert 0 <= r["ks_ppm"] <= 1_000_000
        assert 0 <= r["ks_num"] <= r["n_docs"] * 1_000_000_000


def test_reconciliation_covers_all_orders(spark, sf_dir):
    from fxblue_etl_spark.plans.dq import order_totals_reconciliation

    rows = order_totals_reconciliation(spark, sf_dir).collect()
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    assert {r["bucket"] for r in rows} <= {
        "exact", "within_1_unit", "header_higher", "lines_higher"
    }


def test_supplier_hhi_bounds(spark, sf_dir):
    from fxblue_etl_spark.plans.dq import supplier_concentration

    rows = supplier_concentration(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # HHI of ppm shares: between ~1e12/n (uniform) and 1e12 (monopoly)
        assert 0 < r["hhi_e12"] <= 1_000_000_000_000
        assert r["top_share_ppm"] * r["top_share_ppm"] <= r["hhi_e12"]
        if r["n_suppliers"] == 1:
            assert r["top_share_ppm"] == 1_000_000


def test_rfm_ntile_exact_on_tie_heavy_frame(spark, tmp_path):
    """Adversarial NTILE parity: heavy ties straddling every quintile
    boundary (all frequencies equal; spend from a 3-value domain),
    n % 5 != 0, against DuckDB's NTILE(5) on the same frame — the
    boundary-allocation path (within-value custkey rank) must
    reproduce ntile's ceil-sized-tiles-first split exactly."""
    import datetime

    import duckdb
    import pandas as pd

    from fxblue_etl_spark.plans.behavior import RFM_ORACLE, rfm_segmentation

    rows = []
    for ck in range(1, 24):  # 23 customers: 23 % 5 = 3
        rows.append(
            {
                "o_custkey": ck,
                # recency: only 2 distinct days -> ties straddle
                "o_orderdate": datetime.datetime(2024, 1, 1 + ck % 2),
                # monetary: 3-value domain -> every boundary tied
                "o_totalprice": float(10 * (ck % 3)) + 5.0,
            }
        )
    pdf = pd.DataFrame(rows)
    d = str(tmp_path)
    pdf.to_parquet(f"{d}/orders.parquet")
    got = sorted(tuple(r) for r in rfm_segmentation(spark, d).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')")
    exp = sorted(map(tuple, con.sql(RFM_ORACLE).fetchall()))
    assert got == exp
    assert sum(r[3] for r in got) == 23


def test_rfm_ntile_exact_tiny_n(spark, tmp_path):
    """n < 5: NTILE(5) degenerates to one row per tile; the
    boundary-position formula must survive q=0 / repeated
    boundaries."""
    import datetime

    import duckdb
    import pandas as pd

    from fxblue_etl_spark.plans.behavior import RFM_ORACLE, rfm_segmentation

    pdf = pd.DataFrame(
        [
            {
                "o_custkey": ck,
                "o_orderdate": datetime.datetime(2024, 2, 1),
                "o_totalprice": 42.0,
            }
            for ck in (7, 8, 9)
        ]
    )
    d = str(tmp_path)
    pdf.to_parquet(f"{d}/orders.parquet")
    got = sorted(tuple(r) for r in rfm_segmentation(spark, d).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')")
    exp = sorted(map(tuple, con.sql(RFM_ORACLE).fetchall()))
    assert got == exp
