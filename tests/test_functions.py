"""UDF-machinery surface tests (SURVEY §2.12): scalar pandas_udf,
grouped-map applyInPandas, Python UDTF, and the functions re-exports."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fxblue_etl_spark.functions import udfs


def test_functions_reexports():
    import fxblue_etl_spark.functions as fns

    for name in fns.__all__:
        assert callable(getattr(fns, name)), name


def test_pandas_udf_log_return(spark, sf_dir):
    out = udfs.pandas_udf_log_return(spark, sf_dir)
    row = out.orderBy("o_orderkey").first()
    price = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .orderBy("o_orderkey")
        .first()
        .o_totalprice
    )
    assert abs(row.log_total - round(math.log1p(price), 6)) < 1e-9


def test_grouped_map_share_sums_to_one(spark, sf_dir):
    out = udfs.grouped_map_share(spark, sf_dir)
    sums = out.groupBy("o_custkey").agg(
        (F.sum("spend_share_ppm") / 1e6).alias("s")
    )
    assert sums.filter(F.abs(F.col("s") - 1.0) > 0.01).count() == 0


def test_udtf_token_explode_positions(spark, sf_dir):
    out = udfs.udtf_token_explode(spark, sf_dir)
    one = out.filter(F.col("doc_id") == 0).orderBy("pos").collect()
    text = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") == 0)
        .first()
        .text
    )
    assert [r.token for r in one] == text.split()
    assert [r.pos for r in one] == list(range(len(one)))


def test_sql_udf_stays_inside_catalyst(spark, sf_dir):
    """The SQL-defined function must inline into the plan: zero
    Python-eval nodes, and semantics identical to the inline T4
    expression."""
    from fxblue_etl_spark.functions.udfs import sql_udf_percent_parse
    from fxblue_etl_spark.operators.cleaning import t4_percent_parse

    df = sql_udf_percent_parse(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    got = sorted(map(tuple, df.collect()))
    ref = sorted(map(tuple, t4_percent_parse(spark, sf_dir).collect()))
    assert got == ref


def test_grouped_agg_gini_bounds_and_identity(spark, sf_dir):
    """Gini must sit in [0, 1e6); a constant series gives exactly 0;
    the reported ppm equals the big-int rank formula recomputed in
    Python."""
    from fxblue_etl_spark.functions.udfs import pandas_grouped_agg_gini
    from fxblue_etl_spark.io import table

    rows = {r["o_orderstatus"]: r for r in pandas_grouped_agg_gini(spark, sf_dir).collect()}
    o = table(spark, sf_dir, "orders").select(
        "o_orderstatus", F.floor(F.col("o_totalprice") * 100).cast("long").alias("v")
    ).collect()
    by_status = {}
    for r in o:
        by_status.setdefault(r["o_orderstatus"], []).append(r["v"])
    assert set(rows) == set(by_status)
    for s, vals in by_status.items():
        x = sorted(vals)
        n = len(x)
        num = sum((2 * i - n - 1) * xi for i, xi in enumerate(x, start=1))
        want = (1_000_000 * num) // (n * sum(x))
        assert rows[s]["n_orders"] == n
        assert rows[s]["gini_ppm"] == want
        assert 0 <= want < 1_000_000


def test_gini_numerator_exact_past_int64(spark):
    """A group sized so the old int64 numerator Σ(2i−n−1)·x wraps
    (~2.2e25 at the partial sums): the big-int path must match the
    closed-form Python-int reference exactly (round-4 advice)."""
    from pyspark.sql import functions as F

    from fxblue_etl_spark.functions.udfs import make_gini_ppm_udf

    n = 2_500_000
    lo, hi = 10_000_000, 20_000_000  # cents
    df = spark.range(n).select(
        F.lit("g").alias("s"),
        F.when(F.col("id") % 2 == 0, F.lit(lo))
        .otherwise(F.lit(hi))
        .cast("long")
        .alias("v"),
    )
    got = (
        df.groupBy("s").agg(make_gini_ppm_udf()("v").alias("g")).collect()[0]["g"]
    )
    # sorted series: lo at ranks 1..m, hi at ranks m+1..n (m = ceil(n/2))
    m = (n + 1) // 2

    def wsum(a, cnt):  # Σ_{i=a+1..a+cnt} (2i − n − 1), exact ints
        return cnt * (2 * a + cnt + 1) - cnt * (n + 1)

    num = wsum(0, m) * lo + wsum(m, n - m) * hi
    den = n * (m * lo + (n - m) * hi)
    assert got == (1_000_000 * num) // den
    # the RUNNING total over the negative-weight half is what wraps
    # int64 in the unfixed code (the final value may still fit)
    assert abs(wsum(0, m) * lo) > 2**63
