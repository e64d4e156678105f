"""Data-quality audit: declarative constraint checks over the schema.

The reference enforces exactly one contract — required CSV columns
per record type (`CSV PARSER/gcp_csv.py:104-116`, SURVEY F1) — and
trusts the sink for the rest. A 100 TB lakehouse table has no
Postgres constraints to lean on, so the audit pass IS the contract:
uniqueness, nullability, referential integrity, and range checks run
as queries, and a violation count of zero is the merge gate.

Every check is a count aggregate or an anti-join — all exact integer
arithmetic, so the oracle contract has no float surface. Each check
scans its table once; the anti-joins broadcast nothing here (the
"dim" side is the key column of a fact) and are the same shuffle
shape a MERGE validation would pay anyway.

At scale the audit runs per-partition-increment (check only the
ingest delta), but the query shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..session import tune

#: sane business-date window for the orders fact
DATE_LO, DATE_HI = "1990-01-01", "2005-01-01"


def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row of violation counts; all-zero = contract holds."""
    tune(spark)
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    li = table(spark, sf_dir, "lineitem")

    dup_orderkeys = o.agg(
        (F.count("*") - F.count_distinct(F.col("o_orderkey"))).alias(
            "dup_orderkeys"
        )
    )
    null_keys = o.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_custkeys")
    )
    orphan_orders = (
        o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count("*").alias("orphan_orders"))
    )
    orphan_lineitems = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count("*").alias("orphan_lineitems"))
    )
    bad_prices = li.agg(
        F.count(
            F.when(
                (F.col("l_extendedprice") <= 0)
                | (F.col("l_discount") < 0)
                | (F.col("l_discount") > 1),
                1,
            )
        ).alias("bad_prices")
    )
    bad_dates = o.agg(
        F.count(
            F.when(
                (F.col("o_orderdate") < F.lit(DATE_LO).cast("timestamp"))
                | (F.col("o_orderdate") >= F.lit(DATE_HI).cast("timestamp")),
                1,
            )
        ).alias("bad_dates")
    )
    out = dup_orderkeys
    for piece in (null_keys, orphan_orders, orphan_lineitems, bad_prices, bad_dates):
        out = out.crossJoin(piece)
    return out


DQ_AUDIT_ORACLE = f"""
SELECT
  (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS dup_orderkeys,
  (SELECT count(*) FILTER (o_custkey IS NULL) FROM orders) AS null_custkeys,
  (SELECT count(*) FROM orders o
     WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    AS orphan_orders,
  (SELECT count(*) FROM lineitem l
     WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    AS orphan_lineitems,
  (SELECT count(*) FILTER (l_extendedprice <= 0 OR l_discount < 0 OR l_discount > 1)
     FROM lineitem) AS bad_prices,
  (SELECT count(*) FILTER (o_orderdate < TIMESTAMP '{DATE_LO}'
                           OR o_orderdate >= TIMESTAMP '{DATE_HI}')
     FROM orders) AS bad_dates
"""


def source_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per source, the exact KS statistic
    of its document-length distribution against the whole corpus,
    kept in integers by cross-multiplying the two CDFs
    (``|cum_s·n_all - cum_all·n_s|`` — the float KS is that divided
    by ``n_s·n_all``). The sources whose drift ppm tops the list are
    the ones whose scraping/cleaning changed.

    Scale: the corpus-sized work is two map-side-combined counts;
    the CDF windows run on the (sources × distinct-lengths) stats
    grid, which is domain-bounded regardless of corpus size."""
    from pyspark.sql.window import Window

    d = table(tune(spark), sf_dir, "documents").select("source", "n_chars")
    counts = d.groupBy("source", "n_chars").agg(F.count("*").alias("n_sl"))
    lens = d.select("n_chars").distinct()
    sources = d.groupBy("source").agg(F.count("*").alias("n_s"))
    tot = d.agg(F.count("*").cast("long").alias("n_all"))

    grid = sources.crossJoin(F.broadcast(lens))
    w_s = Window.partitionBy("source").orderBy("n_chars")
    cum_s = (
        grid.join(counts, ["source", "n_chars"], "left")
        .withColumn("n_sl", F.coalesce("n_sl", F.lit(0)))
        .withColumn("cum_s", F.sum("n_sl").over(w_s))
    )
    w_g = Window.orderBy("n_chars")
    cum_all = (
        d.groupBy("n_chars")
        .agg(F.count("*").alias("n_l"))
        .withColumn("cum_all", F.sum("n_l").over(w_g))
        .select("n_chars", "cum_all")
    )
    return (
        cum_s.join(F.broadcast(cum_all), "n_chars")
        .crossJoin(F.broadcast(tot))  # 1-row scalar, broadcast by design
        .groupBy("source")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_s") * F.col("n_all")
                    - F.col("cum_all") * F.col("n_s")
                )
            )
            .cast("long")
            .alias("ks_num"),
            F.first("n_s").cast("long").alias("n_docs"),
            F.first("n_all").cast("long").alias("n_all"),
        )
        .select(
            "source",
            "n_docs",
            "ks_num",
            F.expr("1000000 * ks_num DIV (n_docs * n_all)").alias("ks_ppm"),
        )
    )


LENGTH_DRIFT_ORACLE = """
WITH d AS (SELECT source, n_chars FROM documents),
counts AS (SELECT source, n_chars, count(*) AS n_sl FROM d GROUP BY 1, 2),
lens AS (SELECT DISTINCT n_chars FROM d),
sources AS (SELECT source, count(*) AS n_s FROM d GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM d),
grid AS (SELECT s.source, s.n_s, l.n_chars FROM sources s CROSS JOIN lens l),
cum_s AS (
  SELECT g.source, g.n_s, g.n_chars,
         sum(coalesce(c.n_sl, 0)) OVER (PARTITION BY g.source
                                        ORDER BY g.n_chars) AS cum_s
  FROM grid g LEFT JOIN counts c
    ON c.source = g.source AND c.n_chars = g.n_chars),
cum_all AS (
  SELECT n_chars, sum(count(*)) OVER (ORDER BY n_chars) AS cum_all
  FROM d GROUP BY n_chars)
SELECT s.source,
       CAST(any_value(s.n_s) AS BIGINT) AS n_docs,
       CAST(max(abs(s.cum_s * t.n_all - a.cum_all * s.n_s)) AS BIGINT) AS ks_num,
       CAST((1000000 * max(abs(s.cum_s * t.n_all - a.cum_all * s.n_s)))
            // (any_value(s.n_s) * any_value(t.n_all)) AS BIGINT) AS ks_ppm
FROM cum_s s JOIN cum_all a USING (n_chars), tot t
GROUP BY 1
"""


QUERIES = {
    "dq_audit": dq_audit,
    "source_length_drift": source_length_drift,
}

ORACLES = {
    "dq_audit": DQ_AUDIT_ORACLE,
    "source_length_drift": LENGTH_DRIFT_ORACLE,
}
