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


QUERIES = {
    "dq_audit": dq_audit,
}

ORACLES = {
    "dq_audit": DQ_AUDIT_ORACLE,
}
