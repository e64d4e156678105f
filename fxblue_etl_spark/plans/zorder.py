"""Z-order (Morton) multi-dimensional clustering for data skipping.

One-dimensional sort (`plans/sinks.compact_small_files` range-clusters
by date) makes min/max row-group stats selective on ONE column; a
100 TB fact queried by *two* dominant predicates (customer AND date)
needs multi-dimensional clustering — sort by the interleaved-bit
Morton code of both bucketed dims and every file covers a small
rectangle of (customer, date) space, so either predicate prunes.

The z-value is pure integer bit math (shift/mask/add over disjoint
bit positions), exact in both engines — the oracle certifies the
interleave itself. `tests/test_zorder.py` certifies the *clustering
claim*: over consecutive row runs, z-sorted bounding boxes cover far
less (x, y) area than 1-d-sorted ones — the measurable win that
min/max skipping inherits.

At scale: compute z once at write time, `repartitionByRange(z)` +
sortWithinPartitions(z) → parquet; the query side is unchanged (stats
pruning is automatic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..session import tune

BITS = 8  # per-dimension bits → 16-bit z-value
DIM_MOD = 1 << BITS
ZB_DIV = 256  # z-values per reported bucket


def zvalue(x: Column, y: Column, bits: int = BITS) -> Column:
    """Morton interleave of two ``bits``-bit non-negative ints: x in
    even positions, y in odd. Disjoint bit positions → sum == or."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    z = parts[0]
    for p in parts[1:]:
        z = z + p
    return z


def _zvalue_sql(x: str, y: str, bits: int = BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_clustering_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders keyed by (custkey bucket, epoch-day bucket) → z-value →
    per-z-bucket bounding-box stats. The area column is what min/max
    skipping sees per file after a z-ordered write."""
    o = table(tune(spark), sf_dir, "orders")
    x = (F.col("o_custkey") % DIM_MOD).cast("int")
    y = (
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        % DIM_MOD
    ).cast("int")
    d = o.select(x.alias("x"), y.alias("y"))
    d = d.withColumn("zb", (zvalue(F.col("x"), F.col("y")) / ZB_DIV).cast("long"))
    return d.groupBy("zb").agg(
        F.count("*").alias("n"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        (
            (F.max("x") - F.min("x") + 1) * (F.max("y") - F.min("y") + 1)
        ).cast("long").alias("bbox_area"),
    )


_X_SQL = f"CAST(o_custkey % {DIM_MOD} AS INT)"
_Y_SQL = (
    f"CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % {DIM_MOD} AS INT)"
)

ZORDER_ORACLE = f"""
WITH d AS (
  SELECT {_X_SQL} AS x, {_Y_SQL} AS y FROM orders),
z AS (
  SELECT x, y, CAST(({_zvalue_sql('x', 'y')}) // {ZB_DIV} AS BIGINT) AS zb FROM d)
SELECT zb, count(*) AS n,
       min(x) AS min_x, max(x) AS max_x,
       min(y) AS min_y, max(y) AS max_y,
       CAST((max(x) - min(x) + 1) * (max(y) - min(y) + 1) AS BIGINT) AS bbox_area
FROM z
GROUP BY 1
"""


QUERIES = {
    "zorder_clustering_stats": zorder_clustering_stats,
}

ORACLES = {
    "zorder_clustering_stats": ZORDER_ORACLE,
}
