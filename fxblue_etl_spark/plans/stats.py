"""Optimizer-statistics collection — the ANALYZE TABLE surface an
engine needs to plan with: equi-depth histograms and most-common-value
(MCV) lists, computed exactly and deterministically.

The reference has no planner at all (write-only ETL); these are the
stats a cost-based optimizer over the same tables consumes, exposed
as first-class queries so collection itself is certified.

Determinism: bucket assignment uses ``ntile`` over a totally ordered
key (value, primary key) — no ties left to engine choice; every
emitted money value is an exact e2 integer.

Scale shape (100 TB): a global ``ntile`` needs a total order — a
single sort task in the naive plan. That's acceptable for stats
collection over a SAMPLE (how every warehouse runs ANALYZE) and the
fixture-scale plan documents it; the scale path samples first (the
hash-threshold sampler in corpusops), keeping sort input bounded.
The MCV pass is two map-side-combined aggregates, scale-linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import table
from ..session import tune

#: equi-depth buckets
N_BUCKETS = 32
#: most-common values kept
MCV_K = 20


def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of orders.o_totalprice: N_BUCKETS buckets
    of equal row count, each with exact bounds and population."""
    o = table(tune(spark), sf_dir, "orders").select("o_orderkey", "o_totalprice")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.withColumn("bucket", F.ntile(N_BUCKETS).over(w))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.floor(F.min("o_totalprice") * 100).cast("long").alias("lo_e2"),
            F.floor(F.max("o_totalprice") * 100).cast("long").alias("hi_e2"),
        )
    )


EQUIDEPTH_ORACLE = f"""
WITH b AS (
  SELECT o_totalprice,
         ntile({N_BUCKETS}) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders)
SELECT CAST(bucket AS INT) AS bucket,
       count(*) AS n_rows,
       CAST(floor(min(o_totalprice) * 100) AS BIGINT) AS lo_e2,
       CAST(floor(max(o_totalprice) * 100) AS BIGINT) AS hi_e2
FROM b GROUP BY 1
"""


def mcv_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-common-value list for lineitem.l_quantity with the
    accompanying column-level stats every MCV consumer needs: total
    rows, distinct values, and each value's exact frequency ppm."""
    li = table(tune(spark), sf_dir, "lineitem").select("l_quantity")
    counts = li.groupBy("l_quantity").agg(F.count("*").alias("n"))
    tot = counts.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("n_distinct"),
    )
    w = Window.orderBy(F.desc("n"), F.asc("l_quantity"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= MCV_K)
        .crossJoin(F.broadcast(tot))  # 1-row scalar, broadcast by design
        .select(
            F.floor(F.col("l_quantity") * 100).cast("long").alias("value_e2"),
            "n",
            "rank",
            "n_total",
            "n_distinct",
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * n DIV n_total AS BIGINT)"
            ).alias("freq_ppm"),
        )
    )


MCV_ORACLE = f"""
WITH counts AS (
  SELECT l_quantity, count(*) AS n FROM lineitem GROUP BY 1),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_total,
         CAST(count(*) AS BIGINT) AS n_distinct
  FROM counts),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY n DESC, l_quantity ASC) AS rank
  FROM counts)
SELECT CAST(floor(r.l_quantity * 100) AS BIGINT) AS value_e2,
       r.n,
       CAST(r.rank AS INT) AS rank,
       t.n_total,
       t.n_distinct,
       CAST(CAST(1000000 AS HUGEINT) * r.n // t.n_total AS BIGINT) AS freq_ppm
FROM ranked r, tot t
WHERE r.rank <= {MCV_K}
"""


#: deterministic sample percentage for the sampled ANALYZE path
SAMPLE_PCT = 20


def sampled_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path of ``equidepth_histogram`` made concrete: the
    global sort that ntile needs runs over a DETERMINISTIC
    hash-threshold sample (md5 bucket < SAMPLE_PCT) instead of the
    full table — exactly how a warehouse ANALYZE bounds its sort
    input. Hash sampling (not ``TABLESAMPLE``) keeps the sample — and
    therefore the histogram — bit-identical across engines, runs,
    and partitionings."""
    from ..operators.corpusops import _hash_bucket

    o = (
        table(tune(spark), sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter(_hash_bucket(F.col("o_orderkey"), "analyze|", 100) < SAMPLE_PCT)
    )
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.withColumn("bucket", F.ntile(N_BUCKETS).over(w))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.floor(F.min("o_totalprice") * 100).cast("long").alias("lo_e2"),
            F.floor(F.max("o_totalprice") * 100).cast("long").alias("hi_e2"),
        )
    )


def _sampled_oracle() -> str:
    from ..operators.corpusops import _hash_bucket_sql

    pred = _hash_bucket_sql("CAST(o_orderkey AS VARCHAR)", "analyze|", 100)
    return f"""
WITH s AS (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE {pred} < {SAMPLE_PCT}),
b AS (
  SELECT o_totalprice,
         ntile({N_BUCKETS}) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM s)
SELECT CAST(bucket AS INT) AS bucket,
       count(*) AS n_rows,
       CAST(floor(min(o_totalprice) * 100) AS BIGINT) AS lo_e2,
       CAST(floor(max(o_totalprice) * 100) AS BIGINT) AS hi_e2
FROM b GROUP BY 1
"""


SAMPLED_HISTOGRAM_ORACLE = _sampled_oracle()


#: HLL relative standard deviation requested from approx_count_distinct
HLL_RSD = 0.02
#: certified accuracy bound, percent (generous vs 2% rsd: >2 sigma)
HLL_BOUND_PCT = 5


def hll_accuracy_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy certification: HyperLogLog distinct counts
    (``approx_count_distinct``, rsd 2%) against the exact distinct,
    per column family — emits the exact count and whether the sketch
    landed within ±5%.  This turns the rows-only "approx sketches
    exist" demo into a hash-certified accuracy CONTRACT: the oracle
    asserts the exact counts and ``TRUE`` bounds, so a sketch
    regression (or an rsd misconfiguration) flips the driver row red.

    Scale shape: both sides are single-pass map-side-combined
    aggregates; HLL is the one that still works when the exact
    distinct's shuffle won't."""
    e = table(tune(spark), sf_dir, "events")
    li = table(spark, sf_dir, "lineitem")
    ev = e.agg(
        F.countDistinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id", HLL_RSD).alias("n_approx"),
    ).select(
        F.lit("events.user_id").alias("column_name"),
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact")) * 100
            <= F.col("n_exact") * HLL_BOUND_PCT
        ).alias("within_bound"),
    )
    lo = li.agg(
        F.countDistinct("l_orderkey").alias("n_exact"),
        F.approx_count_distinct("l_orderkey", HLL_RSD).alias("n_approx"),
    ).select(
        F.lit("lineitem.l_orderkey").alias("column_name"),
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact")) * 100
            <= F.col("n_exact") * HLL_BOUND_PCT
        ).alias("within_bound"),
    )
    return ev.unionByName(lo)


HLL_ACCURACY_ORACLE = """
SELECT 'events.user_id' AS column_name,
       (SELECT count(DISTINCT user_id) FROM events) AS n_exact,
       TRUE AS within_bound
UNION ALL
SELECT 'lineitem.l_orderkey' AS column_name,
       (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS n_exact,
       TRUE AS within_bound
"""


#: freqItems support threshold (items with freq > support are
#: GUARANTEED present in the sketch result; false positives allowed)
FREQ_ITEMS_SUPPORT = 0.1


def freq_items_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries frequent-items certification — the heavy-hitter
    sibling of `hll_accuracy_check`: ``df.stat.freqItems`` promises
    every value with true frequency > support appears in its result
    (false positives allowed, false negatives not).  We compute the
    EXACT heavy types and flag each one's presence in the sketch
    output; the oracle asserts the exact counts and TRUE containment,
    so a sketch regression flips the row red.

    Scale: the sketch is one merge-combinable pass with k=1/support
    counters per partition; the exact side is a catalog-bounded count
    aggregate."""
    e = table(tune(spark), sf_dir, "events")
    sketch_items = set(
        e.stat.freqItems(["event_type"], FREQ_ITEMS_SUPPORT).collect()[0][0]
    )
    total = e.count()
    exact = (
        e.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") * 10 > F.lit(total))  # freq > 0.1 exactly
    )
    in_sketch = F.col("event_type").isin(*sketch_items) if sketch_items else F.lit(False)
    return exact.select("event_type", "n", in_sketch.alias("in_sketch"))


FREQ_ITEMS_ORACLE = """
WITH counts AS (
  SELECT event_type, count(*) AS n FROM events GROUP BY 1),
tot AS (SELECT count(*) AS n_total FROM events)
SELECT event_type, n, TRUE AS in_sketch
FROM counts, tot
WHERE n * 10 > n_total
"""


def hll_per_group_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped HLL certification: per event_type, the EXACT distinct
    user count plus whether the per-group ``approx_count_distinct``
    landed within ±5% — `hll_accuracy_check` generalized from one
    global sketch to a sketch per group, which is how dashboards
    actually consume HLL (one counter per dimension value, merged
    across partitions)."""
    e = table(tune(spark), sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", HLL_RSD).alias("n_approx"),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("n_approx") - F.col("n_exact")) * 100
                <= F.col("n_exact") * HLL_BOUND_PCT
            ).alias("within_bound"),
        )
    )


HLL_PER_GROUP_ORACLE = """
SELECT event_type, count(DISTINCT user_id) AS n_exact, TRUE AS within_bound
FROM events GROUP BY 1
"""


QUERIES = {
    "hll_accuracy_check": hll_accuracy_check,
    "equidepth_histogram": equidepth_histogram,
    "mcv_stats": mcv_stats,
    "sampled_histogram": sampled_histogram,
    "freq_items_contract": freq_items_contract,
    "hll_per_group_contract": hll_per_group_contract,
}

ORACLES = {
    "hll_accuracy_check": HLL_ACCURACY_ORACLE,
    "equidepth_histogram": EQUIDEPTH_ORACLE,
    "mcv_stats": MCV_ORACLE,
    "sampled_histogram": SAMPLED_HISTOGRAM_ORACLE,
    "freq_items_contract": FREQ_ITEMS_ORACLE,
    "hll_per_group_contract": HLL_PER_GROUP_ORACLE,
}
