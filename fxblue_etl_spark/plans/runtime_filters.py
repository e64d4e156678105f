"""Runtime bloom-filter join pruning (the row-group sibling of DPP).

`plans/sinks.dpp_monthly_join` shows partition-level runtime pruning;
this plan shows Spark's other runtime filter: when a shuffle join's
build side carries a selective predicate, Catalyst injects a
`bloom_filter_agg` over the build-side keys and plants
`might_contain(key)` on the probe-side scan, so most of a 100 TB fact
never reaches the shuffle. The fixture is far below the default
size thresholds, so the query lowers them explicitly — at real scale
the defaults (10 MB build / 10 GB probe) fire on their own.

`tests/test_runtime_filters.py` asserts `might_contain` lands in the
executed plan; the oracle certifies the filter is a pure optimization
(same result as the plain join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..session import tune

#: selective build-side predicate certified by the round trip
MAX_PART_SIZE = 3


#: confs that let the injection rule fire on a test-scale fixture.
#: A join *hint* suppresses injection, so the shuffle join is forced
#: by conf, not hint — and scoped: the plan is frozen under these
#: settings, then the session is restored (the driver runs every
#: query in one shared session).
_FIXTURE_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ part(p_size ≤ 3): bloom-pruned shuffle join, revenue
    rolled up per brand."""
    tune(spark)
    old = {k: spark.conf.get(k) for k in _FIXTURE_CONFS}
    for k, v in _FIXTURE_CONFS.items():
        spark.conf.set(k, v)
    try:
        li = table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
        )
        p = table(spark, sf_dir, "part").filter(F.col("p_size") <= MAX_PART_SIZE)
        j = li.join(p, li["l_partkey"] == p["p_partkey"])
        out = j.groupBy("p_brand").agg(
            F.count("*").alias("n_items"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
        # freeze logical optimization + physical planning under the
        # fixture confs (lazy vals — later .collect() reuses them; AQE
        # may still re-broadcast at runtime, which is fine: the
        # injected might_contain survives replanning)
        out._jdf.queryExecution().executedPlan()
        return out
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


BLOOM_JOIN_ORACLE = f"""
SELECT p_brand,
       count(*) AS n_items,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= {MAX_PART_SIZE}
GROUP BY 1
"""


QUERIES = {
    "bloom_filter_join": bloom_filter_join,
}

ORACLES = {
    "bloom_filter_join": BLOOM_JOIN_ORACLE,
}
