"""io.swap_cache contract: persist for ONE invocation, release the
previous invocation's blocks, never accumulate in a shared session.

Ten query sites now persist their multi-consumer intermediates
through this helper; a regression here is a storage leak in every
long-lived driver/bench session."""

from __future__ import annotations

from pyspark.sql import functions as F

from fxblue_etl_spark.io import swap_cache


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_swap_cache_releases_previous_invocation(spark):
    slot: list = []
    a = swap_cache(slot, spark.range(10).withColumn("x", F.col("id") * 2))
    a.count()
    assert a.storageLevel.useMemory
    # second invocation: a's blocks must be released, b's live
    b = swap_cache(slot, spark.range(20).withColumn("x", F.col("id") * 3))
    b.count()
    assert not a.storageLevel.useMemory  # unpersisted
    assert b.storageLevel.useMemory
    assert slot == [b]
    swap_cache(slot)  # empty call just drains the slot
    assert slot == []
    assert not b.storageLevel.useMemory


def test_swap_cache_multi_frame_and_derived_reuse(spark):
    slot: list = []
    base = spark.range(100).withColumn("k", F.col("id") % 7)
    derived = base.groupBy("k").agg(F.count("*").alias("n"))
    base, derived = swap_cache(slot, base, derived)
    # derived's plan contains base's logical subtree: cache
    # substitution must feed it from the persisted base
    plan = derived._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    assert [r.n for r in derived.orderBy("k").collect()] == [15, 15] + [14] * 5
    assert len(slot) == 2
    swap_cache(slot)
    assert slot == []


def test_repeated_invocations_do_not_accumulate_blocks(spark):
    """The real leak check: calling a swap_cache-backed query many
    times in one session must not grow persistent-RDD count."""
    from fxblue_etl_spark.operators.corpusops import (
        capped_waterfill_allocation,
    )

    sf = "/root/testdata/sf0.001"
    capped_waterfill_allocation(spark, sf).collect()
    after_first = _n_persistent_rdds(spark)
    for _ in range(3):
        capped_waterfill_allocation(spark, sf).collect()
    assert _n_persistent_rdds(spark) <= after_first


def test_no_cross_sf_cache_leak(spark):
    """The driver calls entry() at sf0.001 and the gate at sf0.01 in
    one session: a swap_cache slot holding the previous sf's frame
    must never substitute into the other sf's plan (logical-plan
    matching is path-sensitive, and a new invocation releases the old
    slot).  Verified by comparing against the opposite call order."""
    from fxblue_etl_spark.operators.corpusops import (
        capped_waterfill_allocation,
    )
    from fxblue_etl_spark.operators.ml import knn_graph_build

    a, b = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    for fn in (capped_waterfill_allocation, knn_graph_build):
        first = sorted(map(tuple, fn(spark, a).collect()))
        after_other = sorted(map(tuple, fn(spark, b).collect()))
        again = sorted(map(tuple, fn(spark, a).collect()))
        assert first == again, fn.__name__
        assert first != after_other, fn.__name__  # different fixtures differ
