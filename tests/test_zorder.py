"""Z-order clustering: the oracle certifies the bit math; this
certifies the clustering CLAIM. The right metric is the per-file
WORST-DIMENSION extent: a 1-d sort gives tiny extents on the sort
column but leaves the other dimension unconstrained (its predicates
prune nothing); z-order bounds BOTH extents, which is what lets
either predicate skip files."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fxblue_etl_spark.plans.zorder import DIM_MOD, zvalue

RUN = 512  # rows per simulated file


def _avg_extents(d, order_col):
    w = Window.orderBy(order_col, "x", "y")
    runs = d.withColumn("run", ((F.row_number().over(w) - 1) / RUN).cast("int"))
    boxes = runs.groupBy("run").agg(
        (F.max("x") - F.min("x") + 1).alias("x_ext"),
        (F.max("y") - F.min("y") + 1).alias("y_ext"),
    )
    row = boxes.agg(F.avg("x_ext"), F.avg("y_ext")).first()
    return row[0], row[1]


def test_zorder_bounds_both_dimensions(spark):
    # dense 256×256 grid, one row per cell: the regime a 100 TB fact
    # is in (many rows per cell); the fixture at sf0.01 is too sparse
    # in z-space to exhibit the asymptotics
    d = spark.range(DIM_MOD * DIM_MOD).select(
        (F.col("id") % DIM_MOD).cast("int").alias("x"),
        (F.col("id") / DIM_MOD).cast("int").alias("y"),
    )
    d = d.withColumn("z", zvalue(F.col("x"), F.col("y"))).cache()
    try:
        zx, zy = _avg_extents(d, "z")
        lx, ly = _avg_extents(d, "x")
    finally:
        d.unpersist()
    # 1-d sort: x is tight but y is the full range — date predicates
    # prune nothing
    assert ly == DIM_MOD and lx < 8, (lx, ly)
    # z-order: RUN=512 cells = aligned 32×16 Morton blocks; both
    # dimensions bounded far under the full range
    assert zx <= 32 and zy <= 32, (zx, zy)
    # the claim: z-order's worst dimension beats 1-d sort's worst
    assert max(zx, zy) < max(lx, ly) / 4, ((zx, zy), (lx, ly))


def test_zvalue_interleave_exact(spark):
    df = spark.range(1).select(
        zvalue(F.lit(0b10101010), F.lit(0b01010101)).alias("z"),
        zvalue(F.lit(255), F.lit(0)).alias("x_only"),
        zvalue(F.lit(0), F.lit(255)).alias("y_only"),
    )
    r = df.first()
    # x bits land even, y bits land odd
    assert r["x_only"] == sum(1 << (2 * i) for i in range(8))
    assert r["y_only"] == sum(1 << (2 * i + 1) for i in range(8))
    assert r["z"] == sum(
        (1 << (2 * i) if i % 2 else 1 << (2 * i + 1)) for i in range(8)
    )


def test_zvalue_bijective_on_sample(spark):
    import random

    rng = random.Random(42)
    pairs = [(rng.randrange(256), rng.randrange(256)) for _ in range(500)]
    df = spark.createDataFrame(pairs, "x int, y int")
    rows = df.select("x", "y", zvalue(F.col("x"), F.col("y")).alias("z")).collect()

    def decode(z):
        x = y = 0
        for i in range(8):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    for r in rows:
        assert decode(r["z"]) == (r["x"], r["y"])
    # bijective: no two distinct pairs share a z
    assert len({r["z"] for r in rows}) == len({(r["x"], r["y"]) for r in rows})
