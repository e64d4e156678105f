"""Streaming tests (SURVEY §2.11, M5): event-time windows, watermark
dedup, stateful LOCF, and foreachBatch keyed merge — each driven to
completion with Trigger.AvailableNow so they assert like batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from fxblue_etl_spark.streaming import pipelines


def test_tumbling_windows_match_batch(spark, sf_dir):
    out = pipelines.streaming_tumbling_windows(spark, sf_dir)
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_sliding_windows_cover_each_event_twice(spark, sf_dir):
    out = pipelines.streaming_sliding_windows(spark, sf_dir)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # 10-min windows sliding by 5 min: every event lands in exactly 2
    assert out.agg(F.sum("n")).first()[0] == 2 * n_events


def test_session_windows_respect_gap(spark, sf_dir):
    out = pipelines.streaming_session_windows(spark, sf_dir)
    per_user = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .count()
    )
    # session counts per user sum back to the user's event count
    got = out.groupBy("user_id").agg(F.sum("n_events").alias("n")).collect()
    want = {r.user_id: r["count"] for r in per_user.collect()}
    assert {r.user_id: r.n for r in got} == want


def test_dedup_watermark_removes_redelivery(spark, sf_dir):
    out = pipelines.streaming_dedup_watermark(spark, sf_dir)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out.count() == n_events
    assert out.select("event_id").distinct().count() == n_events


def test_locf_stateful_carries_last_snapshot(spark, sf_dir):
    out = pipelines.streaming_locf_stateful(spark, sf_dir)
    # every non-signup row after a user's first signup carries a balance
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    first_snap = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("event_id").alias("first_snap_id"))
    )
    joined = out.join(
        first_snap, out.account_id == first_snap.user_id, "left"
    ).filter(F.col("entry_idx") > F.col("first_snap_id"))
    assert joined.filter(F.col("account_balance").isNull()).count() == 0


def test_foreachbatch_merge_is_keyed_and_complete(spark, sf_dir):
    out = pipelines.streaming_csv_merge(spark, sf_dir)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out.count() == n_events
    assert out.select("ticket").distinct().count() == n_events
