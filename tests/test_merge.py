"""Merge/upsert semantics tests — the K1 vs K2 divergence and the
idempotence invariant of ON CONFLICT (SURVEY §5.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fxblue_etl_spark.operators.merge import merge_upsert, resolve_last_write


def _df(spark, rows):
    return spark.createDataFrame(rows, "ticket long, pnl double, gpt_note string")


def test_k1_preserves_old_enrichment_on_conflict(spark):
    old = _df(spark, [(1, 10.0, "enriched"), (2, 20.0, None)])
    new = _df(spark, [(1, 11.0, None), (3, 30.0, None)])
    got = {
        r.ticket: (r.pnl, r.gpt_note)
        for r in merge_upsert(old, new, ["ticket"], preserve_cols=["gpt_note"]).collect()
    }
    assert got == {
        1: (11.0, "enriched"),  # payload new, enrichment old
        2: (20.0, None),        # untouched old row
        3: (30.0, None),        # fresh insert
    }


def test_k1_preserves_even_null_old_value(spark):
    # the SQL UPDATE never touches the column — old NULL beats new value
    old = _df(spark, [(1, 10.0, None)])
    new = _df(spark, [(1, 11.0, "should_not_win")])
    got = merge_upsert(old, new, ["ticket"], preserve_cols=["gpt_note"]).collect()[0]
    assert got.gpt_note is None


def test_k2_clobbers_everything(spark):
    old = _df(spark, [(1, 10.0, "enriched")])
    new = _df(spark, [(1, 11.0, None)])
    got = merge_upsert(old, new, ["ticket"]).collect()[0]
    assert (got.pnl, got.gpt_note) == (11.0, None)


def test_merge_idempotent(spark):
    old = _df(spark, [(1, 10.0, "e"), (2, 20.0, None)])
    new = _df(spark, [(1, 11.0, None), (3, 30.0, None)])
    once = merge_upsert(old, new, ["ticket"], preserve_cols=["gpt_note"])
    twice = merge_upsert(once, new, ["ticket"], preserve_cols=["gpt_note"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_resolve_last_write(spark):
    df = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (2, "x", 5)], ["ticket", "v", "_ingest_ts"]
    )
    got = {r.ticket: r.v for r in resolve_last_write(df, ["ticket"]).collect()}
    assert got == {1: "b", 2: "x"}


def test_schema_mismatch_raises(spark):
    import pytest

    old = _df(spark, [(1, 10.0, None)])
    new = old.select("ticket", "pnl")
    with pytest.raises(ValueError):
        merge_upsert(old, new, ["ticket"])
