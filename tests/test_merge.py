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


# ── SCD2 ────────────────────────────────────────────────────────────────

def _scd2_dim(spark, rows):
    return spark.createDataFrame(
        rows, "k long, attr string, valid_from string, valid_to string, is_current boolean"
    )


def _scd2_upd(spark, rows):
    return spark.createDataFrame(rows, "k long, attr string, _effective_ts string")


def test_scd2_change_closes_and_opens_version(spark):
    from fxblue_etl_spark.operators.merge import merge_scd2

    dim = _scd2_dim(spark, [(1, "a", "t0", None, True)])
    upd = _scd2_upd(spark, [(1, "b", "t1"), (2, "x", "t1")])
    out = merge_scd2(dim, upd, key=["k"], tracked_cols=["attr"])
    rows = {(r.k, r.attr): r for r in out.collect()}
    assert len(rows) == 3
    closed = rows[(1, "a")]
    assert closed.valid_to == "t1" and closed.is_current is False
    opened = rows[(1, "b")]
    assert opened.valid_from == "t1" and opened.valid_to is None and opened.is_current
    inserted = rows[(2, "x")]
    assert inserted.valid_from == "t1" and inserted.is_current


def test_scd2_unchanged_update_is_noop_idempotent(spark):
    from fxblue_etl_spark.operators.merge import merge_scd2

    dim = _scd2_dim(spark, [(1, "a", "t0", None, True)])
    upd = _scd2_upd(spark, [(1, "b", "t1")])
    once = merge_scd2(dim, upd, key=["k"], tracked_cols=["attr"])
    twice = merge_scd2(once, upd, key=["k"], tracked_cols=["attr"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_version_chain_over_batches(spark):
    from fxblue_etl_spark.operators.merge import merge_scd2

    dim = _scd2_dim(spark, [(1, "a", "t0", None, True)])
    v2 = merge_scd2(dim, _scd2_upd(spark, [(1, "b", "t1")]), ["k"], ["attr"])
    v3 = merge_scd2(v2, _scd2_upd(spark, [(1, "c", "t2")]), ["k"], ["attr"])
    rows = sorted(v3.collect(), key=lambda r: r.valid_from)
    assert [(r.attr, r.valid_from, r.valid_to, r.is_current) for r in rows] == [
        ("a", "t0", "t1", False),
        ("b", "t1", "t2", False),
        ("c", "t2", None, True),
    ]
