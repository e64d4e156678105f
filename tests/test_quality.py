"""Repetition filter + decontamination: value parity is the oracle
gate's job; these cover the semantic edges and the plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from fxblue_etl_spark.operators.quality import (
    EVAL_MOD,
    _tok_ngrams,
    contamination_check,
    gopher_repetition,
)


def test_tok_ngrams_edges(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c", "d"]), (2, ["a", "b"]), (3, ["a"]), (4, [])],
        "id int, toks array<string>",
    )
    rows = {
        r["id"]: r["g"]
        for r in df.select("id", _tok_ngrams(F.col("toks"), 3).alias("g")).collect()
    }
    assert rows[1] == ["a b c", "b c d"]
    assert rows[2] == [] and rows[3] == [] and rows[4] == []


def test_gopher_flags_split_and_bounds(spark, sf_dir):
    rows = gopher_repetition(spark, sf_dir).collect()
    keeps = {r["keep"] for r in rows}
    assert keeps == {True, False}, "thresholds must split the fixture"
    for r in rows:
        assert 0 <= r["top_tok_ppm"] <= 1_000_000
        assert 0 <= r["dup_bigram_ppm"] <= 1_000_000
        assert r["top_tok_ppm"] > 0  # every doc has a most-common token


def test_contamination_excludes_eval_docs(spark, sf_dir):
    out = contamination_check(spark, sf_dir)
    rows = out.collect()
    assert all(r["n_contaminated"] <= r["n_train"] for r in rows)
    # eval docs are not counted as training rows
    from fxblue_etl_spark.io import table

    n_train_total = sum(r["n_train"] for r in rows)
    n_docs = table(spark, sf_dir, "documents").count()
    n_eval = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % EVAL_MOD == 0)
        .count()
    )
    assert n_train_total == n_docs - n_eval
