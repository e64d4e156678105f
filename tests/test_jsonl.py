"""JSONL tolerant read: the oracle certifies payload parity; these
pin the quarantine mechanics."""

from __future__ import annotations

from fxblue_etl_spark.io import table
from fxblue_etl_spark.sources.jsonl import (
    CORRUPT_LINES,
    jsonl_tolerant_roundtrip,
)


def test_quarantine_counts_exactly_planted_lines(spark, sf_dir):
    row = jsonl_tolerant_roundtrip(spark, sf_dir).collect()[0]
    assert row["n_corrupt"] == len(CORRUPT_LINES)
    assert row["n_good"] == table(spark, sf_dir, "orders").count()


def test_roundtrip_idempotent(spark, sf_dir):
    a = jsonl_tolerant_roundtrip(spark, sf_dir).collect()[0]
    b = jsonl_tolerant_roundtrip(spark, sf_dir).collect()[0]
    assert a == b
