"""The portable floor-division formula behind kmeans_iterate_exact:

    floor(a / b)  =  (a - ((a % b + b) % b)) DIV b      (b > 0)

Spark's ``DIV`` truncates toward zero and DuckDB's ``//`` floors, so
the kmeans oracle can only be bit-exact if the formula neutralizes
that difference — the subtraction makes the numerator exactly
divisible, where truncation and flooring agree.  This test sweeps a
hostile domain (negatives, zero, ±1 offsets around multiples,
near-int64-sum magnitudes at the µ-unit scale) through BOTH engines
in bulk and compares against Python's true floor division."""

from __future__ import annotations

import duckdb
import pytest

from fxblue_etl_spark.operators.ml import _FLOORDIV, _FLOORDIV_DUCK


def _domain() -> list[tuple[int, int]]:
    as_ = [0, 1, -1, 2, -2, 7, -7, 100, -100, 999_999, -999_999]
    # the magnitudes kmeans actually sees: sums of up to ~500k
    # µ-scaled components (|x| ≤ ~4e5 · 1e6-dup ≈ 2e11)
    as_ += [2 * 10**11, -2 * 10**11, 2 * 10**11 + 1, -2 * 10**11 - 1]
    bs = [1, 2, 3, 7, 10, 499, 500, 500_000]
    out = []
    for b in bs:
        for a in as_:
            out.append((a, b))
            # ±1 around exact multiples — the truncation-vs-floor edge
            m = (a // b) * b
            out += [(m, b), (m + 1, b), (m - 1, b)]
    return sorted(set(out))


def test_floordiv_matches_python_in_both_engines(spark):
    dom = _domain()
    expected = [a // b for a, b in dom]

    sdf = spark.createDataFrame(dom, "a long, b long")
    got_spark = [
        r.q
        for r in sdf.selectExpr(
            f"{_FLOORDIV.format(a='a', b='b')} AS q", "a", "b"
        )
        .orderBy("a", "b")
        .collect()
    ]
    ordered = sorted(zip(dom, expected))
    assert got_spark == [e for _, e in ordered], "Spark DIV formula drifted"

    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", dom)
    got_duck = [
        r[0]
        for r in con.sql(
            f"SELECT {_FLOORDIV_DUCK.format(a='a', b='b')} AS q FROM t ORDER BY a, b"
        ).fetchall()
    ]
    assert got_duck == [e for _, e in ordered], "DuckDB // formula drifted"


def test_plain_division_truncates_in_both_engines(spark):
    """Control documenting WHY the formula exists: both engines'
    integer division truncates toward zero (-7/2 = -3), while the
    mathematical centroid floor (and Python's ``//``, which reference
    computations and tests use) gives -4.  The formula aligns both
    engines with floor semantics; without it the engines would agree
    with each other but silently disagree with every Python-side
    reference value."""
    a, b = -7, 2
    spark_div = spark.sql(f"SELECT {a} DIV {b} AS q").collect()[0].q
    duck_div = duckdb.sql(f"SELECT {a} // {b} AS q").fetchall()[0][0]
    assert spark_div == duck_div == -3  # both truncate toward zero
    assert a // b == -4  # Python floors — the formula's target
