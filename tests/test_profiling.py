"""Profiling-plan invariants: Benford ppm mass, the quantile-contract
certification, and skyline dominance (brute-force cross-check at
fixture scale — value parity with DuckDB is the oracle gate's job)."""

from __future__ import annotations

from fxblue_etl_spark.plans.profiling import (
    BENFORD_PPM,
    approx_quantile_contract,
    benford_first_digit,
    pareto_frontier_parts,
)


def test_benford_expected_mass_is_unit(spark, sf_dir):
    # the nine literal expectations must tile ~1e6 ppm (floor rounding
    # loses at most 9 ppm total)
    assert 1_000_000 - 9 <= sum(BENFORD_PPM.values()) <= 1_000_000
    rows = benford_first_digit(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 9
    assert all(1 <= r["digit"] <= 9 for r in rows)
    n_total = sum(r["n"] for r in rows)
    for r in rows:
        assert r["observed_ppm"] == (1_000_000 * r["n"]) // n_total
        assert r["abs_delta_ppm"] == abs(r["observed_ppm"] - r["benford_ppm"])


def test_quantile_contract_certifies_both_quantiles(spark, sf_dir):
    rows = {r["quantile_tenths"]: r for r in approx_quantile_contract(spark, sf_dir).collect()}
    assert set(rows) == {5, 9}
    assert all(r["within_bound"] for r in rows.values())
    assert len({r["n_rows"] for r in rows.values()}) == 1


def test_skyline_matches_bruteforce_dominance(spark, sf_dir):
    parts = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .selectExpr(
            "p_partkey",
            "CAST(floor(p_retailprice * 100) AS BIGINT) AS price_e2",
            "p_size",
        )
        .collect()
    )

    def dominated(a):
        return any(
            b["price_e2"] <= a["price_e2"]
            and b["p_size"] >= a["p_size"]
            and (b["price_e2"] < a["price_e2"] or b["p_size"] > a["p_size"])
            for b in parts
        )

    expect = {p["p_partkey"] for p in parts if not dominated(p)}
    got = {r["p_partkey"] for r in pareto_frontier_parts(spark, sf_dir).collect()}
    assert got == expect
    assert got  # frontier is never empty on a non-empty table


def test_fd_audit_distinguishes_true_and_false_dependencies(spark, sf_dir):
    """The known-true FDs must hold with zero violations; the
    deliberately false one (l_orderkey → l_partkey on multi-line
    orders) must be violated."""
    from fxblue_etl_spark.plans.profiling import functional_dependency_audit

    rows = {r["fd"]: r for r in functional_dependency_audit(spark, sf_dir).collect()}
    for fd in ("nation.key->name", "orders.key->custkey", "customer.key->nation"):
        assert rows[fd]["holds"] == 1 and rows[fd]["n_violating_keys"] == 0, fd
    # the fixture's injected duplicate lineitem rows (the D1 dedup
    # target) violate even (ok,ln)->partkey — the audit must surface
    # that real dirt, not rubber-stamp the schema's intent
    for fd in ("lineitem.(ok,ln)->partkey", "lineitem.ok->partkey"):
        bad = rows[fd]
        assert bad["holds"] == 0 and bad["n_violating_keys"] > 0, fd
        assert bad["excess_values"] >= bad["n_violating_keys"]
    # the single-column LHS is violated at least as much as the pair
    assert (
        rows["lineitem.ok->partkey"]["excess_values"]
        >= rows["lineitem.(ok,ln)->partkey"]["excess_values"]
    )
