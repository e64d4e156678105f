"""Optimizer-stats collection: value parity is the oracle gate's job;
these pin the histogram/MCV invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from fxblue_etl_spark.io import table
from fxblue_etl_spark.plans.stats import (
    MCV_K,
    N_BUCKETS,
    equidepth_histogram,
    mcv_stats,
)


def test_equidepth_buckets_are_balanced_and_ordered(spark, sf_dir):
    rows = sorted(equidepth_histogram(spark, sf_dir).collect(), key=lambda r: r["bucket"])
    assert len(rows) == N_BUCKETS
    sizes = [r["n_rows"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # ntile balance guarantee
    for prev, cur in zip(rows, rows[1:]):
        assert prev["lo_e2"] <= prev["hi_e2"]
        # bucket bounds never regress (equal is fine: a heavy value
        # can span a bucket boundary)
        assert prev["hi_e2"] <= cur["lo_e2"] or prev["hi_e2"] == cur["lo_e2"]


def test_mcv_ranked_and_bounded(spark, sf_dir):
    rows = sorted(mcv_stats(spark, sf_dir).collect(), key=lambda r: r["rank"])
    assert 0 < len(rows) <= MCV_K
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert r["freq_ppm"] == (1_000_000 * r["n"]) // r["n_total"]
        assert r["n_distinct"] >= len(rows)


def test_decimal_money_totals_matches_double_path_to_the_cent(spark, sf_dir):
    """The exact-decimal sums must agree with the double path after
    cent rounding (TPC-H prices are exact multiples of 0.01, so the
    double sum is within ulps of the decimal truth at fixture scale)."""
    from fxblue_etl_spark.plans.stats import decimal_money_totals

    rows = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in decimal_money_totals(spark, sf_dir).collect()
    }
    dbl = {
        (r["rf"], r["ls"]): r
        for r in (
            table(spark, sf_dir, "lineitem")
            .groupBy(
                F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls")
            )
            .agg(
                F.count("*").alias("n"),
                F.sum("l_extendedprice").alias("price"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc"),
            )
            .collect()
        )
    }
    assert set(rows) == set(dbl)
    for k, r in rows.items():
        assert r["n_rows"] == dbl[k]["n"]
        assert abs(r["price_cents"] - round(dbl[k]["price"] * 100)) <= 1
        # the decimal discounted product rounds at scale 4 then floors
        # at cents: within a cent of the double path per group
        assert abs(r["disc_price_cents"] - dbl[k]["disc"] * 100) <= len(rows) + 2


def test_parquet_agg_pushdown_engages_and_restores_confs(spark, sf_dir):
    """The query must (a) hard-fail unless the scan plan carries
    PushedAggregation — asserted inside the operator — and (b) leave
    the session's source-list confs exactly as found."""
    from fxblue_etl_spark.plans.stats import parquet_agg_pushdown_stats

    before_v1 = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    out = parquet_agg_pushdown_stats(spark, sf_dir).collect()
    assert spark.conf.get("spark.sql.sources.useV1SourceList", None) == before_v1
    li = table(spark, sf_dir, "lineitem")
    assert out[0]["n_rows"] == li.count()
    mm = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).collect()[0]
    assert (
        out[0]["min_orderkey"],
        out[0]["max_orderkey"],
        out[0]["min_suppkey"],
        out[0]["max_suppkey"],
    ) == tuple(mm)


def test_portable_hll_estimate_within_3sigma(spark, sf_dir):
    """The integer HLL estimate must land within 3·1.04/√m of the
    true distinct event-id count (the fixture's user_id has only ~15 distinct values — linear-counting regime, where raw HLL is biased by design) (and the register digest must be
    internally consistent)."""
    from fxblue_etl_spark.plans.stats import HLL_M, portable_hll_registers

    r = portable_hll_registers(spark, sf_dir).collect()[0]
    true = table(spark, sf_dir, "events").select("event_id").distinct().count()
    rel_err = abs(r["estimate"] - true) / true
    assert rel_err <= 3 * 1.04 / (HLL_M ** 0.5), (r["estimate"], true, rel_err)
    assert 0 < r["registers_used"] <= HLL_M
    assert r["rho_max"] * r["registers_used"] >= r["rho_sum"]


def test_portable_hll_is_exactly_mergeable(spark, sf_dir):
    """registers(A ∪ B) == register-wise MAX of registers(A) and
    registers(B) — EXACT equality, the property that makes the
    portable sketch vintage-mergeable without re-scanning A."""
    from fxblue_etl_spark.plans.stats import hll_register_table

    e = table(spark, sf_dir, "events")
    a = e.filter(F.col("event_id") % 2 == 0)
    b = e.filter(F.col("event_id") % 2 == 1)
    merged = {
        (r["bucket"], r["rho"])
        for r in hll_register_table(a, "event_id")
        .unionByName(hll_register_table(b, "event_id"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
        .collect()
    }
    full = {
        (r["bucket"], r["rho"])
        for r in hll_register_table(e, "event_id").collect()
    }
    assert merged == full


def test_chi2_contingency_matches_python(spark, sf_dir):
    """Exact-integer chi-square cells equal a pure-Python recompute
    (arbitrary-precision ints — no overflow to hide in), and the
    floor-scaled statistic approximates the float chi2 to < 1 unit
    per cell."""
    from collections import Counter

    from fxblue_etl_spark.plans.stats import chi2_contingency_cells

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderpriority", "o_orderstatus"
    ).collect()
    obs = Counter((r[0], r[1]) for r in orders)
    rown = Counter(p for p, _ in obs.elements())
    coln = Counter(s for _, s in obs.elements())
    t_n = sum(obs.values())
    rows = chi2_contingency_cells(spark, sf_dir).collect()
    assert len(rows) == len(obs)
    float_chi2 = 0.0
    int_chi2_ppm = 0
    for r in rows:
        n = obs[(r["priority"], r["status"])]
        assert r["n_obs"] == n
        e_e6 = (10**6 * rown[r["priority"]] * coln[r["status"]]) // t_n
        assert r["expected_e6"] == e_e6
        assert r["chi2_cell_ppm"] == (10**6 * n - e_e6) ** 2 // e_e6
        e = rown[r["priority"]] * coln[r["status"]] / t_n
        float_chi2 += (n - e) ** 2 / e
        int_chi2_ppm += r["chi2_cell_ppm"]
    assert abs(int_chi2_ppm / 1e6 - float_chi2) < len(rows)


def test_bitmap_distinct_equals_exact(spark, sf_dir):
    from fxblue_etl_spark.plans.stats import bitmap_distinct_contract

    rows = bitmap_distinct_contract(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["bitmap_exact"] is True
        assert r["distinct_via_bitmap"] == r["distinct_exact"]
        assert 1 <= r["n_segments"] <= 5


def test_bitmap_distinct_beyond_bucket_domain(spark, tmp_path):
    """Key domain spanning several 32768-key bitmap buckets: without
    the bitmap_bucket_number group key, positions alias mod 32768 and
    the count silently undercounts (round-4 advice)."""
    import duckdb
    import pandas as pd

    from fxblue_etl_spark.plans.stats import BITMAP_ORACLE, bitmap_distinct_contract

    rows = [
        {
            "c_custkey": k,
            "c_nationkey": k % 3,
            "c_mktsegment": f"SEG{k % 4}",
        }
        # 1..150000 step 7: ~21k keys across 5 buckets; aliasing
        # would collapse whole buckets onto each other
        for k in range(1, 150_000, 7)
    ]
    d = str(tmp_path)
    pd.DataFrame(rows).to_parquet(f"{d}/customer.parquet")
    got = {r["c_nationkey"]: r for r in bitmap_distinct_contract(spark, d).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS SELECT * FROM read_parquet('{d}/customer.parquet')")
    exp = {r[0]: r for r in con.sql(BITMAP_ORACLE).fetchall()}
    assert set(got) == set(exp) == {0, 1, 2}
    for nk, r in got.items():
        assert r["bitmap_exact"] is True
        assert r["distinct_via_bitmap"] == r["distinct_exact"] == exp[nk][3]
        # exact per-nation count, and the domain really spans buckets
        assert r["distinct_exact"] == len(
            {k for k in range(1, 150_000, 7) if k % 3 == nk}
        )
        assert len({k // 32768 for k in range(1, 150_000, 7) if k % 3 == nk}) >= 4


def test_bitmap_bucketing_property_random_domains(spark, tmp_path_factory):
    """Hypothesis-style sweep without hypothesis overhead: several
    deterministic pseudo-random key domains (sparse, dense, exactly
    on the 32768 boundary, far past it) — bucketed bitmap distinct
    must equal count(DISTINCT) on every one."""
    import pandas as pd

    from fxblue_etl_spark.plans.stats import bitmap_distinct_contract

    domains = [
        [32767, 32768, 32769],                      # straddles bucket 0/1
        list(range(0, 98304, 3)),                    # 3 buckets, dense-ish
        [(k * k * 2654435761) % 500_000 for k in range(1, 4000)],  # scattered
        [1, 2, 65536, 131072, 131073],               # bucket gaps
    ]
    for i, keys in enumerate(domains):
        d = str(tmp_path_factory.mktemp(f"bm{i}"))
        pd.DataFrame(
            {"c_custkey": keys, "c_nationkey": 0, "c_mktsegment": "S"}
        ).to_parquet(f"{d}/customer.parquet")
        row = bitmap_distinct_contract(spark, d).collect()[0]
        assert row["distinct_via_bitmap"] == row["distinct_exact"] == len(set(keys))


def test_portable_kmv_is_exactly_mergeable(spark, sf_dir):
    """kmv(A ∪ B) == bottom-k of (kmv(A) ∪ kmv(B)) — EXACT equality
    (the sketch is a set of hashes, so merge is set-union + truncate;
    no estimator is involved in the mergeability contract)."""
    from fxblue_etl_spark.plans.stats import KMV_K, kmv_sketch_table

    e = table(spark, sf_dir, "events")
    a = e.filter(F.col("event_id") % 2 == 0)
    b = e.filter(F.col("event_id") % 2 == 1)
    full = {
        r["grp"]: r["ks"]
        for r in kmv_sketch_table(e, "event_type", "user_id").collect()
    }
    ka = {
        r["grp"]: r["ks"]
        for r in kmv_sketch_table(a, "event_type", "user_id").collect()
    }
    kb = {
        r["grp"]: r["ks"]
        for r in kmv_sketch_table(b, "event_type", "user_id").collect()
    }
    for grp, ks in full.items():
        merged = sorted(set(ka.get(grp, [])) | set(kb.get(grp, [])))[:KMV_K]
        assert merged == ks, grp


def test_portable_kmv_estimates_within_bounds(spark, sf_dir):
    """Estimator accuracy on the fixture: exact branch (< k distinct)
    must be EXACT; the τ-branch must land within 3.5σ of the true
    union cardinality (σ ≈ 1/√(k−2) for KMV)."""
    from fxblue_etl_spark.plans.stats import KMV_K, portable_kmv_setops

    e = table(spark, sf_dir, "events")
    rows = portable_kmv_setops(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5 event types, 2)
    sigma = (KMV_K - 2) ** -0.5
    # exact |A ∪ B| per pair: |A| + |B| − |A ∩ B|
    sets = {
        r["event_type"]: set(r["us"])
        for r in e.groupBy("event_type")
        .agg(F.collect_set("user_id").alias("us"))
        .collect()
    }
    for r in rows:
        true_union = len(sets[r["type_a"]] | sets[r["type_b"]])
        if r["n_union_sketch"] < KMV_K:
            assert r["est_union"] == true_union
            assert r["jaccard_ppm"] <= 1000000
        else:
            rel = abs(r["est_union"] / true_union - 1)
            assert rel <= 3.5 * sigma, (r, true_union)


def test_qdigest_rank_error_within_bound(spark, sf_dir):
    """Q-digest guarantee, pinned empirically: for each reported
    quantile, CDF(est) ≥ ceil(q·n) (the estimate never undershoots
    its target rank) and the overshoot is bounded by L·T plus the
    largest node count (merged nodes are ≤ T by the rule; kept
    leaves can carry a heavy value's full multiplicity)."""
    from collections import Counter

    from fxblue_etl_spark.plans.stats import (
        QD_K,
        QD_L,
        portable_qdigest_quantiles,
        qdigest_nodes,
    )

    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    grid = [
        min(int((r["value"] * 100 + 0.5) // 1), (1 << 16) - 1)
        for r in e.select("value").collect()
    ]
    grid.sort()
    n = len(grid)
    t = max(1, n // QD_K)
    mults = Counter(grid)
    max_node = max(max(mults.values()), t)
    rows = portable_qdigest_quantiles(spark, sf_dir).collect()
    assert len(rows) == 4
    import bisect

    for r in rows:
        assert r["n_total"] == n
        target = (r["q_ppm"] * n + 999999) // 1000000
        cdf_est = bisect.bisect_right(grid, r["est_grid"])
        assert cdf_est >= target, r
        assert cdf_est <= target - 1 + max_node + QD_L * t, r
    # sketch mass conservation + size bound
    nd = qdigest_nodes(spark, sf_dir).collect()
    assert sum(x["cnt"] for x in nd) == n
    assert rows[0]["n_nodes"] == len(nd)


def test_qdigest_merge_preserves_mass_and_bound(spark, sf_dir):
    """Merging two half-corpus digests (concat node multisets, sum
    per id, re-compress at the combined T) yields a VALID digest:
    total mass preserved and every node count ≤ its level's merge
    threshold invariants.  (Unlike KMV, merge-then-compress is not
    bit-equal to from-scratch — q-digest's guarantee is the error
    bound, which doubles additively; both pins here.)"""
    import pandas as pd

    from fxblue_etl_spark.plans.stats import QD_K, _qdigest_compress

    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    leaf = (
        e.select(
            (
                F.lit(1 << 16)
                + F.greatest(
                    F.lit(0),
                    F.least(
                        F.floor(F.col("value") * 100 + F.lit(0.5)).cast(
                            "int"
                        ),
                        F.lit((1 << 16) - 1),
                    ),
                )
            ).alias("id"),
            (F.col("event_id") % 2).alias("half"),
        )
        .groupBy("half", "id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    halves = {0: {}, 1: {}}
    for r in leaf:
        halves[r["half"]][r["id"]] = r["cnt"]
    digests = []
    for h in (0, 1):
        pdf = pd.DataFrame(
            {"id": list(halves[h]), "cnt": list(halves[h].values())}
        )
        digests.append(_qdigest_compress(pdf))
    merged_in = (
        pd.concat(digests).groupby("id", as_index=False)["cnt"].sum()
    )
    merged = _qdigest_compress(merged_in)
    n = sum(sum(v.values()) for v in halves.values())
    assert int(merged["cnt"].sum()) == n
    # re-compressed node count stays sketch-sized (≈ n/T per level)
    t = max(1, n // QD_K)
    assert len(merged) <= (n // t + 1) * 17


def test_qdigest_leaf_grid_clamps_both_ends(spark):
    """A negative value must clamp to leaf 0 (id == QD_DOM), not
    produce an id below 2^16 that would be misread as an internal
    node — the round-9 advice item.  Mirrors the exact expression in
    qdigest_nodes / PORTABLE_QDIGEST_ORACLE."""
    from fxblue_etl_spark.plans.stats import QD_DOM

    df = spark.createDataFrame(
        [(-5.0,), (-0.004,), (0.0,), (655.34,), (99999.0,)], ["value"]
    ).select(
        (
            F.lit(QD_DOM)
            + F.greatest(
                F.lit(0),
                F.least(
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("int"),
                    F.lit(QD_DOM - 1),
                ),
            )
        ).alias("id")
    )
    ids = [r["id"] for r in df.collect()]
    assert ids == [QD_DOM, QD_DOM, QD_DOM, 2 * QD_DOM - 2, 2 * QD_DOM - 1]
    assert all(QD_DOM <= i < 2 * QD_DOM for i in ids)


def test_spearman_bucketed_equals_simple(spark, sf_dir, monkeypatch):
    """The distributed prefix-sum sibling must be BIT-identical to
    the simple-window plan — including under a tiny bucket width
    that forces thousands of buckets, so the bucket-offset algebra
    is exercised far past the fixture's natural ~160 buckets."""
    from fxblue_etl_spark.plans import stats

    key = lambda r: tuple(r[c] for c in r.__fields__)
    simple = sorted(
        map(key, stats.spearman_rank_corr(spark, sf_dir).collect())
    )
    bucketed = sorted(
        map(key, stats.spearman_rank_corr_bucketed(spark, sf_dir).collect())
    )
    assert bucketed == simple
    monkeypatch.setattr(stats, "SPEAR_BUCKET_W", 1 << 8)
    tiny = sorted(
        map(key, stats.spearman_rank_corr_bucketed(spark, sf_dir).collect())
    )
    assert tiny == simple


def test_spearman_size_gate_dispatches_both_ways(spark, sf_dir, monkeypatch):
    """Round-10 verdict item 4: spearman_rank_corr size-gates its
    rank plan.  Pin the boundary from both sides — at the standing
    gate the fixture takes the simple window (its per-group grid is
    far below SPEAR_GATE_ROWS); with the gate forced to 0 every
    fixture grid exceeds it, the bucketed tail engages, and the
    result is bit-identical (one query name, two certified plans)."""
    from fxblue_etl_spark.plans import stats

    # fixture sits on the simple side of the standing gate; the row
    # count is a sound upper bound on every per-group distinct-y grid
    n_rows = table(spark, sf_dir, "lineitem").count()
    li = stats._spearman_rows(spark, sf_dir)
    grid_max = (
        li.groupBy("g")
        .agg(F.countDistinct("y").alias("nd"))
        .agg(F.max("nd").alias("mx"))
        .collect()[0]["mx"]
    )
    assert grid_max <= n_rows < stats.SPEAR_GATE_ROWS

    key = lambda r: tuple(r[c] for c in r.__fields__)
    simple = sorted(
        map(key, stats.spearman_rank_corr(spark, sf_dir).collect())
    )
    bucketed_calls: list[int] = []
    orig_tail = stats._spearman_bucketed_tail

    def spy(frame):
        bucketed_calls.append(1)
        return orig_tail(frame)

    monkeypatch.setattr(stats, "_spearman_bucketed_tail", spy)
    monkeypatch.setattr(stats, "SPEAR_GATE_ROWS", 0)
    gated = sorted(
        map(key, stats.spearman_rank_corr(spark, sf_dir).collect())
    )
    assert bucketed_calls == [1], "gate=0 must route through the bucketed tail"
    assert gated == simple


def test_spearman_matches_pure_python_reference(spark, sf_dir):
    """ρ·1e6 must match a from-first-principles Python recompute
    (average ranks over collected rows, Pearson on ranks with exact
    Fractions) — the engine's grid-based rank algebra against the
    naive row-based definition."""
    from fractions import Fraction
    from math import isqrt

    from fxblue_etl_spark.plans.stats import spearman_rank_corr

    li = (
        table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("g"),
            F.floor(F.col("l_quantity") * 100).cast("long").alias("x"),
            F.floor(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        )
        .collect()
    )
    groups = {}
    for r in li:
        groups.setdefault(r["g"], []).append((r["x"], r["y"]))

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            r = Fraction(i + 1 + j, 2)  # average of ranks i+1..j
            for k2 in range(i, j):
                ranks[order[k2]] = r
            i = j
        return ranks

    got = {r["l_returnflag"]: r for r in spearman_rank_corr(spark, sf_dir).collect()}
    for g, pts in groups.items():
        xs = avg_ranks([p[0] for p in pts])
        ys = avg_ranks([p[1] for p in pts])
        n = len(pts)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        num = n * sxy - sx * sy
        d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
        rho = float(num) / float(d1 * d2) ** 0.5
        row = got[g]
        assert row["n_rows"] == n
        # floor-ppm of the double path: allow 1 ulp of slack at the
        # floor boundary vs this reference's different float path
        assert abs(row["rho_e6"] - int(rho * 1e6 // 1) ) <= 1, (g, row, rho)
        assert -1000000 <= row["rho_e6"] <= 1000000


def test_percentile_cont_exact_equals_both_native_builtins(spark, sf_dir):
    """The portable ×4-integer interpolation must equal BOTH engines'
    native percentile_cont on the same e2 grid — Spark's
    percentile() and DuckDB's quantile_cont() — exactly (the ×4
    value is ≤ 2e8 so /4 is exact in binary, making the equality
    bit-strict, not a tolerance)."""
    import duckdb

    from fxblue_etl_spark.plans.stats import (
        PCTL_QS,
        percentile_cont_exact,
    )

    got = {
        (r["o_orderstatus"], r["quarter"]): r
        for r in percentile_cont_exact(spark, sf_dir).collect()
    }
    # Spark native
    sp = {}
    o = table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    for q in PCTL_QS:
        for r in (
            o.groupBy("o_orderstatus")
            .agg(F.expr(f"percentile(v, {q}/4)").alias("p"))
            .collect()
        ):
            sp[(r["o_orderstatus"], q)] = r["p"]
    # DuckDB native
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM"
        f" read_parquet('{sf_dir}/orders.parquet')"
    )
    dk = {}
    for q in PCTL_QS:
        for status, p in con.sql(
            "SELECT o_orderstatus,"
            f" quantile_cont(CAST(floor(o_totalprice * 100) AS BIGINT),"
            f" {q}/4.0) FROM orders GROUP BY 1"
        ).fetchall():
            dk[(status, q)] = p
    assert set(got) == set(sp) == set(dk)
    for k, r in got.items():
        assert r["pctl_e2_x4"] == 4 * sp[k] == 4 * dk[k], (k, r, sp[k], dk[k])


def test_encoding_advisor_matches_python_reference(spark, sf_dir):
    """The block-decomposed run/delta computation must equal a naive
    sequential pass over the key-ordered rows (runs, max delta, ndv
    — all exact), including across every block boundary."""
    from fxblue_etl_spark.plans.stats import encoding_advisor_stats

    rows = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_custkey",
                "o_totalprice", "o_orderdate")
        .collect()
    )
    rows.sort(key=lambda r: r["o_orderkey"])
    import datetime

    base_day = datetime.date(1992, 1, 1)
    series = {
        "status_cp": [ord(r["o_orderstatus"][0]) for r in rows],
        "custkey": [r["o_custkey"] for r in rows],
        "price_e2": [int(r["o_totalprice"] * 100 // 1) for r in rows],
        "order_day": [
            (r["o_orderdate"].date() - base_day).days for r in rows
        ],
    }
    got = {
        r["col_name"]: r
        for r in encoding_advisor_stats(spark, sf_dir).collect()
    }
    assert set(got) == set(series)
    for name, vs in series.items():
        runs = 1 + sum(1 for a, b in zip(vs, vs[1:]) if a != b)
        dmax = max((abs(b - a) for a, b in zip(vs, vs[1:])), default=0)
        r = got[name]
        assert r["n_rows"] == len(vs)
        assert r["n_runs"] == runs, name
        assert r["ndv"] == len(set(vs))
        assert (r["delta_bits"] == 0) == (dmax == 0)
        if dmax:
            assert r["delta_bits"] == dmax.bit_length(), name
        assert r["rle_ratio_ppm"] == 1000000 * runs // len(vs)


def test_encoding_advisor_survives_key_gaps(spark, tmp_path):
    """Sparse keys: an entire empty block id between two rows of the
    SAME value must still count ONE run (the boundary pairing walks
    previous EXISTING blocks, not blk−1 arithmetic)."""
    import datetime

    import pandas as pd

    from fxblue_etl_spark.plans.stats import ENC_BLK, encoding_advisor_stats

    # keys 0, 1, and 3·ENC_BLK (blocks 0 and 3; blocks 1-2 empty),
    # all the same status/custkey/price/date → exactly one run each
    keys = [0, 1, 3 * ENC_BLK]
    pd.DataFrame(
        {
            "o_orderkey": keys,
            "o_custkey": [7] * 3,
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [100.0] * 3,
            "o_orderdate": pd.to_datetime(
                [datetime.date(1995, 1, 1)] * 3
            ),
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    ).to_parquet(tmp_path / "orders.parquet")
    got = {
        r["col_name"]: r
        for r in encoding_advisor_stats(spark, str(tmp_path)).collect()
    }
    for name, r in got.items():
        assert r["n_rows"] == 3
        assert r["n_runs"] == 1, (name, r)
        assert r["delta_max" if "delta_max" in r else "delta_bits"] == 0 or r["delta_bits"] == 0
