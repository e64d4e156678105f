"""Round-10 session additions: k-anonymity/l-diversity audit,
zone-map file-skipping economics, and the time-series /
link-prediction family added alongside them.  Each test pins a
semantic invariant the DuckDB oracle cannot express (the oracle
certifies cross-engine equality; these certify the CLAIM)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fxblue_etl_spark.io import table
from fxblue_etl_spark.plans.dq import (
    K_ANON_K,
    L_DIVERSITY_L,
    k_anonymity_audit,
)
from fxblue_etl_spark.plans.zorder import zonemap_file_skipping


def test_k_anonymity_partition_covers_all_customers(spark, sf_dir):
    out = k_anonymity_audit(spark, sf_dir).collect()
    n_customers = table(spark, sf_dir, "customer").count()
    # QI groups partition the customer set: distinct-customer counts
    # over disjoint groups must sum to the table cardinality
    assert sum(r["k_customers"] for r in out) == n_customers
    for r in out:
        assert r["k_customers"] >= 1
        # l counts DISTINCT priorities of the group's orders; a group
        # can't be more diverse than TPC-H's 5 priority levels
        assert 0 <= r["l_priorities"] <= 5
        assert r["at_risk_k"] == int(r["k_customers"] < K_ANON_K)
        assert r["at_risk_l"] == int(r["l_priorities"] < L_DIVERSITY_L)


def test_k_anonymity_flags_are_nontrivial(spark, sf_dir):
    # the audit is only useful if the fixture exercises the risky
    # side of the flag; at sf0.01+ (1.5k customers over ~900 QI
    # groups) both sides appear — sf0.001's 150 customers are ALL in
    # sub-k groups, which the audit correctly reports
    out = k_anonymity_audit(spark, sf_dir).collect()
    ks = {r["at_risk_k"] for r in out}
    assert 1 in ks
    n_customers = table(spark, sf_dir, "customer").count()
    if n_customers >= 1000:
        assert ks == {0, 1}, ks


def test_zonemap_pruning_is_sound_and_clustered_wins(spark, sf_dir):
    out = zonemap_file_skipping(spark, sf_dir).collect()
    by = {(r["layout"], r["probe"]): r for r in out}
    probes = {p for (_, p) in by}
    assert len(by) == 2 * len(probes)
    total_rows = table(spark, sf_dir, "lineitem").count()
    for (layout, probe), r in by.items():
        # soundness: a skipped file contains no matching rows, so the
        # surviving files must hold every match
        assert r["rows_scanned"] >= r["rows_matched"]
        assert 0 <= r["n_files_skipped"] <= r["n_files"]
        assert r["rows_scanned"] <= total_rows
        assert 0 <= r["scan_efficiency_ppm"] <= 1_000_000
    for probe in probes:
        arr, clu = by[("arrival", probe)], by[("clustered", probe)]
        # matched counts are layout-independent by construction
        assert arr["rows_matched"] == clu["rows_matched"]
        # the clustering claim: range-clustered files never scan more
        # than the arrival layout for a range predicate, and for
        # probes with matches inside the data's domain they scan
        # strictly less (the arrival layout's zone maps are all-span)
        assert clu["rows_scanned"] <= arr["rows_scanned"]
        if clu["rows_matched"] > 0:
            assert clu["scan_efficiency_ppm"] >= arr["scan_efficiency_ppm"]


def test_zonemap_empty_probes_skip_everything_clustered(spark, sf_dir):
    # quarters outside the shipdate domain (the 1995Q1 head before
    # 1995-01-02 has matches; 2001Q4 tail after 2001-11-04 partially
    # matches) — any probe with zero matches must scan zero rows
    # under the clustered layout (its zone maps tile the day axis)
    out = zonemap_file_skipping(spark, sf_dir).collect()
    for r in out:
        if r["layout"] == "clustered" and r["rows_matched"] == 0:
            assert r["rows_scanned"] == 0
            assert r["scan_efficiency_ppm"] == 0


def _snm_bruteforce(rows):
    """Plain-Python replay of the SNM contract: global sort ranks per
    pass (the bucketed two-level rank must equal exactly this), rank
    window, union of passes, bigram-Jaccard verify."""
    import re

    def norm(t):
        return re.sub(r"\s+", " ", t.strip()).lower()

    def grams(t):
        toks = [x for x in norm(t).split(" ") if x]
        if len(toks) < 2:
            return None
        return {
            " ".join(toks[i : i + 2]) for i in range(max(len(toks) - 2, 0) + 1)
        }

    docs = [
        (r["doc_id"], norm(r["text"]), grams(r["text"]))
        for r in rows
        if grams(r["text"]) is not None
    ]
    cand = {}
    for pass_id, key in ((1, lambda n: n[:32]), (2, lambda n: n[::-1][:32])):
        order = sorted(docs, key=lambda d: (key(d[1]), d[0]))
        for i, (ida, _, _) in enumerate(order):
            for gap in (1, 2, 3):
                if i + gap >= len(order):
                    break
                idb = order[i + gap][0]
                k = (min(ida, idb), max(ida, idb))
                passes, mg = cand.get(k, (set(), 99))
                passes.add(pass_id)
                cand[k] = (passes, min(mg, gap))
    gr = {d[0]: d[2] for d in docs}
    out = {}
    for (a, b), (passes, mg) in cand.items():
        inter = len(gr[a] & gr[b])
        j_ppm = (1_000_000 * inter) // (len(gr[a]) + len(gr[b]) - inter)
        if j_ppm >= 500_000:
            out[(a, b)] = (len(passes), mg, j_ppm)
    return out


def test_snm_matches_bruteforce_exactly(spark, sf_dir):
    # the load-bearing claim: the sort-free bucketed two-level rank +
    # equi-join window reproduces EXACTLY the textbook "sort
    # globally, slide a window" SNM — pair set, pass counts, gaps,
    # and verified Jaccard all identical
    from fxblue_etl_spark.operators.dedup import snm_sorted_neighborhood_pairs

    rows = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    expected = _snm_bruteforce(rows)
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_passes"], r["min_gap"], r["jaccard_ppm"])
        for r in snm_sorted_neighborhood_pairs(spark, sf_dir).collect()
    }
    assert got == expected
    # the fixture genuinely exercises the operator (near-dup pairs
    # exist and survive the 0.5 verify threshold)
    assert len(got) > 0
    for n_passes, min_gap, j_ppm in got.values():
        assert 1 <= n_passes <= 2
        assert 1 <= min_gap <= 3
        assert j_ppm >= 500_000


def test_dp_noisy_release_mechanism_contract(spark, sf_dir):
    from fxblue_etl_spark.plans.dq import (
        DP_DOMAIN,
        DP_TRUNC,
        _DP_SIZES,
        dp_noisy_release,
    )

    # the ladder IS the mechanism: symmetric, geometric-halving sizes,
    # exact integer domain
    sizes = dict(_DP_SIZES)
    assert DP_DOMAIN == sum(sizes.values())
    for k in range(1, DP_TRUNC + 1):
        assert sizes[k] == sizes[-k] == 2 ** (DP_TRUNC - k)
    assert sizes[0] == 2**DP_TRUNC

    out = dp_noisy_release(spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r["true_n"] for r in out) == n_docs
    for r in out:
        assert -DP_TRUNC <= r["noise"] <= DP_TRUNC
        assert r["released_n"] == max(0, r["true_n"] + r["noise"])
        assert r["abs_err"] == abs(r["noise"])
    # keyed draw is deterministic: a second invocation releases the
    # identical histogram (the cross-engine certification rests on it)
    again = {
        (r["lang"], r["source"]): r["noise"]
        for r in dp_noisy_release(spark, sf_dir).collect()
    }
    assert again == {(r["lang"], r["source"]): r["noise"] for r in out}
    # utility: the truncated-geometric at alpha=1/2 has E|noise| ~ 0.9;
    # a released histogram whose mean absolute error drifts past 3
    # means the ladder (or the bucket hash) broke
    assert sum(r["abs_err"] for r in out) / len(out) <= 3.0


def test_record_linkage_fs_evidence_table(spark, sf_dir):
    from fxblue_etl_spark.operators.linkage import record_linkage_fs

    out = record_linkage_fs(spark, sf_dir).collect()
    n_cust = table(spark, sf_dir, "customer").count()
    tot_m = sum(r["n_match"] for r in out)
    tot_u = sum(r["n_nonmatch"] for r in out)
    # pattern rows partition the candidate set
    assert sum(r["n_pairs"] for r in out) == tot_m + tot_u
    # blocking recall: every true pair survives unless its off-by-one
    # balance crossed a block boundary (rare) — and a record can never
    # match more than once
    assert 0.9 * n_cust <= tot_m <= n_cust
    # m/u are probabilities over their populations
    assert sum(r["m_ppm"] for r in out) <= 1_000_000
    assert sum(r["u_ppm"] for r in out) <= 1_000_000
    by = {(r["agree_name"], r["agree_bal"], r["agree_seg"]): r for r in out}
    # name agreement among true matches tracks the 20% knockout rate
    m_name = sum(r["m_ppm"] for k, r in by.items() if k[0] == 1)
    assert 700_000 <= m_name <= 900_000
    # a unique field agreeing is near-conclusive: u(name agrees) ~ 0
    u_name = sum(r["u_ppm"] for k, r in by.items() if k[0] == 1)
    assert u_name < 10_000
    # the Fellegi-Sunter ordering: full agreement carries the highest
    # finite odds (or is match-only: odds NULL = infinite evidence)
    full = by.get((1, 1, 1))
    assert full is not None and full["n_match"] > 0
    finite = [r["odds_ppm"] for r in out if r["odds_ppm"] is not None]
    if full["odds_ppm"] is not None:
        assert full["odds_ppm"] == max(finite)
    # zero-agreement pairs are overwhelmingly non-matches
    none_ = by.get((0, 0, 0))
    if none_ is not None and none_["odds_ppm"] is not None:
        assert none_["odds_ppm"] < 1_000_000


def test_pca_power_iteration_matches_numpy_eig(spark, sf_dir):
    import numpy as np

    from fxblue_etl_spark.operators.ml import (
        PCA_SCALE,
        PCA_SQUARINGS,
        pca_power_iteration,
    )

    out = pca_power_iteration(spark, sf_dir).collect()
    assert len(out) == 64
    v = np.zeros(64)
    for r in out:
        v[r["dim_i"]] = r["v_scaled"]
        assert abs(r["v_scaled"]) <= PCA_SCALE
        assert r["n_rounds"] == PCA_SQUARINGS
        assert 0 <= r["ev_ppm"] <= 1_000_000
    # ground truth: numpy eigendecomposition of the SAME quantized Gram
    emb = np.stack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in table(spark, sf_dir, "embeddings").collect()
        ]
    )
    q = np.floor(emb * 1e3).astype(np.int64)
    G = (q.T @ q).astype(np.float64)
    evals, evecs = np.linalg.eigh(G)
    top = evecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    # 6 squarings = G^64: even on this near-isotropic spectrum
    # (lambda2/lambda1 ~ 0.93) the dominant axis is isolated to
    # better than half a degree
    assert cos > 0.999, cos
    lam = out[0]["lam_e3q"]
    # infinity-norm eigenvalue off the converged vector sits within
    # grid-quantization distance of the true lambda_max
    assert 0.99 * evals[-1] <= lam <= 1.01 * evals[-1]


def test_gram_upsert_equivalence_and_float_counterexample(spark, sf_dir):
    import numpy as np

    from fxblue_etl_spark.operators.ml import gram_upsert_equivalence

    r = gram_upsert_equivalence(spark, sf_dir).collect()[0]
    assert r["incremental_equals_rebuild"] == 1
    assert r["n_only_incremental"] == 0
    assert r["n_only_rebuild"] == 0
    assert r["n_report_rows"] == 64 * 65 // 2
    # the claim's WHY: on the integer grid split-sum == full-sum is
    # algebra; in float32 the same merge is order-dependent (this is
    # the counterexample that justifies the e3 grid)
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(10_000) * 1e6).astype(np.float32)
    full = x.sum(dtype=np.float32)
    split = x[::2].sum(dtype=np.float32) + x[1::2].sum(dtype=np.float32)
    assert full != split  # float maintenance would NOT certify
    xi = np.floor(x).astype(np.int64)
    assert xi.sum() == xi[::2].sum() + xi[1::2].sum()


def test_scd2_asof_consistency_holds_and_is_load_bearing(spark, sf_dir):
    from fxblue_etl_spark.operators.temporal import (
        ASOF_PROBES,
        scd2_asof_consistency,
    )

    out = {r["probe_date"]: r for r in scd2_asof_consistency(spark, sf_dir).collect()}
    assert set(out) == set(ASOF_PROBES)
    for r in out.values():
        # the audited invariant: interval reconstruction == raw facts
        assert r["consistent"] == 1
        assert r["n_cust_interval"] == r["n_cust_fact"] > 0
        assert r["spend_cents_interval"] == r["spend_cents_fact"] > 0
    # probes are ordered in time, so the as-of state grows monotonically
    seq = [out[p] for p in ASOF_PROBES]
    for a, b in zip(seq, seq[1:]):
        assert a["n_orders_fact"] <= b["n_orders_fact"]
        assert a["spend_cents_fact"] <= b["spend_cents_fact"]


def test_kcenter_coreset_matches_bruteforce_greedy(spark, sf_dir):
    import numpy as np

    from fxblue_etl_spark.operators.ml import KC_K, kcenter_coreset

    rows = table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    q = np.floor(np.stack([np.asarray(r["embedding"], float) for r in rows]) * 1e3).astype(np.int64)
    # plain-Python replay of Gonzalez greedy with min-id tie-breaks
    order = np.argsort(ids)
    ids, q = ids[order], q[order]
    sel = [int(ids[0])]
    dm = ((q - q[0]) ** 2).sum(axis=1)
    expected = [(1, sel[0], None)]
    for r in range(2, KC_K + 1):
        best = int(np.max(dm))
        cands = ids[dm == best]
        pick = int(cands.min())
        expected.append((r, pick, best))
        pi = int(np.where(ids == pick)[0][0])
        dm = np.minimum(dm, ((q - q[pi]) ** 2).sum(axis=1))
        sel.append(pick)
    out = sorted(
        (r["sel_round"], r["vec_id"], r["radius"]) for r in kcenter_coreset(spark, sf_dir).collect()
    )
    assert out == expected
    got = kcenter_coreset(spark, sf_dir).collect()
    cover = {r["coverage_radius"] for r in got}
    assert cover == {int(dm.max())}
    # radii are non-increasing (each pick closes the largest gap) and
    # the final coverage radius is bounded by the last pick's radius
    radii = [r for _, _, r in expected[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    assert int(dm.max()) <= radii[-1]


def test_changepoint_matches_bruteforce_and_planted_shift(spark, sf_dir):
    import numpy as np

    from fxblue_etl_spark.operators.temporal import (
        CP_UNIT,
        changepoint_detection,
    )

    daily = sorted(
        (r["d"], r["cents"])
        for r in table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("string").alias("d"))
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100)).cast("long").alias("cents"))
        .collect()
    )
    y = np.array([c // CP_UNIT for _, c in daily], dtype=np.int64)
    n = len(y)
    cy = np.cumsum(y)
    best = None
    max_rs = 0
    for k in range(2, n + 1):  # 1-based split index: right starts at k
        sl, nl = int(cy[k - 2]), k - 1
        sr, nr = int(cy[-1]) - int(cy[k - 2]), n - k + 1
        rs = (sl * sl * nr + sr * sr * nl) // (nl * nr)
        max_rs = max(max_rs, rs)
        if best is None or rs > best[0] or (rs == best[0] and k < best[1]):
            best = (rs, k)
    # packing headroom (round-10 advice): the argmax packs
    # rs * CP_SHIFT into int64, where Spark would WRAP silently while
    # DuckDB errors — a divergence, not a caught failure.  Pin the
    # bound over EVERY candidate split, with 2^16 spare on top of
    # the 2^16 shift.
    assert max_rs < 1 << 46, max_rs
    r = changepoint_detection(spark, sf_dir).collect()[0]
    assert r["split_date"] == daily[best[1] - 1][0]
    assert r["r_split"] == best[0]
    assert r["n_days_left"] == best[1] - 1
    assert r["n_days_left"] + r["n_days_right"] == n
    # splitting can never score below the single-segment baseline
    assert r["gain"] >= 0
    assert r["r_split"] >= r["r_baseline"]


def test_streaming_gram_maintenance_split_invariant_equals_batch(spark, sf_dir):
    from fxblue_etl_spark.operators.ml import embedding_gram_matrix
    from fxblue_etl_spark.streaming.pipelines import streaming_gram_maintenance

    batch = {
        (r["i"], r["j"]): r["cross_sum"]
        for r in embedding_gram_matrix(spark, sf_dir).collect()
    }
    for n_splits in (1, 4):
        prog: list = []
        got = {
            (r["i"], r["j"]): r["cross_sum"]
            for r in streaming_gram_maintenance(
                spark, sf_dir, prog, n_splits=n_splits
            ).collect()
        }
        # incremental == rebuild EXACTLY, for any micro-batch split
        assert got == batch
        # state is sketch-shaped: d(d+1)/2 cells regardless of corpus
        assert len(got) == 64 * 65 // 2
        if n_splits == 4:
            # the stream really ran as multiple micro-batches
            assert len([p for p in prog if p.get("numInputRows", 0) > 0]) >= 2


def test_group_aware_folds_prevent_pair_leakage(spark, sf_dir):
    from fxblue_etl_spark.operators.graph import CV_FOLDS, group_aware_folds

    out = group_aware_folds(spark, sf_dir).collect()
    n_vecs = table(spark, sf_dir, "embeddings").count()
    assert 1 <= len(out) <= CV_FOLDS
    assert sum(r["n_vecs"] for r in out) == n_vecs
    for r in out:
        # a fold can't hold more components than members
        assert 1 <= r["n_components"] <= r["n_vecs"]
        # the construction guarantee: component-keyed folds never
        # split a near-dup pair
        assert r["group_straddle_pairs"] == 0
        # the counterfactual is the point: naive doc-hash folding
        # WOULD have leaked pairs across the boundary (4/5 of pairs
        # in expectation; assert it is at least nonzero when the
        # fixture has pairs at all)
        if n_vecs >= 500:
            assert r["naive_straddle_pairs"] > 0


def test_padding_waste_sorted_batching_wins(spark, sf_dir):
    from fxblue_etl_spark.operators.corpusops import (
        PAD_BATCH,
        padding_waste_report,
    )

    out = {r["strategy"]: r for r in padding_waste_report(spark, sf_dir).collect()}
    assert set(out) == {"arrival", "sorted"}
    arr, srt = out["arrival"], out["sorted"]
    n_docs = table(spark, sf_dir, "documents").count()
    for r in (arr, srt):
        assert r["n_batches"] == -(-n_docs // PAD_BATCH)
        # padded slots can never undercut the real tokens
        assert r["padded_slots"] >= r["total_tokens"] > 0
        assert 0 <= r["waste_ppm"] < 1_000_000
    # strategies see the same corpus
    assert arr["total_tokens"] == srt["total_tokens"]
    # the claim being sold: length-sorted batching strictly reduces
    # padded slots on any corpus with length variance
    assert srt["padded_slots"] <= arr["padded_slots"]
    assert srt["waste_ppm"] <= arr["waste_ppm"]


def test_theilsen_trend_matches_bruteforce_and_robustness(spark, sf_dir):
    from fxblue_etl_spark.operators.temporal import theilsen_trend

    monthly = sorted(
        (r["m"], r["cents"])
        for r in table(spark, sf_dir, "orders")
        .groupBy(
            F.substring(F.col("o_orderdate").cast("string"), 1, 7).alias("m")
        )
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100)).cast("long").alias("cents"))
        .collect()
    )
    ys = [c for _, c in monthly]
    n = len(ys)
    # python // floors, matching the portable pmod floor division
    slopes = sorted(
        (ys[j] - ys[i]) // (j - i)
        for i in range(n)
        for j in range(i + 1, n)
    )
    r = theilsen_trend(spark, sf_dir).collect()[0]
    assert r["n_months"] == n
    assert r["n_pairs"] == n * (n - 1) // 2
    assert r["ts_slope_cents"] == slopes[(len(slopes) + 1) // 2 - 1]
    # OLS on the same data via exact integer normal equation
    sx = n * (n + 1) // 2
    sxx = sum(x * x for x in range(1, n + 1))
    sy = sum(ys)
    sxy = sum(x * y for x, y in enumerate(ys, 1))
    assert r["ols_slope_cents"] == (n * sxy - sx * sy) // (n * sxx - sx * sx)


def test_ranking_metrics_exact_against_python_replay(spark, sf_dir):
    from fxblue_etl_spark.operators.retrieval import (
        NDCG_D,
        NDCG_IDEAL,
        NDCG_K,
        ranking_metrics_report,
    )
    from fxblue_etl_spark.operators.similarity import cosine_topk_bruteforce

    # the constant-ideal precondition: every label holds >= K
    # same-label vectors (so IDCG == sum(NDCG_D) for every query)
    labels = [r["label"] for r in table(spark, sf_dir, "embeddings").collect()]
    from collections import Counter

    assert min(Counter(labels).values()) >= NDCG_K + 1
    lab = {
        r["vec_id"]: r["label"]
        for r in table(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    perq = {}
    for r in cosine_topk_bruteforce(spark, sf_dir).collect():
        q = r["query_id"]
        perq.setdefault(q, []).append((r["rank"], lab[r["neighbor_id"]] == lab[q]))
    expected = {}
    for q, rows in perq.items():
        rows.sort()
        hits = sum(rel for _, rel in rows)
        first = next((rk for rk, rel in rows if rel), None)
        dcg = sum(NDCG_D[rk - 1] for rk, rel in rows if rel)
        expected.setdefault(lab[q], []).append(
            (
                1_000_000 * hits // NDCG_K,
                1_000_000 // first if first else 0,
                1_000_000 * dcg // NDCG_IDEAL,
            )
        )
    out = {r["label"]: r for r in ranking_metrics_report(spark, sf_dir).collect()}
    assert set(out) == set(expected)
    for lbl, triples in expected.items():
        n = len(triples)
        r = out[lbl]
        assert r["n_queries"] == n
        assert r["mean_precision_ppm"] == sum(t[0] for t in triples) // n
        assert r["mrr_ppm"] == sum(t[1] for t in triples) // n
        assert r["mean_ndcg_ppm"] == sum(t[2] for t in triples) // n
        # metric sanity: ndcg >= precision is NOT generally true, but
        # all three live in [0, 1e6]
        for v in (r["mean_precision_ppm"], r["mrr_ppm"], r["mean_ndcg_ppm"]):
            assert 0 <= v <= 1_000_000


def test_merkle_digest_flags_exactly_the_changed_blocks(spark, sf_dir):
    from fxblue_etl_spark.operators.corpusops import _hash_bucket
    from fxblue_etl_spark.plans.dq import (
        MKL_BLOCK,
        MKL_BLOCK_PCT,
        MKL_ROW_PCT,
        merkle_table_digest,
    )

    o = table(spark, sf_dir, "orders")
    blk = F.expr(f"o_orderkey DIV {MKL_BLOCK}")
    changed_blocks = {
        r["b"]
        for r in o.select(
            blk.alias("b"),
            _hash_bucket(blk, "mklb|", 100).alias("bb"),
            _hash_bucket(F.col("o_orderkey"), "mklr|", 100).alias("br"),
        )
        .filter((F.col("bb") < MKL_BLOCK_PCT) & (F.col("br") < MKL_ROW_PCT))
        .select("b")
        .distinct()
        .collect()
    }
    out = merkle_table_digest(spark, sf_dir).collect()
    # the block_id = -1 sentinel row (round-10 advice) carries the
    # tree summary even when NO blocks differ — a no-diff run still
    # certifies roots_match instead of returning zero rows
    sentinel = [r for r in out if r["block_id"] == -1]
    assert len(sentinel) == 1
    assert sentinel[0]["digest_a16"] is None
    assert sentinel[0]["n_rows_a"] is None
    diffs = [r for r in out if r["block_id"] != -1]
    # the tree flags EXACTLY the blocks whose rows changed — no false
    # positives (digest collisions) and no misses
    assert {r["block_id"] for r in diffs} == changed_blocks
    for r in diffs:
        assert r["digest_a16"] != r["digest_b16"]
        # the delta is update-only, so block cardinalities agree
        assert r["n_rows_a"] == r["n_rows_b"]
    for r in out:
        assert r["n_diff_blocks"] == len(changed_blocks)
        assert r["roots_match"] == int(len(changed_blocks) == 0)


def test_hybrid_skew_join_equals_plain_join_with_honest_routing(spark, sf_dir):
    from fxblue_etl_spark.operators.skew import (
        HYBRID_HOT_MIN,
        hybrid_skew_join_revenue,
    )

    out = hybrid_skew_join_revenue(spark, sf_dir).collect()
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    plain = {
        r["c_nationkey"]: (r["cents"], r["n"])
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100)).cast("long").alias("cents"),
            F.count("*").cast("long").alias("n"),
        )
        .collect()
    }
    assert {r["nationkey"]: (r["revenue_cents"], r["n_orders"]) for r in out} == plain
    # routing accounting: paths partition the join output
    r0 = out[0]
    assert r0["n_hot_rows"] + r0["n_cold_rows"] == sum(n for _, n in plain.values())
    hot = (
        o.groupBy("o_custkey").agg(F.count("*").alias("n"))
        .filter(F.col("n") > HYBRID_HOT_MIN)
        .collect()
    )
    assert r0["n_hot_keys"] == len(hot)
    assert r0["n_hot_rows"] == sum(r["n"] for r in hot)
    # the fixture exercises both paths at sf0.01+ (skewed key mass)
    if o.count() >= 10_000:
        assert r0["n_hot_keys"] > 0 and r0["n_cold_rows"] > 0


def test_cdc_chunking_matches_python_replay_and_offset_invariance(spark, sf_dir):
    from fxblue_etl_spark.operators.dedup import (
        CDC_DIV,
        CDC_M,
        CDC_PW,
        CDC_W,
        cdc_chunk_dedup,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }

    # python replay of the exact chunk partition per doc
    all_chunks = []
    for text in docs.values():
        codes = [ord(c) for c in text]
        bounds = []
        for i in range(len(codes)):
            h = (
                sum(
                    (codes[i - j] if i - j >= 0 else 0) * CDC_PW[j]
                    for j in range(CDC_W)
                )
                % CDC_M
            )
            bounds.append(1 if h % CDC_DIV == 0 else 0)
        chunks = {}
        prev_cum = 0
        for i, c in enumerate(codes):
            chunks.setdefault(prev_cum, []).append(c)
            prev_cum += bounds[i]
        all_chunks.extend(tuple(v) for v in chunks.values())
    n_chunks = len(all_chunks)
    distinct = set(all_chunks)
    bytes_total = sum(len(c) for c in all_chunks)
    bytes_stored = sum(len(c) for c in distinct)
    r = cdc_chunk_dedup(spark, sf_dir).collect()[0]
    assert r["n_chunks"] == n_chunks
    assert r["n_distinct_chunks"] == len(distinct)
    assert r["n_dup_chunks"] == n_chunks - len(distinct)
    assert r["bytes_total"] == bytes_total
    assert r["bytes_stored"] == bytes_stored
    assert r["savings_ppm"] == 1_000_000 * (bytes_total - bytes_stored) // bytes_total
    # the technique's reason to exist: shared substrings align to
    # identical chunks, so the near-dup-rich fixture shows real savings
    assert r["n_dup_chunks"] > 0


def test_cdc_empty_text_contributes_no_char_rows(spark):
    """Round-10 advice: Spark's sequence(1, 0) yields the DESCENDING
    [1, 0] (two rows) while the oracle's range(1, len+1) is empty —
    cdc_chunk_dedup gates the explode on length(text) >= 1 so empty
    documents contribute no char rows in either engine.  Pin both
    the engine divergence the guard defends against and the guarded
    lineage's behavior on an empty document."""
    # the divergence itself: un-guarded sequence(1, 0) is non-empty
    raw = spark.sql("SELECT size(sequence(1, 0)) AS n").collect()[0]["n"]
    assert raw == 2  # would emit 2 phantom char rows per empty doc
    # the guarded char-grid stage (the exact cdc_chunk_dedup shape)
    d = spark.createDataFrame(
        [("empty", ""), ("one", "a")], "doc_id string, text string"
    )
    chars = (
        d.filter(F.length("text") >= 1)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
        )
        .collect()
    )
    assert [(r["doc_id"], r["i"]) for r in chars] == [("one", 1)]


def test_poisson_bootstrap_ci_brackets_the_mean_and_replays(spark, sf_dir):
    from fxblue_etl_spark.plans.stats import (
        BOOT_B,
        BOOT_DOM,
        _boot_ladder,
        poisson_bootstrap_ci,
    )

    ladder = _boot_ladder()
    # ladder sanity: monotone thresholds ending exactly at the domain,
    # and the mass of each step matches Poisson(1) to ladder precision
    assert ladder[-1][1] == BOOT_DOM
    assert all(a[1] < b[1] for a, b in zip(ladder, ladder[1:]))
    import math

    for (k, thr), prev in zip(ladder, [0] + [t for _, t in ladder]):
        width = thr - prev
        expect = math.exp(-1) / math.factorial(k) * BOOT_DOM
        assert abs(width - expect) <= 2 or k == 7

    r = poisson_bootstrap_ci(spark, sf_dir).collect()[0]
    assert r["n_replicas"] == BOOT_B
    assert r["boot_lo_cents"] <= r["boot_hi_cents"]
    assert r["ci_width_cents"] == r["boot_hi_cents"] - r["boot_lo_cents"]
    # the interval is a resampling CI for the mean: it must bracket
    # the full-sample mean (Poisson weights are unbiased) and be
    # narrow relative to the scale of the mean at fixture sizes
    assert r["boot_lo_cents"] <= r["mean_cents"] <= r["boot_hi_cents"]
    assert r["ci_width_cents"] < r["mean_cents"] // 5
    # determinism: identical on re-run
    assert poisson_bootstrap_ci(spark, sf_dir).collect()[0] == r


def test_feature_hashing_knn_matches_python_replay(spark, sf_dir):
    import hashlib
    import re
    from collections import Counter

    from fxblue_etl_spark.operators.tfidf import (
        FH_DIMS,
        FH_K,
        FH_STRIDE,
        feature_hashing_knn,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }

    def vec(text):
        toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
        c = Counter(
            int(hashlib.md5(f"fh|{t}".encode()).hexdigest()[:8], 16) % FH_DIMS
            for t in toks
        )
        return c

    vs = {d: vec(t) for d, t in docs.items()}
    n2 = {d: sum(v * v for v in c.values()) for d, c in vs.items()}
    expected = {}
    for q in (d for d in docs if d % FH_STRIDE == 0):
        scored = []
        for c in docs:
            if c == q:
                continue
            dot = sum(vs[q][k] * vs[c].get(k, 0) for k in vs[q])
            if dot == 0:
                continue  # no shared dims -> no row from the sparse join
            scored.append(((1_000_000 * dot * dot) // (n2[q] * n2[c]), c))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (ppm, c) in enumerate(scored[:FH_K], 1):
            expected[(q, c)] = (ppm, rank)
    got = {
        (r["query_id"], r["neighbor_id"]): (r["cos2_ppm"], r["rank"])
        for r in feature_hashing_knn(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_lexical_hard_negatives_exclude_dups_and_rerank(spark, sf_dir):
    from fxblue_etl_spark.operators.dedup import minhash_lsh_pairs
    from fxblue_etl_spark.operators.tfidf import (
        FH_K,
        _fh_scored,
        lexical_hard_negatives,
    )

    negs = lexical_hard_negatives(spark, sf_dir).collect()
    dups = set()
    for r in minhash_lsh_pairs(spark, sf_dir).collect():
        dups.add((r["doc_a"], r["doc_b"]))
        dups.add((r["doc_b"], r["doc_a"]))
    scored = {}
    for r in _fh_scored(spark, sf_dir).collect():
        scored.setdefault(r["query_id"], []).append(
            (r["cos2_ppm"], r["neighbor_id"])
        )
    for r in negs:
        # no near-dup may ever surface as a negative
        assert (r["query_id"], r["negative_id"]) not in dups
        assert 1 <= r["rank"] <= FH_K
    # re-ranking is exactly "drop dups, then take top-K"
    by_q = {}
    for r in negs:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["negative_id"], r["cos2_ppm"]))
    for q, rows in by_q.items():
        cand = sorted(
            ((ppm, n) for ppm, n in scored[q] if (q, n) not in dups),
            key=lambda t: (-t[0], t[1]),
        )[:FH_K]
        expect = [(i + 1, n, ppm) for i, (ppm, n) in enumerate(cand)]
        assert sorted(rows) == expect


def test_quantile_normalization_maps_onto_reference(spark, sf_dir):
    from fxblue_etl_spark.operators.corpusops import quantile_normalization

    out = {r["source"]: r for r in quantile_normalization(spark, sf_dir).collect()}
    rows = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    ref = sorted((r["n_chars"], r["doc_id"]) for r in rows)
    vals = [v for v, _ in ref]
    n = len(vals)
    per_src = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append((r["n_chars"], r["doc_id"]))
    for src, docs in per_src.items():
        docs.sort()
        ns = len(docs)
        norm = [vals[(rk * n) // ns] for rk in range(ns)]  # rk = r-1; pos-1
        raw = [v for v, _ in docs]
        got = out[src]
        assert got["n_docs"] == ns
        assert got["mean_raw"] == sum(raw) // ns
        assert got["mean_norm"] == sum(norm) // ns
        assert got["max_abs_shift"] == max(abs(a - b) for a, b in zip(norm, raw))
