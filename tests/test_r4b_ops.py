"""Round-4 second-wave operators: Gram matrix, perplexity cutoffs,
tokenizer fertility, weighted priority sampling. Value parity with
DuckDB is the oracle gate's job; these pin the algebraic invariants."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from fxblue_etl_spark.operators.corpusops import (
    WEIGHTED_SAMPLE_K,
    tokenizer_fertility,
    weighted_priority_sample,
)
from fxblue_etl_spark.operators.ml import embedding_gram_matrix
from fxblue_etl_spark.operators.tfidf import (
    N_PPX_BUCKETS,
    perplexity_bucket_cutoffs,
)


def test_gram_matrix_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    q = np.stack(
        [
            np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1e3)
            for r in emb
        ]
    ).astype(np.int64)
    expect = q.T @ q
    rows = embedding_gram_matrix(spark, sf_dir).collect()
    d = q.shape[1]
    assert len(rows) == d * (d + 1) // 2
    for r in rows:
        assert r["i"] <= r["j"]
        assert r["cross_sum"] == expect[r["i"], r["j"]]


def test_perplexity_cutoffs_ntile_arithmetic(spark, sf_dir):
    rows = perplexity_bucket_cutoffs(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["bucket"])
        assert [r["bucket"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= N_PPX_BUCKETS
        # ntile balance: sizes differ by at most one, larger first
        sizes = [r["n_docs"] for r in rs]
        assert max(sizes) - min(sizes) <= 1
        assert sizes == sorted(sizes, reverse=True)
        # cutoffs are non-decreasing with bucket rank
        cuts = [r["cutoff_ppm"] for r in rs]
        assert cuts == sorted(cuts)
    # bucket sizes tile each language's scored-doc population exactly:
    # only docs with >= 2 tokens receive an LM score
    n_scored = (
        docs.selectExpr(
            "size(filter(split(trim(text), '\\\\s+'), t -> t != '')) AS n"
        )
        .filter("n >= 2")
        .count()
    )
    assert sum(r["n_docs"] for r in rows) == n_scored


def test_tokenizer_fertility_quotient_identity(spark, sf_dir):
    rows = tokenizer_fertility(spark, sf_dir).collect()
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == docs_n
    for r in rows:
        assert r["chars_per_tok_ppm"] == (
            1_000_000 * r["char_sum"] // max(r["tok_sum"], 1)
        )
        # whitespace-separated text: at least one more char than
        # tokens unless empty
        assert r["char_sum"] >= r["tok_sum"] - r["n_docs"]


def test_weighted_sample_race_is_deterministic_md5(spark, sf_dir):
    rows = weighted_priority_sample(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= WEIGHTED_SAMPLE_K
        pri = [(r["priority"], r["doc_id"]) for r in rs]
        assert pri == sorted(pri)
    # the race key re-derives from md5 exactly
    for r in rows[:25]:
        u = int(
            hashlib.md5(f"wsample|{r['doc_id']}".encode()).hexdigest()[:8], 16
        )
        assert r["priority"] == u // r["weight"]


def _pq_numpy_fixture(spark, sf_dir):
    from fxblue_etl_spark.operators.ml import K_PQ, M_PQ, SUB_D

    emb = {
        r["vec_id"]: np.floor(
            np.asarray(r["embedding"], dtype=np.float64) * 1e3
        ).astype(np.int64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    cb = {
        (c, m): emb[c][m * SUB_D : (m + 1) * SUB_D]
        for c in range(K_PQ)
        for m in range(M_PQ)
    }
    return emb, cb


def test_pq_encode_is_true_argmin(spark, sf_dir):
    from fxblue_etl_spark.operators.ml import K_PQ, M_PQ, SUB_D, pq_encode

    emb, cb = _pq_numpy_fixture(spark, sf_dir)
    rows = pq_encode(spark, sf_dir).collect()
    assert len(rows) == len(emb) * M_PQ
    for r in rows[:64]:
        sv = emb[r["vec_id"]][r["m"] * SUB_D : (r["m"] + 1) * SUB_D]
        dists = [
            (int(np.sum((sv - cb[(c, r["m"])]) ** 2)), c) for c in range(K_PQ)
        ]
        best = min(dists)
        assert (r["code_sqdist"], r["code"]) == best


def test_pq_adc_distance_is_exact_table_sum(spark, sf_dir):
    from fxblue_etl_spark.operators.ml import (
        M_PQ,
        SUB_D,
        pq_adc_topk,
        pq_encode,
    )

    emb, cb = _pq_numpy_fixture(spark, sf_dir)
    codes = {
        (r["vec_id"], r["m"]): r["code"]
        for r in pq_encode(spark, sf_dir).collect()
    }
    rows = pq_adc_topk(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        for r in rs:
            want = sum(
                int(
                    np.sum(
                        (
                            emb[q][m * SUB_D : (m + 1) * SUB_D]
                            - cb[(codes[(r["neighbor_id"], m)], m)]
                        )
                        ** 2
                    )
                )
                for m in range(M_PQ)
            )
            assert r["adc_dist"] == want


def test_pq_adc_containment_floor(spark, sf_dir):
    """PQ@16 codes on ISOTROPIC synthetic embeddings is lossy by
    construction (random vectors have no subspace cluster structure),
    so the honest bound is containment of ADC's top-5 in the exact
    top-25, averaged over queries — plumbing-level recall evidence,
    not a FAISS-grade quality claim."""
    from fxblue_etl_spark.operators.ml import pq_adc_topk

    emb, _ = _pq_numpy_fixture(spark, sf_dir)
    rows = pq_adc_topk(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits, total = 0, 0
    for q, got in by_q.items():
        d = sorted(
            (int(np.sum((v - emb[q]) ** 2)), i)
            for i, v in emb.items()
            if i != q
        )
        exact25 = {i for _, i in d[:25]}
        hits += len(got & exact25)
        total += len(got)
    assert hits / total >= 0.15


def test_recursive_reachability_consistent_with_components(spark, sf_dir):
    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.operators.dedup import lsh_jaccard_pairs
    from fxblue_etl_spark.plans.advanced import recursive_dup_reachability

    reach = recursive_dup_reachability(spark, sf_dir).collect()
    edges = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_jaccard_pairs(table(spark, sf_dir, "documents"))
        .select("doc_a", "doc_b")
        .collect()
    }
    # hop-1 closure rows are exactly the edge set
    assert {(r["root"], r["reached"]) for r in reach if r["min_hops"] == 1} == edges
    # union-find over the edges: every reachable pair shares a root
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    for r in reach:
        assert find(r["root"]) == find(r["reached"])
        assert 1 <= r["min_hops"] <= 3


def test_lateral_topk_matches_window_rank(spark, sf_dir):
    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.plans.advanced import lateral_topk_per_nation

    got = {
        (r["n_name"], r["c_custkey"], r["bal_e2"])
        for r in lateral_topk_per_nation(spark, sf_dir).collect()
    }
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    want = {
        (r["n_name"], r["c_custkey"], r["bal_e2"])
        for r in c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .selectExpr(
            "n_name", "c_custkey",
            "CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_e2",
        )
        .collect()
    }
    assert got == want


def test_asof_tolerance_never_mixes_quotes(spark, sf_dir):
    from fxblue_etl_spark.operators.temporal import (
        ASOF_TOLERANCE_S,
        asof_purchase_view,
        asof_tolerance_view,
    )

    tol = {r["event_id"]: r for r in asof_tolerance_view(spark, sf_dir).collect()}
    base = {r["event_id"]: r for r in asof_purchase_view(spark, sf_dir).collect()}
    assert set(tol) == set(base)
    n_stale = 0
    for eid, t in tol.items():
        b = base[eid]
        if t["view_ts_us"] is not None:
            # fresh match: identical to the unbounded as-of, within bound
            assert (t["view_ts_us"], t["view_value"]) == (
                b["view_ts_us"], b["view_value"],
            )
            assert t["trade_ts_us"] - t["view_ts_us"] <= ASOF_TOLERANCE_S * 1_000_000
            assert not t["stale_dropped"]
        elif t["stale_dropped"]:
            # dropped: the unbounded as-of DID match, but too old
            assert b["view_ts_us"] is not None
            assert b["trade_ts_us"] - b["view_ts_us"] > ASOF_TOLERANCE_S * 1_000_000
            n_stale += 1
        else:
            assert b["view_ts_us"] is None
    assert n_stale > 0, "fixture must exercise the staleness branch"


def test_snapshot_diff_tiles_the_union(spark, sf_dir):
    from fxblue_etl_spark.plans.dq import corpus_snapshot_diff

    rows = {r["delta_class"]: r for r in corpus_snapshot_diff(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ids = [r["doc_id"] for r in docs]
    a = {i for i in ids if i % 13 != 0}
    b = {i for i in ids if i % 7 != 0}
    want = {
        "added": len(b - a),
        "removed": len(a - b),
        "changed": len({i for i in a & b if i % 11 == 0}),
        "unchanged": len({i for i in a & b if i % 11 != 0}),
    }
    got = {k: rows[k]["n_docs"] if k in rows else 0 for k in want}
    assert got == want
    assert sum(got.values()) == len(a | b)


def test_bpe_merge_topk_matches_python_recount(spark, sf_dir):
    from collections import Counter

    from fxblue_etl_spark.operators.tfidf import BPE_MERGE_TOPK, bpe_merge_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    words = Counter()
    for r in docs:
        words.update(t for t in r["text"].split() if t)
    pairs = Counter()
    for w, n in words.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += n
    want = sorted(((-n, p) for p, n in pairs.items()))[:BPE_MERGE_TOPK]
    rows = sorted(bpe_merge_topk(spark, sf_dir).collect(), key=lambda r: r["rank"])
    assert [(-r["n_total"], r["pair"]) for r in rows] == want


def test_freq_items_contract_all_heavy_present(spark, sf_dir):
    from fxblue_etl_spark.plans.stats import freq_items_contract

    rows = freq_items_contract(spark, sf_dir).collect()
    assert rows and all(r["in_sketch"] for r in rows)


def test_setop_multiset_multiplicity_arithmetic(spark, sf_dir):
    from collections import Counter

    from fxblue_etl_spark.plans.relational import setop_multiset_priorities

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    a = Counter(r["o_orderpriority"] for r in orders if r["o_orderstatus"] == "O")
    b = Counter(r["o_orderpriority"] for r in orders if r["o_orderstatus"] == "F")
    rows = setop_multiset_priorities(spark, sf_dir).collect()
    got = {(r["op"], r["v"]): r["n"] for r in rows}
    for v in set(a) | set(b):
        ex = max(a[v] - b[v], 0)
        ix = min(a[v], b[v])
        assert got.get(("except_all", v), 0) == ex
        assert got.get(("intersect_all", v), 0) == ix


def test_attribution_touches_ordered_and_bounded(spark, sf_dir):
    from fxblue_etl_spark.plans.behavior import (
        ATTRIB_WINDOW_S,
        attribution_first_last,
    )

    rows = attribution_first_last(spark, sf_dir).collect()
    n_attr = 0
    for r in rows:
        if r["attributed"]:
            n_attr += 1
            assert r["first_touch_us"] <= r["last_touch_us"] <= r["purchase_ts_us"]
            assert r["purchase_ts_us"] - r["first_touch_us"] <= ATTRIB_WINDOW_S * 1_000_000
        else:
            assert r["first_touch_us"] is None and r["last_touch_us"] is None
    assert 0 < n_attr < len(rows), "fixture must exercise both branches"


def test_langid_confusion_rows_sum_to_label_totals(spark, sf_dir):
    from fxblue_etl_spark.operators.textops import langid_confusion

    rows = langid_confusion(spark, sf_dir).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label_lang"], []).append(r)
    for label, rs in by_label.items():
        total = rs[0]["label_total"]
        assert all(r["label_total"] == total for r in rs)
        assert sum(r["n"] for r in rs) == total
        for r in rs:
            assert r["cell_ppm"] == 1_000_000 * r["n"] // total


def test_quality_lm_calibration_covers_lm_population(spark, sf_dir):
    from fxblue_etl_spark.operators.quality import quality_lm_calibration
    from fxblue_etl_spark.operators.tfidf import lm_doc_perplexity

    rows = quality_lm_calibration(spark, sf_dir).collect()
    n_lm = lm_doc_perplexity(spark, sf_dir).count()
    assert sum(r["n_docs"] for r in rows) == n_lm
    for r in rows:
        assert 0 <= r["n_keep"] <= r["n_docs"]
        assert 0 <= r["mean_fluency_ppm"] <= 1_000_000


def test_hll_per_group_within_bound(spark, sf_dir):
    from fxblue_etl_spark.plans.stats import hll_per_group_contract

    rows = hll_per_group_contract(spark, sf_dir).collect()
    assert rows and all(r["within_bound"] for r in rows)


def test_cross_split_lm_eval_accounting(spark, sf_dir):
    from fxblue_etl_spark.operators.tfidf import cross_split_lm_eval

    rows = cross_split_lm_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_covered"] <= r["n_pairs"]
        assert r["oov_ppm"] == 1_000_000 * (r["n_pairs"] - r["n_covered"]) // r["n_pairs"]
        assert 0 <= r["mean_cont_ppm"] <= 1_000_000


def test_frame_schedule_geometry(spark, sf_dir):
    from fxblue_etl_spark.operators.multimodal import (
        FRAME_BYTES,
        N_STRIDE_SAMPLES,
        media_frame_schedule,
    )

    rows = media_frame_schedule(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: len(r["text"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rs in by_doc.items():
        n_frames = -(-docs[doc_id] // FRAME_BYTES)
        assert all(r["n_frames"] == n_frames for r in rs)
        assert all(0 <= r["frame_idx"] < n_frames for r in rs)
        kinds = [r["sample_kind"] for r in rs]
        assert kinds.count("keyframe") == 1
        stride = max(n_frames // N_STRIDE_SAMPLES, 1)
        strided = sorted(r["frame_idx"] for r in rs if r["sample_kind"] == "stride")
        assert strided == list(range(0, n_frames, stride))


def test_media_dedup_accounting(spark, sf_dir):
    from fxblue_etl_spark.operators.multimodal import media_dedup_exact

    rows = media_dedup_exact(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_payloads"] for r in rows) == n_docs
    for r in rows:
        assert 1 <= r["n_distinct"] <= r["n_payloads"]
        assert r["dup_bytes_saved"] >= 0
        if r["n_distinct"] == r["n_payloads"]:
            assert r["dup_bytes_saved"] == 0


def test_temperature_sweep_samples_are_nested(spark, sf_dir):
    from fxblue_etl_spark.operators.corpusops import temperature_sweep

    rows = temperature_sweep(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["alpha_pct"]] = r
    for lang, d in by_lang.items():
        assert set(d) == {25, 50, 75}
        # gentler alpha (lower) keeps more: p and n_sampled monotone
        assert d[25]["p_ppm"] >= d[50]["p_ppm"] >= d[75]["p_ppm"]
        assert d[25]["n_sampled"] >= d[50]["n_sampled"] >= d[75]["n_sampled"]
        assert all(r["n_sampled"] <= r["n_in"] for r in d.values())


def test_corrupt_tolerant_read_skips_only_the_bad_file(spark, sf_dir):
    from fxblue_etl_spark.plans.sinks import corrupt_file_tolerant_read

    (row,) = corrupt_file_tolerant_read(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert row["n_rows"] == docs.count()
    assert row["id_sum"] == docs.selectExpr("sum(doc_id)").collect()[0][0]


def test_pandas_api_matches_dataframe_groupby(spark, sf_dir):
    import pyspark.sql.functions as F

    from fxblue_etl_spark.functions.udfs import pandas_api_lang_stats

    got = {r["lang"]: r for r in pandas_api_lang_stats(spark, sf_dir).collect()}
    want = {
        r["lang"]: r
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    }
    assert set(got) == set(want)
    for lang, r in got.items():
        assert (r["n_docs"], r["chars_sum"]) == (want[lang]["n"], want[lang]["s"])
        assert r["mean_chars_floor"] == r["chars_sum"] // r["n_docs"]


def test_release_manifest_assembles_component_truth(spark, sf_dir):
    import pyspark.sql.functions as F

    from fxblue_etl_spark.operators.corpusops import mixture_allocation
    from fxblue_etl_spark.operators.graph import split_decontaminate
    from fxblue_etl_spark.plans.corpus import (
        corpus_release_manifest,
        llm_corpus_prep,
    )

    (row,) = corpus_release_manifest(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert row["raw_docs"] == docs.count()
    assert row["straddling_groups"] == 0  # the leak-free certificate
    assert row["n_splits"] == 3
    assert row["split_docs"] == row["raw_docs"]  # every doc lands in a split
    assert 0 < row["kept_docs"] <= row["raw_docs"]
    prep = llm_corpus_prep(spark, sf_dir).agg(F.sum("n_docs")).collect()[0][0]
    assert row["kept_docs"] == prep
    mix = mixture_allocation(spark, sf_dir).agg(F.sum("final_quota")).collect()[0][0]
    assert row["budget_allocated"] == mix
    assert 1_000_000 < row["corpus_chars_per_tok_ppm"] < 100_000_000


def test_session_window_native_matches_handrolled(spark, sf_dir):
    import pyspark.sql.functions as F

    from fxblue_etl_spark.operators.windows import (
        session_window_native,
        sessionize_events,
    )

    native = session_window_native(spark, sf_dir).collect()
    hand = sessionize_events(spark, sf_dir).collect()
    # same partitioning of events into sessions: identical multiset of
    # (user, n_events, value) session signatures and session starts
    key = lambda rows: sorted(
        (r["user_id"], r["session_start"], r["n_events"], r["session_value_e4"])
        for r in rows
    )
    assert key(native) == key(hand)


def test_shuffle_hash_hint_changes_plan_not_values(spark, sf_dir):
    import pyspark.sql.functions as F

    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.plans.relational import shuffle_hash_segment_revenue

    hinted = shuffle_hash_segment_revenue(spark, sf_dir)
    assert "ShuffledHashJoin" in hinted._jdf.queryExecution().executedPlan().toString()
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    plain = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100)).cast("long").alias("revenue_e2"),
        )
    )
    assert sorted(map(tuple, hinted.collect())) == sorted(map(tuple, plain.collect()))


def test_knn_label_eval_matches_numpy(spark, sf_dir):
    from collections import Counter

    from fxblue_etl_spark.operators.ml import KNN_K, knn_label_eval

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vecs = {
        r["vec_id"]: (
            np.floor(np.asarray(r["embedding"], np.float64) * 1e3).astype(np.int64),
            r["label"],
        )
        for r in emb
    }
    per_label = Counter()
    correct = Counter()
    for pid, (pq, true) in vecs.items():
        if pid % 25 != 0:
            continue
        d = sorted(
            (int(np.sum((q - pq) ** 2)), vid)
            for vid, (q, _) in vecs.items()
            if vid != pid
        )
        votes = Counter(vecs[vid][1] for _, vid in d[:KNN_K])
        best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        per_label[true] += 1
        if best == true:
            correct[true] += 1
    rows = {r["true_label"]: r for r in knn_label_eval(spark, sf_dir).collect()}
    assert {k: v["n_probes"] for k, v in rows.items()} == dict(per_label)
    for label, r in rows.items():
        assert r["n_correct"] == correct[label]
        assert r["acc_ppm"] == 1_000_000 * r["n_correct"] // r["n_probes"]


def test_observation_metrics_match_collected_aggregates(spark, sf_dir):
    """Spark's Observation API: metrics piggyback on a real action
    with NO extra job — the cheap per-batch row/mass counters a
    production pipeline exports. Certified against a direct agg."""
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    from fxblue_etl_spark.io import table

    o = table(spark, sf_dir, "orders")
    obs = Observation("orders_metrics")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor(F.col("o_totalprice") * 100)).alias("rev_e2"),
    )
    n_collected = observed.count()
    got = obs.get
    want = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("o_totalprice") * 100)).alias("s"),
    ).collect()[0]
    assert got["n_rows"] == want["n"] == n_collected
    assert got["rev_e2"] == want["s"]


def test_ann_recall_report_orders_methods_sanely(spark, sf_dir):
    from fxblue_etl_spark.operators.ml import ann_recall_report

    rows = {r["method"]: r for r in ann_recall_report(spark, sf_dir).collect()}
    assert set(rows) == {
        "int8_full_scan", "ivf_single_probe", "ivf_quantized",
        "ivf_multiprobe", "pq_adc",
    }
    for r in rows.values():
        assert 0 <= r["hits"] <= 5 * r["n_queries"]
        assert r["recall_ppm"] == 1_000_000 * r["hits"] // (5 * r["n_queries"])
    # the full int8 scan dominates every pruned configuration
    full = rows["int8_full_scan"]["hits"]
    for m in ("ivf_single_probe", "ivf_quantized", "pq_adc"):
        assert rows[m]["hits"] <= full
    # multi-probe never does worse than single-probe (same codes,
    # strictly more clusters searched)
    assert rows["ivf_multiprobe"]["hits"] >= rows["ivf_quantized"]["hits"]


def test_collated_grouping_merges_case_variants(spark, sf_dir):
    """Every group whose type string got both casings must report
    n_variants == 2, and totals must reconcile with the part table."""
    import pyspark.sql.functions as F

    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.plans.advanced import collated_group_counts

    rows = collated_group_counts(spark, sf_dir).collect()
    p = table(spark, sf_dir, "part")
    assert sum(r["n_parts"] for r in rows) == p.count()
    # fixture has both parities for every type → every group merged 2 casings
    assert all(r["n_variants"] == 2 for r in rows)
    # group count equals the case-insensitive distinct type count
    n_types_ci = p.select(F.lower("p_type")).distinct().count()
    assert len(rows) == n_types_ci


def test_parameterized_sql_binds_and_pushes_down(spark, sf_dir):
    """The named parameter must bind as a foldable literal that
    reaches the parquet scan's pushed filters."""
    from fxblue_etl_spark.plans.advanced import parameterized_sql_orders

    df = parameterized_sql_orders(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LessThanOrEqual(o_orderpriority,3-MEDIUM)" in plan
    assert all(r["o_orderpriority"] <= "3-MEDIUM" for r in df.collect())


def test_argmax_agrees_with_window_topk(spark, sf_dir):
    """max_by over the (price, key) struct must pick exactly the rank-1
    row of the equivalent window formulation, via partial (map-side)
    aggregation and with no Window node in the plan."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.plans.advanced import argmax_order_per_customer

    df = argmax_order_per_customer(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max_by" in plan  # candidates reduced before the exchange
    got = {r["o_custkey"]: r["best_orderkey"] for r in df.collect()}
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc(F.floor(F.col("o_totalprice") * 100)), F.desc("o_orderkey")
    )
    ref = {
        r["o_custkey"]: r["o_orderkey"]
        for r in o.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == ref


def test_not_in_null_semantics_is_ansi(spark, sf_dir):
    """NOT IN over a null-containing set must return ZERO rows; the
    NOT EXISTS anti-join must return the true complement."""
    from fxblue_etl_spark.plans.advanced import not_in_null_semantics

    r = not_in_null_semantics(spark, sf_dir).collect()[0]
    assert r["n_not_in_nullset"] == 0
    assert r["n_not_exists"] > 0
    # the cleaned subquery differs from NOT EXISTS only by the nulled
    # customer (whose key was removed from the set): super-set of it
    assert r["n_not_in_clean"] >= r["n_not_exists"]
    assert r["n_not_exists"] < r["n_customers"]
