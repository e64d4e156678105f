"""Term-relevance operators: value parity is the oracle gate's job;
these pin the semantic invariants (top-k shape, integer ranking,
rarity bounds)."""

from __future__ import annotations

from collections import defaultdict

from fxblue_etl_spark.operators.tfidf import (
    TOPK_TERMS,
    rare_token_quality,
    term_salience_topk,
)


def test_salience_topk_shape_and_integer_rank(spark, sf_dir):
    rows = term_salience_topk(spark, sf_dir).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
        # integer quotient, never a float
        assert r["salience_ppm"] == (1_000_000 * r["tf"]) // r["df"]
        assert r["df"] >= 1 and r["tf"] >= 1
    for doc_rows in by_doc.values():
        assert len(doc_rows) <= TOPK_TERMS
        ranks = sorted(r["rank"] for r in doc_rows)
        assert ranks == list(range(1, len(doc_rows) + 1))
        # ranking is by descending salience with term tiebreak
        ordered = sorted(doc_rows, key=lambda r: r["rank"])
        keys = [(-r["salience_ppm"], r["term"]) for r in ordered]
        assert keys == sorted(keys)


def test_rare_token_quality_bounds(spark, sf_dir):
    rows = rare_token_quality(spark, sf_dir).collect()
    assert rows, "documents fixture is non-empty"
    for r in rows:
        assert 0 <= r["n_rare"] <= r["n_toks"]
        assert 0 <= r["rare_ppm"] <= 1_000_000
        assert r["rare_ppm"] == (1_000_000 * r["n_rare"]) // r["n_toks"]
        # every token contributes at least its own occurrence
        assert r["corpus_freq_sum"] >= r["n_toks"]


def test_bigram_lm_ranks_and_mass(spark, sf_dir):
    from collections import defaultdict

    from fxblue_etl_spark.operators.tfidf import (
        BIGRAM_MIN_HEAD,
        BIGRAM_TOPK,
        token_bigram_lm,
    )

    rows = token_bigram_lm(spark, sf_dir).collect()
    assert rows
    by_head = defaultdict(list)
    for r in rows:
        by_head[r["head"]].append(r)
        assert r["n_head"] >= BIGRAM_MIN_HEAD
        assert 0 < r["cont_ppm"] <= 1_000_000
        assert r["cont_ppm"] == (1_000_000 * r["n"]) // r["n_head"]
    for head, hr in by_head.items():
        hr.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in hr] == list(range(1, len(hr) + 1))
        assert len(hr) <= BIGRAM_TOPK
        # ranked by count desc with nxt tiebreak
        keys = [(-r["n"], r["nxt"]) for r in hr]
        assert keys == sorted(keys)
        # top-k mass never exceeds the head's outgoing mass
        assert sum(r["n"] for r in hr) <= hr[0]["n_head"]


def test_token_pmi_ranks_lift_consistently(spark, sf_dir):
    """PMI top-k: ranks are dense over the lift ordering, every pair
    clears the support floor, and the emitted ppm matches the nested
    integer-divide recomputed from corpus totals."""
    from pyspark.sql import functions as F

    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.operators.textops import ws_tokens
    from fxblue_etl_spark.operators.tfidf import (
        PMI_MIN_PAIR,
        PMI_TOPK,
        token_pmi_topk,
    )

    rows = token_pmi_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= PMI_TOPK
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, len(rows) + 1)
    )
    keys = [(-r["pmi_ratio_ppm"], r["head"], r["nxt"]) for r in sorted(rows, key=lambda r: r["rank"])]
    assert keys == sorted(keys)

    # recompute totals + frequencies independently with plain Spark SQL
    d = table(spark, sf_dir, "documents").select(ws_tokens("text").alias("toks"))
    toks = d.select(F.explode("toks").alias("tok"))
    n_total = toks.count()
    uni = {r["tok"]: r["n"] for r in toks.groupBy("tok").agg(F.count("*").alias("n")).collect()}
    pair_rows = (
        d.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(element_at(toks, i) AS head,"
                    "             element_at(toks, i + 1) AS nxt))"
                )
            ).alias("p")
        )
        .groupBy("p.head", "p.nxt")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    pair = {(r["head"], r["nxt"]): r["n"] for r in pair_rows}
    m_total = sum(pair.values())
    for r in rows:
        n_xy = pair[(r["head"], r["nxt"])]
        assert n_xy == r["n_pair"] >= PMI_MIN_PAIR
        q1 = (1_000_000 * n_xy * n_total) // (m_total * uni[r["head"]])
        assert r["pmi_ratio_ppm"] == (q1 * n_total) // uni[r["nxt"]]


def test_token_weighted_median_is_true_weighted_median(spark, sf_dir):
    """Re-derive the weighted median per language from the raw
    per-doc scores in Python: smallest score whose cumulative token
    mass doubles past the total."""
    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.operators.tfidf import (
        rare_token_quality,
        token_weighted_median_quality,
    )

    got = {r["lang"]: r for r in token_weighted_median_quality(spark, sf_dir).collect()}
    sc = {r["doc_id"]: r for r in rare_token_quality(spark, sf_dir).collect()}
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    by_lang = {}
    for d in docs:
        if d["doc_id"] in sc:
            r = sc[d["doc_id"]]
            by_lang.setdefault(d["lang"], []).append((r["rare_ppm"], r["n_toks"]))
    for lang, pairs in by_lang.items():
        pairs.sort()
        total = sum(t for _, t in pairs)
        cum = 0
        for ppm, t in pairs:
            cum += t
            if 2 * cum >= total:
                break
        assert got[lang]["median_cutoff_ppm"] == ppm
        assert got[lang]["total_tokens"] == total
