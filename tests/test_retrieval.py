"""Ranked retrieval: rational BM25 and reciprocal-rank fusion.
Value parity with DuckDB is the oracle gate's job; these pin the
integer arithmetic against an independent pure-Python recompute and
the structural contracts of the rankings."""

from __future__ import annotations

from collections import Counter

from fxblue_etl_spark.operators.retrieval import (
    BM25_K,
    QUERY_TERMS,
    RRF_C,
    RRF_DEPTH,
    RRF_K,
    bm25_rational_topk,
    rrf_hybrid_fusion,
)


def _python_bm25(rows):
    """Independent exact-integer recompute of the rational BM25 score
    (Python ints are arbitrary precision — no overflow to hide in)."""
    docs = {r["doc_id"]: r["text"].split() for r in rows}
    n_docs = len(docs)
    l_total = sum(len(t) for t in docs.values())
    df = Counter(
        term for toks in docs.values() for term in set(toks) & set(QUERY_TERMS)
    )
    scores = {}
    for doc_id, toks in docs.items():
        tf = Counter(t for t in toks if t in QUERY_TERMS)
        if not tf:
            continue
        dl = len(toks)
        r_ppm = (1_000_000 * dl * n_docs) // l_total
        s = 0
        for term, f in tf.items():
            d = df[term]
            s += (10**12 * (2 * n_docs - 2 * d + 1) * 22 * f) // (
                (2 * d + 1) * (10_000_000 * f + 3_000_000 + 9 * r_ppm)
            )
        scores[doc_id] = (s, len(tf))
    return scores


def test_bm25_matches_python_recompute(spark, sf_dir):
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    expect = _python_bm25(raw)
    order = sorted(expect.items(), key=lambda kv: (-kv[1][0], kv[0]))[:BM25_K]
    rows = bm25_rational_topk(spark, sf_dir).collect()
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, min(BM25_K, len(order)) + 1)
    )
    for r in rows:
        s, nh = expect[r["doc_id"]]
        assert r["bm25_ppm"] == s
        assert r["n_terms_hit"] == nh
    assert [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])] == [
        doc_id for doc_id, _ in order
    ]


def test_bm25_ranking_contracts(spark, sf_dir):
    rows = sorted(bm25_rational_topk(spark, sf_dir).collect(), key=lambda r: r["rank"])
    scores = [r["bm25_ppm"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for a, b in zip(rows, rows[1:]):
        # deterministic tiebreak: equal scores order by doc_id asc
        if a["bm25_ppm"] == b["bm25_ppm"]:
            assert a["doc_id"] < b["doc_id"]
    assert all(1 <= r["n_terms_hit"] <= len(QUERY_TERMS) for r in rows)


def test_rrf_fusion_arithmetic(spark, sf_dir):
    rows = sorted(rrf_hybrid_fusion(spark, sf_dir).collect(), key=lambda r: r["fused_rank"])
    assert [r["fused_rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= RRF_K
    for r in rows:
        lex = 10**9 // (RRF_C + r["bm25_rank"]) if r["bm25_rank"] else 0
        den = 10**9 // (RRF_C + r["dense_rank"]) if r["dense_rank"] else 0
        assert r["rrf_e9"] == lex + den
        assert 0 <= r["bm25_rank"] <= RRF_DEPTH
        assert 0 <= r["dense_rank"] <= RRF_DEPTH
        # a fused result must appear in at least one leg
        assert r["bm25_rank"] or r["dense_rank"]
    fused_scores = [r["rrf_e9"] for r in rows]
    assert fused_scores == sorted(fused_scores, reverse=True)
