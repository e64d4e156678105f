"""Mega-bucket stress for the bucket-grouped pair generators: when a
skewed band/sign bucket holds many members (boilerplate families),
pair generation must stay correct — the quadratic within-bucket
fan-out is the same row set a shuffled equi-join would produce, and
the results must match a brute-force reference exactly."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from fxblue_etl_spark.operators.dedup import lsh_candidate_pairs


def test_identical_doc_family_pairs_completely(spark):
    """50 byte-identical docs share every band bucket: the candidate
    set must contain exactly C(50,2) identical-family pairs plus
    whatever the distinct tail contributes (nothing here)."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler) for i in range(50)]
    rows += [(100 + i, f"totally unrelated document number {i} "
                       f"with its own words {i * 7} {i * 13}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = lsh_candidate_pairs(docs).select("doc_a", "doc_b").collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    family = {(a, b) for a, b in combinations(range(50), 2)}
    assert family <= got
    # no identical-family doc may pair with the distinct tail unless
    # minhash banding collided — verify any extras are tail-tail only
    extras = got - family
    assert all(a >= 100 and b >= 100 for a, b in extras)


def test_megabucket_jaccard_matches_bruteforce(spark):
    """Near-identical family (one token varies): every verified score
    must equal the brute-force shingle Jaccard of that pair."""
    from fxblue_etl_spark.operators.dedup import (
        lsh_jaccard_pairs,
        word_shingles,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, base + (" iota" if i % 2 else " kappa")) for i in range(24)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r.doc_a, r.doc_b): round(r.jaccard, 6)
        for r in lsh_jaccard_pairs(docs).collect()
    }
    sh = {
        r.doc_id: set(r.sh)
        for r in docs.select(
            "doc_id", word_shingles("text").alias("sh")
        ).collect()
    }
    assert got  # banding must fire on near-identical docs
    for (a, b), j in got.items():
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        assert j == round(inter / union, 6), (a, b)
