"""Property: bucket-grouped LSH candidate pairs == the banded-LSH
reference computed brute-force in Python over arbitrary corpora."""

from __future__ import annotations

import hashlib
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fxblue_etl_spark.operators.dedup import (
    BAND_ROWS,
    MERSENNE_31,
    N_PERM,
    PERM_A,
    PERM_B,
    lsh_candidate_pairs,
)

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=10),
    min_size=1,
    max_size=12,
)


def _ref_pairs(token_lists):
    """Brute-force banded-LSH reference: same normalization, shingles,
    universal-hash minhash signatures, and band buckets as the Spark
    implementation, in plain Python."""
    sigs = {}
    for doc_id, toks in enumerate(token_lists):
        if len(toks) < 3:
            continue
        shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        hs = [
            int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in shingles
        ]
        sig = [
            min((PERM_A[p] * h + PERM_B[p]) % MERSENNE_31 for h in hs)
            for p in range(N_PERM)
        ]
        bands = [
            tuple(sig[b * BAND_ROWS : (b + 1) * BAND_ROWS])
            for b in range(N_PERM // BAND_ROWS)
        ]
        sigs[doc_id] = bands
    out = set()
    for a, b in combinations(sorted(sigs), 2):
        if any(x == y for x, y in zip(sigs[a], sigs[b])):
            out.add((a, b))
    return out


@settings(**SETTINGS)
@given(token_lists=docs_strategy)
def test_candidate_pairs_match_bruteforce_reference(spark, token_lists):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(docs).select("doc_a", "doc_b").collect()
    }
    assert got == _ref_pairs(token_lists)
