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


vec_strategy = st.lists(
    st.lists(
        st.floats(
            min_value=-1, max_value=1, allow_nan=False, allow_infinity=False
        ),
        min_size=8,
        max_size=8,
    ),
    min_size=2,
    max_size=10,
)


@settings(**SETTINGS)
@given(vecs=vec_strategy)
def test_sign_bucket_pairs_match_bruteforce(spark, vecs):
    """embedding_near_dup's bucket-grouped candidate generation must
    pair exactly the vectors sharing the 8-dim sign pattern, scored
    with exact cosine — against a plain-Python reference."""
    import math

    from fxblue_etl_spark.operators import similarity

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    docs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # drive through the module's own query entry on a temp view-free
    # path: replicate its body over an injected frame via table() is
    # file-bound, so gocheck the internals through a tiny adapter
    from pyspark.sql import functions as F

    v = similarity._dvec("embedding")
    bucket = F.concat_ws(
        "",
        *[
            (F.element_at(v, i + 1) >= 0).cast("int").cast("string")
            for i in range(8)
        ],
    )
    base = docs.select("vec_id", v.alias("v"), bucket.alias("bucket"))
    buckets = base.groupBy("bucket").agg(
        F.collect_list(F.struct("vec_id", "v")).alias("members")
    )
    m = buckets.filter(F.size("members") >= 2).select(
        F.explode("members").alias("a"), "members"
    )
    pairs = (
        m.select("a", F.explode("members").alias("b"))
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
    )
    got = {(r.vec_a, r.vec_b) for r in pairs.collect()}

    # float32 storage: the sign pattern must be taken from the cast
    # values the engine sees, not the python doubles
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    sign = {
        i: tuple(f32(x) >= 0 for x in v[:8]) for i, v in enumerate(vecs)
    }
    ref = {
        (a, b)
        for a, b in combinations(range(len(vecs)), 2)
        if sign[a] == sign[b]
    }
    assert got == ref
