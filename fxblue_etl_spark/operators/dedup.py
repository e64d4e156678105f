"""Deduplication operators for LLM-data pipelines (SURVEY §2.13, M6).

Four dedup families over `documents`, all engine-portable (hashes are
md5/sha256 so the DuckDB oracle reproduces them bit-for-bit — no
engine-specific seeded hashing in the oracle-checked paths):

* **exact**       — sha256(normalized content) → group → keep min id.
* **MinHash+LSH** — word shingles → K permutation-hashes (md5 keyed by
  permutation index; the min of a keyed cryptographic hash is a valid
  minwise sketch) → band signatures → candidate pairs from shared
  bands → exact-Jaccard verification. The classic near-dup pipeline:
  shuffle cost is O(docs × bands), never O(docs²).
* **SimHash**     — 32-bit sign-aggregated token hashes; near-dup =
  hamming distance ≤ r within 16-bit blocking buckets.
* **n-gram Jaccard** — blocked pairwise token-shingle Jaccard.

Scale notes: every pairwise step is *blocked* (LSH band, simhash
prefix, first-token block) so candidate generation is an equi-join on
the block key — a hash-partitioned shuffle that AQE can skew-split —
followed by per-pair verification. Nothing materializes the full
cross product. The `ml.feature.MinHashLSH` variant (JVM sketches,
`approxSimilarityJoin`) is provided as the rows-only
`minhash_lsh_ml` for comparison with Spark's built-in implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import fan_out, table
from ..session import tune
from .textops import CHUNK_STRIDE, CHUNK_TOKS, ws_tokens

N_PERM = 12  # minhash permutations
BAND_ROWS = 3  # rows per LSH band → 4 bands

#: Mersenne prime modulus for the universal permutation hashes.
MERSENNE_31 = 2_147_483_647

#: Per-permutation multipliers/offsets (odd golden-ratio multiples,
#: < 2^30): ``perm_p(h) = (A[p]*h + B[p]) % MERSENNE_31`` is the
#: textbook pairwise-independent minhash family. NOT plain double
#: hashing ``h1 + p*h2`` — that family's permutations share argmins
#: (any common low-h shingle collides every band), which blew the
#: LSH candidate set up ~50× on the sf0.1 fixture.
PERM_A = [(2654435761 * (p + 1)) % 2**30 | 1 for p in range(N_PERM)]
PERM_B = [(2246822519 * (p + 1)) % 2**30 for p in range(N_PERM)]


def _norm_text(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def word_shingles(c: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles of the normalized text."""
    toks = ws_tokens(_norm_text(c))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)]))
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: keeper id + duplicate count per
    distinct content (generalizes D1 to content-addressed dedup).

    No fan_out here: sha2 is codegen'd JVM work, cheap enough that a
    repartition shuffle of the full text would cost more than it buys.
    """
    d = table(tune(spark), sf_dir, "documents")
    h = F.sha2(_norm_text("text"), 256)
    return (
        d.select("doc_id", h.alias("content_sha"))
        .groupBy("content_sha")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
    )


DEDUP_EXACT_ORACLE = r"""
SELECT sha256(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_sha,
       min(doc_id) AS keeper_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → (shingles, minhash signature array of N_PERM BIGINT mins).

    ONE md5 per shingle, reduced to a 32-bit int h; the N_PERM
    permutation hashes are the pairwise-independent universal family
    ``(A[p]*h + B[p]) % MERSENNE_31`` — ~N_PERM× cheaper than hashing
    each shingle N_PERM times, reproducible in any engine with hex +
    BIGINT arithmetic (A[p] < 2^30, h < 2^32 → products < 2^62, far
    from BIGINT overflow in either engine).

    Both arrays are materialized behind Generate nodes: explode of a
    1-element array makes each an *attribute*, so downstream
    references use the computed value instead of CollapseProject
    re-inlining the whole tokenize+shingle tree per reference
    (measured 61s → ~2s on sf0.01).

    The whole signature is ONE fold over the per-shingle hashes: acc
    is the running element-wise minimum of the permutation-hash
    vector. (A single combined fold also avoids a real PySpark 4.1.2
    bug where multiple parallel *string* folds in one projection
    corrupt minima — the fold here is numeric, but the shape is kept.)
    """
    sh_df = docs.select(
        "doc_id", F.explode(F.array(word_shingles(text_col))).alias("shingles")
    )
    hashes = F.transform(
        "shingles",
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )
    hs_df = sh_df.select(
        "doc_id", "shingles", F.explode(F.array(hashes)).alias("hs")
    )
    sig = F.aggregate(
        "hs",
        F.array_repeat(F.lit(2**62).cast("long"), N_PERM),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    (F.lit(PERM_A[p]) * h + F.lit(PERM_B[p])) % F.lit(MERSENNE_31)
                    for p in range(N_PERM)
                ]
            ),
            lambda a, b: F.least(a, b),
        ),
    )
    return hs_df.select("doc_id", "shingles", F.explode(F.array(sig)).alias("sig"))


def minhash_band_rows_hof(docs: DataFrame) -> DataFrame:
    """The JVM higher-order-function lineage of the banded-LSH index
    rows — the original implementation, kept as the cross-checked
    sibling of the Arrow path (``tests/test_dedup.py`` pins the two
    bit-identical on the fixture AND on an adversarial literal
    frame).  Everything here is row-local expression work."""
    d = docs.filter(F.size(ws_tokens(_norm_text("text"))) >= 3)
    sig_df = minhash_signatures(d)
    return sig_df.select(
        "doc_id",
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.element_at("sig", b * BAND_ROWS + r + 1)
                                    for r in range(BAND_ROWS)
                                ],
                            )
                        ).alias("band_sig"),
                    )
                    for b in range(N_PERM // BAND_ROWS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "shingles", "band.band_idx", "band.band_sig")


#: Java-regex ``\s`` is the ASCII class [ \t\n\x0B\f\r]; the Arrow
#: path must match Spark's split/regexp_replace exactly (Python's
#: ``\s`` is Unicode-aware and would tokenize U+00A0 etc. differently)
_JAVA_WS_RE = "[ \t\n\x0b\f\r]+"

_BAND_ROWS_SCHEMA = (
    "doc_id bigint, shingles array<string>, band_idx int, band_sig string"
)


def _band_rows_arrow_fn(batches):
    """``mapInPandas`` worker for :func:`minhash_band_rows`: the
    normalize → shingle → md5 → universal-hash-min → band-sig chain
    in numpy/hashlib, bit-identical to the HOF lineage (hashlib md5 ==
    Spark md5; the universal family is exact int64 arithmetic,
    products < 2^62).  Defined at module level so cloudpickle ships a
    module reference, not a closure."""
    import hashlib
    import re as _re

    import numpy as _np
    import pandas as _pd

    ws = _re.compile(_JAVA_WS_RE)
    a_vec = _np.array(PERM_A, dtype=_np.int64)
    b_vec = _np.array(PERM_B, dtype=_np.int64)
    n_bands = N_PERM // BAND_ROWS
    for pdf in batches:
        out_doc, out_sh, out_bi, out_bs = [], [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            if not isinstance(text, str):
                continue  # null text: None normally, but a fully-null
                # Arrow batch can surface as float NaN in pandas
            # null doc_id parity (round-7 advice): the HOF lineage
            # passes a null-doc_id row through with its bands intact,
            # so the Arrow path must too — but a nullable bigint batch
            # surfaces as float64 in pandas, and appending NaN to the
            # int output column would fail the Arrow bigint cast and
            # kill the whole task.  Map NaN → None and emit the
            # column as nullable Int64 below.
            doc_id = None if _pd.isna(doc_id) else int(doc_id)
            # no .strip(): Python strips Unicode whitespace, Spark's
            # trim only 0x20 — the empty-token filter already drops
            # leading/trailing Java-\s runs identically to ws_tokens
            toks = [t for t in ws.split(text.lower()) if t]
            if len(toks) < 3:
                continue
            sh = list(
                dict.fromkeys(
                    " ".join(toks[i : i + 3])
                    for i in range(max(len(toks) - 3, 0) + 1)
                )
            )
            hs = _np.fromiter(
                (
                    int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
                    for s in sh
                ),
                dtype=_np.int64,
                count=len(sh),
            )
            sig = ((hs[:, None] * a_vec[None, :]) + b_vec[None, :]) % MERSENNE_31
            sig = sig.min(axis=0)
            for b in range(n_bands):
                out_doc.append(doc_id)
                out_sh.append(sh)
                out_bi.append(b)
                out_bs.append(
                    hashlib.md5(
                        "|".join(
                            str(sig[b * BAND_ROWS + r])
                            for r in range(BAND_ROWS)
                        ).encode()
                    ).hexdigest()
                )
        if out_doc:  # an all-empty pandas frame types shingles as
            # float64, which Arrow cannot cast to list<string>
            yield _pd.DataFrame(
                {
                    # nullable Int64, not bare list: a passed-through
                    # null doc_id must reach Arrow as null, not NaN
                    "doc_id": _pd.array(out_doc, dtype="Int64"),
                    "shingles": out_sh,
                    "band_idx": out_bi,
                    "band_sig": out_bs,
                }
            )


#: Arrow signature stage (round-7 A/B, sf0.1, fan_out both sides,
#: full-output checksum forced): HOF warm 1.47-1.62s vs Arrow warm
#: 0.78-0.94s (~45% faster), outputs bit-identical including shingle
#: order.  The HOF fold is interpreted expression-tree evaluation per
#: shingle×permutation; hashlib+numpy batch the same math through C.
#: Flip to False to restore the pure-JVM lineage.
#:
#: LOCALE CONTRACT (round-7 advice): bit-identity of the two
#: lineages' lowercasing assumes the JVM default locale is ROOT-like
#: for case mapping — Spark's ``lower()`` delegates to
#: ``UTF8String.toLowerCase`` which on a Turkish-locale JVM maps
#: I→ı (dotless) while Python's locale-independent ``str.lower()``
#: yields i.  Deployments MUST pin ``-Duser.language=`` (or run the
#: HOF lineage) on non-ROOT-default JVMs; the parity test
#: (tests/test_arrow_signatures.py) asserts the session JVM is not
#: Turkish/Azerbaijani-locale so the contract is checked, not
#: assumed, on the test host.
USE_ARROW_SIGNATURES = True


def minhash_band_rows(docs: DataFrame) -> DataFrame:
    """The banded-LSH index rows of ``docs`` (needs ``doc_id``,
    ``text``): one ``(doc_id, shingles, band_idx, band_sig)`` row per
    band — the shared primitive behind batch candidate pairing
    (:func:`lsh_candidate_pairs`), the corpus composites, and the
    streaming near-dup gates.  Row-local either way, so the same code
    path runs unchanged on a streaming frame.

    Two bit-identical lineages: the default is an Arrow-batched
    ``mapInPandas`` (numpy universal hashes + hashlib md5 — measured
    ~45% faster than the higher-order-function fold at sf0.1, see
    ``USE_ARROW_SIGNATURES``); ``minhash_band_rows_hof`` keeps the
    pure-JVM expression lineage, cross-checked equal in tests.  At
    100 TB both are embarrassingly parallel scan stages with no
    exchange before the band-bucket shuffle; the Arrow path adds a
    Python worker per core, the standard posture for LLM-corpus
    pipelines."""
    if not USE_ARROW_SIGNATURES:
        return minhash_band_rows_hof(docs)
    return docs.select("doc_id", "text").mapInPandas(
        _band_rows_arrow_fn, _BAND_ROWS_SCHEMA
    )


#: (sf_dir → (session, fingerprint, checkpointed index)) — see
#: ``corpus_band_index``
_BAND_IDX_MEMO: dict[str, tuple] = {}


def clear_band_memo() -> None:
    """Release every memoized corpus band index (test isolation)."""
    from ..io import release_local_checkpoint

    while _BAND_IDX_MEMO:
        *_, df = _BAND_IDX_MEMO.pop(next(iter(_BAND_IDX_MEMO)))
        release_local_checkpoint(df)


def corpus_band_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus's banded-LSH index — ``(doc_id, band_idx,
    band_sig)``, NO shingle payload — memoized per (session, sf_dir,
    fixture fingerprint).

    In a real deployment this is a *maintained artifact*: the index
    of the already-ingested corpus is built once (and upserted as
    documents land), then probed by every streaming micro-batch and
    every interactive near-dup lookup; recomputing the full
    tokenize→minhash→band lineage per probe would be a full corpus
    pass per query.  ``localCheckpoint`` is the local stand-in for
    that persistence; at cluster scale the same three narrow columns
    live as a table bucketed on (band_idx, band_sig).  Invalidation
    mirrors the dedup-spine memo (graph._GRP_MEMO): a regenerated
    fixture or new session rebuilds, the superseded checkpoint is
    released."""
    from ..io import fan_out, fixture_fingerprint, memo_local_checkpoint, table

    return memo_local_checkpoint(
        _BAND_IDX_MEMO,
        sf_dir,
        spark,
        fixture_fingerprint(sf_dir),
        lambda: minhash_band_rows(
            fan_out(table(tune(spark), sf_dir, "documents"))
        ).select("doc_id", "band_idx", "band_sig"),
    )


def upsert_band_index(
    index: DataFrame,
    new_docs: DataFrame,
    *,
    new_rows: DataFrame | None = None,
) -> DataFrame:
    """Incrementally maintain a banded-LSH index: drop the index rows
    of re-ingested doc_ids, append the new docs' freshly banded rows.

    This is how :func:`corpus_band_index` stays cheap at 100 TB — new
    documents band as a delta (row-local work over the batch only,
    never a corpus re-pass), the anti-join probes the index on its
    bucket-partitioned layout, and the union preserves the
    ``(doc_id, band_idx, band_sig)`` schema.  Contract (tested):
    ``upsert(index(corpus), delta) ≡ index(corpus ∪ delta)`` row-set
    exact, including doc re-ingestion with changed text.

    ``new_rows``, when given, must be ``minhash_band_rows(new_docs)``
    projected to the 3 index columns — callers that already banded
    the delta (e.g. a streaming micro-batch that probes with the same
    rows) pass it to avoid recomputing the signature stage."""
    if new_rows is None:
        new_rows = minhash_band_rows(new_docs).select(
            "doc_id", "band_idx", "band_sig"
        )
    keep = index.join(
        new_docs.select("doc_id").distinct(), "doc_id", "left_anti"
    )
    return keep.unionByName(new_rows)


def lsh_candidate_pairs(docs: DataFrame) -> DataFrame:
    """Banded-LSH candidate pairs of ``docs`` (needs ``doc_id``,
    ``text``): ``(doc_a, doc_b, sh_a, sh_b)`` with each side's
    distinct shingle set, ready for exact verification (Jaccard,
    containment, …).

    Bands of BAND_ROWS minhashes are hashed to a band signature;
    pairs sharing any (band_idx, band_sig) bucket are candidates;
    each candidate pair is verified with exact shingle Jaccard.

    Pair generation is bucket-grouped, not a self-join: band rows
    hash-shuffle ONCE on (band_idx, band_sig), each bucket collects
    its members, and within-bucket pairs explode locally.  A
    band-table self-join computes the whole tokenize→minhash→band
    lineage twice (Spark does not reuse the exchange across the
    join's two sides — measured A/B at sf0.1: 1.94s → 1.49s) and, at
    scale, either broadcasts the full band table or shuffles the
    shingle payload on BOTH sides; here the payload crosses the wire
    exactly once.  Per-bucket memory is O(|bucket| · shingles) — the
    same row set a shuffled join would gather in one partition for a
    skewed band key, so the grouped shape adds no new skew exposure;
    bucket sizes are bounded by the LSH collision statistics (a
    mega-bucket means near-identical boilerplate, which upstream
    exact-dedup already collapses in the composite pipelines).
    Shuffle cost is O(docs × bands) on the band-bucket key — never
    the all-pairs product.

    Documents with fewer than 3 tokens cannot form a 3-word shingle
    and are excluded up front (otherwise partial shingles pair every
    short doc with every other — and NULL-handling of the partial
    concat differs between engines).
    """
    bands = minhash_band_rows(docs)

    buckets = (
        bands.groupBy("band_idx", "band_sig")
        .agg(F.collect_list(F.struct("doc_id", "shingles")).alias("members"))
        .filter(F.size("members") >= 2)
    )
    m = buckets.select(F.explode("members").alias("a"), "members")
    return (
        m.select("a", F.explode("members").alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def lsh_jaccard_pairs(docs: DataFrame) -> DataFrame:
    """Banded-LSH candidate pairs scored with exact Jaccard (see
    ``lsh_candidate_pairs`` for the plan shape)."""
    cand = lsh_candidate_pairs(docs)
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))).cast("double")
    return cand.select(
        "doc_a",
        "doc_b",
        (inter / union).alias("jaccard"),
    )


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash/LSH near-dup pairs over the documents fixture (see
    ``lsh_jaccard_pairs`` for the plan shape)."""
    d = fan_out(table(tune(spark), sf_dir, "documents"))
    return lsh_jaccard_pairs(d).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


#: synthetic chunk key = doc_id * CHUNK_KEY_MOD + chunk_idx — collision
#: free through 2^20 chunks/doc (≈50M tokens at the 48-token stride)
#: and doc_ids through 2^43; both bounds hold by orders of magnitude
#: at any plausible corpus shard
CHUNK_KEY_MOD = 1 << 20

#: exact-Jaccard acceptance threshold for chunk-level near-dup, ppm
CHUNK_JAC_T_PPM = 600_000


def chunk_pseudo_docs(d: DataFrame) -> DataFrame:
    """The overlapping-chunk pseudo-doc stream shared by
    :func:`chunk_lsh_neardup` and :func:`chunk_dedup_rewrite`
    (factored round 11 — pure extraction, built plan unchanged):
    CHUNK_TOKS-token windows at CHUNK_STRIDE over the NORMALIZED
    token stream, keyed ``doc_id·CHUNK_KEY_MOD + chunk_idx``, chunks
    under 3 tokens dropped (below shingle width).  Returns
    ``(key, ctoks)``; chunking is a row-local explode — no shuffle."""
    base = d.select("doc_id", ws_tokens(_norm_text("text")).alias("toks"))
    starts = F.filter(
        F.sequence(
            F.lit(0),
            F.greatest(F.size("toks") - 1, F.lit(0)),
            F.lit(CHUNK_STRIDE),
        ),
        lambda s: s < F.size("toks"),
    )
    ch = base.select(
        "doc_id", "toks", F.posexplode(starts).alias("chunk_idx", "tok_start")
    )
    piece = F.slice("toks", F.col("tok_start") + 1, CHUNK_TOKS)
    return (
        ch.select("doc_id", "chunk_idx", piece.alias("ctoks"))
        .filter(F.size("ctoks") >= 3)
        .select(
            (F.col("doc_id") * F.lit(CHUNK_KEY_MOD) + F.col("chunk_idx"))
            .cast("long")
            .alias("key"),
            "ctoks",
        )
    )


def chunk_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-level MinHash/LSH near-dup — dedup BELOW document
    granularity (SlimPajama-style): a doc that embeds a paraphrased
    passage of another doc never reaches doc-level Jaccard, but its
    64-token chunks do.  Chunks are the same overlapping windows as
    ``doc_chunking`` (stride 48) over the NORMALIZED token stream
    (near-dup semantics — ``chunk_boilerplate`` stays raw-text exact
    by design), each chunk becomes a pseudo-doc
    (key = doc_id·2^20 + chunk_idx) through the certified
    tokenize→minhash→band→bucket-pair lineage
    (:func:`lsh_candidate_pairs` — shared primitive, one extra query
    adds zero new hash code), candidates verify EXACT shingle
    Jaccard, and only CROSS-document pairs ≥ 0.6 survive.

    Output: (doc_a, chunk_a, doc_b, chunk_b) with integer
    intersection/union witnesses and floor-ppm Jaccard.

    Scale shape: chunking is row-local explode (~n_toks/48 rows per
    doc); everything after is the doc-level near-dup plan on the
    chunk stream — one band-bucket shuffle, never all-pairs.  The
    ~1.3× row multiplication (64/48 overlap) is the price of
    boundary-straddling passages; at 100 TB the chunk stream remains
    scan-partitioned and the bucket join's skew posture is unchanged
    (boilerplate mega-buckets collapse upstream via
    ``chunk_boilerplate`` exact dedup)."""
    d = fan_out(table(tune(spark), sf_dir, "documents"))
    pseudo = chunk_pseudo_docs(d).select(
        F.col("key").alias("doc_id"),
        F.concat_ws(" ", "ctoks").alias("text"),
    )
    cand = lsh_candidate_pairs(pseudo).filter(
        F.expr(f"doc_a DIV {CHUNK_KEY_MOD} != doc_b DIV {CHUNK_KEY_MOD}")
    )
    scored = cand.select(
        "doc_a",
        "doc_b",
        F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("n_int"),
        (
            F.size("sh_a")
            + F.size("sh_b")
            - F.size(F.array_intersect("sh_a", "sh_b"))
        )
        .cast("long")
        .alias("n_uni"),
    )
    return (
        scored.withColumn(
            "jac_ppm", F.expr("CAST(1000000 * n_int DIV n_uni AS BIGINT)")
        )
        .filter(F.col("jac_ppm") >= CHUNK_JAC_T_PPM)
        .select(
            F.expr(f"doc_a DIV {CHUNK_KEY_MOD}").alias("doc_a"),
            F.expr(f"doc_a % {CHUNK_KEY_MOD}").cast("int").alias("chunk_a"),
            F.expr(f"doc_b DIV {CHUNK_KEY_MOD}").alias("doc_b"),
            F.expr(f"doc_b % {CHUNK_KEY_MOD}").cast("int").alias("chunk_b"),
            "n_int",
            "n_uni",
            "jac_ppm",
        )
    )


def chunk_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware CHUNK rewriting — the SlimPajama production
    step that `chunk_lsh_neardup` (detection) and
    `span_dedup_rewrite` (exact repeated spans) stop short of: close
    the cross-doc chunk near-dup pairs transitively, keep ONE
    canonical chunk per component — the member whose parent document
    carries the highest certified quality score (q10), ties to the
    smallest (doc_id, chunk_idx) key, the exact
    `canonical_doc_selection` rule at chunk granularity — and price
    the rewrite per document.

    Output: one row per AFFECTED document — chunk counts, chunk-token
    mass before/dropped (overlapping-window accounting: chunks
    overlap by CHUNK_TOKS−CHUNK_STRIDE tokens, so token mass is the
    dedup-work measure, not exact document length), and the keep
    ratio in ppm.

    Scale shape: reuses the certified band lineage (one bucket
    shuffle, never all-pairs), components run on the pair graph
    (≪ corpus), the canonical pick is a struct-max aggregate (no
    window, no sort), and the per-doc accounting is two partial
    aggregates on the chunk key's doc prefix.

    Reference: beyond-reference LLM-pipeline surface (SlimPajama /
    RefinedWeb chunk-level dedup; reference repo has no dedup at all
    — `CSV PARSER/gcp_csv.py:148-157` is exact-key only)."""
    from ..io import swap_cache
    from .graph import connected_components
    from .textops import quality_score

    d = fan_out(table(tune(spark), sf_dir, "documents"))
    chunks = swap_cache(
        "dedup.chunk_rewrite_stream",
        chunk_pseudo_docs(d).select(
            "key", F.size("ctoks").cast("long").alias("n_toks")
        ),
    )
    pairs = chunk_lsh_neardup(spark, sf_dir).select(
        (F.col("doc_a") * CHUNK_KEY_MOD + F.col("chunk_a"))
        .cast("long")
        .alias("ka"),
        (F.col("doc_b") * CHUNK_KEY_MOD + F.col("chunk_b"))
        .cast("long")
        .alias("kb"),
    )
    comp = connected_components(pairs, src="ka", dst="kb")
    q = quality_score(spark, sf_dir).select(
        "doc_id",
        F.round(F.col("quality_score") * 10).cast("int").alias("q10"),
    )
    members = (
        comp.join(chunks, comp.id == chunks.key)
        .select(
            "key",
            "component",
            "n_toks",
            F.expr(f"key DIV {CHUNK_KEY_MOD}").alias("doc_id"),
        )
        .join(q, "doc_id")
    )
    best = (
        members.groupBy("component")
        .agg(
            F.max(
                F.struct(F.col("q10"), (-F.col("key")).alias("nk"))
            ).alias("b")
        )
        .select("component", (-F.col("b.nk")).cast("long").alias("skey"))
    )
    dropped = members.join(best, "component").filter(
        F.col("key") != F.col("skey")
    )
    per_doc_all = chunks.groupBy(
        F.expr(f"key DIV {CHUNK_KEY_MOD}").alias("doc_id")
    ).agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum("n_toks").cast("long").alias("chunk_toks"),
    )
    per_doc_drop = dropped.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks_dropped"),
        F.sum("n_toks").cast("long").alias("chunk_toks_dropped"),
    )
    # output-level cache (round-12 verdict item 6): the per-doc
    # rewrite economics feed corpus_release_end_to_end and any other
    # co-scheduled consumer — cache the FINAL frame (affected docs
    # only, ≪ corpus) so the chain pays this lineage once per
    # session instead of once per consumer
    from ..io import swap_cache as _swap

    return _swap(
        "dedup.chunk_rewrite_out",
        per_doc_all.join(per_doc_drop, "doc_id").select(
            "doc_id",
            "n_chunks",
            "n_chunks_dropped",
            "chunk_toks",
            "chunk_toks_dropped",
            F.expr(
                "1000000 * (chunk_toks - chunk_toks_dropped) DIV chunk_toks"
            )
            .cast("long")
            .alias("keep_ppm"),
        ),
    )


def _hex8_sql(var: str, offset: int) -> str:
    """SQL for big-endian base-16 int of 8 hex chars of ``var`` from
    1-based ``offset`` — DuckDB's portable equivalent of Spark's
    ``conv(substring(m, offset, 8), 16, 10)``."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({var}, {offset + k}, 1)) - 1) * {16 ** (7 - k)}"
        for k in range(8)
    )


#: the signature-array SQL (shared by MINHASH_ORACLE and the corpus
#: composite's oracle): one md5 per shingle, N_PERM universal-hash mins.
_A_SQL = "[" + ", ".join(str(a) for a in PERM_A) + "]"
_B_SQL = "[" + ", ".join(str(b) for b in PERM_B) + "]"
SIG_LIST_SQL = (
    f"[list_min(list_transform(ms, m -> "
    f"(({_A_SQL})[CAST(p AS INT) + 1] * ({_hex8_sql('m', 1)})"
    f" + ({_B_SQL})[CAST(p AS INT) + 1]) % {MERSENNE_31}))"
    f" FOR p IN range(0, {N_PERM})]"
)

#: band-signature SQL over a BIGINT ``sig`` array (b = band index var)
BAND_SIG_SQL = " || '|' || ".join(
    f"CAST(sig[CAST(b AS INT) * {BAND_ROWS} + {r + 1}] AS VARCHAR)"
    for r in range(BAND_ROWS)
)

#: shared candidate-pair CTE chain (normalize → shingle → minhash →
#: band → equi-join); every LSH-derived oracle composes on `cand`
CAND_PAIRS_SQL = rf"""
WITH norm AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(
             trim(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), '\s+'),
             t -> t != '') AS toks
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(0, greatest(len(toks) - 3, 0) + 1),
             i -> toks[CAST(i AS INT) + 1] || ' ' || toks[CAST(i AS INT) + 2] || ' ' || toks[CAST(i AS INT) + 3]))
           AS shingles
  FROM norm
  WHERE len(toks) >= 3),
hs AS (
  SELECT doc_id, shingles, list_transform(shingles, s -> md5(s)) AS ms
  FROM sh),
sigs AS (
  SELECT doc_id, shingles, {SIG_LIST_SQL} AS sig
  FROM hs),
bands AS (
  SELECT doc_id, shingles, CAST(b AS INT) AS band_idx,
         md5({BAND_SIG_SQL}) AS band_sig
  FROM sigs, range(0, {N_PERM // BAND_ROWS}) t(b)),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         any_value(a.shingles) AS sh_a, any_value(b.shingles) AS sh_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)"""

#: the chunk pseudo-doc stream as oracle CTEs (norm → starts → keyed
#: chunk slices) — the SQL twin of :func:`chunk_pseudo_docs`, shared
#: by CHUNK_LSH_ORACLE and CHUNK_REWRITE_ORACLE
CHUNK_STREAM_CTES = rf"""norm AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(
             trim(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), '\s+'),
             t -> t != '') AS toks
  FROM documents),
st AS (
  SELECT doc_id, toks,
         list_filter(range(0, greatest(len(toks) - 1, 0) + 1, {CHUNK_STRIDE}),
                     s -> s < len(toks)) AS starts
  FROM norm),
ck AS (
  SELECT doc_id * {CHUNK_KEY_MOD} + u.s.i - 1 AS key,
         toks[u.s.st + 1 : u.s.st + {CHUNK_TOKS}] AS ctoks
  FROM (SELECT doc_id, toks,
               unnest(list_transform(starts, (st, i) -> {{'st': st, 'i': i}})) AS s
        FROM st) u
  WHERE len(toks[u.s.st + 1 : u.s.st + {CHUNK_TOKS}]) >= 3)"""

#: chunk-keyed replay of the LSH chain: normalized chunking
#: (CHUNKING_ORACLE's start/slice spelling over the NORMALIZED token
#: list), then the shared shingle→minhash→band fragments keyed on the
#: synthetic chunk key, cross-document filter inside the bucket join
CHUNK_LSH_ORACLE = rf"""
WITH {CHUNK_STREAM_CTES},
sh AS (
  SELECT key,
         list_distinct(list_transform(
             range(0, greatest(len(ctoks) - 3, 0) + 1),
             i -> ctoks[CAST(i AS INT) + 1] || ' ' || ctoks[CAST(i AS INT) + 2] || ' ' || ctoks[CAST(i AS INT) + 3]))
           AS shingles
  FROM ck),
hs AS (
  SELECT key, shingles, list_transform(shingles, s -> md5(s)) AS ms
  FROM sh),
sigs AS (
  SELECT key, shingles, {SIG_LIST_SQL} AS sig
  FROM hs),
bands AS (
  SELECT key, shingles, CAST(b AS INT) AS band_idx,
         md5({BAND_SIG_SQL}) AS band_sig
  FROM sigs, range(0, {N_PERM // BAND_ROWS}) t(b)),
cand AS (
  SELECT a.key AS ka, b.key AS kb,
         any_value(a.shingles) AS sh_a, any_value(b.shingles) AS sh_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
   AND a.key < b.key
   AND a.key // {CHUNK_KEY_MOD} != b.key // {CHUNK_KEY_MOD}
  GROUP BY 1, 2),
sc AS (
  SELECT ka, kb,
         CAST(len(list_intersect(sh_a, sh_b)) AS BIGINT) AS n_int,
         CAST(len(sh_a) + len(sh_b)
              - len(list_intersect(sh_a, sh_b)) AS BIGINT) AS n_uni
  FROM cand)
SELECT ka // {CHUNK_KEY_MOD} AS doc_a,
       CAST(ka % {CHUNK_KEY_MOD} AS INT) AS chunk_a,
       kb // {CHUNK_KEY_MOD} AS doc_b,
       CAST(kb % {CHUNK_KEY_MOD} AS INT) AS chunk_b,
       n_int, n_uni,
       1000000 * n_int // n_uni AS jac_ppm
FROM sc
WHERE 1000000 * n_int // n_uni >= {CHUNK_JAC_T_PPM}
"""


def _chunk_rewrite_oracle() -> str:
    """Recursive-CTE replay of :func:`chunk_dedup_rewrite`: the
    chunk near-dup pairs (the full CHUNK_LSH_ORACLE, MATERIALIZED
    once), closed transitively exactly like ``_doc_groups_sql``,
    canonical pick by (parent-doc q10, min key) struct-max, per-doc
    accounting off the shared chunk-stream CTEs."""
    from .textops import QUALITY_ORACLE

    return rf"""
WITH RECURSIVE {CHUNK_STREAM_CTES},
cp AS MATERIALIZED (
  SELECT doc_a * {CHUNK_KEY_MOD} + chunk_a AS ka,
         doc_b * {CHUNK_KEY_MOD} + chunk_b AS kb
  FROM ({CHUNK_LSH_ORACLE})),
edges(s, d) AS (
  SELECT ka, kb FROM cp
  UNION
  SELECT kb, ka FROM cp),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
closure AS (
  SELECT s, d FROM reach UNION SELECT s, s FROM edges),
comp AS (
  SELECT s AS key, min(d) AS component FROM closure GROUP BY s),
q AS (
  SELECT doc_id, CAST(round(quality_score * 10) AS INT) AS q10
  FROM ({QUALITY_ORACLE})),
members AS (
  SELECT c.key, c.component, CAST(len(ck.ctoks) AS BIGINT) AS n_toks,
         c.key // {CHUNK_KEY_MOD} AS doc_id, q.q10
  FROM comp c
  JOIN ck ON ck.key = c.key
  JOIN q ON q.doc_id = c.key // {CHUNK_KEY_MOD}),
best AS (
  SELECT component, -(max({{'q10': q10, 'nk': -key}})).nk AS skey
  FROM members GROUP BY 1),
dropped AS (
  SELECT m.doc_id, m.n_toks
  FROM members m JOIN best b USING (component)
  WHERE m.key != b.skey),
perdoc_all AS (
  SELECT key // {CHUNK_KEY_MOD} AS doc_id,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(sum(len(ctoks)) AS BIGINT) AS chunk_toks
  FROM ck GROUP BY 1),
perdoc_drop AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks_dropped,
         CAST(sum(n_toks) AS BIGINT) AS chunk_toks_dropped
  FROM dropped GROUP BY 1)
SELECT a.doc_id, a.n_chunks, d.n_chunks_dropped, a.chunk_toks,
       d.chunk_toks_dropped,
       CAST(1000000 * (a.chunk_toks - d.chunk_toks_dropped)
            // a.chunk_toks AS BIGINT) AS keep_ppm
FROM perdoc_all a JOIN perdoc_drop d USING (doc_id)
"""


MINHASH_ORACLE = rf"""{CAND_PAIRS_SQL}
SELECT doc_a, doc_b,
       round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
             / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))), 6) AS jaccard
FROM cand
"""


def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document: per-token md5-derived 32-bit
    hashes, sign-aggregated bit-wise (majority vote). The token hash
    is the first 8 md5 hex chars as an int — `conv` here, explicit
    base-16 arithmetic in the oracle, identical values."""
    d = fan_out(table(tune(spark), sf_dir, "documents"))
    toks = F.array_distinct(ws_tokens(_norm_text("text")))
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    hashes = F.transform(toks, lambda t: tok_hash(t))
    def _vote(b):  # closure factory: a 2-arg lambda per bit position
        def merge(acc, h):
            return acc + F.when(((h / (2 ** b)).cast("long") % 2) == 1, 1).otherwise(-1)

        return merge

    bit_votes = [
        F.aggregate(hashes, F.lit(0).cast("long"), _vote(b)) for b in range(32)
    ]
    simhash = sum(
        (F.when(v > 0, F.lit(2 ** b)).otherwise(F.lit(0)) for b, v in enumerate(bit_votes)),
        start=F.lit(0).cast("long"),
    )
    return d.select("doc_id", simhash.alias("simhash"))


SIMHASH_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(list_filter(regexp_split_to_array(
             trim(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), '\s+'),
             t -> t != '')) AS t
  FROM documents),
hashes AS (
  SELECT doc_id,
         list_transform(t, tok -> (
           (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 268435456
         + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 16777216
         + (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) * 1048576
         + (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1) * 65536
         + (strpos('0123456789abcdef', substr(md5(tok), 5, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substr(md5(tok), 6, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substr(md5(tok), 7, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(tok), 8, 1)) - 1))) AS hs
  FROM toks),
votes AS (
  SELECT doc_id, hs,
         [list_reduce(list_transform(hs,
              h -> CASE WHEN CAST(floor(h / power(2, CAST(b AS INT))) AS BIGINT) % 2 = 1
                        THEN 1 ELSE -1 END),
              (a, x) -> a + x)
          FOR b IN range(0, 32)] AS v
  FROM hashes)
SELECT doc_id,
       CAST(list_reduce(list_transform(range(0, 32),
            b -> CASE WHEN v[CAST(b AS INT) + 1] > 0
                      THEN CAST(power(2, CAST(b AS INT)) AS BIGINT) ELSE 0 END),
            (a, x) -> a + x) AS BIGINT) AS simhash
FROM votes
"""


_BIGRAM_BLOCKED_SCHEMA = (
    "doc_id bigint, block_lang string, block_tok string,"
    " grams array<string>"
)


def _bigram_blocked_arrow_fn(batches):
    """``mapInPandas`` worker for :func:`_bigram_blocked` —
    byte-identical to the JVM expression tree (same tokenizer
    contract as :func:`_band_rows_arrow_fn`; first-occurrence shingle
    order preserved)."""
    import re as _re

    import pandas as _pd

    ws = _re.compile(_JAVA_WS_RE)
    for pdf in batches:
        out = {"doc_id": [], "block_lang": [], "block_tok": [], "grams": []}
        for doc_id, lang, text in zip(
            pdf["doc_id"], pdf["lang"], pdf["text"]
        ):
            if not isinstance(text, str):
                continue  # null text is filtered by the JVM lineage too
            toks = [t for t in ws.split(text.lower()) if t]
            if len(toks) < 2:
                continue
            out["doc_id"].append(
                None if _pd.isna(doc_id) else int(doc_id)
            )
            out["block_lang"].append(
                lang if isinstance(lang, str) else None
            )
            out["block_tok"].append(toks[0])
            out["grams"].append(
                list(
                    dict.fromkeys(
                        f"{toks[i]} {toks[i + 1]}"
                        for i in range(len(toks) - 1)
                    )
                )
            )
        if out["doc_id"]:
            out["doc_id"] = _pd.array(out["doc_id"], dtype="Int64")
            yield _pd.DataFrame(out)


def _bigram_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, block_lang, block_tok, grams) — the blocked word-
    bigram spine shared by ``ngram_jaccard_pairs`` (uncapped, exact)
    and the sweep's per-block-capped variant below.

    Documents with fewer than 2 tokens cannot form a word bigram and
    are excluded up front (same guard as minhash_lsh_pairs' 3-token
    filter: Spark's concat_ws skips the missing second token while
    SQL || propagates NULL, so partial grams diverge across engines).

    Default lineage is the Arrow kernel above (r14 optimization
    round, guide §4.2; parity pinned in
    tests/test_arrow_signatures.py); ``USE_ARROW_SIGNATURES = False``
    restores the pure-JVM tree."""
    d = fan_out(table(tune(spark), sf_dir, "documents"))
    if USE_ARROW_SIGNATURES:
        return d.select("doc_id", "lang", "text").mapInPandas(
            _bigram_blocked_arrow_fn, _BIGRAM_BLOCKED_SCHEMA
        )
    d = d.filter(F.size(ws_tokens(_norm_text("text"))) >= 2)
    grams = word_shingles("text", k=2)
    toks = ws_tokens(_norm_text("text"))
    return d.select(
        "doc_id",
        F.col("lang").alias("block_lang"),
        F.element_at(toks, 1).alias("block_tok"),
        grams.alias("grams"),
    )


def _bigram_pairs(blocked: DataFrame) -> DataFrame:
    """Within-block pair join + exact Jaccard ≥ 0.05 over a blocked
    bigram spine (see ``_bigram_blocked``)."""
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = a.join(
        b,
        (F.col("a.block_lang") == F.col("b.block_lang"))
        & (F.col("a.block_tok") == F.col("b.block_tok"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    inter = F.size(F.array_intersect("a.grams", "b.grams")).cast("double")
    union = (
        F.size("a.grams") + F.size("b.grams") - F.size(F.array_intersect("a.grams", "b.grams"))
    ).cast("double")
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(inter / union, 6).alias("jaccard"),
    ).filter(F.col("jaccard") >= 0.05)


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked n-gram Jaccard near-dup: documents sharing
    (lang, first token) are compared; pairs with Jaccard ≥ 0.05 of
    their word-bigram sets are emitted.  Exact and uncapped — the
    per-block pair-mass-guarded sibling for downstream sweeps is
    ``ngram_jaccard_pairs_capped``."""
    from ..io import swap_cache

    # persist the spine: both sides of the within-block self-join
    # otherwise re-execute the tokenize→shingle tree (r14
    # optimization round, guide §2.4)
    return _bigram_pairs(
        swap_cache("dedup.bigram_blocked", _bigram_blocked(spark, sf_dir))
    )


#: per-(lang, first-token) block document cap for the CAPPED bigram
#: pair spine (round-14 verdict item 4: dedup_threshold_sensitivity
#: probed at e = 1.15 because block populations scale with the
#: corpus, so within-block pairs grow quadratically on a
#: mass-duplication corpus).  Keeping the ``cap`` smallest doc_ids
#: per block bounds every block's pair mass at C(256, 2) — total
#: pair mass becomes linear in the number of blocks — and the count
#: of excluded documents rides along as an explicit scalar: exact up
#: to the cap, explicit beyond it.
SWEEP_BLOCK_DOC_CAP = 256


def ngram_jaccard_pairs_capped(
    spark: SparkSession, sf_dir: str, cap: int = SWEEP_BLOCK_DOC_CAP
) -> tuple[DataFrame, DataFrame]:
    """(pairs, n_docs_capped) — the bigram pair spine with a
    per-block document cap: each (lang, first-token) block
    contributes only its ``cap`` smallest doc_ids to the pair join
    (deterministic, so the DuckDB oracle replays the same QUALIFY),
    and the 1-row scalar frame counts the excluded documents so a
    consumer can surface the truncation explicitly."""
    from pyspark.sql.window import Window

    from ..io import swap_cache

    # persist the spine once (shingle tree) and the capped keep-set
    # once (the rank window): the former shape re-executed the
    # tokenize→shingle tree per join side and the window per
    # consumer (r14 optimization round, guide §2.4)
    blocked = swap_cache(
        "dedup.bigram_blocked", _bigram_blocked(spark, sf_dir)
    )
    w = Window.partitionBy("block_lang", "block_tok").orderBy("doc_id")
    ranked = blocked.withColumn("rk", F.row_number().over(w))
    kept = swap_cache(
        "dedup.bigram_kept", ranked.filter(F.col("rk") <= cap).drop("rk")
    )
    n_capped = ranked.filter(F.col("rk") > cap).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_capped")
    )
    return _bigram_pairs(kept), n_capped


NGRAM_ORACLE = r"""
WITH prep AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(
             trim(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), '\s+'),
             t -> t != '') AS toks
  FROM documents),
blocked AS (
  SELECT doc_id, lang AS block_lang, toks[1] AS block_tok,
         list_distinct(list_transform(range(0, greatest(len(toks) - 2, 0) + 1),
             i -> toks[CAST(i AS INT) + 1] || ' ' || toks[CAST(i AS INT) + 2])) AS grams
  FROM prep
  WHERE len(toks) >= 2)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6) AS jaccard
FROM blocked a
JOIN blocked b
  ON a.block_lang = b.block_lang AND a.block_tok = b.block_tok AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.05
"""


def minhash_lsh_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark ML MinHashLSH approxSimilarityJoin (rows-only check:
    JVM-internal seeded hash families aren't oracle-reproducible).
    This is the built-in scale path for near-dup joins.

    Run on a deterministic 1/3 slice with a 0.2 distance cutoff
    (Jaccard >= 0.8 — the near-dup regime; the fixture docs share so
    much vocabulary that sim >= 0.5 admits ~75% of ALL pairs): the
    self-join's candidate set grows quadratically with bucket density,
    and this query exists as a JVM comparison point, not the engine's
    near-dup path (that's `minhash_lsh_pairs`) — unsliced at sf0.1 it
    alone costs 10+ minutes while proving nothing extra."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    d = fan_out(
        table(tune(spark), sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    )
    toks = d.select("doc_id", ws_tokens(_norm_text("text")).alias("toks"))
    cv = CountVectorizer(inputCol="toks", outputCol="features", binary=True, minDF=1.0)
    model = cv.fit(toks)
    feats = model.transform(toks)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
    lsh_model = lsh.fit(feats)
    joined = lsh_model.approxSimilarityJoin(feats, feats, 0.2, distCol="jaccard_dist")
    return (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(F.col("jaccard_dist"), 6).alias("jaccard_dist"),
        )
    )


#: exact-Jaccard threshold of the ML containment contract (4/5,
#: compared as integers: inter·5 ≥ union·4)
_MH_CONTAIN_J_NUM, _MH_CONTAIN_J_DEN = 4, 5


def minhash_lsh_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-certifiable contract over ``minhash_lsh_ml`` (round-5
    verdict item 3): every exact token-set-Jaccard ≥ 0.8 pair (the
    hand-rolled, oracle-certified ground truth, blocked on
    (lang, first token) like the n-gram family) must appear in the
    Spark ML MinHashLSH candidate set.  The output is one summary row
    — (n_certified, n_missing, all_contained) — whose oracle pins
    n_missing = 0, so a recall regression in the built-in scale path
    fails the hash compare instead of hiding behind a rows-only check.

    The ML side is run deliberately stronger than ``minhash_lsh_ml``
    (8 hash tables vs 4, distance cutoff 0.21 vs 0.2): containment
    only needs the candidate set to be a superset, the extra tables
    push the per-pair miss probability below 1e-5, and the loosened
    cutoff keeps exact-0.8 pairs from falling to a double-rounding
    boundary.  Same 1/3 slice as minhash_lsh_ml."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from ..io import swap_cache

    d = fan_out(
        table(tune(spark), sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    )
    toks = d.select(
        "doc_id", "lang", ws_tokens(_norm_text("text")).alias("toks")
    ).filter(F.size("toks") > 0)
    sets = toks.select(
        "doc_id",
        "lang",
        F.array_distinct("toks").alias("s"),
        F.element_at("toks", 1).alias("b"),
    )
    # toks feeds four consumers (both cert join sides via sets, the
    # CV fit, the CV transform): persist so documents is scanned once
    toks, sets = swap_cache("dedup.mh_containment", toks, sets)
    a, b = sets.alias("a"), sets.alias("b")
    inter = F.size(F.array_intersect(F.col("a.s"), F.col("b.s")))
    union = F.size(F.col("a.s")) + F.size(F.col("b.s")) - inter
    cert = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.b") == F.col("b.b"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(inter * _MH_CONTAIN_J_DEN >= union * _MH_CONTAIN_J_NUM)
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )
    # cert is consumed twice (count + anti-join probe) and is tiny
    cert = swap_cache("dedup.mh_containment_cert", cert)
    cv = CountVectorizer(
        inputCol="toks", outputCol="features", binary=True, minDF=1.0
    )
    feats = cv.fit(toks).transform(toks)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    )
    joined = lsh.fit(feats).approxSimilarityJoin(
        feats, feats, 0.21, distCol="jd"
    )
    ml = joined.filter(
        F.col("datasetA.doc_id") < F.col("datasetB.doc_id")
    ).select(
        F.col("datasetA.doc_id").alias("doc_a"),
        F.col("datasetB.doc_id").alias("doc_b"),
    )
    n_cert = cert.agg(F.count("*").cast("long").alias("n_certified"))
    n_miss = cert.join(ml, ["doc_a", "doc_b"], "left_anti").agg(
        F.count("*").cast("long").alias("n_missing")
    )
    return n_cert.crossJoin(n_miss).select(
        "n_certified",
        "n_missing",
        (F.col("n_missing") == 0).cast("int").alias("all_contained"),
    )


MINHASH_CONTAINMENT_ORACLE = rf"""
WITH prep AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(
             trim(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), '\s+'),
             t -> t != '') AS toks
  FROM documents WHERE doc_id % 3 = 0),
sets AS (
  SELECT doc_id, lang, list_distinct(toks) AS s, toks[1] AS b
  FROM prep WHERE len(toks) > 0),
cert AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sets a JOIN sets b
    ON a.lang = b.lang AND a.b = b.b AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s)) * {_MH_CONTAIN_J_DEN}
        >= (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) * {_MH_CONTAIN_J_NUM})
SELECT CAST(count(*) AS BIGINT) AS n_certified,
       CAST(0 AS BIGINT) AS n_missing,
       1 AS all_contained
FROM cert
"""


#: edit-distance blocking: length-band width and closeness ratio
LEV_BAND = 32
LEV_RATIO = 5  # close iff dist * LEV_RATIO <= min(len_a, len_b)


def edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein near-dup pairs, blocked on (lang, length band).

    The fifth dedup family: character-level edit distance, the metric
    of record for short-document / OCR-noise dedup where token
    shingles are too coarse. Candidates come from an equi-join on
    (lang, n_chars DIV LEV_BAND) — same blocked shape as the other
    families, never a cross product — then each candidate pays one
    O(len²) levenshtein verification, bounded by the band width.
    Pairs straddling a band boundary are missed by construction (run
    with bands b and b+1 joined for full recall); the oracle encodes
    the same blocking so the contract is exact.

    Both engines implement classic unit-cost Levenshtein over
    codepoints, so the distance is cross-engine exact — no float, no
    rounding surface at all."""
    d = fan_out(table(tune(spark), sf_dir, "documents")).select(
        "doc_id", "lang", "text", "n_chars", F.expr(f"n_chars DIV {LEV_BAND}").alias("lb")
    )
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.text"), F.col("b.text"))
    min_chars = F.least(F.col("a.n_chars"), F.col("b.n_chars"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.lb") == F.col("b.lb"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # triangle-inequality prefilter: dist >= |len_a - len_b|,
            # so this prunes candidates BEFORE paying the O(len²)
            # levenshtein and provably never changes the result (the
            # oracle needs no mirror — it is implied by the final
            # threshold)
            & (
                F.abs(F.col("a.n_chars") - F.col("b.n_chars")) * LEV_RATIO
                <= F.least(F.col("a.n_chars"), F.col("b.n_chars"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("left_id"),
            F.col("b.doc_id").alias("right_id"),
            dist.cast("long").alias("edit_dist"),
            min_chars.cast("long").alias("min_chars"),
        )
        .filter(F.col("edit_dist") * LEV_RATIO <= F.col("min_chars"))
    )


EDIT_DISTANCE_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang, text, n_chars, n_chars // {LEV_BAND} AS lb
  FROM documents)
SELECT a.doc_id AS left_id, b.doc_id AS right_id,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
       CAST(least(a.n_chars, b.n_chars) AS BIGINT) AS min_chars
FROM d a JOIN d b
  ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
WHERE levenshtein(a.text, b.text) * {LEV_RATIO} <= least(a.n_chars, b.n_chars)
"""


#: 24-permutation universal-hash family for the S-curve planner —
#: same generator formula as PERM_A/PERM_B (the first 12 entries
#: coincide), kept separate so the certified 12-perm oracle text
#: (_A_SQL/_B_SQL) is untouched
PERM_A24 = [(2654435761 * (p + 1)) % 2**30 | 1 for p in range(24)]
PERM_B24 = [(2246822519 * (p + 1)) % 2**30 for p in range(24)]


_GRAMS3_SCHEMA = "doc_id bigint, grams array<string>, sz bigint"


def _grams3_arrow_fn(batches):
    """``mapInPandas`` worker producing the (doc_id, distinct 3-word
    shingles, shingle count) frame of the prefix-filter join —
    byte-identical to ``word_shingles(text, k=3)`` over the
    ``size(ws_tokens) >= 3`` filter (same tokenizer contract as
    :func:`_band_rows_arrow_fn`, including first-occurrence shingle
    order, which array_distinct preserves on the JVM side)."""
    import re as _re

    import pandas as _pd

    ws = _re.compile(_JAVA_WS_RE)
    for pdf in batches:
        out_doc, out_gr, out_sz = [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            if not isinstance(text, str):
                continue  # null text is filtered by the JVM lineage too
            doc_id = None if _pd.isna(doc_id) else int(doc_id)
            toks = [t for t in ws.split(text.lower()) if t]
            if len(toks) < 3:
                continue
            sh = list(
                dict.fromkeys(
                    " ".join(toks[i : i + 3])
                    for i in range(max(len(toks) - 3, 0) + 1)
                )
            )
            out_doc.append(doc_id)
            out_gr.append(sh)
            out_sz.append(len(sh))
        if out_doc:
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.array(out_doc, dtype="Int64"),
                    "grams": out_gr,
                    "sz": _pd.array(out_sz, dtype="Int64"),
                }
            )


_SCURVE_SIG_SCHEMA = "doc_id bigint, sig array<bigint>"


def _scurve_sigs_arrow_fn(batches):
    """``mapInPandas`` worker for :func:`_scurve_sigs`: the
    normalize → shingle → md5 → 24-perm universal-hash-min chain in
    numpy/hashlib, bit-identical to the HOF fold (hashlib md5 ==
    Spark md5; products < 2^62 stay exact in int64) — the same
    lineage split as :func:`_band_rows_arrow_fn`, which measured
    ~45% faster than the interpreted expression fold."""
    import hashlib
    import re as _re

    import numpy as _np
    import pandas as _pd

    ws = _re.compile(_JAVA_WS_RE)
    a_vec = _np.array(PERM_A24, dtype=_np.int64)
    b_vec = _np.array(PERM_B24, dtype=_np.int64)
    for pdf in batches:
        out_doc, out_sig = [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            if not isinstance(text, str):
                continue  # null text is filtered by the HOF lineage too
            doc_id = None if _pd.isna(doc_id) else int(doc_id)
            toks = [t for t in ws.split(text.lower()) if t]
            if len(toks) < 3:
                continue
            sh = list(
                dict.fromkeys(
                    " ".join(toks[i : i + 3])
                    for i in range(max(len(toks) - 3, 0) + 1)
                )
            )
            hs = _np.fromiter(
                (
                    int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
                    for s in sh
                ),
                dtype=_np.int64,
                count=len(sh),
            )
            sig = (
                ((hs[:, None] * a_vec[None, :]) + b_vec[None, :])
                % MERSENNE_31
            ).min(axis=0)
            out_doc.append(doc_id)
            out_sig.append(sig.tolist())
        if out_doc:
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.array(out_doc, dtype="Int64"),
                    "sig": out_sig,
                }
            )


def _scurve_sigs(docs: DataFrame) -> DataFrame:
    """doc_id → 24-perm minhash signature (the planner's budget) —
    the `minhash_signatures` fold at doubled width.  Docs under 3
    tokens are excluded to match the certified 12-perm lineage
    (``minhash_band_rows_hof``) and the oracle's ``len(toks) >= 3``
    shingle CTE — a 0-2-token doc would otherwise get a degenerate
    single-shingle signature here while being absent from the
    oracle's signature set (round-13 advice item 1).

    Default lineage is the Arrow kernel above (r14 optimization
    round, guide §4.2); ``USE_ARROW_SIGNATURES = False`` restores the
    pure-JVM HOF fold, cross-checked bit-identical in
    ``tests/test_arrow_signatures.py``."""
    if USE_ARROW_SIGNATURES:
        return docs.select("doc_id", "text").mapInPandas(
            _scurve_sigs_arrow_fn, _SCURVE_SIG_SCHEMA
        )
    sh_df = docs.filter(F.size(ws_tokens(_norm_text("text"))) >= 3).select(
        "doc_id", F.explode(F.array(word_shingles("text"))).alias("shingles")
    )
    hashes = F.transform(
        "shingles",
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )
    hs_df = sh_df.select(
        "doc_id", F.explode(F.array(hashes)).alias("hs")
    )
    sig = F.aggregate(
        "hs",
        F.array_repeat(F.lit(2**62).cast("long"), 24),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    (F.lit(PERM_A24[p]) * h + F.lit(PERM_B24[p]))
                    % F.lit(MERSENNE_31)
                    for p in range(24)
                ]
            ),
            lambda a, b: F.least(a, b),
        ),
    )
    return hs_df.select("doc_id", F.explode(F.array(sig)).alias("sig"))


#: S-curve planning grid: candidate (bands, rows) geometries with
#: b·r ≤ 2·N_PERM (what a 24-permutation budget could buy) and the
#: Jaccard thresholds the curve is evaluated at (ppm)
SCURVE_GEOMS = ((2, 6), (3, 4), (4, 3), (6, 2), (4, 6), (6, 4), (8, 3))
SCURVE_J_PPM = (100000, 300000, 500000, 700000, 900000)


def lsh_s_curve_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH PLANNING TABLE — how production picks (bands, rows):
    for a pair at Jaccard j, one band of r rows collides with
    probability j^r and at least one of b bands collides with
    probability 1 − (1 − j^r)^b (the S-curve).  The planner
    evaluates every candidate geometry at every threshold and also
    reports each geometry's CORPUS-MEASURED candidate-pair count —
    theory and measured cost side by side, which is exactly the
    trade a tuning engineer stares at.

    Exactness: probabilities are kept in ppm with floor after every
    multiply (p·q → (p·q) DIV 1e6) — each step is integer, so both
    engines replay the identical arithmetic (exact rational powers
    overflow DECIMAL(38,0) at b=8, hence the documented stepwise
    floor; error < b+r ppm, irrelevant at planning granularity).
    The corpus measurement reuses the certified signature lineage:
    one md5 per shingle, per-geometry band buckets, Σ C(bucket, 2).

    Scale shape: the theory grid is |geoms|·|thresholds| literal
    rows; the measured column is one signature pass + one
    bucket-count aggregate per geometry over signatures (corpus
    rows, map-side combined — never materializes pairs)."""
    from ..io import swap_cache

    def powf(p_expr: str, k: int) -> str:
        out = "CAST(1000000 AS BIGINT)"
        for _ in range(k):
            out = f"(({out}) * ({p_expr}) DIV 1000000)"
        return out

    legs = []
    for b, r in SCURVE_GEOMS:
        for j in SCURVE_J_PPM:
            jr = powf(str(j), r)
            hit = f"1000000 - {powf(f'1000000 - {jr}', b)}"
            legs.append(
                f"SELECT {b} AS bands, {r} AS rows_per_band,"
                f" CAST({j} AS BIGINT) AS j_ppm,"
                f" CAST({jr} AS BIGINT) AS band_hit_ppm,"
                f" CAST({hit} AS BIGINT) AS pair_found_ppm"
            )
        # negative j marks the measured-cost row for the geometry
        legs.append(
            f"SELECT {b} AS bands, {r} AS rows_per_band,"
            f" CAST(-1 AS BIGINT) AS j_ppm,"
            f" CAST(0 AS BIGINT) AS band_hit_ppm,"
            f" CAST(0 AS BIGINT) AS pair_found_ppm"
        )
    theory = tune(spark).sql(" UNION ALL ".join(legs))

    d = fan_out(table(spark, sf_dir, "documents"))
    # 24-permutation signature stream (the planner's budget), same
    # universal-hash family as the certified 12-perm lineage
    sigs = swap_cache("dedup.scurve_sigs", _scurve_sigs(d))
    # ONE exploded pass over the signature stream for ALL geometries
    # (r14 optimization round): the former per-geometry loop ran 7
    # separate two-exchange aggregate jobs over the persisted sigs
    # (38 Exchanges total); tagging each band struct with its
    # (bands, rows_per_band) and aggregating once is the identical
    # integer arithmetic — Σ C(bucket, 2) per geometry — at 2
    # Exchanges (guide §2.4).
    band_structs = [
        F.struct(
            F.lit(b).alias("bands"),
            F.lit(r).alias("rpb"),
            F.lit(i).alias("band"),
            F.concat_ws(
                "|", *[F.col("sig")[i * r + k] for k in range(r)]
            ).alias("key"),
        )
        for b, r in SCURVE_GEOMS
        for i in range(b)
    ]
    measured = (
        sigs.select(F.explode(F.array(*band_structs)).alias("bk"))
        .groupBy("bk.bands", "bk.rpb", "bk.band", "bk.key")
        .agg(F.count("*").cast("long").alias("n"))
        .groupBy("bands", "rpb")
        .agg(
            F.sum(F.expr("n * (n - 1) DIV 2"))
            .cast("long")
            .alias("n_candidates")
        )
        .withColumnRenamed("rpb", "rows_per_band")
    )
    return (
        theory.join(
            F.broadcast(measured), ["bands", "rows_per_band"], "left"
        )
        .select(
            "bands",
            "rows_per_band",
            "j_ppm",
            "band_hit_ppm",
            "pair_found_ppm",
            F.when(F.col("j_ppm") < 0, F.col("n_candidates"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("measured_candidates"),
        )
        .orderBy("bands", "rows_per_band", "j_ppm")
    )


def _scurve_oracle() -> str:
    def powf(p_expr: str, k: int) -> str:
        out = "CAST(1000000 AS BIGINT)"
        for _ in range(k):
            out = f"(({out}) * ({p_expr}) // 1000000)"
        return out

    legs = []
    for b, r in SCURVE_GEOMS:
        for j in SCURVE_J_PPM:
            jr = powf(str(j), r)
            hit = f"1000000 - {powf(f'1000000 - {jr}', b)}"
            legs.append(
                f"SELECT {b} AS bands, {r} AS rows_per_band,"
                f" CAST({j} AS BIGINT) AS j_ppm,"
                f" CAST({jr} AS BIGINT) AS band_hit_ppm,"
                f" CAST({hit} AS BIGINT) AS pair_found_ppm"
            )
        legs.append(
            f"SELECT {b} AS bands, {r} AS rows_per_band,"
            f" CAST(-1 AS BIGINT) AS j_ppm, CAST(0 AS BIGINT),"
            f" CAST(0 AS BIGINT)"
        )
    # the measured column replays the 24-perm signature lineage per
    # geometry: same md5/universal-hash family as SIG_LIST_SQL but at
    # n_perm = 24
    a24 = "[" + ", ".join(str(a) for a in PERM_A24) + "]"
    b24 = "[" + ", ".join(str(b_) for b_ in PERM_B24) + "]"
    sig24 = (
        f"[list_min(list_transform(ms, m -> "
        f"(({a24})[CAST(p AS INT) + 1] * ({_hex8_sql('m', 1)})"
        f" + ({b24})[CAST(p AS INT) + 1]) % {MERSENNE_31}))"
        f" FOR p IN range(0, {2 * N_PERM})]"
    )
    meas_legs = []
    for b, r in SCURVE_GEOMS:
        band_key = " || '|' || ".join(
            f"CAST(sig[CAST(band AS INT) * {r} + {k + 1}] AS VARCHAR)"
            for k in range(r)
        )
        meas_legs.append(f"""
SELECT {b} AS bands, {r} AS rows_per_band,
       CAST(sum(n * (n - 1) // 2) AS BIGINT) AS n_candidates
FROM (SELECT band, key, count(*) AS n
      FROM (SELECT band, {band_key} AS key
            FROM sigs, range(0, {b}) t(band))
      GROUP BY 1, 2)""")
    return rf"""
WITH norm AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(
             trim(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), '\s+'),
             t -> t != '') AS toks
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(0, greatest(len(toks) - 3, 0) + 1),
             i -> toks[CAST(i AS INT) + 1] || ' ' || toks[CAST(i AS INT) + 2]
                  || ' ' || toks[CAST(i AS INT) + 3])) AS shingles
  FROM norm WHERE len(toks) >= 3),
hs AS (SELECT doc_id, list_transform(shingles, s -> md5(s)) AS ms FROM sh),
sigs AS MATERIALIZED (SELECT doc_id, {sig24} AS sig FROM hs),
measured AS ({" UNION ALL ".join(meas_legs)}),
theory AS ({" UNION ALL ".join(legs)})
SELECT t.bands, t.rows_per_band, t.j_ppm, t.band_hit_ppm,
       t.pair_found_ppm,
       CAST(CASE WHEN t.j_ppm < 0 THEN m.n_candidates ELSE 0 END
            AS BIGINT) AS measured_candidates
FROM theory t LEFT JOIN measured m
  ON t.bands = m.bands AND t.rows_per_band = m.rows_per_band
ORDER BY 1, 2, 3
"""


def fastss_editdist1_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 similarity join by DELETION-NEIGHBORHOOD
    blocking (FastSS, Bocek et al. 2007) — the LOSSLESS counterpart
    of `edit_distance_pairs`' length-band heuristic: two strings are
    within edit distance 1 iff they share a member of their deletion
    neighborhoods (the string itself plus every single-character
    deletion), so the equi-join on variants provably finds EVERY
    ed ≤ 1 pair — substitution pairs share the deletion at the
    differing position, insert/delete pairs contain each other's
    full string.  The oracle is the all-pairs levenshtein truth (the
    |len diff| ≤ 1 prefilter is implied by the threshold), so the
    hash match certifies the blocking lost nothing.

    Substrate: customer names — the entity-key-typo shape record
    linkage dedupes (the documents fixture's 31-token vocabulary is
    too small to exercise blocking).  Scale shape: len+1 variants
    per name (posting-shaped explode), one variant equi-join (never
    all-pairs — that's the oracle's job), one O(len) levenshtein per
    candidate.  At 100 TB the variant table is (len+1)·|names| rows
    and the join is bucket-shaped on variant hash."""
    # fan_out: the single-file customer scan is ONE split, which
    # serialized the whole variant explode + join build on one core
    # (measured 3.2s for the 285k-row variant frame alone at sf0.1;
    # r14 optimization round, guide §2.5 input skew).
    c = fan_out(table(tune(spark), sf_dir, "customer").select("c_name"))
    variants = c.select(
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
    # join on the 8-byte xxhash64 of the variant, not the variant
    # string itself (guide §2.3 "narrower types"): candidates stay a
    # SUPERSET of the true deletion-neighborhood matches (equal
    # variants always collide; a stray hash collision can only add a
    # candidate), and the exact levenshtein verification downstream
    # keeps precisely the ed ≤ 1 pairs either way — output unchanged.
    ).select("name", F.xxhash64("v").alias("vh"))
    a = variants.alias("a")
    b = variants.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.vh") == F.col("b.vh"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
        .distinct()
    )
    return cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("edit_dist"),
    ).filter(F.col("edit_dist") <= 1)


FASTSS_ED1_ORACLE = """
SELECT a.c_name AS name_a, b.c_name AS name_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
FROM customer a JOIN customer b
  ON a.c_name < b.c_name
 AND abs(len(a.c_name) - len(b.c_name)) <= 1
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment over the LSH candidate pairs:
    ``|A∩B| / |A|`` (and ``/ |B|``) as integer ppm. Jaccard misses
    the quote-inclusion case — a short document wholly embedded in a
    long one scores low Jaccard but 1e6 containment ppm on the short
    side; dedup policies drop the contained copy. Same banded plan as
    ``minhash_lsh_pairs``; only the verification expression differs."""
    d = fan_out(table(tune(spark), sf_dir, "documents"))
    cand = lsh_candidate_pairs(d)
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    return cand.select(
        "doc_a",
        "doc_b",
        inter.alias("n_common"),
        F.size("sh_a").cast("long").alias("n_a"),
        F.size("sh_b").cast("long").alias("n_b"),
    ).select(
        "doc_a",
        "doc_b",
        "n_common",
        F.expr("1000000 * n_common DIV n_a").alias("containment_a_ppm"),
        F.expr("1000000 * n_common DIV n_b").alias("containment_b_ppm"),
    )


CONTAINMENT_ORACLE = rf"""{CAND_PAIRS_SQL}
SELECT doc_a, doc_b,
       CAST(len(list_intersect(sh_a, sh_b)) AS BIGINT) AS n_common,
       CAST((1000000 * len(list_intersect(sh_a, sh_b))) // len(sh_a) AS BIGINT)
         AS containment_a_ppm,
       CAST((1000000 * len(list_intersect(sh_a, sh_b))) // len(sh_b) AS BIGINT)
         AS containment_b_ppm
FROM cand
"""


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources near-duplicate each other: the LSH pair graph
    joined back to each side's ``source``, counted per unordered
    source pair — the governance readout that finds mirror domains
    and syndication clusters before they skew a training mixture.

    Scale: two equi-joins of the (tiny) pair graph against the
    doc→source projection on ``doc_id``, then a sources²-group
    aggregate. The pair graph is edges-sized, never corpus-sized."""
    d = fan_out(table(tune(spark), sf_dir, "documents"))
    src = d.select("doc_id", "source")
    pairs = lsh_candidate_pairs(d).select("doc_a", "doc_b")
    both = (
        pairs.join(src.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("source", "source_a")
        .join(
            src.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "source", "source_b"
            ),
            "doc_b",
        )
    )
    return (
        both.select(
            F.least("source_a", "source_b").alias("source_x"),
            F.greatest("source_a", "source_b").alias("source_y"),
        )
        .groupBy("source_x", "source_y")
        .agg(F.count("*").alias("n_pairs"))
    )


SOURCE_OVERLAP_ORACLE = rf"""{CAND_PAIRS_SQL}
SELECT least(da.source, db.source) AS source_x,
       greatest(da.source, db.source) AS source_y,
       count(*) AS n_pairs
FROM cand c
JOIN documents da ON da.doc_id = c.doc_a
JOIN documents db ON db.doc_id = c.doc_b
GROUP BY 1, 2
"""


#: sorted-neighborhood geometry: sort-key prefix length, window width
#: (candidates = rank gap 1..SNM_WINDOW-1 per pass), verify threshold
SNM_KEY_LEN = 32
SNM_WINDOW = 4
SNM_JACCARD_MIN_PPM = 500_000


def _snm_global_rank(keyed: DataFrame, pass_id: int) -> DataFrame:
    """Exact global rank over ``(skey, doc_id)`` WITHOUT a global
    single-task sort: bucket by the key's first character — buckets
    are alphabet-bounded and ordering-aligned (every key in bucket
    'a' sorts before every key in bucket 'b', byte order on the
    ASCII fixture) — rank within the bucket in parallel, then add
    each bucket's offset (total count of lexicographically smaller
    buckets, a triangular join over the ≤ |alphabet| per-bucket
    totals, broadcast back).  The same two-level prefix-sum shape as
    ``spearman_rank_corr_bucketed``; no partitionless window."""
    from pyspark.sql.window import Window

    b = keyed.withColumn("bkt", F.substring("skey", 1, 1))
    local = b.withColumn(
        "lrank",
        F.row_number().over(Window.partitionBy("bkt").orderBy("skey", "doc_id")),
    )
    counts = b.groupBy("bkt").agg(F.count("*").cast("long").alias("n"))
    x, y = counts.alias("x"), counts.alias("y")
    offs = (
        x.join(y, F.col("y.bkt") < F.col("x.bkt"), "left")
        .groupBy(F.col("x.bkt").alias("bkt"))
        .agg(F.coalesce(F.sum("y.n"), F.lit(0)).cast("long").alias("off"))
    )
    return local.join(F.broadcast(offs), "bkt").select(
        F.lit(pass_id).alias("pass_id"),
        "doc_id",
        (F.col("off") + F.col("lrank")).cast("long").alias("rnk"),
    )


def snm_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass sorted-neighborhood (SNM) near-dup — the classic
    entity-resolution blocking method (Hernández & Stolfo 1995)
    completing the candidate-generation family: LSH blocks by hash
    collision, SimHash by bit-prefix, SNM by SORT ADJACENCY — two
    lexicographic passes (normalized-text prefix; reversed-text
    prefix, which catches dups that diverge early but share a tail),
    candidates = pairs within rank distance < SNM_WINDOW in either
    pass, exact word-bigram Jaccard verify ≥ SNM_JACCARD_MIN_PPM
    (integer ppm — a k/n quotient must never meet ``round()``).

    Scale shape: per pass the candidate step is O(docs × window) —
    each ranked row emits SNM_WINDOW-1 integer probe ranks and the
    join is an equi-join on (pass, rank), one hash shuffle; the rank
    itself is the bucketed two-level prefix sum (no single-task
    global sort), so the whole plan is sort-free and pairwise-free.
    At 100 TB SNM is the cheapest of the four blockers (no signature
    computation at all); its known blind spot — dups whose sort keys
    land far apart — is exactly what the multi-pass union and the
    LSH sibling cover.  Output: pair, how many passes found it, the
    closest rank gap, verified Jaccard."""
    from ..io import swap_cache

    d = fan_out(table(tune(spark), sf_dir, "documents"))
    norm = _norm_text("text")
    d = d.filter(F.size(ws_tokens(norm)) >= 2)
    # g feeds both rank passes and both sides of the verify join;
    # ranked feeds the probe side and the join side of the candidate
    # step — persist each once instead of recomputing per branch
    g = swap_cache(
        "dedup.snm_g",
        d.select(
            "doc_id",
            F.substring(norm, 1, SNM_KEY_LEN).alias("k1"),
            F.substring(F.reverse(norm), 1, SNM_KEY_LEN).alias("k2"),
            word_shingles("text", k=2).alias("grams"),
        ),
    )
    ranked = swap_cache(
        "dedup.snm_ranked",
        _snm_global_rank(g.select("doc_id", F.col("k1").alias("skey")), 1).unionByName(
            _snm_global_rank(g.select("doc_id", F.col("k2").alias("skey")), 2)
        ),
    )
    probes = ranked.select(
        "pass_id",
        F.col("doc_id").alias("low_id"),
        F.explode(F.sequence(F.lit(1), F.lit(SNM_WINDOW - 1))).alias("gap"),
        "rnk",
    ).withColumn("rnk", (F.col("rnk") + F.col("gap")).cast("long"))
    cand = probes.join(ranked, ["pass_id", "rnk"]).select(
        "pass_id",
        F.least("low_id", "doc_id").alias("doc_a"),
        F.greatest("low_id", "doc_id").alias("doc_b"),
        "gap",
    )
    pairs = cand.groupBy("doc_a", "doc_b").agg(
        F.count_distinct("pass_id").cast("long").alias("n_passes"),
        F.min("gap").cast("long").alias("min_gap"),
    )
    ga = g.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("gr_a"))
    gb = g.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gr_b"))
    inter = F.size(F.array_intersect("gr_a", "gr_b")).cast("long")
    union = (
        F.size("gr_a") + F.size("gr_b") - F.size(F.array_intersect("gr_a", "gr_b"))
    ).cast("long")
    return (
        pairs.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_passes",
            "min_gap",
            inter.alias("n_inter"),
            union.alias("n_union"),
        )
        .select(
            "doc_a",
            "doc_b",
            "n_passes",
            "min_gap",
            F.expr("1000000 * n_inter DIV n_union").alias("jaccard_ppm"),
        )
        .filter(F.col("jaccard_ppm") >= SNM_JACCARD_MIN_PPM)
    )


SNM_ORACLE = rf"""
WITH prep AS MATERIALIZED (
  SELECT doc_id,
         lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm,
         list_filter(regexp_split_to_array(
             lower(regexp_replace(trim(text), '\s+', ' ', 'g')), '\s+'),
             t -> t != '') AS toks
  FROM documents),
g AS MATERIALIZED (
  SELECT doc_id,
         substr(norm, 1, {SNM_KEY_LEN}) AS k1,
         substr(reverse(norm), 1, {SNM_KEY_LEN}) AS k2,
         list_distinct(list_transform(range(0, greatest(len(toks) - 2, 0) + 1),
             i -> toks[CAST(i AS INT) + 1] || ' ' || toks[CAST(i AS INT) + 2]))
           AS grams
  FROM prep WHERE len(toks) >= 2),
r1 AS (SELECT doc_id, row_number() OVER (ORDER BY k1, doc_id) AS rnk FROM g),
r2 AS (SELECT doc_id, row_number() OVER (ORDER BY k2, doc_id) AS rnk FROM g),
cand AS (
  SELECT 1 AS pass_id, a.doc_id AS ida, b.doc_id AS idb, b.rnk - a.rnk AS gap
  FROM r1 a JOIN r1 b ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + {SNM_WINDOW - 1}
  UNION ALL
  SELECT 2, a.doc_id, b.doc_id, b.rnk - a.rnk
  FROM r2 a JOIN r2 b ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + {SNM_WINDOW - 1}),
pairs AS (
  SELECT least(ida, idb) AS doc_a, greatest(ida, idb) AS doc_b,
         CAST(count(DISTINCT pass_id) AS BIGINT) AS n_passes,
         CAST(min(gap) AS BIGINT) AS min_gap
  FROM cand GROUP BY 1, 2)
SELECT p.doc_a, p.doc_b, p.n_passes, p.min_gap,
       CAST((1000000 * len(list_intersect(a.grams, b.grams)))
            // (len(a.grams) + len(b.grams)
                - len(list_intersect(a.grams, b.grams))) AS BIGINT)
         AS jaccard_ppm
FROM pairs p
JOIN g a ON a.doc_id = p.doc_a
JOIN g b ON b.doc_id = p.doc_b
WHERE (1000000 * len(list_intersect(a.grams, b.grams)))
      // (len(a.grams) + len(b.grams)
          - len(list_intersect(a.grams, b.grams)))
      >= {SNM_JACCARD_MIN_PPM}
"""


#: content-defined chunking geometry (LBFS/rsync family): rolling
#: window, polynomial base, modulus, and boundary divisor (expected
#: chunk length).  PW holds B^j mod M as Python-computed literals so
#: neither engine evaluates a power.
CDC_W = 16
CDC_B = 31
CDC_M = 1 << 25
CDC_DIV = 64
CDC_PW = [pow(CDC_B, j, CDC_M) for j in range(CDC_W)]


def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup — the STORAGE-level member of
    the dedup family (exact/LSH/SimHash/SNM dedupe documents; CDC
    dedupes the BYTES inside them, the rsync/LBFS/backup-store
    technique): a polynomial rolling hash over the payload stream
    cuts chunk boundaries wherever ``h % CDC_DIV == 0``, so shared
    substrings between near-duplicate documents align to identical
    chunks REGARDLESS of byte offset — the property fixed-size
    blocking lacks (one inserted byte shifts every later block).
    One summary row: chunk counts, distinct-chunk counts, and the
    exact bytes a content-addressed store would save on this corpus.

    Engine-portable by construction: the fixture is ASCII (pinned by
    the ahash guard), so the char stream IS the byte stream; the
    rolling hash is 16 lag terms dotted with Python-precomputed
    ``B^j mod M`` literals — pure integer arithmetic, no loops, no
    UDF.  Scale shape: one posexplode to the char grid, one per-doc
    window for the hash + boundary cumsum, one groupBy to assemble
    chunks, corpus-level aggregates; everything partitions by
    doc_id except the final distinct-chunk count (hash-grouped)."""
    from pyspark.sql.window import Window

    d = fan_out(table(tune(spark), sf_dir, "documents"))
    # empty-text guard (round-10 advice): Spark's sequence(1, 0) is
    # the DESCENDING [1, 0] while the oracle's range(1, len+1) is
    # empty — gate the explode so zero-length documents contribute
    # no char rows in either engine
    chars = (
        d.filter(F.length("text") >= 1)
        .select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("long").alias("i"),
            F.expr("ascii(substring(text, i, 1))").alias("code"),
        )
    )
    # chars is consumed by the hash window AND chunk assembly via one
    # lineage (window output carries everything forward)
    w = Window.partitionBy("doc_id").orderBy("i")
    h = None
    for j, p in enumerate(CDC_PW):
        term = (
            F.coalesce(F.lag("code", j).over(w), F.lit(0)).cast("long") * p
        )
        h = term if h is None else h + term
    hashed = chars.withColumn("h", h % CDC_M)
    bounded = hashed.withColumn(
        "is_boundary", (F.col("h") % CDC_DIV == 0).cast("long")
    ).withColumn(
        "chunk_id",
        F.coalesce(
            F.sum("is_boundary").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    chunks = bounded.groupBy("doc_id", "chunk_id").agg(
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("i", "code"))),
                    lambda s: s["code"].cast("string"),
                ),
            )
        ).alias("ch"),
        F.count("*").cast("long").alias("clen"),
    )
    per_hash = chunks.groupBy("ch").agg(
        F.count("*").cast("long").alias("n_copies"),
        F.min("clen").cast("long").alias("clen"),
    )
    return per_hash.agg(
        F.sum("n_copies").cast("long").alias("n_chunks"),
        F.count("*").cast("long").alias("n_distinct_chunks"),
        (F.sum("n_copies") - F.count("*")).cast("long").alias("n_dup_chunks"),
        F.sum(F.col("n_copies") * F.col("clen")).cast("long").alias("bytes_total"),
        F.sum("clen").cast("long").alias("bytes_stored"),
        F.expr(
            "1000000 * (sum(n_copies * clen) - sum(clen))"
            " DIV sum(n_copies * clen)"
        )
        .cast("long")
        .alias("savings_ppm"),
    )


def _cdc_oracle() -> str:
    terms = " + ".join(
        f"CAST(coalesce(lag(code, {j}) OVER win, 0) AS BIGINT) * {p}"
        for j, p in enumerate(CDC_PW)
    )
    return f"""
WITH chars AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS i,
         ascii(substr(text, CAST(t.i AS INT), 1)) AS code
  FROM documents, unnest(range(1, len(text) + 1)) t(i)),
hashed AS (
  SELECT doc_id, i, code, ({terms}) % {CDC_M} AS h
  FROM chars
  WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
bounded AS (
  SELECT doc_id, i, code,
         coalesce(sum(CASE WHEN h % {CDC_DIV} = 0 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS chunk_id
  FROM hashed),
chunks AS (
  SELECT doc_id, chunk_id,
         md5(string_agg(CAST(code AS VARCHAR), ',' ORDER BY i)) AS ch,
         CAST(count(*) AS BIGINT) AS clen
  FROM bounded GROUP BY 1, 2),
per_hash AS (
  SELECT ch, CAST(count(*) AS BIGINT) AS n_copies,
         CAST(min(clen) AS BIGINT) AS clen
  FROM chunks GROUP BY 1)
SELECT CAST(sum(n_copies) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_distinct_chunks,
       CAST(sum(n_copies) - count(*) AS BIGINT) AS n_dup_chunks,
       CAST(sum(n_copies * clen) AS BIGINT) AS bytes_total,
       CAST(sum(clen) AS BIGINT) AS bytes_stored,
       CAST((1000000 * (sum(n_copies * clen) - sum(clen)))
            // sum(n_copies * clen) AS BIGINT) AS savings_ppm
FROM per_hash
"""


#: SimHash near-dup radius: 4 bands of 16 bits over a 64-bit
#: signature make banding LOSSLESS at Hamming <= 3 (pigeonhole).
#: 64 bits, not the certified 32-bit demo signature: on a corpus
#: whose token profiles are similar, 32 bits saturate (measured:
#: Hamming <= 3 matched 15% of ALL pairs at sf0.001 — not a
#: detector) while the 64-bit tail keeps random pairs ~32 bits apart
SIMHAM_T = 3
SIMHAM_BANDS = 4


_SIMHAM_SIG_SCHEMA = "doc_id bigint, lo bigint, hi bigint"


def _simham_sigs_arrow_fn(batches):
    """``mapInPandas`` worker for :func:`_simhash64_sigs`: the
    normalize → distinct-token → md5 → per-bit majority vote in
    numpy/hashlib, bit-identical to the HOF fold — Spark's
    ``(h / 2**b) cast long % 2`` equals ``(h >> b) & 1`` exactly for
    h < 2^32 (double division by a power of two is exact there), and
    votes are commutative sums, so token order cannot matter.  The
    HOF lineage evaluates 64 interpreted per-bit fold expressions per
    document; this kernel is one vectorized bit-matrix sum (guide
    §4.2)."""
    import hashlib
    import re as _re

    import numpy as _np
    import pandas as _pd

    ws = _re.compile(_JAVA_WS_RE)
    bits = _np.arange(32, dtype=_np.int64)
    pow2 = _np.int64(1) << bits
    for pdf in batches:
        out_doc, out_lo, out_hi = [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            if not isinstance(text, str):
                continue  # null text has no tokens in the HOF lineage
            doc_id = None if _pd.isna(doc_id) else int(doc_id)
            toks = list(
                dict.fromkeys(t for t in ws.split(text.lower()) if t)
            )
            if not toks:
                continue  # whitespace-only doc: excluded on both sides
            digs = [hashlib.md5(t.encode()).hexdigest() for t in toks]

            def word(col0: int, col1: int) -> int:
                hs = _np.fromiter(
                    (int(d[col0:col1], 16) for d in digs),
                    dtype=_np.int64,
                    count=len(digs),
                )
                votes = (
                    2 * ((hs[:, None] >> bits[None, :]) & 1) - 1
                ).sum(axis=0)
                return int(pow2[votes > 0].sum())

            out_doc.append(doc_id)
            out_lo.append(word(0, 8))
            out_hi.append(word(8, 16))
        if out_doc:
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.array(out_doc, dtype="Int64"),
                    "lo": _np.array(out_lo, dtype=_np.int64),
                    "hi": _np.array(out_hi, dtype=_np.int64),
                }
            )


def _simhash64_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lo, hi): the 64-bit majority-vote SimHash as two
    BIGINT 32-bit words (md5 hex chars 1-8 and 9-16 per token give
    two independent hash streams; two words stay clear of the sign
    bit).  Shared by the near-dup operator and its brute-force
    losslessness pin.

    Default lineage is the Arrow kernel above (r14 optimization
    round); ``USE_ARROW_SIGNATURES = False`` restores the pure-JVM
    64-fold vote, cross-checked bit-identical in
    ``tests/test_arrow_signatures.py``."""
    d = fan_out(table(tune(spark), sf_dir, "documents"))
    if USE_ARROW_SIGNATURES:
        return d.select("doc_id", "text").mapInPandas(
            _simham_sigs_arrow_fn, _SIMHAM_SIG_SCHEMA
        )
    toks = F.array_distinct(ws_tokens(_norm_text("text")))

    def word(offset: int) -> Column:
        th = lambda t: F.conv(
            F.substring(F.md5(t), offset, 8), 16, 10
        ).cast("long")
        hashes = F.transform(toks, th)

        def _vote(b):
            def merge(acc, h):
                return acc + F.when(
                    ((h / (2 ** b)).cast("long") % 2) == 1, 1
                ).otherwise(-1)

            return merge

        votes = [
            F.aggregate(hashes, F.lit(0).cast("long"), _vote(b))
            for b in range(32)
        ]
        return sum(
            (
                F.when(v > 0, F.lit(2 ** b)).otherwise(F.lit(0))
                for b, v in enumerate(votes)
            ),
            start=F.lit(0).cast("long"),
        )

    # a whitespace-only document has no tokens, hence no signature:
    # without this filter Spark would emit an all-zero signature and
    # pair every such doc at Hamming 0, while the oracle's
    # list_reduce (no initial value) errors on the empty list —
    # both engines now agree empty-text docs are excluded
    # (round-12 advice item 3)
    return d.filter(F.size(toks) > 0).select(
        "doc_id", word(1).alias("lo"), word(9).alias("hi")
    )


def simhash_hamming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document near-dup pairs by SimHash Hamming distance — the
    signature-level TEXT sibling of ``media_ahash_neardup`` (same
    pigeonhole machinery, different modality): a 64-bit majority-vote
    signature per document (the `simhash_docs` vote at doubled
    width — md5 hex chars 1-8 and 9-16 give two independent 32-bit
    token hash streams, carried as two BIGINT words to stay clear of
    sign-bit trouble), banded 4×16 bits for candidates, exact
    Hamming ≤ SIMHAM_T verify on the candidate set.  With 4 bands
    and radius 3, at least one band is untouched by any ≤3-bit
    difference, so the banding is LOSSLESS — exact Hamming near-dup,
    not approximate (Manku et al., WWW 2007 run the same multi-index
    trick at web scale).

    Complements the shingle-based detectors: MinHash/prefix-filter
    measure SET overlap, SimHash Hamming measures WEIGHTED-profile
    drift — production dedup stacks run both.

    Scale shape: signatures are one row-local fold per doc (no
    shuffle), candidates come from the band-bucket equi-join (never
    all-pairs), verification is two bit_counts per candidate."""
    from ..io import swap_cache

    sh = swap_cache("dedup.simham_sigs", _simhash64_sigs(spark, sf_dir))
    bands = sh.select(
        "doc_id",
        "lo",
        "hi",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.expr(
                            f"({'lo' if i < 2 else 'hi'}"
                            f" DIV {65536 ** (i % 2)}) % 65536"
                        ).alias("band_val"),
                    )
                    for i in range(SIMHAM_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "lo", "hi", "b.band_idx", "b.band_val")
    left = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lo").alias("la"),
        F.col("hi").alias("qa"),
        "band_idx",
        "band_val",
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lo").alias("lb"),
        F.col("hi").alias("qb"),
        "band_idx",
        "band_val",
    )
    cand = (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "la", "qa", "lb", "qb")
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.expr(
            "CAST(bit_count(la ^ lb) + bit_count(qa ^ qb) AS INT)"
        ).alias("hamming"),
    ).filter(F.col("hamming") <= SIMHAM_T)


def _simham_oracle() -> str:
    def votes_sql(offset: int) -> str:
        h = _hex8_sql("md5(tok)", offset)
        return (
            f"[list_reduce(list_transform(t, tok -> "
            f"CASE WHEN CAST(floor(({h}) / power(2, CAST(b AS INT)))"
            f" AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END), (a, x) -> a + x)"
            f" FOR b IN range(0, 32)]"
        )

    return rf"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(list_filter(regexp_split_to_array(
             trim(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), '\s+'),
             t -> t != '')) AS t
  FROM documents),
-- empty-token docs are excluded on BOTH sides (Spark filters
-- size(toks) > 0): list_reduce with no initial value errors on an
-- empty list, and an all-zero signature would pair every empty doc
netoks AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
votes AS (
  SELECT doc_id, {votes_sql(1)} AS v1, {votes_sql(9)} AS v9
  FROM netoks),
sig AS MATERIALIZED (
  SELECT doc_id,
         CAST(list_reduce(list_transform(range(0, 32), b ->
              CASE WHEN v1[CAST(b AS INT) + 1] > 0
                   THEN CAST(power(2, CAST(b AS INT)) AS BIGINT)
                   ELSE 0 END), (a, x) -> a + x) AS BIGINT) AS lo,
         CAST(list_reduce(list_transform(range(0, 32), b ->
              CASE WHEN v9[CAST(b AS INT) + 1] > 0
                   THEN CAST(power(2, CAST(b AS INT)) AS BIGINT)
                   ELSE 0 END), (a, x) -> a + x) AS BIGINT) AS hi
  FROM votes),
bands AS (
  SELECT doc_id, lo, hi, CAST(b AS INT) AS band_idx,
         (CASE WHEN b < 2 THEN lo ELSE hi END
          // CAST(power(65536, CAST(b % 2 AS INT)) AS BIGINT)) % 65536
           AS band_val
  FROM sig, range(0, {SIMHAM_BANDS}) t(b)),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         any_value(a.lo) AS la, any_value(a.hi) AS qa,
         any_value(b.lo) AS lb, any_value(b.hi) AS qb
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(la, lb)) + bit_count(xor(qa, qb)) AS INT)
         AS hamming
FROM cand
WHERE bit_count(xor(la, lb)) + bit_count(xor(qa, qb)) <= {SIMHAM_T}
"""


#: prefix-filter Jaccard threshold as an exact rational (1/2): the
#: lossless-blocking guarantee below is an integer-arithmetic theorem
PF_T_NUM, PF_T_DEN = 1, 2


def prefix_filter_jaccard_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact similarity join by PREFIX FILTERING (PPJoin family,
    Xiao et al., WWW 2008) — the third blocking strategy next to the
    banded-LSH equi-join (`minhash_lsh_pairs`, probabilistic) and the
    sorted neighborhood (`snm_sorted_neighborhood_pairs`, heuristic):
    unlike both, the prefix filter is LOSSLESS at its threshold — a
    pair with Jaccard ≥ t MUST share at least one token in either
    side's (|S| − ⌈t·|S|⌉ + 1)-token prefix when every doc's token
    set is ordered by one global rank (document frequency ascending,
    ties by token) — so the ORACLE computes the ALL-PAIRS truth with
    no blocking at all, and a hash match certifies the filter lost
    nothing.

    All arithmetic integer-exact: the threshold is the rational
    PF_T_NUM/PF_T_DEN (J ≥ 1/2 ⟺ 2·|A∩B| ≥ |A∪B|), jaccard_ppm is a
    floor quotient of two int64 counts, the prefix length uses
    ceiling division, and the length pre-filter (2·min ≥ max, the
    PPJoin size bound at t = 1/2) is a pure integer compare.

    Scale shape: the candidate join is an equi-join on PREFIX tokens
    only — each doc exposes its ~|S|/2 RAREST tokens (global-df
    rank), so hot tokens never fan out and the join key distribution
    is anti-skewed by construction; the per-doc rank window
    partitions by doc_id (bounded by doc length); verification joins
    the bounded candidate set back to the two gram arrays.

    Measured tuning at sf0.1 (5k docs, heavy shared vocabulary —
    adversarial for prefix filtering): word BIGRAMS with the basic
    prefix+length filters yielded 5.5M distinct candidates (44% of
    all pairs) and 84s; adding the POSITIONAL filter cut it to 46s;
    moving to 3-word shingles (rarer tokens → selective prefixes,
    the standard dedup unit) landed at 18s.  The A/B history lives
    in COVERAGE.md round 12."""
    from pyspark.sql.window import Window

    from ..io import swap_cache

    d = fan_out(table(tune(spark), sf_dir, "documents"))
    # Persist the shingled frame: four consumers (df build, prefix
    # postings, and the two verification sides) otherwise re-execute
    # the normalize→tokenize→shingle tree per consumer — the scan
    # sweep's classic shape, and the dominant cost of the 21.6s r13
    # canonical draw (r14 optimization round, guide §2.4/§5).  The
    # shingle tree itself is the next cost (6.8s of the remaining
    # 7s): default lineage is the Arrow kernel (guide §4.2),
    # bit-identical to the expression path (parity pinned in
    # tests/test_arrow_signatures.py); USE_ARROW_SIGNATURES = False
    # restores the pure-JVM tree.
    if USE_ARROW_SIGNATURES:
        shingled = d.select("doc_id", "text").mapInPandas(
            _grams3_arrow_fn, _GRAMS3_SCHEMA
        )
    else:
        shingled = (
            d.filter(F.size(ws_tokens(_norm_text("text"))) >= 3)
            .select("doc_id", word_shingles("text", k=3).alias("grams"))
            .withColumn("sz", F.size("grams").cast("long"))
        )
    docs = swap_cache("dedup.pf_docs", shingled)
    posts = docs.select(
        "doc_id", "sz", F.explode("grams").alias("gram")
    )
    dfreq = posts.groupBy("gram").agg(
        F.count("*").cast("long").alias("df")
    )
    wdoc = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("gram"))
    # prefix_len = sz − ⌈t·sz⌉ + 1, with ⌈(n·sz)/d⌉ as (n·sz+d−1) DIV d
    plen = (
        F.col("sz")
        - F.expr(
            f"(sz * {PF_T_NUM} + {PF_T_DEN - 1}) DIV {PF_T_DEN}"
        )
        + 1
    )
    prefix = (
        posts.join(F.broadcast(dfreq), "gram")
        .withColumn("rn", F.row_number().over(wdoc).cast("long"))
        .filter(F.col("rn") <= plen)
        .select("doc_id", "sz", "gram", "rn")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    # PPJoin positional filter (lossless): for a true pair, its FIRST
    # shared token in the global rank order sits at positions (pa,
    # pb) with every other shared token strictly after both, so
    # overlap ≤ 1 + min(sz_a − pa, sz_b − pb); requiring that bound
    # to clear minoverlap = ⌈t/(1+t)·(sz_a+sz_b)⌉ (= ⌈(sa+sb)/3⌉ at
    # t = 1/2) prunes late-prefix-only matches without ever dropping
    # a qualifying pair — the EXISTS-over-matches form keeps any pair
    # whose earliest shared token passes.  On corpora with heavy
    # vocabulary overlap (this fixture) the basic prefix filter
    # degenerates (~44% of all pairs as candidates at sf0.1); the
    # positional bound is what keeps the candidate set tied to the
    # threshold rather than the vocabulary shape.
    minov = F.expr(
        f"((a.sz + b.sz) * {PF_T_NUM} + {PF_T_DEN + PF_T_NUM - 1})"
        f" DIV {PF_T_DEN + PF_T_NUM}"
    )
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter at t = 1/2: J ≥ 1/2 ⟹ sizes within 2×
            & (
                2 * F.least(F.col("a.sz"), F.col("b.sz"))
                >= F.greatest(F.col("a.sz"), F.col("b.sz"))
            )
            & (
                1
                + F.least(
                    F.col("a.sz") - F.col("a.rn"),
                    F.col("b.sz") - F.col("b.rn"),
                )
                >= minov
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    ga = docs.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("grams_a"))
    gb = docs.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("grams_b"))
    inter = F.size(F.array_intersect("grams_a", "grams_b")).cast("long")
    union = (
        F.size("grams_a").cast("long")
        + F.size("grams_b").cast("long")
        - inter
    )
    return (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .withColumn("i", inter)
        .withColumn("u", union)
        .filter(F.col("i") * PF_T_DEN >= F.col("u") * PF_T_NUM)
        .select(
            "doc_a",
            "doc_b",
            F.expr("1000000 * i DIV u").cast("long").alias("jaccard_ppm"),
        )
    )


#: the oracle is the UNBLOCKED all-pairs truth — losslessness of the
#: prefix filter is exactly what a hash match certifies
PREFIX_FILTER_ORACLE = rf"""
WITH prep AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(
             trim(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), '\s+'),
             t -> t != '') AS toks
  FROM documents),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
             i -> toks[CAST(i AS INT) + 1] || ' ' || toks[CAST(i AS INT) + 2]
                  || ' ' || toks[CAST(i AS INT) + 3]))
           AS grams
  FROM prep
  WHERE len(toks) >= 3)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(CAST(1000000 AS BIGINT) * len(list_intersect(a.grams, b.grams))
            // (len(a.grams) + len(b.grams)
                - len(list_intersect(a.grams, b.grams))) AS BIGINT)
         AS jaccard_ppm
FROM g a JOIN g b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.grams, b.grams)) * {PF_T_DEN}
      >= (len(a.grams) + len(b.grams)
          - len(list_intersect(a.grams, b.grams))) * {PF_T_NUM}
"""


#: duplicated-span window width in TOKENS (the Lee et al. 2022
#: "Deduplicating Training Data Makes Language Models Better"
#: substring-dedup tier scaled to the fixture's 10-99-token docs;
#: production corpora use ~50).  Any k-token window whose token
#: sequence appears more than once in the corpus is a duplicated
#: span; every occurrence except the canonical first one is removed.
SPAN_K = 8

#: position-encoding multiplier for the canonical-occurrence key:
#: key = doc_id * SPAN_POS_ENC + pos is a single BIGINT that orders
#: (doc_id, pos) lexicographically in both engines — no struct-min
#: portability hazard.  1e9 supports billion-token documents and
#: billion-document corpora inside int64.
SPAN_POS_ENC = 1_000_000_000


def duplicated_span_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSTRING-granular dedup — the k-token duplicated-SPAN rewrite
    (round-13 verdict "What's missing #3"): the standard web-scale
    corpus pass that document-exact, chunk/CDC, and fingerprint-
    overlap dedup all miss, because a 50-token boilerplate run
    repeated across thousands of otherwise-distinct documents
    survives every document-level tier.  Every SPAN_K-token window
    is rolling-hashed; windows whose token sequence occurs more than
    once in the CORPUS keep only their canonical first occurrence
    (global min (doc_id, pos), encoded as one BIGINT key), and every
    token covered by a non-canonical occurrence is removed.  Per doc:
    token count before, tokens removed, and the md5 of the surviving
    space-joined text — the rewrite is certified byte-exactly, like
    ``chunk_dedup_rewrite`` one tier up.

    Unlike the pair-shaped detectors this tier NEVER forms document
    pairs: duplicate detection is one groupBy on the gram hash
    (map-side combinable count + min-key), occurrence classification
    is a posting-shaped equi-join back on the hash, and coverage is
    a bounded ×K position explode of the duplicated occurrences —
    every stage linear in corpus tokens, which is exactly why the
    suffix-array substring pass is the one dedup tier that runs at
    100 TB without an LSH approximation.

    Reference basis: rolling k-gram postings reuse the winnowing
    (``textops.winnowing_fingerprint_pairs``) and CDC
    (``cdc_chunk_dedup``) lineages' machinery."""
    d = fan_out(table(tune(spark), sf_dir, "documents"))
    from ..io import swap_cache

    # persist the tokenized stream (three consumers: gram explode,
    # token rows, per-doc totals) and the gram postings (two: the
    # duplicate stats and the occurrence classification) — the r14
    # scan sweep measured 4 documents scans in this plan (guide §2.4)
    base = swap_cache(
        "dedup.span_base",
        d.select("doc_id", ws_tokens(_norm_text("text")).alias("toks")),
    )
    grams = (
        base.filter(F.size("toks") >= SPAN_K)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.size("toks") - (SPAN_K - 1))
            ).alias("pos"),
            "toks",
        )
        .select(
            "doc_id",
            "pos",
            F.md5(
                F.concat_ws(" ", F.expr(f"slice(toks, pos, {SPAN_K})"))
            ).alias("g"),
        )
    )
    grams = swap_cache("dedup.span_grams", grams)
    gstats = grams.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.min(
            F.col("doc_id") * F.lit(SPAN_POS_ENC) + F.col("pos")
        ).alias("first_key"),
    )
    dup_occ = grams.join(gstats.filter(F.col("cnt") > 1), "g").filter(
        F.col("doc_id") * F.lit(SPAN_POS_ENC) + F.col("pos")
        != F.col("first_key")
    )
    covered = (
        dup_occ.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (SPAN_K - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    tok_rows = base.select(
        "doc_id", F.posexplode("toks").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "tok")
    kept = tok_rows.join(covered, ["doc_id", "pos"], "left_anti")
    kept_agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            )
        ).alias("kept_md5"),
    )
    return (
        base.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
        .join(kept_agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("kept_md5"), F.md5(F.lit(""))).alias(
                "kept_md5"
            ),
        )
    )


DUP_SPAN_ORACLE = rf"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(
             trim(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), '\s+'),
             t -> t != '') AS toks
  FROM documents),
grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(toks[CAST(i AS INT):CAST(i + {SPAN_K - 1} AS INT)], ' ')) AS g
  FROM d, unnest(range(1, len(toks) - {SPAN_K - 1} + 1)) AS u(i)
  WHERE len(toks) >= {SPAN_K}),
gstats AS (
  SELECT g, count(*) AS cnt,
         min(doc_id * {SPAN_POS_ENC} + pos) AS first_key
  FROM grams GROUP BY 1),
dup_occ AS (
  SELECT gr.doc_id, gr.pos
  FROM grams gr JOIN gstats gs ON gr.g = gs.g
  WHERE gs.cnt > 1
    AND gr.doc_id * {SPAN_POS_ENC} + gr.pos != gs.first_key),
covered AS (
  SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS pos
  FROM dup_occ, unnest(range(pos, pos + {SPAN_K})) AS u(p)),
tok_rows AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[CAST(i AS INT)] AS tok
  FROM d, unnest(range(1, len(toks) + 1)) AS u(i)),
kept AS (
  SELECT t.doc_id, t.pos, t.tok
  FROM tok_rows t ANTI JOIN covered c
    ON t.doc_id = c.doc_id AND t.pos = c.pos),
kept_agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS kept_md5
  FROM kept GROUP BY 1)
SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens,
       CAST(len(d.toks) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(k.kept_md5, md5('')) AS kept_md5
FROM d LEFT JOIN kept_agg k ON d.doc_id = k.doc_id
"""


QUERIES = {
    "cdc_chunk_dedup": cdc_chunk_dedup,
    "prefix_filter_jaccard_pairs": prefix_filter_jaccard_pairs,
    "dedup_exact": dedup_exact,
    "snm_sorted_neighborhood_pairs": snm_sorted_neighborhood_pairs,
    "edit_distance_pairs": edit_distance_pairs,
    "fastss_editdist1_pairs": fastss_editdist1_pairs,
    "lsh_s_curve_planner": lsh_s_curve_planner,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "chunk_lsh_neardup": chunk_lsh_neardup,
    "chunk_dedup_rewrite": chunk_dedup_rewrite,
    "simhash_docs": simhash_docs,
    "simhash_hamming_neardup": simhash_hamming_neardup,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "duplicated_span_rewrite": duplicated_span_rewrite,
    # minhash_lsh_ml: REMOVED from the driver surface (round-11,
    # verdict item 5) — Spark ML's seeded JVM hash families are not
    # oracle-reproducible; its recall is driver-checked through the
    # hash-certified minhash_lsh_containment contract (function kept).
    "minhash_lsh_containment": minhash_lsh_containment,
    "containment_pairs": containment_pairs,
    "source_overlap_matrix": source_overlap_matrix,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_ORACLE,
    "prefix_filter_jaccard_pairs": PREFIX_FILTER_ORACLE,
    "snm_sorted_neighborhood_pairs": SNM_ORACLE,
    "cdc_chunk_dedup": _cdc_oracle(),
    "edit_distance_pairs": EDIT_DISTANCE_ORACLE,
    "fastss_editdist1_pairs": FASTSS_ED1_ORACLE,
    "lsh_s_curve_planner": _scurve_oracle(),
    "minhash_lsh_pairs": MINHASH_ORACLE,
    "chunk_lsh_neardup": CHUNK_LSH_ORACLE,
    "chunk_dedup_rewrite": _chunk_rewrite_oracle(),
    "simhash_docs": SIMHASH_ORACLE,
    "simhash_hamming_neardup": _simham_oracle(),
    "ngram_jaccard_pairs": NGRAM_ORACLE,
    "duplicated_span_rewrite": DUP_SPAN_ORACLE,
    # minhash_lsh_ml: rows-only (seeded JVM hash family); its
    # hash-certified sibling is minhash_lsh_containment
    "minhash_lsh_containment": MINHASH_CONTAINMENT_ORACLE,
    "containment_pairs": CONTAINMENT_ORACLE,
    "source_overlap_matrix": SOURCE_OVERLAP_ORACLE,
}
