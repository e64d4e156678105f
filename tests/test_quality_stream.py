"""The shared token-pair stream (tfidf.token_pair_stream) must feed
each quality signal bit-identically to its standalone lineage — the
round-8 composite fusion (quality_feature_matrix pays one corpus
explode instead of one per signal per consumer) must be a pure plan
change, never a result change."""

from __future__ import annotations

from pyspark.sql import functions as F

from fxblue_etl_spark.io import fan_out, table
from fxblue_etl_spark.operators.textops import ws_tokens
from fxblue_etl_spark.operators.tfidf import (
    lm_doc_perplexity,
    rare_token_quality,
    token_pair_stream,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


#: whitespace/empty/single-token/duplicate edges where the stream
#: and array lineages could plausibly diverge
_ADVERSARIAL = [
    (1, "en", "the quick brown fox jumps over the lazy dog"),
    (2, "en", "dup dup dup dup dup"),  # one distinct token
    (3, "en", "solo"),  # single token: no bigrams
    (4, "en", ""),  # empty: drops from exploded stats
    (5, "en", None),  # null text
    (6, "en", "  padded   with \t mixed\nwhitespace  "),
    (7, "de", "a b a b a b a b"),  # 2 distinct tokens, 2 distinct bigrams
    (8, "fr", "x y"),  # exactly one bigram
]


def _docs(spark):
    return spark.createDataFrame(
        _ADVERSARIAL, "doc_id bigint, lang string, text string"
    )


def _stream(docs):
    return token_pair_stream(
        docs.select("doc_id", ws_tokens("text").alias("toks"))
    )


def test_stream_matches_standalone_on_fixture(spark, sf_dir):
    docs = fan_out(table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "text"
    )
    stream = _stream(docs)
    pairs = stream.filter(F.col("nxt").isNotNull()).select(
        "doc_id", F.col("tok").alias("head"), "nxt"
    )
    assert _rows(rare_token_quality(spark, sf_dir, px=stream)) == _rows(
        rare_token_quality(spark, sf_dir, docs=docs)
    )
    assert _rows(lm_doc_perplexity(spark, sf_dir, pairs=pairs)) == _rows(
        lm_doc_perplexity(spark, sf_dir, docs=docs)
    )


def test_stream_matches_standalone_adversarial(spark):
    docs = _docs(spark)
    stream = _stream(docs)
    pairs = stream.filter(F.col("nxt").isNotNull()).select(
        "doc_id", F.col("tok").alias("head"), "nxt"
    )
    got_rare = _rows(rare_token_quality(spark, "", px=stream))
    assert got_rare == _rows(rare_token_quality(spark, "", docs=docs))
    got_lm = _rows(lm_doc_perplexity(spark, "", pairs=pairs))
    assert got_lm == _rows(lm_doc_perplexity(spark, "", docs=docs))
    # structural spot-checks, not just self-consistency
    rare_ids = {r[0] for r in got_rare}
    assert 3 in rare_ids and 8 in rare_ids
    assert 4 not in rare_ids and 5 not in rare_ids  # empty/null drop
    lm_ids = {r[0] for r in got_lm}
    assert 3 not in lm_ids  # single-token doc has no pairs
    assert 8 in lm_ids


def test_stream_shape(spark):
    """One row per token position; nxt NULL exactly at doc ends."""
    docs = _docs(spark)
    stream = _stream(docs).collect()
    per_doc = {}
    for r in stream:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert len(per_doc[1]) == 9 and len(per_doc[3]) == 1
    assert 4 not in per_doc and 5 not in per_doc
    for doc_id, rows in per_doc.items():
        assert sum(1 for r in rows if r["nxt"] is None) == 1, doc_id
