"""Corpus indexing & ordering: inverted-index construction, nucleus
vocabulary coverage, and deterministic training-order shuffling.

Beyond the reference's scope (its text columns are passthrough,
`CSV PARSER/gcp_csv.py:43-45`); these are the passes a retrieval /
training-data stack runs after cleaning:

- ``inverted_index_postings``: token → (document frequency, total
  term frequency, head of the sorted posting list) — the build step
  of a distributed search index.
- ``vocab_coverage``: per language, how many distinct token types
  cover 50/90/99% of the token mass (the "nucleus" curve that sizes
  tokenizer vocabularies); all comparisons are integer
  cross-multiplications, no float division anywhere.
- ``training_order_shuffle``: the deterministic md5-keyed shard+
  position assignment used to globally shuffle a corpus for training
  without a global sort — shard by hash bucket, order within shard
  by the full hash string.

Scale shape (100 TB):

- postings: explode → (tok, doc) partial-agg'd counts. The head-of-
  posting-list step is a two-level tournament top-K: level 1 keeps
  the K smallest doc_ids per (tok, doc-hash-bucket) — N_TOURNAMENT
  ways parallel even for stop-word tokens — and level 2 merges the
  ≤ N_TOURNAMENT·K survivors per token. No window ever sees a
  stop-word's full posting list, so the skewed-token partition that
  a single per-token window would serialize on never exists.
  ``MIN_DF`` prunes the hapax tail before any join.
- vocab_coverage: the cumulative-mass window is one task per
  language (vocabularies are Heaps-law-bounded, millions of rows at
  most — nothing like corpus scale); the corpus-sized explode ahead
  of it is map-side combined.
- training_order_shuffle: row_number runs per shard — parallelism =
  shard count (thousands at real scale), state per task = shard
  size, never a global sort. Shard count is the knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import fan_out, table
from ..session import tune
from .corpusops import _hash_bucket, _hash_bucket_sql
from .textops import ws_tokens

#: head of each posting list kept (smallest doc_ids)
POSTINGS_K = 5
#: tokens rarer than this document frequency are pruned
MIN_DF = 5
#: level-1 tournament ways for the posting-list head (bounds the
#: widest per-token window partition to ~df/N_TOURNAMENT)
N_TOURNAMENT = 8
#: nucleus thresholds, percent of per-language token mass
COVERAGE_PCTS = (50, 90, 99)
#: training shards for the deterministic shuffle
N_SHARDS = 16

_TOKS_SQL = r"""
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t != '') AS toks
  FROM documents
"""


def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the documents fixture: per token (df ≥
    MIN_DF), document frequency, total term frequency, and the first
    POSTINGS_K doc_ids of the sorted posting list (comma-joined)."""
    d = fan_out(table(tune(spark), sf_dir, "documents")).select(
        "doc_id", ws_tokens("text").alias("toks")
    )
    td = (
        d.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("tok", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    stats = td.groupBy("tok").agg(
        F.count("*").alias("df"),
        F.sum("tf").cast("long").alias("tf_total"),
    )
    # tournament level 1: K smallest doc_ids within each of
    # N_TOURNAMENT hash sub-streams of the token
    w1 = Window.partitionBy("tok", "tb").orderBy("doc_id")
    level1 = (
        td.withColumn(
            "tb", _hash_bucket(F.col("doc_id"), "postings|", N_TOURNAMENT)
        )
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= POSTINGS_K)
    )
    # level 2: merge the <= N_TOURNAMENT*K survivors per token
    w2 = Window.partitionBy("tok").orderBy("doc_id")
    head = (
        level1.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= POSTINGS_K)
        .groupBy("tok")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings_head")
        )
    )
    return (
        stats.filter(F.col("df") >= MIN_DF)
        .join(head, "tok")
        .select("tok", "df", "tf_total", "postings_head")
    )


POSTINGS_ORACLE = f"""
WITH tk AS ({_TOKS_SQL}),
td AS (
  SELECT t.tok, doc_id, count(*) AS tf
  FROM tk, unnest(toks) t(tok)
  GROUP BY 1, 2),
stats AS (
  SELECT tok, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total
  FROM td GROUP BY 1),
head AS (
  SELECT tok,
         array_to_string((list(doc_id ORDER BY doc_id))[1:{POSTINGS_K}], ',')
           AS postings_head
  FROM td GROUP BY 1)
SELECT s.tok, s.df, s.tf_total, h.postings_head
FROM stats s JOIN head h USING (tok)
WHERE s.df >= {MIN_DF}
"""


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus coverage per language: the smallest number of token
    types (ranked by frequency, token tiebreak) whose cumulative
    count reaches each of COVERAGE_PCTS percent of the language's
    token mass. ``100 * cum >= pct * total`` keeps the threshold
    integer-exact in both engines."""
    d = fan_out(table(tune(spark), sf_dir, "documents")).select(
        "lang", ws_tokens("text").alias("toks")
    )
    cnt = (
        d.select("lang", F.explode("toks").alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    # ranks, cumulative mass, AND language totals all come off the
    # same vocab-bounded count table as windows — a totals aggregate
    # joined back (twice) re-ran the corpus explode per reference
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("tok"))
    w_lang = Window.partitionBy("lang")
    ranked = cnt.select(
        "lang",
        "cnt",
        F.row_number().over(w).alias("rank"),
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.sum("cnt").over(w_lang).cast("long").alias("total_toks"),
        F.count("*").over(w_lang).cast("long").alias("total_types"),
    )
    pcts = F.array(*[F.lit(p) for p in COVERAGE_PCTS])
    return (
        ranked.select("*", F.explode(pcts).alias("pct"))
        .filter(F.lit(100) * F.col("cum") >= F.col("pct") * F.col("total_toks"))
        .groupBy("lang", "pct")
        .agg(
            F.min("rank").alias("n_types"),
            F.min_by("cum", "rank").cast("long").alias("covered_toks"),
            F.first("total_types").alias("total_types"),
            F.first("total_toks").alias("total_toks"),
        )
        .select("lang", "pct", "n_types", "covered_toks", "total_types", "total_toks")
    )


VOCAB_COVERAGE_ORACLE = f"""
WITH tk AS ({_TOKS_SQL}),
cnt AS (
  SELECT lang, t.tok, count(*) AS cnt
  FROM tk, unnest(toks) t(tok)
  GROUP BY 1, 2),
ranked AS (
  SELECT lang, cnt,
         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok ASC) AS rank,
         sum(cnt) OVER (PARTITION BY lang ORDER BY cnt DESC, tok ASC
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM cnt),
totals AS (
  SELECT lang, CAST(sum(cnt) AS BIGINT) AS total_toks,
         CAST(count(*) AS BIGINT) AS total_types
  FROM cnt GROUP BY 1)
SELECT r.lang, p.pct,
       CAST(min(r.rank) AS INT) AS n_types,
       CAST(arg_min(r.cum, r.rank) AS BIGINT) AS covered_toks,
       t.total_types, t.total_toks
FROM ranked r
JOIN totals t USING (lang)
CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in COVERAGE_PCTS)}]) AS pct) p
WHERE 100 * r.cum >= p.pct * t.total_toks
GROUP BY r.lang, p.pct, t.total_types, t.total_toks
"""


def training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training order: shard by hash
    bucket of doc_id, position within shard by the full md5 string
    (doc_id tiebreak — md5 collisions are astronomically unlikely but
    determinism must not rest on that)."""
    d = table(tune(spark), sf_dir, "documents").select("doc_id")
    key = F.md5(F.concat(F.lit("order|"), F.col("doc_id").cast("string")))
    sharded = d.select(
        "doc_id",
        _hash_bucket(F.col("doc_id"), "shuffle|", N_SHARDS).alias("shard"),
        key.alias("okey"),
    )
    w = Window.partitionBy("shard").orderBy("okey", "doc_id")
    return sharded.select(
        "doc_id", "shard", F.row_number().over(w).alias("pos")
    )


TRAINING_ORDER_ORACLE = f"""
SELECT doc_id,
       CAST({_hash_bucket_sql("CAST(doc_id AS VARCHAR)", "shuffle|", N_SHARDS)} AS BIGINT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY {_hash_bucket_sql("CAST(doc_id AS VARCHAR)", "shuffle|", N_SHARDS)}
         ORDER BY md5('order|' || CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS pos
FROM documents
"""


QUERIES = {
    "inverted_index_postings": inverted_index_postings,
    "vocab_coverage": vocab_coverage,
    "training_order_shuffle": training_order_shuffle,
}

ORACLES = {
    "inverted_index_postings": POSTINGS_ORACLE,
    "vocab_coverage": VOCAB_COVERAGE_ORACLE,
    "training_order_shuffle": TRAINING_ORDER_ORACLE,
}
