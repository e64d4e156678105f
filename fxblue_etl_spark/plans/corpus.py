"""End-to-end LLM corpus preparation pipeline (the §2.13 composite).

The individual operators — quality scoring, language-ID, content-hash
dedup, fingerprint near-dup — are each oracle-checked in isolation
(`operators/textops.py`, `operators/dedup.py`); a real training-data
pipeline runs them as one chained plan:

    documents → quality gate (Gopher-ish score ≥ 0.7)
              → language gate (marker-ID ≠ unk)
              → exact dedup   (keep min doc_id per content md5)
              → near-dup trim (keep min doc_id per winnowing min-hash)
              → per-language corpus stats

Chaining matters at 100 TB: every stage here is a narrow projection
or a window over a hash-partitioned key, so Catalyst fuses the three
filters into the scan (one pass over the text) and the two dedup
windows share a shuffle only when their keys collide — the whole prep
is two shuffles + the final aggregate, regardless of input size. The
composite is oracle-checked end-to-end, which also pins the *order*
of stages (dedup keepers are chosen among quality+lang survivors, not
the raw corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import tune


def llm_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textops import doc_fingerprint, lang_id, quality_score

    tune(spark)
    q = quality_score(spark, sf_dir).select("doc_id", "n_tokens", "quality_score", "keep")
    lang = lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    fp = doc_fingerprint(spark, sf_dir)

    survivors = (
        q.filter(F.col("keep") == 1)
        .join(lang, "doc_id")
        .filter(F.col("pred_lang") != "unk")
        .join(fp, "doc_id")
    )
    exact_kept = (
        survivors.withColumn(
            "__m", F.min("doc_id").over(Window.partitionBy("content_md5"))
        )
        .filter(F.col("doc_id") == F.col("__m"))
        .drop("__m")
    )
    near_kept = (
        exact_kept.withColumn(
            "__m", F.min("doc_id").over(Window.partitionBy("winnow_min_hash"))
        )
        .filter(F.col("doc_id") == F.col("__m"))
        .drop("__m")
    )
    return near_kept.groupBy("pred_lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens_total"),
        F.round(F.sum("quality_score"), 2).alias("quality_sum"),
    )


LLM_CORPUS_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t != '') AS ws,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t != '') AS lt,
         CAST(length(regexp_replace(text, '[\w\s]', '', 'g')) AS DOUBLE)
           / length(text) AS punct_ratio,
         lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm
  FROM documents),
scored AS (
  SELECT doc_id,
         CAST(len(ws) AS INT) AS n_tokens,
         CAST(CASE WHEN len(ws) BETWEEN 20 AND 1000 THEN 0.5 ELSE 0.0 END
          + CASE WHEN len(list_intersect(ws, ['the','and','of','to','a'])) > 0 THEN 0.3 ELSE 0.0 END
          + CASE WHEN punct_ratio < 0.1 THEN 0.2 ELSE 0.0 END AS DOUBLE) AS score,
         CAST(len(list_intersect(lt, ['the','and','of','to','a'])) AS INT) AS hits_en,
         CAST(len(list_intersect(lt, ['der','die','und','das','ist'])) AS INT) AS hits_de,
         CAST(len(list_intersect(lt, ['le','la','et','les','des'])) AS INT) AS hits_fr,
         CAST(len(list_intersect(lt, ['el','la','que','de','los'])) AS INT) AS hits_es,
         md5(norm) AS content_md5,
         list_min(list_transform(range(1, greatest(length(norm) - 7, 1) + 1),
                                 i -> md5(substr(norm, CAST(i AS INT), 8)))) AS winnow_min_hash
  FROM toks),
survivors AS (
  SELECT *,
         CASE WHEN greatest(hits_en, hits_de, hits_fr, hits_es) = 0 THEN 'unk'
              WHEN hits_en = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'en'
              WHEN hits_de = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'de'
              WHEN hits_fr = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'fr'
              ELSE 'es' END AS pred_lang
  FROM scored
  WHERE score >= 0.7),
lang_ok AS (
  SELECT * FROM survivors WHERE pred_lang != 'unk'),
exact_kept AS (
  SELECT * FROM (SELECT *, min(doc_id) OVER (PARTITION BY content_md5) AS m
                 FROM lang_ok)
  WHERE doc_id = m),
near_kept AS (
  SELECT * FROM (SELECT *, min(doc_id) OVER (PARTITION BY winnow_min_hash) AS m2
                 FROM exact_kept)
  WHERE doc_id = m2)
SELECT pred_lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total,
       round(sum(round(score, 2)), 2) AS quality_sum
FROM near_kept
GROUP BY pred_lang
"""


QUERIES = {
    "llm_corpus_prep": llm_corpus_prep,
}

ORACLES = {
    "llm_corpus_prep": LLM_CORPUS_ORACLE,
}
