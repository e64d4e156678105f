"""Round-12 additions: the composed corpus-release pipeline and its
hand-off certificates."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_DIR  # noqa: E402


@pytest.fixture(scope="module")
def release(spark):
    from fxblue_etl_spark.plans.corpus import corpus_release_end_to_end

    return corpus_release_end_to_end(spark, SF_DIR).collect()


def test_release_end_to_end_handoff_certificate(release):
    """Every surviving document received a split: the hand-off
    certificate is zero on every row."""
    assert release, "composed pipeline returned no rows"
    assert all(r["n_missing_split"] == 0 for r in release)


def test_release_end_to_end_conserves_survivors(spark, release):
    """The per-(split, lang) rollup must conserve the survivor set:
    summed across splits it equals llm_corpus_prep exactly — the
    composition reorganizes, never drops or invents."""
    from fxblue_etl_spark.plans.corpus import llm_corpus_prep

    prep = {
        r["pred_lang"]: (r["n_docs"], r["n_tokens_total"])
        for r in llm_corpus_prep(spark, SF_DIR).collect()
    }
    by_lang: dict[str, list[int]] = {}
    for r in release:
        acc = by_lang.setdefault(r["pred_lang"], [0, 0])
        acc[0] += r["n_docs"]
        acc[1] += r["n_tokens_total"]
    assert {k: tuple(v) for k, v in by_lang.items()} == prep


def test_release_end_to_end_chunk_economics_consistent(spark, release):
    """The rewrite column flows through the join intact: total
    chunk_toks_dropped over release rows equals the rewrite stage's
    total over SURVIVING docs (the rewrite stage also prices docs the
    cleaning stage dropped — those must NOT leak into the release)."""
    from fxblue_etl_spark.operators.dedup import chunk_dedup_rewrite
    from fxblue_etl_spark.plans.corpus import llm_survivor_docs

    surv = {r["doc_id"] for r in llm_survivor_docs(spark, SF_DIR).collect()}
    rw = chunk_dedup_rewrite(spark, SF_DIR).collect()
    expected = sum(r["chunk_toks_dropped"] for r in rw if r["doc_id"] in surv)
    assert sum(r["chunk_toks_dropped"] for r in release) == expected
    # fixture property (both sf0.001 and sf0.01): chunk near-dups
    # occur only inside doc-level dup clusters, and the rewrite
    # output rows (docs that LOST chunks) are exactly the docs the
    # doc-level dedup drops — so the release must carry ZERO chunk
    # discount.  A nonzero row here would mean drop economics leaked
    # through the left join (double discount).
    assert rw, "rewrite stage produced no rows — blocker drifted"
    assert all(r["doc_id"] not in surv for r in rw)
    assert all(r["n_docs_rewritten"] == 0 for r in release)


def test_survivor_extraction_preserves_prep_plan(spark):
    """llm_corpus_prep ≡ groupBy(llm_survivor_docs): the refactor is
    a pure extraction (round-12 _R12_CODE_CHANGED entry)."""
    from pyspark.sql import functions as F

    from fxblue_etl_spark.plans.corpus import (
        llm_corpus_prep,
        llm_survivor_docs,
    )

    a = sorted(
        map(tuple, llm_corpus_prep(spark, SF_DIR).collect())
    )
    b = sorted(
        map(
            tuple,
            llm_survivor_docs(spark, SF_DIR)
            .groupBy("pred_lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_tokens").cast("long").alias("n_tokens_total"),
                F.sum(F.floor(F.col("quality_score") * 10))
                .cast("long")
                .alias("quality_sum_e1"),
            )
            .collect(),
        )
    )
    assert a == b
