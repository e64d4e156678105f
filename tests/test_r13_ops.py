"""Round-13 additions: the streaming HLL maintenance sibling and the
round-12 advice-item edge-case pins."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_DIR  # noqa: E402


def test_streaming_hll_matches_batch_and_multibatch(spark):
    """Incremental ≡ rebuild for the streaming HLL maintenance: the
    multi-split streamed register state equals the single-split
    (≡ batch) state register-for-register, and the run really
    processed multiple micro-batches."""
    from fxblue_etl_spark.streaming.pipelines import (
        streaming_hll_maintenance,
    )

    progress: list = []
    multi = sorted(
        map(
            tuple,
            streaming_hll_maintenance(
                spark, SF_DIR, progress, n_splits=4
            ).collect(),
        )
    )
    single = sorted(
        map(
            tuple,
            streaming_hll_maintenance(spark, SF_DIR, n_splits=1).collect(),
        )
    )
    assert multi == single
    data_batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(data_batches) >= 4


def test_streaming_hll_matches_batch_register_table(spark):
    """The streamed state equals plans.stats.hll_register_table over
    the whole events table — the exact claim the driver oracle
    certifies, pinned in-process too."""
    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.plans.stats import hll_register_table
    from fxblue_etl_spark.streaming.pipelines import (
        streaming_hll_maintenance,
    )

    streamed = sorted(
        map(tuple, streaming_hll_maintenance(spark, SF_DIR).collect())
    )
    batch = sorted(
        map(
            tuple,
            hll_register_table(
                table(spark, SF_DIR, "events"), "event_id"
            ).collect(),
        )
    )
    assert streamed == batch


def test_streaming_cms_matches_batch_and_multibatch(spark):
    """Incremental ≡ rebuild for the streaming CMS maintenance: the
    multi-split streamed counter state equals the single-split
    (≡ batch) state cell-for-cell — because SUM is not idempotent,
    this equality also certifies exactly-once batch delivery."""
    from fxblue_etl_spark.streaming.pipelines import (
        streaming_cms_maintenance,
    )

    progress: list = []
    multi = sorted(
        map(
            tuple,
            streaming_cms_maintenance(
                spark, SF_DIR, progress, n_splits=4
            ).collect(),
        )
    )
    single = sorted(
        map(
            tuple,
            streaming_cms_maintenance(spark, SF_DIR, n_splits=1).collect(),
        )
    )
    assert multi == single
    data_batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(data_batches) >= 4
    # total cell mass = depth × row count (every key lands in every row)
    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.operators.temporal import _CMS_DEPTH

    n = table(spark, SF_DIR, "lineitem").count()
    assert sum(r[2] for r in single) == _CMS_DEPTH * n


def test_simhash_sigs_exclude_empty_docs(spark):
    """Advice item 3 pin: a whitespace-only document gets NO SimHash
    signature (the all-zero signature would pair every empty doc at
    Hamming 0, and the DuckDB oracle's list_reduce errors on an
    empty token list)."""
    from fxblue_etl_spark.operators.dedup import _simhash64_sigs

    sigs = _simhash64_sigs(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    n_sigs = sigs.count()
    # fixture has no empty docs: every doc keeps its signature
    assert n_sigs == n_docs
    # degenerate frame: empty and whitespace-only docs drop out
    deg = spark.createDataFrame(
        [(1, "real text here"), (2, "   "), (3, "")],
        "doc_id long, text string",
    )
    # the same size(toks) > 0 predicate the signature builder applies
    import fxblue_etl_spark.operators.dedup as d
    from pyspark.sql import functions as F

    toks = F.array_distinct(d.ws_tokens(d._norm_text("text")))
    kept = deg.filter(F.size(toks) > 0).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [1]


def test_ivm_delete_drops_emptied_groups(spark):
    """Advice item 2 pin: if a delete cohort empties a whole group,
    the maintained view DROPS the group exactly like the recompute
    oracle (no n_orders=0 ghost rows)."""
    from fxblue_etl_spark.plans.dq import ivm_delete_maintenance

    rows = ivm_delete_maintenance(spark, SF_DIR).collect()
    assert rows, "maintained view is empty"
    assert all(r["n_orders"] > 0 for r in rows)


def test_threshold_sweep_ppm_cast_is_round_not_truncate(spark):
    """Advice item 1 pin: the Spark-side j_ppm uses round-to-nearest
    before the long cast, so a jaccard of 1/3 lands at 333333 ppm
    (truncation would give 333332 and silently diverge from DuckDB
    for thresholds just below the boundary)."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.round(F.round(F.lit(1.0 / 3.0), 6) * 1e6)
        .cast("long")
        .alias("j_ppm")
    )
    assert df.first()["j_ppm"] == 333333
