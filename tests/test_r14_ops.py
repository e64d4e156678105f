"""Round-14 additions: pair-mass guards on the two super-linear
detectors (round-13 verdict item 4) pinned with mass-duplication
corpora, plus the round-13 advice-item edge-case pins (TWAP
zero-span/negative-value floor, kappa degenerate guard, S-curve
signature token filter, ablation single-source guard)."""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_DIR  # noqa: E402


@pytest.fixture(scope="module")
def massdup_dir(tmp_path_factory):
    """sf0.001 documents with ONE document duplicated ×300 under
    fresh doc_ids — the adversarial corpus both pair-mass guards
    must survive: every copy lands in the same (lang, first-token)
    block and shares every fingerprint, so the UNGUARDED pair joins
    would emit ~C(300, 2) ≈ 45k pairs for that family alone."""
    src = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    base = src.iloc[0]
    n_extra = 300
    start = int(src["doc_id"].max()) + 1
    dups = pd.DataFrame(
        {
            "doc_id": range(start, start + n_extra),
            "text": [base["text"]] * n_extra,
            "lang": [base["lang"]] * n_extra,
            "source": [base["source"]] * n_extra,
            "n_chars": [base["n_chars"]] * n_extra,
        }
    )
    out = pd.concat([src, dups], ignore_index=True)
    d = tmp_path_factory.mktemp("massdup")
    pq.write_table(
        pa.Table.from_pandas(out, preserve_index=False),
        d / "documents.parquet",
    )
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


def test_winnowing_pair_mass_guard(spark, massdup_dir):
    """Duplicate one doc ×300: the absolute df cap must drop the
    duplicated family's fingerprints (df ≈ 301 > WINNOW_DF_ABS),
    keep the output bounded far below the ~45k-pair explosion, and
    say so via a positive n_capped_fps on every row."""
    from fxblue_etl_spark.operators.textops import (
        WINNOW_DF_ABS,
        winnowing_fingerprint_pairs,
    )

    rows = winnowing_fingerprint_pairs(spark, massdup_dir).collect()
    assert "n_capped_fps" in rows[0].asDict()
    assert all(r["n_capped_fps"] > 0 for r in rows)
    # the duplicated family alone would contribute C(301, 2) ≈ 45k
    # pairs unguarded; the guard keeps total output at corpus scale
    assert len(rows) < 5000
    dup_pairs = [r for r in rows if r["doc_a"] >= 500 and r["doc_b"] >= 500]
    assert dup_pairs == [], "capped fingerprints must not pair"
    assert WINNOW_DF_ABS == 64  # the documented constant the cap uses


def test_winnowing_guard_inactive_on_clean_corpus(spark):
    """On the fixture the absolute leg is a no-op (every df is under
    both caps): n_capped_fps must be exactly 0 so a green oracle row
    certifies the EXACT uncapped answer."""
    from fxblue_etl_spark.operators.textops import (
        winnowing_fingerprint_pairs,
    )

    rows = winnowing_fingerprint_pairs(spark, SF_DIR).collect()
    assert rows and all(r["n_capped_fps"] == 0 for r in rows)


def test_threshold_sweep_pair_mass_guard(spark, massdup_dir):
    """Duplicate one doc ×300 (> SWEEP_BLOCK_DOC_CAP): the sweep
    must report the overflow count and bound the per-block pair
    mass at C(cap, 2) instead of C(301, 2)."""
    from fxblue_etl_spark.operators.graph import (
        dedup_threshold_sensitivity,
    )

    rows = dedup_threshold_sensitivity(spark, massdup_dir).collect()
    assert len(rows) == 4
    assert all(r["n_docs_capped"] > 0 for r in rows)
    # every threshold's edge count stays below the capped block's
    # C(256, 2) + the clean corpus's own pair mass — the unguarded
    # C(301, 2) for the duplicated family alone would exceed this
    for r in rows:
        assert r["n_edges"] < 301 * 300 // 2


def test_threshold_sweep_guard_inactive_on_clean_corpus(spark):
    """Fixture blocks are all under the cap: n_docs_capped must be 0
    (the oracle-certified exact path)."""
    from fxblue_etl_spark.operators.graph import (
        dedup_threshold_sensitivity,
    )

    rows = dedup_threshold_sensitivity(spark, SF_DIR).collect()
    assert rows and all(r["n_docs_capped"] == 0 for r in rows)


def test_capped_bigram_pairs_match_uncapped_under_cap(spark):
    """With the cap above every block size the capped spine is
    bit-identical to the exact ngram_jaccard_pairs — the 'exact up
    to the cap' half of the contract."""
    from fxblue_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_capped,
    )

    exact = sorted(map(tuple, ngram_jaccard_pairs(spark, SF_DIR).collect()))
    capped, n = ngram_jaccard_pairs_capped(spark, SF_DIR)
    assert sorted(map(tuple, capped.collect())) == exact
    assert n.collect()[0]["n_docs_capped"] == 0


def test_twap_zero_span_and_negative_values(spark, tmp_path):
    """TWAP's floor division must agree with DuckDB on negative
    pv_sum (floor, not truncate-toward-zero) and emit NULL — not an
    error — for a zero span (round-13 advice item 2)."""
    import duckdb

    from fxblue_etl_spark.operators.temporal import (
        _twap_oracle,
        twap_by_event_type,
    )

    events = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 10, 11],
            "user_id": [1, 1, 1, 2, 2],
            "event_type": ["neg", "neg", "neg", "zspan", "zspan"],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:00:07",
                    "2024-01-01 00:00:10",
                    "2024-02-01 00:00:00",
                    "2024-02-01 00:00:00",
                ]
            ),
            "value": [-0.3333, 0.5, 1.0, 1.0, 2.0],
        }
    )
    d = tmp_path / "twapfx"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(events, preserve_index=False),
        d / "events.parquet",
    )
    got = {
        r["event_type"]: r
        for r in twap_by_event_type(spark, str(d)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'"
    )
    want = con.execute(_twap_oracle()).df().set_index("event_type")
    # neg: pv_sum = -3333*7 + 5000*3 = -8331, span 10 → floor = -834
    # (truncation would give -833)
    assert got["neg"]["twap_e4"] == -834
    assert int(want.loc["neg"]["twap_e4"]) == -834
    # zspan: two events at one timestamp → span 0 → NULL both sides
    assert got["zspan"]["span_s"] == 0
    assert got["zspan"]["twap_e4"] is None
    assert pd.isna(want.loc["zspan"]["twap_e4"])


def test_kappa_degenerate_confusion_guard():
    """A single-cell confusion matrix (N² = chance mass) must emit
    κ = 0 in the oracle's SQL rather than divide by zero — the
    degenerate-corpus guard (round-13 advice item 3)."""
    import duckdb

    from fxblue_etl_spark.operators.textops import _kappa_floordiv

    kappa = _kappa_floordiv(
        "CAST(1000000 AS HUGEINT) * (n_docs * n_agree - chance_mass)",
        "(n_docs * n_docs - chance_mass)",
        "//",
    )
    # every doc labeled AND predicted 'en': row_n = col_n = N so
    # chance_mass = N², the denominator's zero
    row = duckdb.sql(
        f"""
        WITH base AS (SELECT CAST(7 AS BIGINT) AS n_docs,
                             CAST(7 AS BIGINT) AS n_agree,
                             CAST(49 AS BIGINT) AS chance_mass)
        SELECT CASE WHEN n_docs * n_docs = chance_mass THEN 0
                    ELSE CAST({kappa} AS BIGINT) END AS kappa_ppm
        FROM base
        """
    ).fetchone()
    assert row[0] == 0


def test_ablation_single_source_guard(spark, tmp_path):
    """A single-source corpus must report shift 0 — not divide by
    zero — when ablating its only source (round-13 advice item 3)."""
    from fxblue_etl_spark.operators.corpusops import (
        source_ablation_report,
    )

    src = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    src["source"] = "only"
    d = tmp_path / "onesrc"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(src, preserve_index=False),
        d / "documents.parquet",
    )
    rows = source_ablation_report(spark, str(d)).collect()
    assert len(rows) == 1
    assert rows[0]["max_shift_ppm"] == 0


def test_scurve_signatures_exclude_short_docs(spark, tmp_path):
    """A 2-token document must contribute NO 24-perm signature —
    matching the certified 12-perm lineage and the oracle's
    len(toks) >= 3 CTE (round-13 advice item 1)."""
    from fxblue_etl_spark.operators.dedup import _scurve_sigs

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["two tokens", "", "three whole tokens here"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [10, 0, 23],
        }
    )
    d = tmp_path / "short"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        d / "documents.parquet",
    )
    sdf = spark.read.parquet(str(d / "documents.parquet"))
    ids = {
        r["doc_id"] for r in _scurve_sigs(sdf).select("doc_id").distinct().collect()
    }
    assert ids == {3}


def test_duplicated_span_rewrite_semantics(spark, tmp_path):
    """Hand-checkable corpus: doc 2 repeats doc 1's 8-token opening
    span verbatim, doc 3 shares nothing.  The canonical (first)
    occurrence survives untouched; doc 2 loses exactly the covered
    tokens; doc 3 is byte-identical in and out."""
    import hashlib

    from fxblue_etl_spark.operators.dedup import duplicated_span_rewrite

    span = "alpha beta gamma delta epsilon zeta eta theta"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                f"{span} tail one",
                f"{span} different ending here",
                "completely unrelated text with no duplicated span at all",
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [0, 0, 0],
        }
    )
    d = tmp_path / "span"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        d / "documents.parquet",
    )
    got = {
        r["doc_id"]: r
        for r in duplicated_span_rewrite(spark, str(d)).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    # doc 1 is canonical: nothing removed
    assert got[1]["n_removed"] == 0
    assert got[1]["kept_md5"] == md5(f"{span} tail one")
    # doc 2: the 8 duplicated tokens go, the rest survives in order
    assert got[2]["n_removed"] == 8
    assert got[2]["kept_md5"] == md5("different ending here")
    # doc 3 untouched
    assert got[3]["n_removed"] == 0
    assert got[3]["kept_md5"] == md5(
        "completely unrelated text with no duplicated span at all"
    )


def test_duplicated_span_rewrite_internal_repeat(spark, tmp_path):
    """A doc that repeats ITS OWN 8-token span keeps the first
    occurrence and sheds the second — the within-doc case."""
    from fxblue_etl_spark.operators.dedup import duplicated_span_rewrite

    span = "one two three four five six seven eight"
    docs = pd.DataFrame(
        {
            "doc_id": [1],
            "text": [f"{span} middle {span}"],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [0],
        }
    )
    d = tmp_path / "ispan"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        d / "documents.parquet",
    )
    (row,) = duplicated_span_rewrite(spark, str(d)).collect()
    assert row["n_tokens"] == 17
    assert row["n_removed"] == 8


def test_streaming_drawdown_matches_batch_and_multibatch(spark):
    """Incremental ≡ rebuild for the live drawdown monitor: the
    multi-split streamed state equals the batch window+argmin
    operator row-for-row, and the run really processed multiple
    micro-batches."""
    from fxblue_etl_spark.operators.temporal import max_drawdown_by_user
    from fxblue_etl_spark.streaming.pipelines import (
        streaming_drawdown_monitor,
    )

    progress: list = []
    streamed = sorted(
        map(
            tuple,
            streaming_drawdown_monitor(
                spark, SF_DIR, progress, n_splits=4
            ).collect(),
        )
    )
    batch = sorted(
        map(tuple, max_drawdown_by_user(spark, SF_DIR).collect())
    )
    assert streamed == batch


def test_shapley_vocab_conservation(spark):
    """Σ_src φ_src reconciles to 1e6·|vocab| minus bounded floor
    dust (each of the |grid| credits floors away < 1) — the
    efficiency axiom of Shapley values, checked exactly."""
    from fxblue_etl_spark.operators.corpusops import (
        shapley_vocab_coverage,
    )

    rows = shapley_vocab_coverage(spark, SF_DIR).collect()
    total = sum(r["shapley_e6"] for r in rows)
    # vocabulary size = number of distinct tokens overall
    import duckdb

    vocab = duckdb.sql(
        rf"""SELECT count(DISTINCT tok) FROM (
             SELECT unnest(list_filter(regexp_split_to_array(
                 trim(lower(text)), '\s+'), t -> t != '')) AS tok
             FROM '{SF_DIR}/documents.parquet')"""
    ).fetchone()[0]
    n_cells = sum(r["vocab_size"] for r in rows)
    assert total <= 1_000_000 * vocab
    assert total > 1_000_000 * vocab - n_cells  # floor dust bound


def test_vocab_divergence_zero_for_identical_distribution(spark, tmp_path):
    """Two sources with byte-identical text must both report
    tv_ppm = 0 — the divergence's fixed point."""
    from fxblue_etl_spark.operators.corpusops import (
        vocab_divergence_report,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["alpha beta gamma", "alpha beta gamma"],
            "lang": ["en", "en"],
            "source": ["a", "b"],
            "n_chars": [16, 16],
        }
    )
    d = tmp_path / "vd"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        d / "documents.parquet",
    )
    rows = vocab_divergence_report(spark, str(d)).collect()
    assert all(r["tv_ppm"] == 0 for r in rows)


def test_isotonic_fit_properties(spark, tmp_path):
    """The minimax isotonic fit must (a) be non-decreasing within
    each segment on the real fixture, (b) leave an already-monotone
    series untouched, and (c) pool a strict violator pair to its
    floor-average — the PAVA behaviors, hand-checked."""
    from fxblue_etl_spark.operators.temporal import isotonic_weekly_fit

    rows = isotonic_weekly_fit(spark, SF_DIR).collect()
    by_pr: dict = {}
    for r in rows:
        by_pr.setdefault(r["o_orderpriority"], []).append(
            (r["wk"], r["fit_cents"])
        )
    for pr, seq in by_pr.items():
        fits = [f for _, f in sorted(seq)]
        assert fits == sorted(fits), f"fit not monotone for {pr}"

    # hand case: orders for one synthetic priority, weekly totals
    # 100, 300, 200, 400 cents → PAVA pools (300, 200) to 250 each
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [1, 1, 1, 1],
            "o_orderstatus": ["F"] * 4,
            "o_totalprice": [1.00, 3.00, 2.00, 4.00],
            "o_orderdate": pd.to_datetime(
                ["1995-01-02", "1995-01-09", "1995-01-16", "1995-01-23"]
            ),
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    d = tmp_path / "iso"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(orders, preserve_index=False),
        d / "orders.parquet",
    )
    got = sorted(
        (r["wk"], r["y_cents"], r["fit_cents"])
        for r in isotonic_weekly_fit(spark, str(d)).collect()
    )
    assert [g[1] for g in got] == [100, 300, 200, 400]
    assert [g[2] for g in got] == [100, 250, 250, 400]


def test_cms_parity_build_equals_per_side_builds(spark):
    """r14 optimization pin: countmin_upsert_equivalence now derives
    its base/delta partial counter tables from ONE parity-tagged
    build pass (groupBy(par, d, b)) instead of two per-side
    filter+explode passes.  The refactor is sound iff, per parity,
    the single-pass cells equal the old per-side builds
    cell-for-cell — counts over a disjoint split ARE the split of
    the counts, pinned here against the literal old shape."""
    from pyspark.sql import functions as F

    from fxblue_etl_spark.operators.temporal import _cms_md5_buckets

    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )

    def old_side(parity: int):
        return (
            l.filter(F.col("l_orderkey") % 2 == parity)
            .select(F.explode(_cms_md5_buckets(F.col("l_partkey"))).alias("db"))
            .groupBy(F.col("db.d").alias("d"), F.col("db.b").alias("b"))
            .agg(F.count("*").cast("long").alias("cnt"))
        )

    parts = (
        l.select(
            (F.col("l_orderkey") % 2).alias("par"),
            F.explode(_cms_md5_buckets(F.col("l_partkey"))).alias("db"),
        )
        .groupBy("par", F.col("db.d").alias("d"), F.col("db.b").alias("b"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    for parity in (0, 1):
        new_cells = {
            (r["d"], r["b"]): r["cnt"]
            for r in parts.filter(F.col("par") == parity).collect()
        }
        old_cells = {
            (r["d"], r["b"]): r["cnt"] for r in old_side(parity).collect()
        }
        assert new_cells == old_cells, f"parity {parity} cells diverge"
    # the contract query itself still certifies merge == rebuild
    from fxblue_etl_spark.operators.temporal import (
        countmin_upsert_equivalence,
    )

    row = countmin_upsert_equivalence(spark, SF_DIR).first()
    assert row["merge_equals_rebuild"] == 1
    assert row["n_mismatch"] == 0
