"""Streaming state-bound guards (round-6 verdict item 4): the 10M-event
scale probe (tools/scale_stress.py, commit a62f54b) showed state-store
volume is event-volume-independent; these tests pin that contract at
fixture scale so a regression that makes state grow with event volume
or micro-batch count goes RED in the suite, not just in a tool run.

* ``streaming_lsh_dedup``: complete-mode per-doc aggregate — state is
  one row per DISTINCT doc.  Re-feeding the same documents across 3
  micro-batches must keep ``stateOperators[*].numRowsTotal`` flat at
  the distinct-doc count (arrivals merge into existing keys; a
  regression that keys state per-arrival or per-batch triples it).
* ``streaming_cdc_scd2``: the merge's entire cross-batch state is the
  run-set.  Feeding the same per-key-chronological feed as 1 vs 3
  micro-batches must produce identical history and a final run-set no
  larger than the single-batch one (boundary runs merge, never
  duplicate); duplicating every event 3x in-batch must not grow the
  run-set at all (consecutive same-type copies collapse).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from fxblue_etl_spark.streaming.pipelines import (
    streaming_cdc_scd2,
    streaming_lsh_dedup,
)

SF = "/root/testdata/sf0.001"


def _peak_state_rows(progress: list) -> int:
    return max(
        (
            op.get("numRowsTotal", 0)
            for p in progress
            for op in (p.get("stateOperators") or [])
        ),
        default=0,
    )


def _per_batch_state_rows(progress: list) -> list[int]:
    out = []
    for p in progress:
        ops = p.get("stateOperators") or []
        if ops:
            out.append(sum(op.get("numRowsTotal", 0) for op in ops))
    return out


def test_lsh_dedup_state_flat_across_batches(spark, tmp_path):
    con = duckdb.connect()
    docs_sql = (
        f"SELECT * FROM read_parquet('{SF}/documents.parquet') "
        "WHERE doc_id < 150"
    )
    n_docs = con.execute(f"SELECT count(*) FROM ({docs_sql})").fetchone()[0]

    multi = str(tmp_path / "docs3")
    os.makedirs(multi)
    for i in range(3):  # three identical files → three micro-batches
        con.execute(f"COPY ({docs_sql}) TO '{multi}/f{i}.parquet' (FORMAT PARQUET)")

    progress: list = []
    res = streaming_lsh_dedup(
        spark, SF, progress_out=progress,
        stage_dir=multi, max_files_per_trigger=1,
    )
    per_batch = _per_batch_state_rows(progress)
    assert len(per_batch) >= 3, f"expected >=3 micro-batches, got {per_batch}"
    assert all(n == n_docs for n in per_batch), (
        f"state must stay flat at {n_docs} distinct docs across "
        f"re-arrivals; got {per_batch}"
    )
    assert _peak_state_rows(progress) == n_docs
    assert res.count() == n_docs  # one verdict row per distinct doc


@pytest.fixture(scope="module")
def _events_splits(tmp_path_factory):
    """events.parquet as (single-file dir, 3-chronological-files dir,
    3-files-with-3x-duplicated-events dir)."""
    base = tmp_path_factory.mktemp("cdc_feed")
    con = duckdb.connect()
    src = f"read_parquet('{SF}/events.parquet')"
    one, three, dup3 = (str(base / d) for d in ("one", "three", "dup3"))
    for d in (one, three, dup3):
        os.makedirs(d)
    con.execute(f"COPY (SELECT * FROM {src}) TO '{one}/all.parquet' (FORMAT PARQUET)")
    # per-key chronological split: global (ts, event_id) thirds keep
    # every user's events in order across batch files
    for i in range(3):
        con.execute(f"""
        COPY (SELECT * FROM (
                SELECT *, ntile(3) OVER (ORDER BY ts, event_id) AS b FROM {src})
              WHERE b = {i + 1} ORDER BY ts, event_id)
        TO '{three}/f{i}.parquet' (FORMAT PARQUET)
        """)
        con.execute(f"""
        COPY (SELECT e.* EXCLUDE (b) FROM (
                SELECT *, ntile(3) OVER (ORDER BY ts, event_id) AS b FROM {src}) e
              CROSS JOIN range(3) WHERE b = {i + 1} ORDER BY ts, event_id)
        TO '{dup3}/f{i}.parquet' (FORMAT PARQUET)
        """)
    return one, three, dup3


def test_cdc_scd2_state_tracks_runs_not_batches(spark, _events_splits):
    one, three, _ = _events_splits
    s1: list = []
    h1 = sorted(map(tuple, streaming_cdc_scd2(
        spark, SF, stage_dir=one, state_rows_out=s1).collect()))
    s3: list = []
    h3 = sorted(map(tuple, streaming_cdc_scd2(
        spark, SF, stage_dir=three, max_files_per_trigger=1,
        state_rows_out=s3).collect()))
    assert len(s3) >= 3, f"expected >=3 micro-batches, got {len(s3)}"
    assert h3 == h1, "batch boundaries changed the SCD2 history"
    assert s3[-1] == s1[-1] == len(h1), (
        f"run-set state must end at the distinct-run count {len(h1)} "
        f"regardless of batching; got single={s1} multi={s3}"
    )
    # monotone growth only by genuinely-new runs, no per-batch bloat
    assert all(a <= b for a, b in zip(s3, s3[1:]))


def test_cdc_scd2_state_event_volume_independent(spark, _events_splits):
    one, _, dup3 = _events_splits
    s1: list = []
    h1 = sorted(map(tuple, streaming_cdc_scd2(
        spark, SF, stage_dir=one, state_rows_out=s1).collect()))
    sd: list = []
    hd = sorted(map(tuple, streaming_cdc_scd2(
        spark, SF, stage_dir=dup3, max_files_per_trigger=1,
        state_rows_out=sd).collect()))
    assert len(sd) >= 3
    assert hd == h1, "3x-duplicated feed changed the SCD2 history"
    assert sd[-1] == s1[-1] == len(h1), (
        f"state grew with event volume: single={s1}, 3x-dup={sd}"
    )


def test_lsh_dedup_incremental_matches_batch_and_split_invariant(spark):
    """The self-maintaining variant (empty index, probe-then-upsert per
    micro-batch) must produce the batch gate's exact verdict table, no
    matter how the doc_id-ordered feed is split into batches — and it
    must use NO streaming state store at all (foreachBatch only; the
    cross-batch state is the maintained band index, not Spark state)."""
    from fxblue_etl_spark.streaming.pipelines import (
        streaming_lsh_dedup_incremental,
    )

    batch = sorted(map(tuple, streaming_lsh_dedup(spark, SF).collect()))
    prog: list = []
    inc3 = sorted(
        map(
            tuple,
            streaming_lsh_dedup_incremental(spark, SF, prog).collect(),
        )
    )
    assert inc3 == batch
    assert len(prog) >= 3  # genuinely multi-batch
    assert _peak_state_rows(prog) == 0  # no state store rows
    inc1 = sorted(
        map(
            tuple,
            streaming_lsh_dedup_incremental(spark, SF, n_splits=1).collect(),
        )
    )
    assert inc1 == batch


def test_embed_dedup_incremental_matches_batch_predicate(spark):
    """The embedding gate (empty sign-LSH index, probe-then-upsert per
    micro-batch) must flag exactly the LATER side of every batch
    ``embedding_near_dup`` pair, invariant across micro-batch splits,
    with NO streaming state store (foreachBatch only; the cross-batch
    state is the maintained payload-bearing sign index)."""
    from fxblue_etl_spark.operators.similarity import embedding_near_dup
    from fxblue_etl_spark.streaming.pipelines import (
        streaming_embed_dedup_incremental,
    )

    dups = {
        r.vec_b for r in embedding_near_dup(spark, SF).collect()
    }
    prog: list = []
    inc3 = {
        r.vec_id: r.is_dup
        for r in streaming_embed_dedup_incremental(
            spark, SF, prog
        ).collect()
    }
    assert {v for v, d in inc3.items() if d == 1} == dups
    assert len(prog) >= 3  # genuinely multi-batch
    assert _peak_state_rows(prog) == 0  # no state store rows
    inc1 = {
        r.vec_id: r.is_dup
        for r in streaming_embed_dedup_incremental(
            spark, SF, n_splits=1
        ).collect()
    }
    assert inc1 == inc3


def test_streaming_quality_gate_is_stateless(spark, sf_dir):
    """The streaming quality gate is a pure row-local map in append
    mode: its progress must report NO state operators at all (a
    regression that sneaks an aggregation or dedup into the gate
    would grow checkpoint state with corpus size) — and its verdicts
    must equal the batch gate's bit-for-bit."""
    from fxblue_etl_spark.operators.textops import quality_score
    from fxblue_etl_spark.streaming.pipelines import streaming_quality_gate

    progress: list = []
    got = sorted(
        map(tuple, streaming_quality_gate(spark, sf_dir, progress).collect())
    )
    assert got == sorted(map(tuple, quality_score(spark, sf_dir).collect()))
    assert progress, "availableNow run must report progress"
    for p in progress:
        assert not (p.get("stateOperators") or []), p["stateOperators"]


def test_ahash_gate_matches_batch_predicate_and_split_invariant(spark):
    """The streaming perceptual gate (empty ahash band index,
    probe-then-append per micro-batch) must flag exactly the LATER
    side of every batch ``media_ahash_neardup`` pair, cover exactly
    the eligible-doc set, stay invariant across micro-batch splits,
    and use NO streaming state store (foreachBatch only; the
    cross-batch state is the 4-rows-per-doc band index)."""
    from pyspark.sql import functions as F

    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.operators.multimodal import (
        AHASH_SEGS,
        media_ahash_neardup,
        with_binary_payload,
    )
    from fxblue_etl_spark.streaming.pipelines import (
        streaming_ahash_dedup_incremental,
    )

    dups = {r["doc_b"] for r in media_ahash_neardup(spark, SF).collect()}
    eligible = {
        r["doc_id"]
        for r in with_binary_payload(table(spark, SF, "documents"))
        .filter(F.col("media_meta.n_bytes") >= AHASH_SEGS)
        .select("doc_id")
        .collect()
    }
    prog: list = []
    inc3 = {
        r["doc_id"]: r["is_dup"]
        for r in streaming_ahash_dedup_incremental(spark, SF, prog).collect()
    }
    assert len(prog) >= 3  # genuinely multi-batch
    assert _peak_state_rows(prog) == 0  # no state store rows
    assert set(inc3) == eligible
    assert {d for d, v in inc3.items() if v == 1} == dups
    inc1 = {
        r["doc_id"]: r["is_dup"]
        for r in streaming_ahash_dedup_incremental(
            spark, SF, n_splits=1
        ).collect()
    }
    assert inc1 == inc3


def test_kmv_distinct_incremental_matches_batch_and_split_invariant(spark):
    """The streaming KMV cardinality monitor must equal the batch
    sketch EXACTLY (truncation confluence), invariant across
    micro-batch splits, with NO streaming state store (foreachBatch
    only; the cross-batch state is the ≤ groups×k sketch frame)."""
    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.plans.stats import kmv_sketch_table
    from fxblue_etl_spark.streaming.pipelines import streaming_kmv_distinct

    batch_sk = {
        r["grp"]: r["ks"]
        for r in kmv_sketch_table(
            table(spark, SF, "events"), "event_type", "user_id"
        ).collect()
    }
    prog: list = []
    inc3 = {r["event_type"]: r for r in streaming_kmv_distinct(spark, SF, prog).collect()}
    assert len(prog) >= 3  # genuinely multi-batch
    assert _peak_state_rows(prog) == 0  # no state store rows
    assert set(inc3) == set(batch_sk)
    for grp, ks in batch_sk.items():
        assert inc3[grp]["n_sketch"] == len(ks)
        assert inc3[grp]["tau"] == ks[-1]
    inc1 = {
        r["event_type"]: tuple(r)
        for r in streaming_kmv_distinct(spark, SF, n_splits=1).collect()
    }
    assert inc1 == {k: tuple(v) for k, v in inc3.items()}
