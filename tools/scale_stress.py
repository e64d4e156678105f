"""10× scale stress: duplicate the sf0.1 fixture tables with offset
keys into /tmp and measure the operators whose plan shapes the scale
review cares about most.

Duplication is the interesting stress for this engine, not just more
rows: 10 byte-identical copies of every document make the
within-bucket pair fan-out quadratic (every identical family pairs
completely — C(10,2)·n_docs extra candidate pairs), while exact
dedup inside the composite pipelines must collapse the copies and
reproduce the 1× answer bit-for-bit.

Measured 2026-08-14 (local[32], idle start, load noted inline):

    1x  minhash_lsh_pairs   9.1s (cold)   264 pairs
    10x minhash_lsh_pairs   8.4s      251,400 pairs  (≈1000× output,
                                       same wall time — the banded
                                       bucket-grouped shape absorbs it)
    1x  rfm_segmentation    4.2s (cold)   115 rows
    10x rfm_segmentation    2.6s          115 rows   (boundary-based
                                       quintiles: flat at 10× orders)
    1x  llm_corpus_prep    14.6s (cold)
    10x llm_corpus_prep     5.3s       IDENTICAL result rows — exact
                                       dedup collapses the copies
                                       before the near-dup stage, so
                                       the pair graph never grows
    1x  quality_feature_matrix  1.9s   5,000 rows
    10x quality_feature_matrix  1.7s  50,000 rows (single persisted
                                       scan; fixed overheads dominate)

A one-off 100× probe (500k docs, 100-member identical families —
every family bucket explodes to C(100,2)=4950 pairs) measured
**27,390,000 verified pairs in 93s** through the same grouped plan,
and ``llm_corpus_prep`` at 100× still returned the bit-identical 1×
rows in 23s — the exact-dedup stage collapses the families before
the pair graph ever sees them.  ``rfm_segmentation`` at 100× orders
(15M rows) ran in 3.3s — the boundary-based quintile rewrite (the
round-4 verdict's one flagged scale-killer) is flat in data size.

Reference-parity ingest path, measured 2026-08-14: ``s2_csv_ingest``
(scan→gate→rename→coerce→dedup over real CSV files) = 8.8s at 150k
trades, **10.2s at 1.5M trades** — near-flat, the chain is
scan-bound — with rows and per-account pnl mass exactly ×10 (distinct
tickets must NOT collapse in the composite-key dedup);
``fx_ingest_end_to_end`` reconciles the ×10 ledger in 4.6s with its
1500-account set invariant.

Embedding family, measured 2026-08-14: ``kmeans_iterate_exact`` at
10× duplicated vectors (50k × 64d) = 7.0s and at a one-off 100× probe
(500k vectors) = 39.8s, in BOTH cases with members and inertia exactly
×k and centroid checksums IDENTICAL — uniform duplication is
mean-preserving, and the integer arithmetic makes that a bit-strict
assertion, not a tolerance.  ``brp_lsh_containment`` at 10× holds
(129,200 certified pairs, 0 missing) but costs 398s through the
built-in approxSimilarityJoin (candidate pairs grow ×100 per family
in every one of its 12 hash tables before the distinct) — opt-in via
``--full``; the hand-rolled bucket-grouped LSH absorbs the same
duplication in ~9s (see minhash_lsh_pairs above).

Streaming family (round-5 verdict item 5), measured 2026-08-14 at
10× duplication with state-store introspection (see
``stream_stress``):

    streaming_lsh_dedup      10x original-id slice == 1x bit-exact;
                             every copy flagged dup; state EXACTLY one
                             row per banded doc (5,000 → 50,000 —
                             linear in corpus by design, asserted)
    streaming_cdc_scd2       10x history == 1x bit-exact (runs are
                             duplication-invariant); run-set state
                             80,440 rows at BOTH scales
    streaming_tumbling_append counts/sums ×10 exact over identical
                             windows; state rows 21,388 at BOTH 1x and
                             10x volume — watermark/window-bounded,
                             volume-independent.  A one-off 100× probe
                             (10M events) ran in 3.5s warm with
                             counts/sums ×100 exact and the SAME
                             21,388 state rows — map-side partial
                             aggregation absorbs duplication entirely

Usage:
    python tools/scale_stress.py            # builds /tmp/sf10x, runs all
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = "/root/testdata/sf0.1"
TENX = "/tmp/sf10x"


def build_10x() -> None:
    import duckdb

    os.makedirs(TENX, exist_ok=True)
    con = duckdb.connect()
    if not os.path.exists(f"{TENX}/documents.parquet"):
        con.execute(f"""
        COPY (
          SELECT doc_id + k * 10000000 AS doc_id, lang, source, n_chars, text
          FROM read_parquet('{BASE}/documents.parquet'), range(0, 10) t(k)
        ) TO '{TENX}/documents.parquet' (FORMAT PARQUET)
        """)
    if not os.path.exists(f"{TENX}/events.parquet"):
        con.execute(f"""
        COPY (
          SELECT event_id + k * 1000000000 AS event_id, ts, user_id,
                 event_type, value, props
          FROM read_parquet('{BASE}/events.parquet'), range(0, 10) t(k)
        ) TO '{TENX}/events.parquet' (FORMAT PARQUET)
        """)
    if not os.path.exists(f"{TENX}/orders.parquet"):
        con.execute(f"""
        COPY (
          SELECT o_orderkey + k * 100000000 AS o_orderkey, o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM read_parquet('{BASE}/orders.parquet'), range(0, 10) t(k)
        ) TO '{TENX}/orders.parquet' (FORMAT PARQUET)
        """)
    if not os.path.exists(f"{TENX}/lineitem.parquet"):
        con.execute(f"""
        COPY (
          SELECT l_orderkey + k * 100000000 AS l_orderkey, l_partkey,
                 l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM read_parquet('{BASE}/lineitem.parquet'), range(0, 10) t(k)
        ) TO '{TENX}/lineitem.parquet' (FORMAT PARQUET)
        """)
    if not os.path.exists(f"{TENX}/embeddings.parquet"):
        # original vec_ids survive (k=0), so fixed-centroid inits
        # (vec_id < K) and query sets (vec_id % 50 == 0 over the
        # originals) pick the same vectors at 10×
        con.execute(f"""
        COPY (
          SELECT vec_id + k * 10000000 AS vec_id, embedding, label
          FROM read_parquet('{BASE}/embeddings.parquet'), range(0, 10) t(k)
        ) TO '{TENX}/embeddings.parquet' (FORMAT PARQUET)
        """)


def main() -> int:
    build_10x()
    from fxblue_etl_spark.operators.dedup import dedup_exact, minhash_lsh_pairs
    from fxblue_etl_spark.operators.quality import quality_feature_matrix
    from fxblue_etl_spark.plans.behavior import rfm_segmentation
    from fxblue_etl_spark.plans.corpus import llm_corpus_prep
    from fxblue_etl_spark.session import get_spark

    spark = get_spark("scale-stress")
    print(f"# load_avg at start: {os.getloadavg()[0]:.2f}")

    def t(label, fn):
        t0 = time.time()
        r = fn()
        print(f"{label}: {time.time() - t0:.1f}s  ({r})")

    for sf, tag in ((BASE, "1x "), (TENX, "10x")):
        t(f"{tag} minhash_lsh_pairs", lambda sf=sf: minhash_lsh_pairs(spark, sf).count())
        t(f"{tag} rfm_segmentation", lambda sf=sf: rfm_segmentation(spark, sf).count())
        t(f"{tag} dedup_exact", lambda sf=sf: dedup_exact(spark, sf).count())
        t(f"{tag} quality_feature_matrix", lambda sf=sf: quality_feature_matrix(spark, sf).count())
        t(f"{tag} llm_corpus_prep", lambda sf=sf: sorted(map(tuple, llm_corpus_prep(spark, sf).collect()))[:1])
    # the invariants that make duplication a CORRECTNESS stress, not
    # just a load test:
    # 1. the composite must collapse the copies and reproduce 1x
    one = sorted(map(tuple, llm_corpus_prep(spark, BASE).collect()))
    ten = sorted(map(tuple, llm_corpus_prep(spark, TENX).collect()))
    ok = one == ten
    print(f"# llm_corpus_prep 10x == 1x: {ok}")
    # 2. distinct-based behavioral ops are duplication-INVARIANT
    #    (user-day / user-type sets unchanged by copies) ...
    from fxblue_etl_spark.plans.behavior import (
        event_cooccurrence,
        retention_cohorts,
    )

    t("1x  retention_cohorts", lambda: retention_cohorts(spark, BASE).count())
    t("10x retention_cohorts", lambda: retention_cohorts(spark, TENX).count())
    r1 = sorted(map(tuple, retention_cohorts(spark, BASE).collect()))
    r10 = sorted(map(tuple, retention_cohorts(spark, TENX).collect()))
    c1 = sorted(map(tuple, event_cooccurrence(spark, BASE).collect()))
    c10 = sorted(map(tuple, event_cooccurrence(spark, TENX).collect()))
    ok = ok and r1 == r10 and c1 == c10
    print(f"# retention/cooccurrence 10x == 1x: {r1 == r10} {c1 == c10}")
    # 3. ... while count-based rollups scale EXACTLY 10x per cell
    #    (row counts and integer value sums x10; distinct users
    #    unchanged — all three in one query's output)
    from fxblue_etl_spark.plans.advanced import hourly_event_load

    h1 = {(r.hour, r.event_type): r for r in hourly_event_load(spark, BASE).collect()}
    h10 = {(r.hour, r.event_type): r for r in hourly_event_load(spark, TENX).collect()}
    exact10 = set(h1) == set(h10) and all(
        h10[k].n == 10 * v.n
        and h10[k].n_users == v.n_users
        and h10[k].total_value_e4 == 10 * v.total_value_e4
        for k, v in h1.items()
    )
    ok = ok and exact10
    print(f"# hourly_event_load: n,sum x10 exact; n_users invariant: {exact10}")
    ok = ingest_stress(spark) and ok
    ok = ml_stress(spark) and ok
    ok = graph_stress(spark) and ok
    ok = stream_stress(spark) and ok
    ok = dedup_rewrite_stress(spark) and ok
    print(f"# load_avg at end: {os.getloadavg()[0]:.2f}")
    return 0 if ok else 1


def _state_rows(progress: list) -> int:
    """Peak state-store row count across a run's micro-batches."""
    return max(
        (
            op["numRowsTotal"]
            for p in progress
            for op in (p.get("stateOperators") or [])
        ),
        default=0,
    )


def ingest_stress(spark) -> bool:
    """Reference-parity ingest path at 10× file volume: the CSV
    fixtures are re-materialized from the duplicated orders (copies
    land in the SAME per-account file — the key offset is divisible
    by the 8-account modulus — and keep distinct tickets, so the
    composite-key dedup must NOT collapse them).  Asserts the full
    scan→gate→rename→coerce→dedup chain emits exactly ×10 rows and
    ×10 per-account pnl mass; fx_ingest_end_to_end is timed at both
    volumes with its account set invariant (accounts come from
    distinct user_ids / the orderkey modulus, which duplication
    preserves)."""
    from fxblue_etl_spark.plans.relational import fx_ingest_end_to_end
    from fxblue_etl_spark.sources.fxblue_csv import s2_csv_ingest
    from pyspark.sql import functions as F

    ok = True

    def t(label, fn):
        t0 = time.time()
        r = fn()
        print(f"{label}: {time.time() - t0:.1f}s  ({len(r)} rows)")
        return r

    def per_acct(sf):
        return {
            r.account_id: (r.n, r.pnl_e4)
            for r in s2_csv_ingest(spark, sf)
            .groupBy("account_id")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.floor(F.col("pnl") * 1e4)).cast("long").alias("pnl_e4"),
            )
            .collect()
        }

    t0 = time.time()
    c1 = per_acct(BASE)
    print(f"1x  s2_csv_ingest per-acct: {time.time() - t0:.1f}s "
          f"({sum(n for n, _ in c1.values())} trades, {len(c1)} accounts)")
    t0 = time.time()
    c10 = per_acct(TENX)
    print(f"10x s2_csv_ingest per-acct: {time.time() - t0:.1f}s "
          f"({sum(n for n, _ in c10.values())} trades, {len(c10)} accounts)")
    csv_ok = set(c1) == set(c10) and all(
        c10[a] == (10 * n, 10 * p) for a, (n, p) in c1.items()
    )
    print(f"# s2_csv_ingest: rows and per-account pnl mass x10 exact, "
          f"no dedup collapse of distinct tickets: {csv_ok}")
    ok = ok and csv_ok

    f1 = t("1x  fx_ingest_end_to_end",
           lambda: fx_ingest_end_to_end(spark, BASE).collect())
    f10 = t("10x fx_ingest_end_to_end",
            lambda: fx_ingest_end_to_end(spark, TENX).collect())
    a1 = {r.acct for r in f1}
    a10 = {r.acct for r in f10}
    csv10 = {r.acct: (r.n_csv_trades, r.csv_pnl_e4) for r in f10 if r.n_csv_trades}
    csvsc = all(
        csv10.get(r.acct) == (10 * r.n_csv_trades, 10 * r.csv_pnl_e4)
        for r in f1
        if r.n_csv_trades
    )
    fx_ok = a1 == a10 and csvsc
    print(f"# fx_ingest: account set invariant ({len(a1)}), CSV ledger "
          f"columns x10 exact through the 3-way reconcile: {fx_ok}")
    return ok and fx_ok


def graph_stress(spark) -> bool:
    """Dedup-spine incremental maintenance at 10×: upsert_components
    on the 10× LSH pair graph must (a) equal the full recompute
    label-for-label, and (b) do delta-sized work — the contracted CC
    sees only the delta edges (~1/5 of the graph by the %5 split),
    never re-walking the base.  The pair machinery is persisted
    up-front so the timing compares the CC stages, not the shared
    LSH cost."""
    from pyspark.sql import functions as F

    from fxblue_etl_spark.io import fan_out, swap_cache, table
    from fxblue_etl_spark.operators.dedup import lsh_jaccard_pairs
    from fxblue_etl_spark.operators.graph import (
        DECON_J,
        connected_components,
        upsert_components,
    )

    docs = fan_out(table(spark, TENX, "documents"))
    pairs = (
        lsh_jaccard_pairs(docs)
        .filter(F.round("jaccard", 6) >= DECON_J)
        .select("doc_a", "doc_b")
    )
    pairs = swap_cache("stress.cc_pairs", pairs)
    n_pairs = pairs.count()  # materializes the persisted pair graph
    is_delta = (F.col("doc_a") + F.col("doc_b")) % 5 == 0
    n_delta = pairs.filter(is_delta).count()

    t0 = time.time()
    full = {
        r.id: r.component
        for r in connected_components(
            pairs, src="doc_a", dst="doc_b"
        ).collect()
    }
    t_full = time.time() - t0

    base = connected_components(
        pairs.filter(~is_delta), src="doc_a", dst="doc_b"
    )
    base.collect()  # the standing labeling exists before the delta lands
    t0 = time.time()
    up = {
        r.id: r.component
        for r in upsert_components(
            base, pairs.filter(is_delta), src="doc_a", dst="doc_b"
        ).collect()
    }
    t_upsert = time.time() - t0

    eq = up == full
    print(
        f"# upsert_components 10x: pairs {n_pairs} (delta {n_delta}), "
        f"upsert == full recompute over {len(full)} vertices: {eq}; "
        f"full {t_full:.1f}s vs delta-upsert {t_upsert:.1f}s"
    )
    swap_cache("stress.cc_pairs")  # drain the persisted pair graph
    return eq


def ml_stress(spark) -> bool:
    """Embedding family at 10× duplicated vectors (original vec_ids
    survive as the k=0 copies, so fixed-centroid inits pick the same
    vectors).  Ten identical copies of every vector give EXACT Lloyd
    invariants, not just load: per-cluster means are unchanged by
    uniform duplication, so ``kmeans_iterate_exact`` at 10× must emit
    the SAME centroid checksums with member counts and inertia
    exactly ×10 — integer arithmetic makes the comparison bit-strict.
    ``brp_lsh_containment`` must keep n_missing = 0 while its
    certified set blows up ~600× (every 10-copy family is C(10,2)
    distance-0 pairs in one sign bucket + the cross-family pairs ×100
    — the candidate-set stress for the ML join)."""
    from fxblue_etl_spark.operators.ml import kmeans_iterate_exact
    from fxblue_etl_spark.operators.similarity import brp_lsh_containment

    ok = True

    def t(label, fn):
        t0 = time.time()
        r = fn()
        print(f"{label}: {time.time() - t0:.1f}s  ({len(r)} rows)")
        return r

    k1 = {
        r.cluster: r
        for r in t(
            "1x  kmeans_iterate_exact",
            lambda: kmeans_iterate_exact(spark, BASE).collect(),
        )
    }
    k10 = {
        r.cluster: r
        for r in t(
            "10x kmeans_iterate_exact",
            lambda: kmeans_iterate_exact(spark, TENX).collect(),
        )
    }
    km_ok = set(k1) == set(k10) and all(
        k10[c].n_members == 10 * v.n_members
        and k10[c].inertia_q == 10 * v.inertia_q
        and k10[c].centroid_checksum == v.centroid_checksum
        for c, v in k1.items()
    )
    print(f"# kmeans_iterate_exact: members/inertia x10 exact, centroid "
          f"checksums IDENTICAL: {km_ok}")
    ok = ok and km_ok

    if "--full" not in sys.argv:
        # measured 2026-08-14: 10× BRP containment = 398s, 129,200
        # certified pairs, 0 missing — the contract HOLDS under a
        # ~330× candidate blowup, but the built-in approxSimilarityJoin
        # pays for duplication quadratically per hash table (every
        # 10-copy family collides in all 12 tables before the distinct)
        # where the hand-rolled bucket-grouped LSH absorbed the same
        # blowup in ~8s.  Too slow for the default run: --full opts in.
        print("# brp_lsh_containment 10x: skipped (pass --full; see note)")
        return ok
    b1 = t(
        "1x  brp_lsh_containment",
        lambda: brp_lsh_containment(spark, BASE).collect(),
    )[0]
    b10 = t(
        "10x brp_lsh_containment",
        lambda: brp_lsh_containment(spark, TENX).collect(),
    )[0]
    brp_ok = (
        b10.all_contained == 1
        and b10.n_missing == 0
        and b10.n_certified >= 45 * 5000  # every family alone is C(10,2)
    )
    print(f"# brp_lsh_containment: 1x {b1.n_certified} certified → 10x "
          f"{b10.n_certified}, still zero missing: {brp_ok}")
    return ok and brp_ok


def stream_stress(spark) -> bool:
    """Streaming family at 10× duplication (round-5 verdict item 5):
    results bit-identical where duplication-invariance is provable,
    and STATE-STORE row counts asserted, not just outputs.

    * ``streaming_lsh_dedup``: identical copies share every band, so
      the original-id slice of the 10× answer must equal the 1×
      answer bit-for-bit and every copy row must be flagged dup;
      state = the complete-mode per-doc aggregate — exactly one row
      per banded doc (linear in corpus BY DESIGN, asserted exact).
    * ``streaming_cdc_scd2``: (user_id, ts) is unique in the fixture,
      so each event's 10 copies are consecutive same-type rows in
      (ts, event_id) order — runs, and therefore the SCD2 history,
      are duplication-INVARIANT; 10× must reproduce the 1× table and
      the run-set state must not grow.
    * ``streaming_tumbling_append``: watermark-bounded windowed agg —
      state rows (windows × types) must be IDENTICAL at 10× volume
      (counts merge into the same windows), certifying state is
      bounded by event-time geometry, not input size.
    """
    from fxblue_etl_spark.streaming.pipelines import (
        streaming_cdc_scd2,
        streaming_lsh_dedup,
        streaming_tumbling_append,
    )

    ok = True

    def t(label, fn):
        t0 = time.time()
        r = fn()
        print(f"{label}: {time.time() - t0:.1f}s  ({len(r)} rows)")
        return r

    # --- LSH dedup gate ---
    p1: list = []
    r1 = {
        r.doc_id: r.is_dup
        for r in t(
            "1x  streaming_lsh_dedup",
            lambda: streaming_lsh_dedup(spark, BASE, progress_out=p1).collect(),
        )
    }
    p10: list = []
    r10 = {
        r.doc_id: r.is_dup
        for r in t(
            "10x streaming_lsh_dedup",
            lambda: streaming_lsh_dedup(spark, TENX, progress_out=p10).collect(),
        )
    }
    base_slice = {d: v for d, v in r10.items() if d < 10_000_000}
    copies_all_dup = all(v == 1 for d, v in r10.items() if d >= 10_000_000)
    slice_ok = base_slice == r1
    print(f"# lsh_dedup: 10x original-id slice == 1x: {slice_ok}; "
          f"all copies flagged dup: {copies_all_dup}")
    s1, s10 = _state_rows(p1), _state_rows(p10)
    state_ok = s1 == len(r1) and s10 == len(r10)
    print(f"# lsh_dedup state rows: 1x {s1} (docs {len(r1)}), "
          f"10x {s10} (docs {len(r10)}) — one row per banded doc: {state_ok}")
    ok = ok and slice_ok and copies_all_dup and state_ok

    # --- self-maintaining incremental LSH gate (round 7) ---
    from fxblue_etl_spark.streaming.pipelines import (
        streaming_lsh_dedup_incremental,
    )

    pi: list = []
    ri = {
        r.doc_id: r.is_dup
        for r in t(
            "10x streaming_lsh_dedup_incremental(8 batches)",
            lambda: streaming_lsh_dedup_incremental(
                spark, TENX, progress_out=pi, n_splits=8
            ).collect(),
        )
    }
    inc_ok = ri == r10
    durs = [p["batchDuration"] for p in pi if "batchDuration" in p]
    # per-batch duration must not grow with corpus-so-far size: the
    # index probe is a narrow hash join and the index is compacted per
    # upsert.  3x over the first batches is a generous shared-host
    # bound — the partition-creep regression this guards against grows
    # LINEARLY in batch count and blows through it.
    trend_ok = len(durs) >= 8 and max(durs[2:]) <= 3 * max(durs[:2])
    si = _state_rows(pi)
    print(
        f"# lsh_dedup_incremental: verdicts == static-index gate at "
        f"10x: {inc_ok}; state rows {si} (foreachBatch only): {si == 0}; "
        f"per-batch ms {durs} flat-trend: {trend_ok}"
    )
    ok = ok and inc_ok and trend_ok and si == 0

    # --- self-maintaining incremental EMBEDDING gate (round 7) ---
    from fxblue_etl_spark.operators.similarity import embedding_near_dup
    from fxblue_etl_spark.streaming.pipelines import (
        streaming_embed_dedup_incremental,
    )

    dup10 = {
        r.vec_b
        for r in t(
            "10x embedding_near_dup (batch predicate)",
            lambda: embedding_near_dup(spark, TENX).collect(),
        )
    }
    pe: list = []
    re_ = {
        r.vec_id: r.is_dup
        for r in t(
            "10x streaming_embed_dedup_incremental(8 batches)",
            lambda: streaming_embed_dedup_incremental(
                spark, TENX, progress_out=pe, n_splits=8
            ).collect(),
        )
    }
    emb_ok = {v for v, d in re_.items() if d == 1} == dup10
    edurs = [p["batchDuration"] for p in pe if "batchDuration" in p]
    etrend_ok = len(edurs) >= 8 and max(edurs[2:]) <= 3 * max(edurs[:2])
    se = _state_rows(pe)
    print(
        f"# embed_dedup_incremental: dup set == 10x batch predicate "
        f"({len(dup10)} dups over {len(re_)} vecs): {emb_ok}; state rows "
        f"{se} (foreachBatch only): {se == 0}; per-batch ms {edurs} "
        f"flat-trend: {etrend_ok}"
    )
    ok = ok and emb_ok and etrend_ok and se == 0

    # --- CDC → SCD2 ---
    c1 = sorted(map(tuple, t(
        "1x  streaming_cdc_scd2",
        lambda: streaming_cdc_scd2(spark, BASE).collect(),
    )))
    c10 = sorted(map(tuple, t(
        "10x streaming_cdc_scd2",
        lambda: streaming_cdc_scd2(spark, TENX).collect(),
    )))
    scd_ok = c1 == c10
    print(f"# cdc_scd2: 10x history == 1x (duplication-invariant runs): "
          f"{scd_ok}; run-set state rows 1x {len(c1)} == 10x {len(c10)}")
    ok = ok and scd_ok

    # --- watermark-bounded windowed agg ---
    pa1: list = []
    a1 = {
        (r.win_start, r.event_type): r
        for r in t(
            "1x  streaming_tumbling_append",
            lambda: streaming_tumbling_append(
                spark, BASE, progress_out=pa1
            ).collect(),
        )
    }
    pa10: list = []
    a10 = {
        (r.win_start, r.event_type): r
        for r in t(
            "10x streaming_tumbling_append",
            lambda: streaming_tumbling_append(
                spark, TENX, progress_out=pa10
            ).collect(),
        )
    }
    agg_ok = set(a1) == set(a10) and all(
        a10[k].n == 10 * v.n and a10[k].total_e4 == 10 * v.total_e4
        for k, v in a1.items()
    )
    sa1, sa10 = _state_rows(pa1), _state_rows(pa10)
    wm_ok = sa1 == sa10 and sa1 > 0
    print(f"# tumbling_append: counts/sums x10 exact over identical "
          f"windows: {agg_ok}; state rows 1x {sa1} == 10x {sa10} "
          f"(watermark/window-bounded, volume-independent): {wm_ok}")
    return ok and agg_ok and wm_ok


def dedup_rewrite_stress(spark) -> bool:
    """Round-7 additions at 10× duplication — both have EXACT
    invariants under uniform copying, not just load numbers.

    ``semdedup_prune``: 10 identical copies of every vector leave the
    exact-Lloyd centroids unchanged (uniform duplication preserves
    integer means — the kmeans probe above asserts it), every copy
    lands in its original's cluster with the SAME centroid distance,
    and the tie rule (prune the larger vec_id) makes every non-minimal
    copy pruned by its own family while each ORIGINAL's verdict is
    untouched (copies only add tied-distance neighbors with larger
    ids, which can never prune an original).  So per cluster:
    n_members ×10 exact, n_kept IDENTICAL to 1×, and
    n_pruned(10×) = 9·n_members(1×) + n_pruned(1×).

    ``span_dedup_rewrite``: duplicating every document makes every
    SPAN_K-token span cross-document shared, so every doc with
    n_tokens ≥ SPAN_K must come back FULLY removed (kept_ppm = 0,
    n_removed = n_tokens) and every shorter doc untouched — full
    coverage is the transform's worst case, hit exactly."""
    from fxblue_etl_spark.operators.ml import semdedup_prune
    from fxblue_etl_spark.operators.quality import SPAN_K, span_dedup_rewrite

    def t(label, fn):
        t0 = time.time()
        r = fn()
        print(f"{label}: {time.time() - t0:.1f}s  ({len(r)} rows)")
        return r

    if "--full" in sys.argv:
        s1 = {r.cluster: r for r in t(
            "1x  semdedup_prune",
            lambda: semdedup_prune(spark, BASE).collect())}
        s10 = {r.cluster: r for r in t(
            "10x semdedup_prune",
            lambda: semdedup_prune(spark, TENX).collect())}
        sd_ok = set(s1) == set(s10) and all(
            s10[c].n_members == 10 * v.n_members
            and s10[c].n_kept == v.n_kept
            and s10[c].n_pruned == 9 * v.n_members + v.n_pruned
            for c, v in s1.items()
        )
        print(f"# semdedup_prune: members x10, kept IDENTICAL, pruned = "
              f"9*members + pruned(1x) per cluster: {sd_ok}")
    else:
        # 10× with the fixture's FIXED K=8 is the operator's
        # documented quadratic case (20k vectors → ~2.5k per cluster
        # → ~25M within-cluster pairs; >10 min on this host).  The
        # whole point of SemDeDup is that production scales K with
        # the corpus to bound cluster sizes — the fixture pins K=8
        # for oracle parity, so the 10× invariant run opts in via
        # --full rather than tax every battery run.
        sd_ok = True
        print("# semdedup_prune 10x: skipped (pass --full; fixed fixture "
              "K=8 makes 10x quadratic by design — see docstring)")

    r1 = t("1x  span_dedup_rewrite",
           lambda: span_dedup_rewrite(spark, BASE).collect())
    r10 = t("10x span_dedup_rewrite",
            lambda: span_dedup_rewrite(spark, TENX).collect())
    full = all(
        (r.n_tokens < SPAN_K and r.n_removed == 0 and r.kept_ppm == 1_000_000)
        or (r.n_tokens >= SPAN_K and r.n_removed == r.n_tokens
            and r.kept_ppm == 0)
        for r in r10
    )
    sr_ok = len(r10) == 10 * len(r1) and full
    print(f"# span_dedup_rewrite: 10x rows = {len(r10)} (= 10x {len(r1)}); "
          f"every >=K-token doc fully covered, shorter untouched: {sr_ok}")
    return sd_ok and sr_ok


if __name__ == "__main__":
    sys.exit(main())
