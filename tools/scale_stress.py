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
    print(f"# load_avg at end: {os.getloadavg()[0]:.2f}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
