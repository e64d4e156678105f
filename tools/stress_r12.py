"""10× duplication growth probes for the round-12 additions
(round-12 verdict item 4) — the same posture as the round-8 probes in
``scale_stress.py``: duplicate the sf0.1 fixture ×10 with offset keys
(identical text/vector families of 10 → within-bucket candidate sets
grow quadratically per family), measure wall time and output rows at
1× and 10×, and record the growth exponent so "honest exact join" is
separated from "latent quadratic" by a number, not a claim.

Missing dimension tables (customer, nation, ...) are linked from the
1× fixture — 10× facts over 1× dims is the realistic shape.

Usage: python tools/stress_r12.py [query ...]   (default: the pair/
graph-shaped r12 additions first, then the aggregate-shaped rest)
Writes detail to ``OUT`` (default /tmp/stress_r12.json; wrapper
scripts like stress_r13 repoint it before calling ``main``).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scale_stress import BASE, TENX, build_10x  # noqa: E402

#: detail-output path — a module constant so round wrappers
#: (stress_r13, ...) can repoint it without overwriting this round's
#: record (round-13 advice item 4)
OUT = Path("/tmp/stress_r12.json")

#: probe order: candidate-pair / graph-shaped queries first (the ones
#: whose 10× growth can be super-linear), then the aggregate-shaped
#: rest (expected flat-ish; probed for the record)
DEFAULT = [
    "prefix_filter_jaccard_pairs",
    "simhash_hamming_neardup",
    "winnowing_fingerprint_pairs",
    "dedup_threshold_sensitivity",
    "dbscan_projection_clusters",
    "fd_discovery_sweep",
    "association_rules_topk",
    "corpus_release_end_to_end",
    "compaction_plan_execute",
    "ranking_rbo_report",
    "mmr_diverse_topk",
    "conformal_quantile_gate",
    "hll_rolling_distinct",
    "session_gap_sensitivity",
    "ivm_delete_maintenance",
    "neyman_allocation",
    "bloom_upsert_equivalence",
    "hll_upsert_equivalence",
    "countmin_upsert_equivalence",
    "streaming_bloom_maintenance",
]


def _link_dims() -> None:
    for t in ("region", "nation", "customer", "supplier", "part"):
        dst = f"{TENX}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    build_10x()
    _link_dims()

    import __spark_entry__ as entry
    from fxblue_etl_spark.io import drain_all
    from fxblue_etl_spark.session import get_spark

    spark = get_spark("stress-r12")
    qs = entry.queries()
    out: dict[str, dict] = {}
    print(f"# load_avg at start: {os.getloadavg()[0]:.2f}")
    for name in names:
        rec: dict = {}
        for sf, tag in ((BASE, "1x"), (TENX, "10x")):
            drain_all(spark)
            t0 = time.time()
            try:
                n = qs[name](spark, sf).count()
                rec[tag] = {"sec": round(time.time() - t0, 1), "rows": n}
            except Exception as exc:  # noqa: BLE001 — record and move on
                rec[tag] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
                break
        if "10x" in rec and "error" not in rec.get("10x", {}):
            s1, s10 = rec["1x"]["sec"], rec["10x"]["sec"]
            # growth exponent: time ~ n^e  =>  e = log10(t10/t1);
            # sub-second 1x times are floored to 0.5s so cold-start
            # noise can't fabricate a big exponent
            e = math.log10(max(s10, 0.1) / max(s1, 0.5))
            rec["exponent"] = round(e, 2)
            rec["rows_growth"] = (
                round(rec["10x"]["rows"] / rec["1x"]["rows"], 1)
                if rec["1x"]["rows"]
                else None
            )
        print(f"{name}: {json.dumps(rec)}", flush=True)
        out[name] = rec
    OUT.write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
