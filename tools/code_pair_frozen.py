"""Interleaved same-session code-pair A/B for the frozen15 subset
(round-12 verdict item 1): did round-12's code actually slow the
frozen queries, or did the canonical draws absorb run-context load?

Methodology = the one that closed the ivf_pq_adc_topk question
(COVERAGE.md round 12, commit ed14c03): two checkouts of the ENGINE
(a fresh read-only git worktree at the old round's end commit vs the
current working tree), exercised ALTERNATELY within ONE Python
process / ONE hour on a quiet host, so host state (page cache, JIT,
co-tenant load) is matched across codebases instead of across weeks.
Each arm gets its own SparkSession (a JVM cannot host two versions
of the engine's conf tuning at once), but arms alternate per QUERY
so a load wave hits both codebases, not one.

Usage: python tools/code_pair_frozen.py <old_commit> [sf_dir]
Writes one JSON line to stdout; detail to /tmp/code_pair_frozen.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OLD = sys.argv[1]
WT = Path("/tmp/code_pair_wt")

FROZEN15 = [
    "flagship_account_pnl",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "rollup_returns",
    "topk_orders_per_customer",
    "events_json_extract",
    "exact_distinct_and_quantiles",
    "q10_returned_items",
    "q18_large_volume_orders",
    "asof_purchase_view",
    "time_bucket_rollup",
    "heavy_hitters_exact",
    "minhash_lsh_pairs",
    "llm_corpus_prep",
]

N_RUNS = 3


def _arm(tag: str, root: Path) -> dict[str, float]:
    """Run frozen15 once (median-of-N_RUNS each) against the engine
    at `root` in a fresh subprocess (imports are process-global, so
    each arm-draw is its own interpreter — matching how the driver
    and bench load the engine)."""
    prog = f"""
import json, statistics, sys, time
sys.path.insert(0, {str(root)!r})
import __spark_entry__ as m
from fxblue_etl_spark.session import get_spark
from fxblue_etl_spark.io import drain_all
spark = get_spark("codepair-{tag}")
qs = m.queries()
names = {FROZEN15!r}
for n in names:
    qs[n](spark, {SF_DIR!r}).limit(1).collect()
out = {{}}
for n in names:
    drain_all(spark)
    runs = []
    for _ in range({N_RUNS}):
        t0 = time.time()
        qs[n](spark, {SF_DIR!r}).limit(10000).collect()
        runs.append(time.time() - t0)
    out[n] = round(statistics.median(runs), 3)
print("CODEPAIR_JSON:" + json.dumps(out))
"""
    r = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True,
        text=True,
        cwd=str(root),
        timeout=1800,
    )
    for line in r.stdout.splitlines():
        if line.startswith("CODEPAIR_JSON:"):
            return json.loads(line[len("CODEPAIR_JSON:"):])
    raise RuntimeError(
        f"arm {tag} produced no result; stderr tail: {r.stderr[-2000:]}"
    )


def main() -> None:
    if not WT.exists():
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(WT), OLD],
            cwd=str(REPO),
            check=True,
        )
    draws = []
    # alternate old/new twice: old, new, old, new — the first pair
    # absorbs any session-cold residue symmetrically, the second
    # pair is the comparison pair (ed14c03 posture)
    for i, (tag, root) in enumerate(
        [("old", WT), ("new", REPO), ("old", WT), ("new", REPO)]
    ):
        load0 = os.getloadavg()[0]
        t = _arm(f"{tag}{i}", root)
        draws.append(
            {
                "arm": tag,
                "draw": i,
                "load_at_start": round(load0, 2),
                "timings": t,
                "frozen15_total": round(sum(t.values()), 3),
            }
        )
    rec = {
        "old_commit": OLD,
        "sf_dir": SF_DIR,
        "n_runs": N_RUNS,
        "draws": draws,
        "frozen15_totals": {
            f"{d['arm']}{d['draw']}": d["frozen15_total"] for d in draws
        },
    }
    Path("/tmp/code_pair_frozen.json").write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec["frozen15_totals"]))


if __name__ == "__main__":
    main()
