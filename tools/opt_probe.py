"""Round-14 optimization probe — isolated per-query measurement.

For each query name: captures ``explain("formatted")`` to
``plans/r14/<query>_<tag>.txt``, then times N noop-sink executions
(guide §1.4 — computes every column of every row, no driver fetch)
with the swap-cache drained before each query so every probe pays its
own cache builds, exactly like a cold driver call.  Prints one line
per query: median / min seconds plus plan-shape counters (Exchanges,
joins by strategy, Python-eval nodes) so before/after diffs are
machine-checkable.

Usage: python tools/opt_probe.py [--tag before|after] [--sf DIR]
           [--runs N] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import re
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_REPO = Path(__file__).resolve().parent.parent


def plan_shape(plan: str) -> str:
    counters = {
        "Exchange": len(re.findall(r"\bExchange\b", plan)),
        "BHJ": len(re.findall(r"BroadcastHashJoin", plan)),
        "SMJ": len(re.findall(r"SortMergeJoin", plan)),
        "SHJ": len(re.findall(r"ShuffledHashJoin", plan)),
        "BNLJ": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "PyEval": len(re.findall(r"(?:Batch|Arrow)EvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas", plan)),
        "Window": len(re.findall(r"\bWindow\b", plan)),
    }
    return " ".join(f"{k}={v}" for k, v in counters.items() if v)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument(
        "--plan-only",
        action="store_true",
        help="capture explain output without executing (load-insensitive)",
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from fxblue_etl_spark.io import drain_all
    from fxblue_etl_spark.session import get_spark

    spark = get_spark("opt-probe")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    qs = entrymod.queries()
    plan_dir = _REPO / "plans" / "r14"
    plan_dir.mkdir(parents=True, exist_ok=True)

    for name in args.queries:
        if name not in qs:
            print(f"?? {name}: not in queries()")
            continue
        sc = spark.sparkContext
        # warm (plans, file listings, code paths) once, unmeasured
        drain_all(spark)
        sc.setJobDescription(f"warm:{name}")
        df = qs[name](spark, args.sf)
        if args.plan_only:
            plan = df._jdf.queryExecution().explainString(mode)
            (plan_dir / f"{name}_{args.tag}.txt").write_text(plan)
            print(f"{name}: plan captured | {plan_shape(plan)}", flush=True)
            continue
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().explainString(mode)
        if not args.no_plan:
            (plan_dir / f"{name}_{args.tag}.txt").write_text(plan)
        runs = []
        for i in range(args.runs):
            drain_all(spark)
            sc.setJobDescription(f"{name}[{i}]")
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        sc.setJobDescription(None)
        med = statistics.median(runs)
        print(
            f"{name}: med={med:.3f}s min={min(runs):.3f}s "
            f"runs={[round(r, 3) for r in runs]} load={os.getloadavg()[0]:.1f} "
            f"| {plan_shape(plan)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
