"""Plan auditor — prints the physical-plan evidence the scale story
rests on, per headline query (and any extra query names passed).

For each query it reports:

- the formatted plan (``explain("formatted")``),
- scan health: ``PushedFilters`` / ``ReadSchema`` (column pruning),
- exchange inventory: how many shuffles, how many broadcasts,
- red flags: ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` /
  row-at-a-time ``BatchEvalPython`` in the plan.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
       python tools/plan_audit.py [sf_dir] --all     # every queries() entry
(defaults: sf0.01, the bench headline set)
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: unconditional failures: an unpartitioned all-pairs product is
#: never the right plan on this surface
RED_FLAGS = ("CartesianProduct",)

#: review-level: legitimate in specific shapes, wrong anywhere else —
#: BroadcastNestedLoopJoin is exactly how Spark executes the
#: deliberate broadcast-singleton crossJoins (1-row scalar aggregates:
#: corpus totals, thresholds, centroid arrays) and the bounded
#: broadcast query-sets of the top-k scans; BatchEvalPython is
#: inherent to the UDTF execution mode. A full-surface scan
#: (PLAN_AUDIT_FULL=1 over queries()) confirmed every current hit is
#: one of those shapes — new hits deserve a look.
REVIEW_FLAGS = ("BroadcastNestedLoopJoin", "BatchEvalPython")


def main() -> None:
    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from fxblue_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(HEADLINE)

    spark = get_spark("plan-audit")
    qs = entrymod.queries()
    if names == ["--all"]:
        names = list(qs)
    flagged: dict[str, list[str]] = {}
    for name in names:
        if name not in qs:
            print(f"## {name}: UNKNOWN QUERY")
            continue
        import contextlib
        import io

        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        n_shuffle = len(re.findall(r"\(\d+\) Exchange\b", plan))
        n_bcast = len(re.findall(r"\(\d+\) BroadcastExchange\b", plan))
        pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
        hits = [f for f in RED_FLAGS if f in plan]
        review = [f for f in REVIEW_FLAGS if f in plan]
        if hits:
            flagged[name] = hits
        print(f"\n{'=' * 72}\n## {name}")
        print(
            f"shuffles={n_shuffle} broadcasts={n_bcast} "
            f"red_flags={hits or 'none'} review={review or 'none'}"
        )
        for p in pushed[:4]:
            print(f"  {p}")
        if os.environ.get("PLAN_AUDIT_FULL"):
            print(plan)
    print(f"\n{'=' * 72}")
    if flagged:
        print(f"RED FLAGS in {len(flagged)} queries: {flagged}")
        sys.exit(1)
    print(f"plan audit clean: {len(names)} queries, no red-flag operators")


if __name__ == "__main__":
    main()
