"""Scan-count sweep: how many times does each registered query's plan
scan the same parquet table?

Spark shares NO lineage between a DataFrame's consumers — every
consumer of an un-persisted frame re-executes its whole subtree.  On
the fixture that is milliseconds; at 100 TB each redundant scan of a
corpus-sized table (documents / embeddings / lineitem / orders /
events) is a full extra pass.  This sweep found (round 5):

* ``knn_graph_build`` at 18 embeddings scans (edge list consumed by
  four downstream branches) — fixed with ``io.swap_cache``;
* ``capped_waterfill_allocation`` at 7 documents scans (a temp view
  referenced from six CTEs) — fixed by persisting the caps table;
* ``dedup_triangles`` / ``dedup_degree_hist`` re-deriving the
  embedding pair graph per join side / union branch — fixed with
  ``swap_cache`` / row-local explode symmetrization;
* the text-LSH and sign-LSH pair generators executing the signature
  lineage on both sides of a self-join — fixed by bucket-grouped
  pair generation.

Multiple scans are NOT automatically wrong: config-sized dims
(nation, region), column-pruned count probes, and set-operation
branches are cheap by construction.  The sweep is a *review* surface:
it prints every query whose plan scans one table ``--min`` times or
more (default 3), worst first, so a new scan-multiplying shape is
visible the round it appears.

``--gate`` turns the sweep into a pass/fail check against the
whitelist below (the same mechanism as plan_audit's bounded-window
whitelist): a query may scan a corpus-sized table at most its listed
number of times (unlisted queries: at most 3).  A new
scan-multiplying shape — or a regression of a fixed one — fails the
gate the round it appears instead of surviving as a silent 100 TB
cost.

Usage:
    python tools/scan_sweep.py [sf_dir] [--min N] [--gate]
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: tables that are corpus-sized at the target scale — a repeated scan
#: of one of these is a repeated full pass, not a config lookup
BIG_TABLES = {"documents", "embeddings", "lineitem", "orders", "events"}

#: --gate whitelist: maximum corpus-table scan count per query.  Each
#: entry is a REVIEWED, by-design shape; anything else is capped at
#: DEFAULT_MAX.  Reviewed round 5:
GATE_WHITELIST = {
    # five certified pipeline stages assembled into one release row —
    # each keeps its own plan so the manifest is certified end-to-end
    "corpus_release_manifest": 6,
    # IVF serving: the extra scans are the query-set and centroid
    # sides (modulo-filtered, column-pruned — not full corpus passes)
    "ivf_multiprobe_topk": 6,
    # three-branch NOT IN / NOT EXISTS / anti-join semantics demo —
    # the branches ARE the point
    "not_in_null_semantics": 6,
    # System-R estimate calibration: per-pair stats + the actual join
    # (ground truth) are separate passes by definition
    "join_cardinality_estimate": 4,
    # MAD needs median → deviations → flagging: near the pass minimum
    # for a two-level order statistic
    "mad_outliers": 4,
    # Reviewed round 14 (the r14 sweep caught 20 unreviewed shapes;
    # 18 were fixed with io.swap_cache — see OPTIMIZATION_r14.md —
    # and these two are compositions whose extra passes are the
    # design):
    # PRF = TWO full certified-BM25 passes (seed ranking, then
    # re-ranking under the expanded termset — the second pass's terms
    # are data-derived, so its postings cannot share the literal
    # QUERY_TERMS cache) plus the feedback-vocabulary df pass
    "query_expansion_prf": 8,
    # three certified pipelines chained at doc granularity (survivor
    # keep-set, dup-group split spine, chunk rewrite) — each keeps
    # its own certified plan and needs the corpus at least once; the
    # manifest sibling is whitelisted at 6 for the same reason
    "corpus_release_end_to_end": 4,
    # UNION of three priority-class branches — multiset semantics
    "setop_multiset_priorities": 4,
}

#: unlisted queries may scan a corpus-sized table at most this often
DEFAULT_MAX = 3


def gate_violations(rows) -> list[tuple[str, int, int]]:
    """Pure gate rule over sweep rows ((name, worst, dup, big)):
    a query may scan a corpus-sized table at most its whitelisted
    count (unlisted: DEFAULT_MAX). Split out so the rule is testable
    without building 282 Spark plans."""
    out = []
    for name, _worst, dup, big in rows:
        if not big:
            continue
        worst_big = max(c for t, c in dup.items() if t in BIG_TABLES)
        allowed = GATE_WHITELIST.get(name, DEFAULT_MAX)
        if worst_big > allowed:
            out.append((name, worst_big, allowed))
    return out


def main() -> int:
    min_scans, positional, gate = 3, [], False
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--min"):
            if "=" in a:
                min_scans = int(a.split("=", 1)[1])
            else:
                i += 1
                min_scans = int(argv[i])
        elif a == "--gate":
            gate = True
        else:
            positional.append(a)
        i += 1
    sf_dir = positional[0] if positional else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from fxblue_etl_spark.session import get_spark

    spark = get_spark("scan-sweep")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    from fxblue_etl_spark.io import drain_all

    rows, errs = [], []
    for name, fn in entrymod.queries().items():
        # ORDER-INDEPENDENCE (round 8): swap_cache registers persists
        # at plan-construction time, so an earlier query's cached
        # subtree can replace a later query's file scans with
        # InMemoryRelation in the analyzed plan — round 7's gate
        # silently passed two 6- and 9-scan queries that only looked
        # clean because of where they sat in the dict.  Draining the
        # slots AND the CacheManager before each analysis makes every
        # count intrinsic to the query, whatever the rotation order.
        drain_all(spark)
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(mode)
        except Exception as e:  # analysis failure is its own finding
            errs.append((name, str(e).splitlines()[0][:80]))
            continue
        tables = re.findall(
            r"Location: InMemoryFileIndex \[[^\]]*?/(\w+)\.parquet", plan
        )
        # the gate must see every multi-scan regardless of the --min
        # display filter, or `--gate --min 5` silently masks 4-scan
        # violations of the default cap; --min shapes only the report
        dup = {
            t: c
            for t, c in Counter(tables).items()
            if c >= (2 if gate else min_scans)
        }
        if dup:
            big = {t: c for t, c in dup.items() if t in BIG_TABLES}
            rows.append((name, max(dup.values()), dup, bool(big)))

    rows.sort(key=lambda r: (-r[1], r[0]))
    print(f"# queries scanning one table >= {min_scans}x ({sf_dir}):")
    for name, worst, dup, big in rows:
        if worst < min_scans:
            continue
        shown = {t: c for t, c in dup.items() if c >= min_scans}
        flag = " [corpus-sized]" if big else ""
        print(f"{worst:3d}x  {name}  {shown}{flag}")
    violations = gate_violations(rows) if gate else []
    for name, err in errs:
        print(f"ERR   {name}  {err}")
    n_shown = sum(1 for r in rows if r[1] >= min_scans)
    print(f"# total: {n_shown} flagged, {len(errs)} errors")
    if gate:
        for name, got, allowed in violations:
            print(
                f"GATE FAIL  {name}: {got} corpus-table scans"
                f" (allowed {allowed}) — persist the multi-consumer"
                f" frame (io.swap_cache) or whitelist with a review note"
            )
        print(f"# gate: {'FAIL' if violations else 'PASS'}")
        return 1 if (violations or errs) else 0
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
