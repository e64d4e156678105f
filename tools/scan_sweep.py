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

Usage:
    python tools/scan_sweep.py [sf_dir] [--min N]
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


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    min_scans = 3
    for a in sys.argv[1:]:
        if a.startswith("--min"):
            min_scans = int(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])

    import __spark_entry__ as entrymod
    from fxblue_etl_spark.session import get_spark

    spark = get_spark("scan-sweep")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    rows, errs = [], []
    for name, fn in entrymod.queries().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(mode)
        except Exception as e:  # analysis failure is its own finding
            errs.append((name, str(e).splitlines()[0][:80]))
            continue
        tables = re.findall(
            r"Location: InMemoryFileIndex \[[^\]]*?/(\w+)\.parquet", plan
        )
        dup = {
            t: c
            for t, c in Counter(tables).items()
            if c >= min_scans
        }
        if dup:
            big = {t: c for t, c in dup.items() if t in BIG_TABLES}
            rows.append((name, max(dup.values()), dup, bool(big)))

    rows.sort(key=lambda r: (-r[1], r[0]))
    print(f"# queries scanning one table >= {min_scans}x ({sf_dir}):")
    for name, worst, dup, big in rows:
        flag = " [corpus-sized]" if big else ""
        print(f"{worst:3d}x  {name}  {dup}{flag}")
    for name, err in errs:
        print(f"ERR   {name}  {err}")
    print(f"# total: {len(rows)} flagged, {len(errs)} errors")
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
