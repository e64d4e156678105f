"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and, where an
``oracle_sql()`` entry exists, the oracle on DuckDB over the same
parquet tables; compares row count, sorted column names, and an
order-insensitive canonical value comparison (exact for non-floats,
exact-after-round for floats — queries are expected to round float
aggregates themselves so raw values already agree).

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonicalization: stable text form for floats
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(cols), out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from fxblue_etl_spark.session import get_spark

    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = [c.lower() for c in sdf.columns]
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:500]}
            n_fail += 1
            print(f"✗ {name}: SPARK_ERROR {str(e)[:200]}")
            continue
        if name not in oracles:
            results[name] = {
                "status": "ROWS_ONLY",
                "rows": len(spark_rows),
                "sec": round(time.time() - t0, 2),
            }
            print(f"~ {name}: rows-only ({len(spark_rows)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = [c.lower() for c in rel.columns]
            duck_rows = rel.fetchall()
        except Exception as e:
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:500]}
            n_fail += 1
            print(f"✗ {name}: ORACLE_ERROR {str(e)[:200]}")
            continue

        status = "OK"
        detail = ""
        if sorted(spark_cols) != sorted(duck_cols):
            status = "SCHEMA_MISMATCH"
            detail = f"spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
        elif len(spark_rows) != len(duck_rows):
            status = "ROWCOUNT_MISMATCH"
            detail = f"spark={len(spark_rows)} duck={len(duck_rows)}"
        else:
            _, s = canon_rows(spark_cols, spark_rows)
            _, d = canon_rows(duck_cols, duck_rows)
            if s != d:
                status = "VALUE_MISMATCH"
                diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
                detail = f"first diffs: {diffs}"
        results[name] = {
            "status": status,
            "rows": len(spark_rows),
            "sec": round(time.time() - t0, 2),
        }
        if status != "OK":
            n_fail += 1
            results[name]["detail"] = detail
            print(f"✗ {name}: {status} {detail[:400]}")
        else:
            print(f"✓ {name}: {len(spark_rows)} rows in {results[name]['sec']}s")

    print(json.dumps({"sf_dir": sf_dir, "n_fail": n_fail, "results": results}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
