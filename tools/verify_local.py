"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and, where an
``oracle_sql()`` entry exists, the oracle on DuckDB over the same
parquet tables; compares row count, sorted column names, and an
order-insensitive canonical value comparison (exact for non-floats,
exact-after-round for floats — queries are expected to round float
aggregates themselves so raw values already agree).

Crucially the oracle result is fetched **through pandas** (``rel.df()``),
the same path the driver uses — NOT ``fetchall()``.  ``fetchall()``
converts DuckDB HUGEINT to a Python int that canonicalizes identically
to Spark's long, which made rounds 2 and 3 ship "locally green" fixes
the driver rejected (pandas renders HUGEINT as float64 → ``5.0`` vs
``5``).  On top of the pandas fetch, a pre-flight rejects any oracle
whose output schema types a driver-canonicalization hazard:

* HUGEINT / UHUGEINT (pandas → float64, text diverges from Spark long)
* list / struct / map / union (pandas cells are unhashable; the
  driver's ``sort_values`` canonicalizer raises ``TypeError``)
* an integral Spark column paired with a float64 oracle dtype (the
  general form of the HUGEINT hazard, e.g. via DECIMAL division)

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
        # str() (shortest repr), NOT a %.6g round: the driver renders
        # pandas cells as text, so an int64 5 and a float64 5.0 must
        # canonicalize DIFFERENTLY ("5" vs "5.0") — %.6g collapsed
        # them and hid the HUGEINT class for two rounds
        return str(v)
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


# DuckDB type ids whose pandas rendering diverges from (or crashes on)
# the driver's canonicalizer.  `list`/`struct`/`map`/`union` cells are
# unhashable in pandas sort_values; HUGEINT becomes float64.
HAZARD_TYPE_IDS = {"hugeint", "uhugeint", "list", "struct", "map", "union", "array"}


def oracle_type_hazards(rel) -> list[str]:
    """Names the oracle output columns whose DuckDB type is in the
    driver-hazard class.  Pre-flight: these must be projected away
    (CAST to BIGINT, array_to_string, …) before a query is registered."""
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        tid = getattr(typ, "id", str(typ)).lower()
        if tid in HAZARD_TYPE_IDS:
            bad.append(f"{col}:{typ}")
    return bad


def pandas_rows(df) -> list[tuple]:
    """Row tuples out of a pandas frame, preserving the dtypes the
    driver would see (numpy scalars → native python via .item())."""
    out = []
    for row in df.itertuples(index=False, name=None):
        conv = []
        for v in row:
            if hasattr(v, "item") and not isinstance(v, (bytes, str)):
                try:
                    v = v.item()
                except (ValueError, AttributeError):
                    pass
            conv.append(v)
        out.append(tuple(conv))
    return out


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
    from fxblue_etl_spark.io import drain_all

    for name, fn in queries.items():
        if only and name not in only:
            continue
        # a full-surface run touches every swap_cache slot; draining
        # between queries keeps the session at one query's worth of
        # cached blocks (io.drain_all contract)
        drain_all(spark)
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = [c.lower() for c in sdf.columns]
            # toPandas, NOT collect(): the driver reads both sides
            # through pandas, where a NULL in a double/nullable-int
            # column is NaN/float64 — collect()'s None made driver-
            # green queries look red here and vice versa
            spark_pdf = sdf.toPandas()
            spark_rows = pandas_rows(spark_pdf)
            spark_kinds = {
                c.lower(): d.kind for c, d in zip(spark_pdf.columns, spark_pdf.dtypes)
            }
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
            hazards = oracle_type_hazards(rel)
            duck_cols = [c.lower() for c in rel.columns]
            # pandas fetch — the driver's path.  fetchall() hides the
            # HUGEINT→float64 divergence (rounds 2+3 burned on this).
            duck_df = rel.df()
            duck_rows = pandas_rows(duck_df)
        except Exception as e:
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:500]}
            n_fail += 1
            print(f"✗ {name}: ORACLE_ERROR {str(e)[:200]}")
            continue

        if hazards:
            results[name] = {"status": "TYPE_HAZARD", "detail": str(hazards)}
            n_fail += 1
            print(f"✗ {name}: TYPE_HAZARD oracle emits {hazards}")
            continue
        # int64 on one side vs float64 on the other (after BOTH went
        # through pandas) is the generalized HUGEINT hazard: the
        # driver's text render diverges ("5" vs "5.0").  Symmetric
        # float64/float64 — e.g. nullable ints on both sides — is fine.
        drift = [
            c
            for c, dt in zip(duck_cols, duck_df.dtypes)
            if {dt.kind, spark_kinds.get(c, dt.kind)} == {"i", "f"}
        ]
        if drift:
            results[name] = {"status": "TYPE_HAZARD", "detail": f"int-vs-float64: {drift}"}
            n_fail += 1
            print(f"✗ {name}: TYPE_HAZARD integral Spark column is float64 in pandas: {drift}")
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
