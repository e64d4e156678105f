"""Every oracle_sql() entry must parse AND bind in DuckDB against
the fixture views — an EXPLAIN per oracle catches SQL drift (renamed
columns, engine-version syntax) in seconds, without waiting for the
full execution gate."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_oracle_explains(con, name):
    sql = entrymod.oracle_sql()[name]
    con.execute(f"EXPLAIN {sql}")


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_oracle_output_types_driver_safe(con, name):
    """No oracle may emit a driver-canonicalization hazard type:
    HUGEINT (pandas renders float64 → text diverges from Spark's
    long) or list/struct/map (pandas sort_values dies on unhashable
    cells).  This class cost rounds 2 AND 3 a red driver row each —
    binding the relation types is free, so fail it at test speed."""
    from tools.verify_local import oracle_type_hazards

    rel = con.sql(entrymod.oracle_sql()[name])
    hazards = oracle_type_hazards(rel)
    assert not hazards, (
        f"{name} oracle emits driver-hazardous column types {hazards}; "
        "CAST to BIGINT / array_to_string them in the final projection"
    )
