"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()``
exposes one callable per implemented operator from SURVEY.md §2 (plus
the beyond-reference LLM-pipeline surface); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each (omitted only for operators whose
results are engine-specific by construction, e.g. approx sketches).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fxblue_etl_spark.plans import relational


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.flagship_account_pnl(spark, "/root/testdata/sf0.001")


def _modules():
    mods = [relational]
    try:
        from fxblue_etl_spark.plans import advanced

        mods.append(advanced)
    except ImportError:
        pass
    try:
        from fxblue_etl_spark.plans import tpch_more

        mods.append(tpch_more)
    except ImportError:
        pass
    try:
        from fxblue_etl_spark.plans import corpus

        mods.append(corpus)
    except ImportError:
        pass
    try:
        from fxblue_etl_spark.operators import cleaning

        mods.append(cleaning)
    except ImportError:
        pass
    try:
        from fxblue_etl_spark.operators import merge

        mods.append(merge)
    except ImportError:
        pass
    try:
        from fxblue_etl_spark.operators import windows

        mods.append(windows)
    except ImportError:
        pass
    try:
        from fxblue_etl_spark.operators import dedup

        mods.append(dedup)
    except ImportError:
        pass
    try:
        from fxblue_etl_spark.operators import similarity

        mods.append(similarity)
    except ImportError:
        pass
    try:
        from fxblue_etl_spark.operators import textops

        mods.append(textops)
    except ImportError:
        pass
    try:
        from fxblue_etl_spark.operators import multimodal

        mods.append(multimodal)
    except ImportError:
        pass
    try:
        from fxblue_etl_spark.operators import skew

        mods.append(skew)
    except ImportError:
        pass
    try:
        from fxblue_etl_spark.operators import temporal

        mods.append(temporal)
    except ImportError:
        pass
    try:
        from fxblue_etl_spark.operators import graph

        mods.append(graph)
    except ImportError:
        pass
    try:
        from fxblue_etl_spark.sources import fxblue_csv, rss_feed

        mods.extend([fxblue_csv, rss_feed])
    except ImportError:
        pass
    try:
        from fxblue_etl_spark.sources import rss_datasource

        mods.append(rss_datasource)
    except ImportError:
        pass
    try:
        from fxblue_etl_spark.streaming import pipelines

        mods.append(pipelines)
    except ImportError:
        pass
    try:
        from fxblue_etl_spark.functions import udfs

        mods.append(udfs)
    except ImportError:
        pass
    return mods


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(getattr(mod, "QUERIES", {}))
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLES", {}))
    return out
