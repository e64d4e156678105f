"""Fixture/table loaders.

The driver provides a TPC-H-ish star schema plus ``events`` /
``documents`` / ``embeddings`` as one parquet file per table
(TESTDATA.md). Loading is a plain columnar parquet scan — Catalyst
gets predicate pushdown / column pruning for free, and at cluster
scale the same call fans out one task per row-group/split.
"""

from __future__ import annotations

import os
import threading
import weakref

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimensions small enough to broadcast at any realistic scale factor
#: (region/nation are bounded by geography; supplier/part/customer are
#: orders-of-magnitude smaller than the fact tables).
BROADCAST_DIMS = ("region", "nation", "supplier")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. `name` must be in TABLES.

    ``events.ts`` has shipped in two physical parquet forms across
    driver rounds — TIMESTAMP(NANOS) (surfacing as epoch-nanos long
    under ``spark.sql.legacy.parquet.nanosAsLong``) and untagged
    TIMESTAMP(MICROS) (surfacing as TIMESTAMP_NTZ). Both normalize
    here to session-TZ ``TimestampType`` at microsecond precision:
    with the session pinned to UTC (session.tune) the NTZ→LTZ cast
    preserves the wall clock, which is exactly how the DuckDB oracle
    reads the same file (naive TIMESTAMP). Every downstream operator
    sees one ts type regardless of fixture vintage.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    from .session import tune

    tune(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F

        t = dict(df.dtypes).get("ts")
        if t == "bigint":
            # integer div — float division would lose precision at 1e18 nanos
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif t == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    elif name in ("orders", "lineitem"):
        # The same TIMESTAMP(NANOS) vintage rescue for the other two
        # timestamp columns, should the driver ever regenerate these
        # tables the way events.parquet once shipped.  bigint branch
        # ONLY: the current micros-NTZ vintage passes through
        # untouched, so every standing certified row keeps its exact
        # input type.
        from pyspark.sql import functions as F

        for c in ("o_orderdate", "l_shipdate"):
            if dict(df.dtypes).get(c) == "bigint":
                df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Spread per-row-heavy (interpreted HOF / Pandas-UDF) work.

    A small table scans as one split, which serializes CPU-bound
    per-row expressions no matter how many cores the cluster has.
    Repartition up to cluster parallelism when the scan is narrower;
    at real scale the scan already yields enough splits and this is a
    no-op (no shuffle inserted).

    The width probe uses ``inputFiles()`` (a driver-side metadata
    lookup), never ``df.rdd`` — RDD conversion re-plans the whole
    physical tree on every call. File count under-estimates splits
    for one huge file, but a scan that big is already past the
    repartition threshold at cluster scale; non-scan plans (no input
    files) keep their upstream shuffle partitioning untouched.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files and len(files) < target:
        return df.repartition(target)
    return df


def fixture_fingerprint(sf_dir: str, name: str = "documents") -> tuple:
    """(mtime_ns, size) of a fixture table file — the invalidation key
    for per-(session, sf_dir) memoized index artifacts.  A driver-
    regenerated fixture at the same path must never serve a stale
    memo entry."""
    try:
        st = os.stat(os.path.join(sf_dir, f"{name}.parquet"))
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return (0, 0)


#: shared cap for checkpoint memos (matches graph._GRP_MEMO_CAP)
MEMO_CAP = 8


def memo_local_checkpoint(memo: dict, key: str, spark, fp, build) -> DataFrame:
    """Fingerprint-keyed ``localCheckpoint`` memo (the ``_GRP_MEMO``
    pattern, generalized): return the memoized frame when (session,
    fingerprint) match, else build + checkpoint, RELEASING the
    superseded entry's pinned blocks on overwrite and evicting
    oldest-first past :data:`MEMO_CAP`.

    Use for index-like artifacts a real deployment would persist once
    and probe many times (a corpus band index, a dedup spine) — not
    for per-invocation intermediates (those are :func:`swap_cache`'s
    job)."""
    hit = memo.get(key)
    if hit is not None and hit[0] is spark and hit[1] == fp:
        return hit[2]
    out = build().localCheckpoint()
    if hit is not None:
        release_local_checkpoint(hit[2])
    while len(memo) >= MEMO_CAP and key not in memo:
        *_, old = memo.pop(next(iter(memo)))  # oldest first
        release_local_checkpoint(old)
    memo[key] = (spark, fp, out)
    return out


def release_local_checkpoint(df: DataFrame) -> None:
    """Best-effort unpersist of the RDD behind a ``localCheckpoint``'d
    DataFrame. Superseded checkpoint blocks otherwise sit in executor
    storage until JVM GC + ContextCleaner reclaim them — measurable
    memory pressure in a shared-session bench or long driver run."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass  # cleanup must never fail the query


#: Central swap_cache registry: SparkSession → {slot name → live JVM
#: Dataset handles}.  The values are py4j ``_jdf`` handles, NOT
#: DataFrames: a DataFrame holds a strong reference back to its
#: session, which would pin the weak key forever and the documented
#: weak-key cleanup could never fire.  A ``JavaObject`` references
#: only the gateway, so a dropped session genuinely releases its
#: Python-side bookkeeping (the JVM blocks die with the session's
#: SharedState).
_SWAP_SLOTS: "weakref.WeakKeyDictionary[SparkSession, dict[str, list]]" = (
    weakref.WeakKeyDictionary()
)
_SWAP_LOCK = threading.Lock()


def _release(handles: list) -> None:
    """Unpersist JVM Dataset handles (``df._jdf``); no-fail."""
    for jdf in handles:
        try:
            jdf.unpersist(False)
        except Exception:
            pass  # cleanup must never fail the query


def swap_cache(
    slot: str, *dfs: DataFrame
) -> DataFrame | tuple[DataFrame, ...] | None:
    """Persist ``dfs`` for reuse within ONE query invocation,
    releasing whatever the previous invocation of the same query left
    under ``slot`` *in the same SparkSession* — a shared bench/driver
    session must never accumulate more than one invocation's worth of
    cached blocks per query.

    Slots are keyed by (session, name) in a central registry, so two
    sessions running the same query concurrently cannot release each
    other's blocks, and a harness can drop every live slot between
    query sections with :func:`drain_all`.  The session is taken from
    ``dfs[0]``; a bare ``swap_cache(name)`` call drains that slot in
    every session.

    Release FIRST, persist SECOND: CacheManager dedups by logical
    plan, so persisting the new (identical) plan before dropping the
    old entry would no-op, and the old entry's unpersist would then
    evict the cache the new invocation is counting on.

    Use at the natural materialization points of a multi-consumer
    plan (an index build's assignment table, a pair graph's edge
    list): Spark shares NO lineage between a DataFrame's consumers,
    so k consumers of an un-persisted frame re-execute its whole
    subtree k times — the scan-count sweep found an 18× corpus-scan
    plan built exactly that way.

    Same-session concurrency note: two threads invoking the SAME
    query on the SAME session still share a slot — the whole
    release-persist-insert sequence runs under one lock (releases
    and ``persist()`` registration are cheap, no-fail driver-side
    calls), so the slot always holds exactly the last writer's
    frames and the earlier writer's blocks are released before the
    swap, never leaked.  The earlier writer's in-flight action still
    completes correctly (Spark recomputes evicted blocks from
    lineage); only its cache benefit is lost.

    A bare ``swap_cache(name)`` (no frames) drains that slot and
    returns ``None`` — callers use the drain arm for teardown only.
    """
    if not dfs:
        with _SWAP_LOCK:
            drained = [
                slots.pop(slot) for slots in _SWAP_SLOTS.values() if slot in slots
            ]
        for handles in drained:
            _release(handles)
        return None
    sess = dfs[0].sparkSession
    with _SWAP_LOCK:
        _release(_SWAP_SLOTS.setdefault(sess, {}).pop(slot, []))
        out = [df.persist() for df in dfs]
        # store the JVM handle when the frame has one (classic mode);
        # fall back to the frame itself (fakes / Connect) — both
        # expose unpersist(bool)
        _SWAP_SLOTS[sess][slot] = [getattr(df, "_jdf", df) for df in out]
    return out[0] if len(out) == 1 else tuple(out)


def drain_all(spark: SparkSession | None = None) -> int:
    """Release every live swap_cache slot (of ``spark``, or of all
    sessions).  For a driver/bench harness to call between query
    sections so a full-surface run never holds more than the current
    query's blocks.  Returns the number of slots drained."""
    with _SWAP_LOCK:
        sessions = (
            [spark]
            if spark is not None
            else list(_SWAP_SLOTS.keys())
        )
        drained: list[list[DataFrame]] = []
        for sess in sessions:
            slots = _SWAP_SLOTS.get(sess)
            if slots:
                drained.extend(slots.values())
                slots.clear()
    for frames in drained:
        _release(frames)
    return len(drained)


def stage_once(path: str, build) -> str:
    """Idempotent, crash-safe, concurrency-safe fixture staging
    (round-11 advice item 3): the former per-site pattern wrote the
    payload INTO ``path`` and dropped a ``_fxblue_done`` marker
    after — a crash between write and marker was handled (re-stage),
    but a concurrent second session could read a half-overwritten
    directory because mode("overwrite") deletes files before the
    other process re-checks the marker.

    Here ``build(tmp_dir)`` writes the complete payload into a fresh
    sibling temp dir, the marker lands inside it, and one atomic
    ``os.rename`` publishes the whole thing — readers can only ever
    observe a missing dir or a complete one.  Losing a publish race
    is fine: the winner's dir is complete by construction, so the
    loser discards its own temp dir and returns the published path.
    """
    import shutil
    import uuid

    done = os.path.join(path, "_fxblue_done")
    if os.path.exists(done):
        return path
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    try:
        build(tmp)
        with open(os.path.join(tmp, "_fxblue_done"), "w") as f:
            f.write("ok")
        try:
            os.rename(tmp, path)
        except OSError:
            if not os.path.exists(done):
                # stale partial dir from a pre-helper crash: replace
                # it, tolerating one more concurrent winner
                shutil.rmtree(path, ignore_errors=True)
                try:
                    os.rename(tmp, path)
                except OSError:
                    if not os.path.exists(done):
                        raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return path


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
) -> None:
    """Write a table hive-partitioned by low-cardinality columns so
    predicates on them prune whole directories at scan time (the
    layout for `historical_trades`-style fact tables: partition by
    ingest date / account bucket, never by a high-cardinality key).
    """
    df.write.partitionBy(*partition_by).mode(mode).parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
