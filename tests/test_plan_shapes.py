"""Plan-shape regression tests for round-3 operators: the structural
properties that make each one scale-correct must survive refactors.
(Value parity is the oracle gate's job.)"""

from __future__ import annotations


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ohlc_uses_a_single_exchange(spark, sf_dir):
    """Both row_number windows and the final aggregate share one
    (hour, event_type) partitioning: exactly one shuffle."""
    from fxblue_etl_spark.operators.temporal import ohlc_bars_hourly

    plan = _plan(ohlc_bars_hourly(spark, sf_dir))
    # AQE wraps the tree; count distinct Exchange operators planned
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_cooccurrence_has_no_join(spark, sf_dir):
    """Pairs are generated row-locally from per-user sets — the plan
    must contain no self-join of the events relation (the only joins
    are the final broadcasts of the vocab²-sized aggregates)."""
    from fxblue_etl_spark.plans.behavior import event_cooccurrence

    plan = _plan(event_cooccurrence(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_postings_tournament_bounds_window_width(spark, sf_dir):
    """The head-of-postings pass must run two row_number windows (the
    two tournament levels), the first partitioned by (tok, bucket)."""
    from fxblue_etl_spark.operators.indexing import inverted_index_postings

    plan = _plan(inverted_index_postings(spark, sf_dir))
    assert plan.count("row_number()") >= 2, plan
    assert "tb" in plan  # level-1 sub-stream key reaches the plan


def test_chunking_is_shuffle_free(spark, sf_dir):
    """Chunking is row-local: no Exchange anywhere in the plan."""
    from fxblue_etl_spark.operators.textops import doc_chunking

    plan = _plan(doc_chunking(spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan


def test_mixture_allocation_is_config_sized(spark, sf_dir):
    """The corpus-sized side is one partial-agg count; the
    apportionment windows run on the config-sized language table."""
    from fxblue_etl_spark.operators.corpusops import mixture_allocation

    plan = _plan(mixture_allocation(spark, sf_dir))
    # partial + final aggregate pair for the availability count
    assert plan.count("HashAggregate") >= 2


def test_incremental_merge_indistinguishable_from_recompute(spark, sf_dir):
    """Merging the standing partial with the increment's partial must
    reproduce the full recompute bit-for-bit, and both partials must
    prune at the scan (orderkey bound in PushedFilters)."""
    import pyspark.sql.functions as F

    from fxblue_etl_spark.io import table
    from fxblue_etl_spark.plans.dq import incremental_agg_maintenance

    merged = {
        r["o_orderstatus"]: r for r in incremental_agg_maintenance(spark, sf_dir).collect()
    }
    full = {
        r["o_orderstatus"]: r
        for r in table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100)).cast("long").alias("price_cents"),
        )
        .collect()
    }
    assert set(merged) == set(full)
    for k in full:
        assert merged[k]["n_orders"] == full[k]["n_orders"]
        assert merged[k]["price_cents"] == full[k]["price_cents"]


def test_partitionless_window_detector():
    """The plan_audit global-window parser: partitioned specs pass,
    order-only specs flag, comma-bearing partition expressions
    (round(x, 2)) don't fool the balanced-paren walk."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_audit import _partitionless_windows

    partitioned = (
        "windowspecdefinition(_w0#21, k#3L ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$()))"
    )
    assert _partitionless_windows(partitioned) == []
    global_win = (
        "windowspecdefinition(spend#8L ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$()))"
    )
    assert len(_partitionless_windows(global_win)) == 1
    tricky_partition = (
        "windowspecdefinition(round(x#3, 2), ord#5 DESC NULLS LAST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$()))"
    )
    assert _partitionless_windows(tricky_partition) == []
    assert len(_partitionless_windows(partitioned + " " + global_win)) == 1


def test_rfm_plan_has_no_global_window(spark, sf_dir):
    """Regression guard for the round-4 scale-killer: the rewritten
    rfm_segmentation must never reintroduce a partitionless window
    (the old triple global ntile)."""
    import contextlib
    import io
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_audit import _partitionless_windows

    from fxblue_etl_spark.plans.behavior import rfm_segmentation

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rfm_segmentation(spark, sf_dir).explain("formatted")
    assert _partitionless_windows(buf.getvalue()) == []


def test_global_window_whitelist_names_registered_queries():
    """Every GLOBAL_WINDOW_OK key must be a live queries() entry —
    a rename or removal would otherwise leave a stale whitelist slot
    that could mask a future unbounded window under the old name."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import __spark_entry__ as entrymod
    from plan_audit import GLOBAL_WINDOW_OK

    registered = set(entrymod.queries())
    stale = [k for k in GLOBAL_WINDOW_OK if k not in registered]
    assert stale == []


def test_detector_fires_on_real_global_window_plan(spark, sf_dir):
    """End-to-end: the detector must find the (whitelisted) global
    ntile in equidepth_histogram's REAL physical plan — proving the
    audit would flag an unlisted query with the same shape."""
    import contextlib
    import io
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_audit import GLOBAL_WINDOW_OK, _partitionless_windows

    from fxblue_etl_spark.plans.stats import equidepth_histogram

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        equidepth_histogram(spark, sf_dir).explain("formatted")
    assert len(_partitionless_windows(buf.getvalue())) >= 1
    assert "equidepth_histogram" in GLOBAL_WINDOW_OK
