"""Round-11 additions: mechanism-contract pins (brute-force /
replay) for the operators queued in ``_R12_QUEUE``.  The DuckDB
oracle certifies cross-engine values; these tests certify the
SEMANTICS against independent python replays."""

from __future__ import annotations

from pyspark.sql import functions as F

from fxblue_etl_spark.io import table


def _union_find(edges):
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    comps: dict = {}
    for v in parent:
        comps.setdefault(find(v), set()).add(v)
    return comps


def test_chunk_dedup_rewrite_keeps_one_canonical_chunk_per_component(
    spark, sf_dir
):
    """Full python replay of the SlimPajama rewrite step: union-find
    over the certified chunk near-dup pairs, survivor = the member
    whose parent doc has max q10 (ties → min key), per-doc
    accounting — every output cell must match exactly."""
    from fxblue_etl_spark.operators.dedup import (
        CHUNK_KEY_MOD,
        chunk_dedup_rewrite,
        chunk_lsh_neardup,
        chunk_pseudo_docs,
    )
    from fxblue_etl_spark.operators.textops import quality_score

    pairs = [
        (
            r["doc_a"] * CHUNK_KEY_MOD + r["chunk_a"],
            r["doc_b"] * CHUNK_KEY_MOD + r["chunk_b"],
        )
        for r in chunk_lsh_neardup(spark, sf_dir).collect()
    ]
    assert pairs, "fixture must exercise the rewrite"
    comps = _union_find(pairs)
    q10 = {
        r["doc_id"]: int(round(r["quality_score"] * 10))
        for r in quality_score(spark, sf_dir).collect()
    }
    sizes = {
        r["key"]: r["n"]
        for r in chunk_pseudo_docs(table(spark, sf_dir, "documents"))
        .select("key", F.size("ctoks").alias("n"))
        .collect()
    }
    dropped_keys: set = set()
    for members in comps.values():
        assert len(members) > 1  # components only exist from pairs
        survivor = max(
            members, key=lambda k: (q10[k // CHUNK_KEY_MOD], -k)
        )
        dropped_keys |= members - {survivor}
    # exactly one survivor per component
    assert sum(len(m) for m in comps.values()) - len(comps) == len(
        dropped_keys
    )
    per_doc_all: dict = {}
    for k, n in sizes.items():
        d = per_doc_all.setdefault(k // CHUNK_KEY_MOD, [0, 0])
        d[0] += 1
        d[1] += n
    per_doc_drop: dict = {}
    for k in dropped_keys:
        d = per_doc_drop.setdefault(k // CHUNK_KEY_MOD, [0, 0])
        d[0] += 1
        d[1] += sizes[k]
    expected = {
        doc: (
            per_doc_all[doc][0],
            nd,
            per_doc_all[doc][1],
            td,
            1_000_000 * (per_doc_all[doc][1] - td) // per_doc_all[doc][1],
        )
        for doc, (nd, td) in per_doc_drop.items()
    }
    got = {
        r["doc_id"]: (
            r["n_chunks"],
            r["n_chunks_dropped"],
            r["chunk_toks"],
            r["chunk_toks_dropped"],
            r["keep_ppm"],
        )
        for r in chunk_dedup_rewrite(spark, sf_dir).collect()
    }
    assert got == expected
    # rewrite must actually drop something on the near-dup-rich
    # fixture, and never everything (the survivor stays)
    assert got
    for n_chunks, n_dropped, toks, toks_dropped, keep in got.values():
        # a doc CAN lose every chunk (survivors may all live in other
        # docs), so the bounds are inclusive
        assert 1 <= n_dropped <= n_chunks
        assert 0 < toks_dropped <= toks
        assert 0 <= keep < 1_000_000


def test_streaming_observed_metrics_state_bounds_at_sf01(spark):
    """Round-10 verdict item 8's 'Done' clause: a state-bound
    assertion at sf0.1 — the state-store row total must be bounded by
    the number of distinct event-time windows (state scales with OPEN
    WINDOWS, never with stream length), evictions must account for
    every expired window, and the flush batch must drain all but the
    still-open tail."""
    from fxblue_etl_spark.streaming.pipelines import (
        OBS_WIN_MS,
        streaming_observed_metrics,
    )

    sf01 = "/root/testdata/sf0.1"
    rows = sorted(
        streaming_observed_metrics(spark, sf01).collect(),
        key=lambda r: r["batch_id"],
    )
    ev = table(spark, sf01, "events")
    n_events = ev.count()
    n_windows = ev.select(
        (F.expr("unix_millis(cast(ts as timestamp))") / OBS_WIN_MS)
        .cast("long")
        .alias("w")
    ).distinct().count()
    # conservation: every event enters exactly one micro-batch
    assert sum(r["n_input_rows"] for r in rows) == n_events
    # THE bound: state never exceeds the distinct-window count, at
    # 100x the fixture exactly as at 1x
    for r in rows:
        assert r["state_rows_total"] <= n_windows
    # total evictions + final open state account for every window
    # that ever entered state
    assert (
        sum(r["state_rows_removed"] for r in rows)
        + rows[-1]["state_rows_total"]
        <= n_windows
    )
    # the flush batch drains state down to the un-expirable tail
    # (windows newer than final watermark - one window width)
    assert rows[-1]["n_input_rows"] == 0
    assert rows[-1]["state_rows_total"] <= 2
    # watermark is monotone non-decreasing across batches
    wms = [r["wm_epoch_ms"] for r in rows]
    assert wms == sorted(wms)
