"""Corpus-management operators: split/sample/pack/prune semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from fxblue_etl_spark.io import table
from fxblue_etl_spark.operators.corpusops import (
    PACK_BUDGET,
    SAMPLE_RATES,
    corpus_split,
    df_prune,
    sequence_pack,
    stratified_sample,
)


def test_split_is_exhaustive_and_deterministic(spark, sf_dir):
    out = corpus_split(spark, sf_dir)
    total = out.agg(F.sum("n_docs")).first()[0]
    n_docs = table(spark, sf_dir, "documents").count()
    assert total == n_docs
    splits = {r["split"] for r in out.collect()}
    assert splits <= {"train", "val", "test"}
    # deterministic: a re-run yields identical rows
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, corpus_split(spark, sf_dir).collect()))
    assert a == b
    # roughly 80/10/10 overall
    by_split = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.sum("n_docs").alias("n")).collect()
    }
    assert by_split["train"] > by_split.get("val", 0)
    assert by_split["train"] > by_split.get("test", 0)


def test_stratified_sample_rates(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    samp = stratified_sample(spark, sf_dir)
    tot = {r["lang"]: r["count"] for r in d.groupBy("lang").count().collect()}
    got = {r["lang"]: r["count"] for r in samp.groupBy("lang").count().collect()}
    for lang, n in tot.items():
        rate = SAMPLE_RATES[lang] / 1000
        # loose binomial bound on the fixture sizes
        assert got.get(lang, 0) <= n
        assert abs(got.get(lang, 0) - rate * n) < 0.2 * n + 10
    # membership is a pure function of doc_id: sample ⊆ corpus, stable
    again = stratified_sample(spark, sf_dir)
    assert sorted(r["doc_id"] for r in samp.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_sequence_pack_bins_contiguous(spark, sf_dir):
    df = sequence_pack(spark, sf_dir)
    out = df.collect()
    by_stream: dict[tuple, list] = {}
    for r in out:
        by_stream.setdefault((r["lang"], r["pack_bucket"]), []).append(r)
    for (lang, bucket), rows in by_stream.items():
        rows.sort(key=lambda r: r["bin"])
        # bins are dense from 0 and doc ranges don't overlap within a
        # (lang, bucket) sub-stream
        assert rows[0]["bin"] == 0
        assert [r["bin"] for r in rows] == list(range(len(rows)))
        for a, b in zip(rows, rows[1:]):
            assert a["last_doc"] < b["first_doc"]
        # every bin but the last was closed because it crossed budget:
        # bin_tokens >= budget - (docs can straddle the boundary) means
        # cumulative start of next bin >= its index * budget
        cum = 0
        for r in rows[:-1]:
            cum += r["bin_tokens"]
            assert cum >= (r["bin"] + 1) * PACK_BUDGET
    # the scale property the bucketing exists for: more than one
    # packing task per language (one window task per (lang, bucket)),
    # and the window shuffle keyed by both columns
    langs = {lang for lang, _ in by_stream}
    for lang in langs:
        assert len({b for l, b in by_stream if l == lang}) > 1, lang
    plan = df._jdf.queryExecution().executedPlan().toString()
    widx = plan.index("Window")
    assert "pack_bucket" in plan[widx : widx + 400]


def test_df_prune_preserves_order_and_multiplicity(spark, sf_dir):
    out = df_prune(spark, sf_dir)
    rows = out.collect()
    d = {r["doc_id"]: r for r in rows}
    docs = table(spark, sf_dir, "documents").count()
    assert len(rows) == docs
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_tokens"]
    # at least one doc keeps something or drops something (non-degenerate)
    assert any(r["n_dropped"] > 0 for r in rows)
    # recompute one doc by hand
    doc = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == rows[0]["doc_id"])
        .first()
    )
    toks = [t for t in doc["text"].strip().split() if t]
    assert len(toks) == d[doc["doc_id"]]["n_tokens"]


def test_temperature_resample_downsamples_head(spark, sf_dir):
    from fxblue_etl_spark.operators.corpusops import temperature_resample

    rows = {r["lang"]: r for r in temperature_resample(spark, sf_dir).collect()}
    head = max(rows.values(), key=lambda r: r["n_in"])
    tail = min(rows.values(), key=lambda r: r["n_in"])
    # head language gets a strictly lower keep rate than the tail
    assert head["p_ppm"] < tail["p_ppm"]
    for r in rows.values():
        assert 0 < r["p_ppm"] <= 1_000_000
        assert r["n_sampled"] <= r["n_in"]
    # sampling actually removed something from the head language
    assert head["n_sampled"] < head["n_in"]


def test_mixture_allocation_sums_to_budget(spark, sf_dir):
    from fxblue_etl_spark.operators.corpusops import MIX_BUDGET, mixture_allocation

    rows = mixture_allocation(spark, sf_dir).collect()
    assert rows
    assert sum(r["final_quota"] for r in rows) == MIX_BUDGET
    for r in rows:
        assert r["extra"] in (0, 1)
        assert r["final_quota"] in (r["base_quota"], r["base_quota"] + 1)


def test_hierarchical_mixture_conserves_quotas(spark, sf_dir):
    from collections import defaultdict

    from fxblue_etl_spark.operators.corpusops import MIX_BUDGET, hierarchical_mixture

    rows = hierarchical_mixture(spark, sf_dir).collect()
    per_lang = defaultdict(int)
    lang_quota = {}
    for r in rows:
        per_lang[r["lang"]] += r["src_quota"]
        lang_quota[r["lang"]] = r["lang_quota"]
    # per-source quotas sum exactly to their language quota...
    for lang, total in per_lang.items():
        assert total == lang_quota[lang], lang
    # ...and language quotas sum exactly to the budget
    assert sum(lang_quota.values()) == MIX_BUDGET


def test_waterfill_saturates_small_sources_and_sums_to_budget(spark, sf_dir):
    """Drive the shared fill SQL on synthetic skewed caps: small
    sources saturate at their cap, the rest share one water level
    (±1 for the remainder), and Σ alloc == budget exactly.  Then the
    fixture-backed operator must satisfy the same invariants."""
    from fxblue_etl_spark.operators.corpusops import (
        WATERFILL_BUDGET_PPM,
        WATERFILL_FILL_SQL,
        capped_waterfill_allocation,
    )

    caps = [("tiny", 10), ("small", 50), ("mid", 400), ("big", 4000), ("huge", 40000)]
    spark.createDataFrame(caps, "source string, cap long").createOrReplaceTempView(
        "wf_caps"
    )
    rows = {r["source"]: r for r in spark.sql(WATERFILL_FILL_SQL).collect()}
    total = sum(c for _, c in caps)
    budget = (WATERFILL_BUDGET_PPM * total) // 1_000_000
    assert sum(r["alloc"] for r in rows.values()) == budget
    for s, cap in caps:
        assert rows[s]["alloc"] <= cap
    # water level = (22230 − 4460)/1 = 17770: everything but `huge`
    # sits below it and saturates at its own cap
    assert rows["tiny"]["alloc"] == 10
    assert rows["small"]["alloc"] == 50
    assert rows["mid"]["alloc"] == 400
    assert rows["big"]["alloc"] == 4000
    assert rows["huge"]["alloc"] == budget - 4460

    # fixture-backed operator: same conservation + cap invariants
    out = capped_waterfill_allocation(spark, sf_dir).collect()
    t = sum(r["cap"] for r in out)
    b = (WATERFILL_BUDGET_PPM * t) // 1_000_000
    assert sum(r["alloc"] for r in out) == b
    assert all(r["alloc"] <= r["cap"] for r in out)
