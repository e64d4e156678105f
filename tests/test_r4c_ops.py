"""Round-4 third-wave operators: boolean retrieval census, split
centroid drift, join-skew report. Oracle parity is the gate's job;
these pin the arithmetic against pure-Python recomputes."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from fxblue_etl_spark.operators.ml import split_centroid_drift
from fxblue_etl_spark.operators.retrieval import (
    BOOL_TERMS,
    boolean_retrieval_census,
)
from fxblue_etl_spark.operators.skew import SKEW_KEYS, join_skew_report


def test_boolean_census_matches_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    flags = {
        r["doc_id"]: tuple(t in set(r["text"].split()) for t in BOOL_TERMS)
        for r in docs
    }
    t0, t1, t2 = BOOL_TERMS
    preds = {
        f"{t0}_and_{t1}": lambda f: f[0] and f[1],
        f"{t0}_or_{t1}": lambda f: f[0] or f[1],
        f"{t0}_and_not_{t2}": lambda f: f[0] and not f[2],
        "all_three": lambda f: f[0] and f[1] and f[2],
    }
    rows = {r["expr"]: r for r in boolean_retrieval_census(spark, sf_dir).collect()}
    assert set(rows) == set(preds)
    for name, pred in preds.items():
        hits = [d for d, f in flags.items() if pred(f)]
        r = rows[name]
        assert r["n_docs"] == len(hits)
        if hits:
            assert (r["min_doc"], r["max_doc"]) == (min(hits), max(hits))
            assert r["doc_id_checksum"] == sum(hits)


def _split_of(vec_id: int) -> str:
    h = hashlib.md5(f"split|{vec_id}".encode()).hexdigest()
    b = int(h[:8], 16) % 100
    return "train" if b < 80 else ("val" if b < 90 else "test")


def test_split_drift_matches_python(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    import math

    sums = defaultdict(lambda: defaultdict(int))
    counts = Counter()
    for r in emb:
        s = _split_of(r["vec_id"])
        if s == "val":
            continue
        counts[(r["label"], s)] += 1
        for i, x in enumerate(r["embedding"]):
            sums[(r["label"], s)][i] += math.floor(float(x) * 1e5)
    rows = split_centroid_drift(spark, sf_dir).collect()
    for r in rows:
        nt, ne = counts[(r["label"], "train")], counts[(r["label"], "test")]
        assert (r["n_train"], r["n_test"]) == (nt, ne)
        def tdiv(a, b):
            # SQL integral DIV truncates toward zero; Python // floors
            q = abs(a) // abs(b)
            return q if (a >= 0) == (b >= 0) else -q

        drift = 0
        for i in sums[(r["label"], "train")]:
            mt = tdiv(10**6 * sums[(r["label"], "train")][i], nt)
            me = tdiv(10**6 * sums[(r["label"], "test")][i], ne)
            drift += (mt - me) ** 2
        assert int(r["drift_sq_e12"]) == drift


def test_join_skew_report_matches_python(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(*SKEW_KEYS).collect()
    rows = {r["key_col"]: r for r in join_skew_report(spark, sf_dir).collect()}
    assert set(rows) == set(SKEW_KEYS)
    for k in SKEW_KEYS:
        per = Counter(r[k] for r in li)
        r = rows[k]
        assert r["n_keys"] == len(per)
        assert r["n_rows"] == sum(per.values())
        assert r["max_rows"] == max(per.values())
        # percentile_disc(0.99): smallest value with cume_dist >= 0.99
        vals = sorted(per.values())
        import math

        idx = math.ceil(0.99 * len(vals)) - 1
        assert r["p99_rows"] == vals[idx]
        assert r["mean_rows_ppm"] == (10**6 * r["n_rows"]) // r["n_keys"]
        assert (
            r["skew_ratio_ppm"]
            == (10**6 * r["max_rows"] * r["n_keys"]) // r["n_rows"]
        )


def test_incremental_join_equals_recompute(spark, sf_dir):
    """Maintenance must be indistinguishable from recompute."""
    from pyspark.sql import functions as F

    from fxblue_etl_spark.plans.dq import incremental_join_maintenance

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    direct = {
        r["c_nationkey"]: r
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100)).alias("price_cents"),
            F.sum("o_orderkey").alias("orderkey_checksum"),
        )
        .collect()
    }
    rows = incremental_join_maintenance(spark, sf_dir).collect()
    assert len(rows) == len(direct)
    for r in rows:
        d = direct[r["c_nationkey"]]
        assert (r["n_orders"], r["price_cents"], r["orderkey_checksum"]) == (
            d["n_orders"], d["price_cents"], d["orderkey_checksum"]
        )


def test_knn_graph_structure(spark, sf_dir):
    """Structural contracts of the blocked kNN-graph build."""
    from fxblue_etl_spark.operators.ml import KNN_GRAPH_K, knn_graph_build

    rows = knn_graph_build(spark, sf_dir).collect()
    assert rows, "graph must be non-empty"
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    total_nodes = sum(r["n_nodes"] for r in rows)
    # every vector in a cluster of size >= 2 gets edges; singleton
    # clusters contribute none
    assert total_nodes <= n_vecs
    for r in rows:
        assert 1 <= r["n_edges"] <= KNN_GRAPH_K * r["n_nodes"]
        # mutual edges are directed counts of symmetric pairs -> even
        assert r["n_mutual"] % 2 == 0
        assert 0 <= r["n_mutual"] <= r["n_edges"]
        assert r["qdot_max"] <= 127 * 127 * 64


def test_catalog_manifest_covers_every_table(spark, sf_dir):
    from fxblue_etl_spark.plans.profiling import (
        CATALOG_KEYS,
        catalog_snapshot_manifest,
    )

    rows = {r["table_name"]: r for r in catalog_snapshot_manifest(spark, sf_dir).collect()}
    assert set(rows) == set(CATALOG_KEYS)
    for name, key in CATALOG_KEYS.items():
        t = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        r = rows[name]
        assert r["n_rows"] == t.count()
        keys = [x[0] for x in t.select(key).collect()]
        assert (r["key_min"], r["key_max"], int(r["key_sum"])) == (
            min(keys), max(keys), sum(keys)
        )


def test_join_cardinality_estimate_contract(spark, sf_dir):
    from fxblue_etl_spark.plans.profiling import join_cardinality_estimate

    rows = {r["join_pair"]: r for r in join_cardinality_estimate(spark, sf_dir).collect()}
    assert set(rows) == {"orders_customer", "lineitem_orders"}
    for r in rows.values():
        assert r["est_rows"] == (r["n_l"] * r["n_r"]) // r["ndv_max"]
        assert r["actual_rows"] > 0
    # PK-FK joins where every fact row matches: estimate is exact
    # whenever ndv of the FK side equals the dim key count; at worst
    # the System-R estimate cannot exceed the fact side here
    lo = rows["lineitem_orders"]
    assert lo["actual_rows"] == lo["n_l"]
