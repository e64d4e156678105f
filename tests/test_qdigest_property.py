"""Hypothesis properties for the q-digest compression kernel
(`plans.stats._qdigest_compress` — pure numpy, no Spark needed, so
the search is cheap): over random multisets the compressed digest
must conserve mass, stay sketch-sized, keep every node's count ≤ the
merge threshold unless it is an uncompressed leaf-path survivor, and
answer every quantile within the L·T rank-error bound."""

from __future__ import annotations

import bisect

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from fxblue_etl_spark.plans.stats import QD_DOM, QD_K, QD_L, _qdigest_compress

values = st.lists(
    st.integers(min_value=0, max_value=QD_DOM - 1),
    min_size=1,
    max_size=400,
)


def _digest(vals):
    leaf = {}
    for v in vals:
        leaf[QD_DOM + v] = leaf.get(QD_DOM + v, 0) + 1
    pdf = pd.DataFrame({"id": list(leaf), "cnt": list(leaf.values())})
    return _qdigest_compress(pdf)


@given(values)
@settings(max_examples=150, deadline=None)
def test_mass_conserved_and_sketch_sized(vals):
    out = _digest(vals)
    n = len(vals)
    t = max(1, n // QD_K)
    assert int(out["cnt"].sum()) == n
    assert len(out) <= len(set(vals)) + QD_L  # never larger than leaves+path
    # every node id is a valid tree node: 1 ≤ id < 2^(L+1)
    assert out["id"].between(1, (QD_DOM << 1) - 1).all()
    # merged (non-leaf) nodes obey the threshold by construction
    internal = out[out["id"] < QD_DOM]
    assert (internal["cnt"] <= t).all()


@given(values, st.sampled_from([250000, 500000, 750000, 950000]))
@settings(max_examples=150, deadline=None)
def test_quantile_rank_error_bounded(vals, q_ppm):
    out = _digest(vals)
    n = len(vals)
    t = max(1, n // QD_K)
    # extraction exactly as the certified query: sort by (hi, lo, id),
    # cumulative count, min hi among nodes reaching the target rank
    rows = []
    for node_id, cnt in zip(out["id"], out["cnt"]):
        lvl = node_id.bit_length() - 1
        lo = (int(node_id) - (1 << lvl)) << (QD_L - lvl)
        hi = lo + (1 << (QD_L - lvl)) - 1
        rows.append((hi, lo, int(node_id), int(cnt)))
    rows.sort()
    target = (q_ppm * n + 999999) // 1000000
    cum = 0
    est = None
    for hi, lo, _id, cnt in rows:
        cum += cnt
        if cum >= target:
            est = hi
            break
    assert est is not None
    grid = sorted(vals)
    cdf_est = bisect.bisect_right(grid, est)
    assert cdf_est >= target
    # overshoot bound: the chosen node's own count plus straddling
    # ancestors (≤ T each across ≤ L levels)
    max_mult = max(grid.count(v) for v in set(grid)) if grid else 0
    assert cdf_est <= target - 1 + max(t, max_mult) + QD_L * t
