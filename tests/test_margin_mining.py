"""margin_bitext_mine re-derived from first principles: exhaustive
NumPy margins on the fixture slice must reproduce the Spark plan's
top-1 matches bit-for-bit, and the blocked variant must equal the
exact algebra restricted to its sign-bucket candidate set — so the
integer-grid margin rule (floor(cos·1e6) → k-NN sums → ratio ppm) is
pinned by something other than the DuckDB restatement of the same
plan."""

from __future__ import annotations

import numpy as np

from fxblue_etl_spark.io import table
from fxblue_etl_spark.operators.similarity import (
    MARGIN_K,
    MARGIN_KEEP_PPM,
    margin_bitext_mine,
    margin_bitext_mine_blocked,
)


def _seq_dot(a, b):
    """Strictly LEFT-TO-RIGHT float64 dot product (cumsum prefix
    order) — Spark's ``F.aggregate`` fold adds sequentially, and a
    pairwise-summed numpy dot can differ in the last ulp, which
    matters under floor(·1e6) at grid boundaries."""
    return np.cumsum(a * b, axis=-1)[..., -1]


def _numpy_margins(ids_a, va, ids_b, vb, cand_mask=None):
    """Exhaustive reference implementation: returns {src_id:
    (matched_id, sim_e6, margin_ppm, keep)} over the allowed
    candidate pairs (cand_mask[i, j] False = pair not generated)."""
    # cos = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))), every dot
    # sequential — the operator's exact float recipe
    num = _seq_dot(va[:, None, :], vb[None, :, :])
    den = np.sqrt(_seq_dot(va, va))[:, None] * np.sqrt(_seq_dot(vb, vb))[None, :]
    s6 = np.floor(num / den * 1e6).astype(np.int64)
    allowed = (
        np.ones_like(s6, dtype=bool) if cand_mask is None else cand_mask
    )
    NEG = np.iinfo(np.int64).min

    def ksum(scores, axis_ids, axis):
        # top-K by (s6 desc, other-side id asc): sort on s6 breaking
        # ties toward the SMALLER id, exactly the plan's window order
        out = {}
        n = scores.shape[axis]
        for i in range(n):
            row = scores[i, :] if axis == 0 else scores[:, i]
            ok = allowed[i, :] if axis == 0 else allowed[:, i]
            ids = axis_ids
            pairs = [(row[j], ids[j]) for j in range(len(ids)) if ok[j]]
            pairs.sort(key=lambda t: (-t[0], t[1]))
            if pairs:
                out[i] = sum(s for s, _ in pairs[:MARGIN_K])
        return out

    ka = ksum(s6, ids_b, axis=0)
    kb = ksum(s6, ids_a, axis=1)
    result = {}
    for i, a_id in enumerate(ids_a):
        best = None
        for j, b_id in enumerate(ids_b):
            if not allowed[i, j]:
                continue
            denom = ka[i] + kb[j]
            # Spark `div` / DuckDB `//` truncate toward zero
            m = int(
                np.int64(1_000_000) * np.int64(2 * MARGIN_K) * s6[i, j]
            )
            m = int(np.trunc(m / denom)) if denom else None
            if m is None:
                continue
            key = (-m, b_id)
            if best is None or key < best[0]:
                best = (key, b_id, int(s6[i, j]), m)
        if best is not None:
            _, b_id, se6, m = best
            result[int(a_id)] = (int(b_id), se6, m, m >= MARGIN_KEEP_PPM)
    return result


def _load_sides(spark, sf_dir):
    rows = (
        table(spark, sf_dir, "embeddings")
        .filter("vec_id % 4 <= 1")
        .select("vec_id", "embedding")
        .collect()
    )
    a = [(r["vec_id"], r["embedding"]) for r in rows if r["vec_id"] % 4 == 0]
    b = [(r["vec_id"], r["embedding"]) for r in rows if r["vec_id"] % 4 == 1]
    ids_a = np.array([i for i, _ in a])
    va = np.array([v for _, v in a], dtype=np.float64)
    ids_b = np.array([i for i, _ in b])
    vb = np.array([v for _, v in b], dtype=np.float64)
    return ids_a, va, ids_b, vb


def test_exact_miner_matches_numpy(spark, sf_dir):
    ids_a, va, ids_b, vb = _load_sides(spark, sf_dir)
    want = _numpy_margins(ids_a, va, ids_b, vb)
    got = {
        r["src_id"]: (
            r["matched_id"],
            r["sim_e6"],
            r["margin_ppm"],
            r["keep"],
        )
        for r in margin_bitext_mine(spark, sf_dir).collect()
    }
    assert got == want


def test_blocked_miner_is_exact_algebra_on_blocked_candidates(
    spark, sf_dir
):
    ids_a, va, ids_b, vb = _load_sides(spark, sf_dir)

    def bucket(v):
        return "".join("1" if x >= 0 else "0" for x in v[:8])

    ba = np.array([bucket(v) for v in va])
    bb = np.array([bucket(v) for v in vb])
    mask = ba[:, None] == bb[None, :]
    want = _numpy_margins(ids_a, va, ids_b, vb, cand_mask=mask)
    got = {
        r["src_id"]: (
            r["matched_id"],
            r["sim_e6"],
            r["margin_ppm"],
            r["keep"],
        )
        for r in margin_bitext_mine_blocked(spark, sf_dir).collect()
    }
    assert got == want
    # the blocked set must be a strict restriction on this fixture:
    # some sources lose their bucket-less mate, none gain one
    exact_ids = set(_numpy_margins(ids_a, va, ids_b, vb))
    assert set(got) <= exact_ids and len(got) < len(exact_ids)
