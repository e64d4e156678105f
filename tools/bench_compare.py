"""Taint-aware bench comparison: per-query deltas between two
BENCH_r*.json records, with load contamination surfaced instead of
manually adjudicated (rounds 6-8 each spent verdict time separating
co-tenant waves from real regressions — this prints the separation).

A delta only counts as SIGNAL when NEITHER side's measurement was
load-tainted; tainted sides are marked so a "regression" whose hot
side ran under a co-tenant wave reads as noise at a glance.  Records
older than round 8 carry no load_tainted field — their per-query
loads (query_loads, round 7+) are thresholded here with the same
default the bench uses.

Usage:
    python tools/bench_compare.py BENCH_r07.json BENCH_r08.json
    python tools/bench_compare.py old.json new.json --threshold 0.15
"""

from __future__ import annotations

import json
import sys

#: mirror of bench.TAINT_LOAD's default for records predating the field
_TAINT_LOAD = 8.0

#: relative delta below which a difference is reported as flat
_FLAT = 0.10


def _load(path: str) -> dict:
    d = json.load(open(path))
    # driver records wrap the JSON line; `parsed` can be present but
    # null (observed BENCH_r08), in which case try to recover the
    # line from the `tail` capture before falling back to the wrapper
    inner = d.get("parsed")
    if inner is None and isinstance(d.get("tail"), str):
        t = d["tail"]
        start = t.find('{"metric"')
        if start >= 0:
            try:
                inner = json.loads(t[start:])
            except ValueError:
                inner = None
    d = inner if isinstance(inner, dict) else d
    qs = d.get("queries", {})
    tainted = set(d.get("load_tainted") or [])
    if not tainted:  # pre-round-8 record: derive from query_loads
        tainted = {
            k
            for k, load in (d.get("query_loads") or {}).items()
            if load >= _TAINT_LOAD
        }
    return {"queries": qs, "tainted": tainted, "meta": d}


def main() -> int:
    # accept both `--threshold=0.15` and `--threshold 0.15` (round-8
    # advice: the space-separated form documented in the usage line
    # was previously mis-parsed as a positional argument)
    argv = sys.argv[1:]
    args: list[str] = []
    threshold = _FLAT
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                threshold = float(a.split("=", 1)[1])
            elif i + 1 < len(argv):
                i += 1
                threshold = float(argv[i])
            else:
                print(__doc__)
                return 2
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = _load(args[0]), _load(args[1])
    rows = []
    for name, t_new in new["queries"].items():
        t_old = old["queries"].get(name)
        if t_old is None:
            rows.append((name, t_old, t_new, None, "NEW"))
            continue
        rel = (t_new - t_old) / t_old if t_old else 0.0
        dirty = []
        if name in old["tainted"]:
            dirty.append("old-tainted")
        if name in new["tainted"]:
            dirty.append("new-tainted")
        if dirty:
            verdict = "NOISE? (" + ",".join(dirty) + ")"
        elif abs(rel) < threshold:
            verdict = "flat"
        elif rel > 0:
            verdict = "REGRESSION"
        else:
            verdict = "improvement"
        rows.append((name, t_old, t_new, rel, verdict))
    rows.sort(key=lambda r: -(abs(r[3]) if r[3] is not None else 0))
    signal = [r for r in rows if r[4] in ("REGRESSION", "improvement")]
    print(f"# {args[0]} -> {args[1]}  (threshold {threshold:.0%})")
    for name, t_old, t_new, rel, verdict in rows:
        o = f"{t_old:.3f}" if t_old is not None else "  -  "
        r = f"{rel:+.0%}" if rel is not None else "  "
        print(f"{o} -> {t_new:.3f}  {r:>6}  {verdict:<28} {name}")
    n_reg = sum(1 for r in signal if r[4] == "REGRESSION")
    print(
        f"# clean-signal deltas: {len(signal)}"
        f" ({n_reg} regressions); everything marked NOISE? needs a"
        " gated re-draw before it means anything"
    )
    for k in ("frozen15_total", "frozen27_total"):
        a, b = old["meta"].get(k), new["meta"].get(k)
        if a is not None and b is not None:
            print(f"# {k}: {a} -> {b}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
