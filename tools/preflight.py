"""One-command pre-flight: everything that must be green before a
commit claims driver-readiness.

Chains the repo's local gates and exits nonzero on ANY failure:

1. ``tools/verify_local.py`` over the full oracle surface (itself
   driver-faithful since round 4: pandas fetch on both sides, HUGEINT/
   list/struct pre-flight, int-vs-float64 drift detection) — catches
   VALUE_MISMATCH / SCHEMA_MISMATCH / ROWCOUNT_MISMATCH / TYPE_HAZARD.
2. ``tools/plan_audit.py --all`` — catches CartesianProduct (hard
   fail) and reports review-level nodes (BroadcastNestedLoopJoin /
   BatchEvalPython / single-partition windows).
3. Oracle syntax sweep: every oracle EXPLAIN-binds in DuckDB (cheap,
   already part of verify_local's execution, kept as a fast first
   fence so a syntax error fails in seconds, not after the Spark run).
4. ``tools/scan_sweep.py --gate`` (full-surface runs only) — fails on
   any query whose plan scans a corpus-sized table past its reviewed
   whitelist cap.

Usage:
    python tools/preflight.py [sf_dir]          # full surface (~12 min:
                                                # ~5m verify, ~4m audit,
                                                # ~2m scan gate)
    python tools/preflight.py [sf_dir] q1 q2 …  # subset (verify+audit)

Round-3 postmortem: the builder ran these gates piecemeal and shipped
two "locally green" fixes the driver rejected.  One command = one
definition of "locally green".
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(label: str, cmd: list[str]) -> int:
    print(f"\n=== preflight: {label} ===", flush=True)
    t0 = time.time()
    rc = subprocess.call(cmd, cwd=REPO)
    print(f"=== {label}: {'OK' if rc == 0 else f'FAIL rc={rc}'} "
          f"({time.time() - t0:.0f}s) ===", flush=True)
    return rc


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    subset = sys.argv[2:]

    py = sys.executable
    failures = 0

    # fast fence first: oracle syntax + type sweep (seconds)
    failures += run(
        "oracle syntax sweep",
        [py, "-m", "pytest", "tests/test_oracle_syntax.py", "-x", "-q"],
    ) != 0

    failures += run(
        "oracle correctness gate (verify_local)",
        [py, str(REPO / "tools" / "verify_local.py"), sf_dir, *subset],
    ) != 0

    audit_cmd = [py, str(REPO / "tools" / "plan_audit.py")]
    if subset:
        audit_cmd += [sf_dir, *subset]
    else:
        audit_cmd += ["/root/testdata/sf0.001", "--all"]
    failures += run("plan audit", audit_cmd) != 0

    # scan-count gate: a new multi-consumer shape re-scanning a
    # corpus-sized table fails HERE, not as a silent 100 TB cost.
    # Full-surface only (the whitelist is keyed by query name; a
    # subset run would just re-audit the same plans verify built).
    if not subset:
        failures += run(
            "scan-count gate (scan_sweep --gate)",
            [py, str(REPO / "tools" / "scan_sweep.py"), "--gate"],
        ) != 0

    print(f"\npreflight: {'CLEAN' if not failures else f'{failures} gate(s) FAILED'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
