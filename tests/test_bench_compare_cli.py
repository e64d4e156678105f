"""CLI contract for tools/bench_compare.py (round-8 advice, low):
the documented space-separated `--threshold 0.15` form must parse —
previously the value leaked into the positional args and triggered
the usage error while `--threshold=` was silently the only form."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import bench_compare


def _write(tmp_path: Path, name: str, queries: dict) -> str:
    p = tmp_path / name
    p.write_text(json.dumps({"queries": queries, "load_tainted": []}))
    return str(p)


def _run(argv: list[str], capsys) -> tuple[int, str]:
    old = sys.argv
    sys.argv = ["bench_compare.py"] + argv
    try:
        rc = bench_compare.main()
    finally:
        sys.argv = old
    return rc, capsys.readouterr().out


def test_threshold_space_separated(tmp_path, capsys):
    a = _write(tmp_path, "a.json", {"q": 1.0})
    b = _write(tmp_path, "b.json", {"q": 1.12})
    rc, out = _run([a, b, "--threshold", "0.15"], capsys)
    assert rc == 0
    assert "threshold 15%" in out
    assert "flat" in out  # +12% < 15% -> flat, not REGRESSION


def test_threshold_equals_form_still_works(tmp_path, capsys):
    a = _write(tmp_path, "a.json", {"q": 1.0})
    b = _write(tmp_path, "b.json", {"q": 1.12})
    rc, out = _run([a, b, "--threshold=0.10"], capsys)
    assert rc == 0
    assert "REGRESSION" in out  # +12% > 10%


def test_bare_threshold_is_usage_error(tmp_path, capsys):
    a = _write(tmp_path, "a.json", {"q": 1.0})
    b = _write(tmp_path, "b.json", {"q": 1.0})
    rc, _ = _run([a, b, "--threshold"], capsys)
    assert rc == 2
