"""bench.py's load-aware start gate (round-5 verdict item 4): the
harness must wait for a quiet host, give up after the bounded budget
with an explicit waiver, and let the env knobs disable it — all
checked here with a scripted ``os.getloadavg`` so no real waiting or
load generation is involved."""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def _scripted_loads(monkeypatch, values):
    it = iter(values)
    last = values[-1]
    monkeypatch.setattr(
        bench.os, "getloadavg", lambda: (next(it, last), 0.0, 0.0)
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)


def test_quiet_host_passes_immediately(monkeypatch):
    _scripted_loads(monkeypatch, [0.5])
    load, waiver = bench._wait_for_quiet_host()
    assert load == 0.5 and waiver is None


def test_busy_host_waits_until_quiet(monkeypatch):
    _scripted_loads(monkeypatch, [9.0, 8.0, 1.2])
    load, waiver = bench._wait_for_quiet_host()
    assert load == 1.2 and waiver is None


def test_never_quiet_host_gets_waiver(monkeypatch):
    monkeypatch.setattr(bench, "LOAD_WAIT_MAX_S", 0.0)
    _scripted_loads(monkeypatch, [9.0])
    load, waiver = bench._wait_for_quiet_host()
    assert load == 9.0
    assert waiver is not None and waiver >= 0


def test_gate_disabled_by_env(monkeypatch):
    monkeypatch.setattr(bench, "MAX_START_LOAD", 0.0)  # <=0 disables
    _scripted_loads(monkeypatch, [99.0])
    load, waiver = bench._wait_for_quiet_host()
    assert load == 99.0 and waiver is None


def test_env_knobs_parse(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MAX_LOAD", "7.5")
    monkeypatch.setenv("SPARK_GRAFT_LOAD_WAIT_MAX_S", "42")
    importlib.reload(bench)
    try:
        assert bench.MAX_START_LOAD == 7.5
        assert bench.LOAD_WAIT_MAX_S == 42.0
    finally:
        monkeypatch.delenv("SPARK_GRAFT_MAX_LOAD")
        monkeypatch.delenv("SPARK_GRAFT_LOAD_WAIT_MAX_S")
        importlib.reload(bench)
