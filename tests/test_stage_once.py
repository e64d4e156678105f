"""stage_once (round-11 advice item 3): the shared staging helper
must publish atomically — readers can only ever observe a missing
dir or a complete one — and must be idempotent, crash-safe, and
race-tolerant."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fxblue_etl_spark.io import stage_once  # noqa: E402


def _build(payload="data"):
    def build(tmp):
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "part-00000"), "w") as f:
            f.write(payload)

    return build


def test_publishes_complete_dir(tmp_path):
    path = str(tmp_path / "t1")
    out = stage_once(path, _build("hello"))
    assert out == path
    assert open(os.path.join(path, "part-00000")).read() == "hello"
    assert os.path.exists(os.path.join(path, "_fxblue_done"))
    # no temp litter
    assert [n for n in os.listdir(tmp_path) if ".tmp." in n] == []


def test_idempotent_second_call_skips_build(tmp_path):
    path = str(tmp_path / "t2")
    stage_once(path, _build("first"))
    calls = []

    def build(tmp):
        calls.append(tmp)

    stage_once(path, build)
    assert calls == []
    assert open(os.path.join(path, "part-00000")).read() == "first"


def test_crashed_build_leaves_no_published_dir(tmp_path):
    path = str(tmp_path / "t3")

    def failing(tmp):
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "part-00000"), "w") as f:
            f.write("partial")
        raise RuntimeError("spark died")

    with pytest.raises(RuntimeError):
        stage_once(path, failing)
    # the reader-visible path never appeared, temp dir cleaned up
    assert not os.path.exists(path)
    assert [n for n in os.listdir(tmp_path) if ".tmp." in n] == []


def test_stale_partial_dir_is_replaced(tmp_path):
    """A pre-helper crash left payload WITHOUT a marker: the next
    stage replaces it atomically."""
    path = str(tmp_path / "t4")
    os.makedirs(path)
    with open(os.path.join(path, "part-00000"), "w") as f:
        f.write("stale-partial")  # no _fxblue_done
    stage_once(path, _build("fresh"))
    assert open(os.path.join(path, "part-00000")).read() == "fresh"
    assert os.path.exists(os.path.join(path, "_fxblue_done"))


def test_lost_race_returns_winner(tmp_path):
    """If a concurrent session publishes while we build, our rename
    fails, we discard our temp dir, and the winner's dir survives."""
    path = str(tmp_path / "t5")

    def racing_build(tmp):
        _build("loser")(tmp)
        # simulate the other session winning mid-build
        stage_once(path, _build("winner"))

    out = stage_once(path, racing_build)
    assert out == path
    assert open(os.path.join(path, "part-00000")).read() == "winner"
    assert [n for n in os.listdir(tmp_path) if ".tmp." in n] == []
