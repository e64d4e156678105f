"""The scan_sweep --gate rule itself: a non-whitelisted corpus-table
scan count above DEFAULT_MAX must violate; whitelisted shapes and
config-table fan-outs must not.  (The full sweep builds 282 plans —
too slow for the suite — so the rule is tested as a pure function;
a stale-whitelist entry is also rejected here.)"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from scan_sweep import DEFAULT_MAX, GATE_WHITELIST, gate_violations


def test_unlisted_corpus_multiscan_violates():
    rows = [("new_query", 5, {"documents": 5}, True)]
    assert gate_violations(rows) == [("new_query", 5, DEFAULT_MAX)]


def test_whitelisted_shape_passes_at_its_cap():
    name, cap = next(iter(GATE_WHITELIST.items()))
    rows = [(name, cap, {"orders": cap}, True)]
    assert gate_violations(rows) == []
    rows = [(name, cap + 1, {"orders": cap + 1}, True)]
    assert gate_violations(rows) == [(name, cap + 1, cap)]


def test_config_table_fanout_ignored():
    rows = [("dim_heavy", 9, {"nation": 9}, False)]
    assert gate_violations(rows) == []


def test_whitelist_entries_all_above_default():
    """A whitelist entry at or below DEFAULT_MAX is stale — the query
    no longer needs a waiver and the entry should be deleted."""
    for name, cap in GATE_WHITELIST.items():
        assert cap > DEFAULT_MAX, f"stale whitelist entry: {name} ({cap})"
