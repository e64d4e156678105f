"""10× duplication growth probes for the round-13 additions — the
same posture as ``stress_r12.py`` (see its docstring): 1× vs 10×
duplicated sf0.1, time exponent e = log10(t10/t1), output growth.

Usage: python tools/stress_r13.py [query ...]
Writes detail to /tmp/stress_r13.json.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools import stress_r12

DEFAULT = [
    # pair/graph-shaped first
    "fastss_editdist1_pairs",
    "lsh_s_curve_planner",
    "jitter_dedup_events",
    "incremental_session_maintenance",
    # folds / stats / economics
    "ewma_control_chart",
    "mann_kendall_trend",
    "twap_by_event_type",
    "gapfill_linear_interp",
    "classifier_agreement_kappa",
    "mixture_temperature_weights",
    "source_ablation_report",
    "linkage_threshold_sensitivity",
    "golden_record_survivorship",
    # sketch / streaming maintenance
    "streaming_hll_maintenance",
    "streaming_cms_maintenance",
    "streaming_ewma_monitor",
    "streaming_jitter_dedup",
]

if __name__ == "__main__":
    sys.argv = [sys.argv[0]] + (sys.argv[1:] or DEFAULT)
    # reuse the r12 harness wholesale; only the query list and the
    # detail-output path differ (round-13 advice item 4: an r13 run
    # must not clobber the r12 record)
    stress_r12.OUT = Path("/tmp/stress_r13.json")
    stress_r12.main()
