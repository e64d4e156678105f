"""10× duplication growth probes for the round-14 additions — the
same posture as ``stress_r12.py`` (see its docstring): 1× vs 10×
duplicated sf0.1, time exponent e = log10(t10/t1), output growth.

Usage: python tools/stress_r14.py [query ...]
Writes detail to /tmp/stress_r14.json (the OUT constant is repointed
so the r12/r13 records are never clobbered — round-13 advice item 4).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools import stress_r12

DEFAULT = [
    # pair/posting-shaped first (the ones a latent quadratic hides in)
    "duplicated_span_rewrite",
    "vocab_divergence_report",
    "shapley_vocab_coverage",
    # the round-14 pair-mass-guard re-probes (round-13 verdict item 4:
    # "re-run the 10× probe showing e <= 1.0 or an explicit overflow
    # row" — the guards land this round, so these two carry the bar)
    "winnowing_fingerprint_pairs",
    "dedup_threshold_sensitivity",
    # windows / folds / stats
    "max_drawdown_by_user",
    "holt_linear_forecast",
    "nelson_aalen_hazard",
    "kruskal_wallis_test",
    "benford_digit_audit",
    "winsorized_stats",
    # streaming maintenance
    "streaming_drawdown_monitor",
]

if __name__ == "__main__":
    sys.argv = [sys.argv[0]] + (sys.argv[1:] or DEFAULT)
    stress_r12.OUT = Path("/tmp/stress_r14.json")
    stress_r12.main()
