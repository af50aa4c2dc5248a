"""Standing perf-coverage gate (VERDICT r06 #9): bench, budgets, and
the written scale story must not drift — every bench query needs a
budget row and a SCALE.md/PERF_BUDGET.md mention, every registry
category needs a bench representative, and no budget row may orphan.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT / "tools"))


def test_perf_coverage_audit_is_clean():
    import audit_coverage

    problems = audit_coverage.audit()
    assert problems == [], "\n".join(problems)
