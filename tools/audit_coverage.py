#!/usr/bin/env python
"""Standing perf-coverage gate (VERDICT r06 #9): fail loudly when the
bench/budget/ladder surface drifts out of sync with the registry, so
"budget the new queries" and "extend the ladder" stop being per-round
chases.

Hard rules (each violation is one line in the report):
  1. Every bench HEADLINE query has a budget row in perf_budgets.json
     (the breach protocol is blind to unbudgeted queries — r06 #2).
  2. Every bench HEADLINE query is mentioned in SCALE.md or
     PERF_BUDGET.md (a ladder/rung row or a budget rationale — the
     written 100 TB argument for that shape).
  3. Every registry category has at least one bench representative
     (micro operator-correctness queries — fn_*/agg_*/join_* — carry
     their category's scale story through that representative; they
     are driver-hash-gated for correctness, not wall-clock tracked).
  4. Every budget row corresponds to a registered query (no orphaned
     budgets masking a renamed/retired query).
  5. Every registry query has a measured wall-clock row that is at most
     2 rounds stale — from the driver bench (bench.HEADLINE runs every
     round) or from the rotation bench (tools/bench_rotation.py over
     the long tail, bench_rotation.json). A regression in a
     never-measured query was invisible until it hit a driver round
     (VERDICT r10 task 7).

Usage: python tools/audit_coverage.py   (exit 1 + report on violation)
tests/test_audit_coverage.py runs the same audit in CI.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def audit() -> list[str]:
    import bench
    from tajo_spark.queries.registry import REGISTRY, all_queries

    all_queries()
    bench_names = list(dict.fromkeys(bench.HEADLINE))
    budgets = {
        k
        for k in json.load(
            open(os.path.join(REPO, "perf_budgets.json"))
        )
        if not k.startswith("_")
    }
    scale = open(os.path.join(REPO, "SCALE.md")).read()
    perf = open(os.path.join(REPO, "PERF_BUDGET.md")).read()

    problems: list[str] = []
    for n in bench_names:
        if n not in REGISTRY:
            problems.append(f"bench query {n!r} is not in the registry")
        if n not in budgets:
            problems.append(f"bench query {n!r} has no budget row")
        if n not in scale and n not in perf:
            problems.append(
                f"bench query {n!r} has no SCALE.md/PERF_BUDGET.md mention"
            )
    in_bench = set(bench_names)
    for cat in sorted({s.category for s in REGISTRY.values()}):
        members = [n for n, s in REGISTRY.items() if s.category == cat]
        if not any(n in in_bench for n in members):
            problems.append(
                f"category {cat!r} ({len(members)} queries) has no bench "
                "representative"
            )
    # spot-bench legs: measured by tools/sf1_spotbench.py (and the
    # 1x/4x/10x build ladder in SCALE.md), not registry queries — their
    # budget rows are legitimate but can't resolve in REGISTRY
    spotbench_legs = {"sim_ann_pq_build"}
    for b in sorted(budgets - set(REGISTRY) - spotbench_legs):
        problems.append(f"budget row {b!r} has no registered query")
    # rule 5: full wall-clock coverage, max staleness 2 rounds
    from bench_rotation import current_round

    try:
        rotation = json.load(
            open(os.path.join(REPO, "bench_rotation.json"))
        )
    except Exception:
        rotation = {}
    rnd = current_round()
    for n in sorted(REGISTRY):
        if n in in_bench:
            continue  # driver bench measures these every round
        ent = rotation.get(n)
        if ent is None:
            problems.append(
                f"query {n!r} has no wall-clock row anywhere — run "
                "tools/bench_rotation.py"
            )
        elif rnd - ent.get("round", 0) > 2:
            problems.append(
                f"query {n!r} rotation wall is {rnd - ent.get('round', 0)} "
                "rounds stale — run tools/bench_rotation.py"
            )
    for n in sorted(set(rotation) - set(REGISTRY)):
        problems.append(f"rotation row {n!r} has no registered query")
    return problems


def main() -> None:
    problems = audit()
    for p in problems:
        print(p)
    print(f"{len(problems)} problems")
    sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main()
