#!/usr/bin/env python
"""Count Spark jobs + wall per registry query (guide §1: measure first).

Usage: python tools/job_count.py q1,q2,...   → one JSON line
{"name": {"jobs_cold": N, "wall_cold": s, "jobs_warm": N,
          "wall_warm": s}, ...}
(cold = first measured run, includes any one-time per-process builds
like persisted-index creation; warm = second run, the steady state the
bench's min-of-2 reports)

Jobs are counted by tagging each query's execution with a job group
and asking the status tracker for that group's job ids — deterministic
evidence for fold-the-pre-jobs optimizations (a wall clock at these
magnitudes is ±0.3 s host noise; a job count is exact).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tajo_spark.queries.registry import all_queries  # noqa: E402
from tajo_spark.session import build_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 2 or not sys.argv[1].strip():
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    names = sys.argv[1].split(",")
    warm_dir = os.environ.get("ISO_WARM_DIR", "/root/testdata/sf0.001")
    sf_dir = os.environ.get("ISO_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark(app_name="job_count")
    sc = spark.sparkContext
    reg = all_queries()
    out = {}
    for name in names:
        spec = reg[name]
        for _ in range(2):  # codegen warmup at the tiny SF
            try:
                spec.spark(spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:
                print(f"warmup {name}: {exc}", file=sys.stderr)
        rec = {}
        # two measured runs: for the persisted-index queries run 1
        # includes the one-time index build (memoized per process);
        # run 2 is the steady-state warm path the bench's min-of-2
        # reports
        for tag in ("cold", "warm"):
            group = f"jc_{name}_{tag}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = round(time.perf_counter() - t0, 3)
            sc.setJobGroup(None, None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            rec[f"jobs_{tag}"] = jobs
            rec[f"wall_{tag}"] = wall
        out[name] = rec
        print(f"{name}: {rec}", file=sys.stderr)
        for rdd in list(sc._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
