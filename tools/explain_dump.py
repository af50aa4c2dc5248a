#!/usr/bin/env python
"""Dump .explain('formatted') for named registry queries to files.

Usage: python tools/explain_dump.py <out_dir> <suffix> q1,q2,...
Writes <out_dir>/<query>_<suffix>.txt for each query (judge-checkable
plan evidence for OPTIMIZATION rounds; guide §1 step: capture the plan
shape — Exchange count, join strategy, PushedFilters/ReadSchema,
BatchEvalPython nodes — before and after each change).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tajo_spark.queries.registry import all_queries  # noqa: E402
from tajo_spark.session import build_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sf_dir = os.environ.get("ISO_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_spark(app_name="explain_dump")
    reg = all_queries()
    for name in names:
        df = reg[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)} chars, {n_ex} Exchange", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
