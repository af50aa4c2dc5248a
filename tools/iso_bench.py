#!/usr/bin/env python
"""Isolation-protocol measurement (PERF_BUDGET.md's method, made
reproducible): for each named registry query — solo process, per-query
sf0.001 codegen warmup x2, JVM gc + settle, then min-of-3 at sf0.1
through the noop sink.  This is the number budget rows are set from;
the driver bench's min-of-2-in-a-110-query-process sits above it by
the host factor.

Usage: python tools/iso_bench.py q1,q2,...   → one JSON line
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
    names = sys.argv[1].split(",")
    warm_dir = os.environ.get("ISO_WARM_DIR", "/root/testdata/sf0.001")
    sf_dir = os.environ.get("ISO_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark(app_name="iso_bench")
    reg = all_queries()
    out = {}
    for name in names:
        spec = reg[name]
        for _ in range(2):
            try:
                spec.spark(spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # warmup must never fail the run
                print(f"warmup {name}: {exc}", file=sys.stderr)
        spark.sparkContext._jvm.System.gc()
        time.sleep(4)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
            for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                rdd.unpersist()
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}s", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
