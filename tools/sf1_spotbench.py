#!/usr/bin/env python
"""sf1-equivalent spot-bench of the heaviest registry queries
(VERDICT r07 #8): one-shot wall-clock at 10x the bench scale factor to
validate that the sf0.1 budget envelopes EXTRAPOLATE — the SCALE.md
ladders multiply documents, not TPC-H sf, so this is the one
measurement that grows both corpora together.

Protocol: stage 10x documents / embeddings / TPC-H facts with the
scaling_ladder generators (replica texts are shingle-distinct — the
dedup worst case, see scaling_ladder.py), codegen-warm each query at
sf0.001, then ONE measured run per query at 10x with a noop sink.
Prints the markdown table SCALE.md carries plus the ratio vs the
tracked sf0.1 bench wall (bench_results.json) — a healthy
shuffle-bound operator lands well under 10x/ratio-of-cores; anything
super-linear beyond its documented candidate-volume note is a bug.

Usage: python tools/sf1_spotbench.py [--mult 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

# the 10 heaviest budget rows (bench_results.json r07 ranking), one
# per heavy family: composed pipeline, containment (asym + weighted),
# cluster survivor choice (graph), PQ/IVF persisted ANN, k-means,
# BPE train+encode, tar export w/ consumer verify
HEAVY = [
    ("pipeline_corpus_prep_v7", "docs"),
    ("dedup_containment_asym", "docs"),
    ("dedup_weighted_containment", "docs"),
    ("dedup_best_by_centrality", "docs"),
    ("dedup_best_of_cluster", "docs"),
    ("sim_ann_pq_persisted", "emb"),
    ("sim_kmeans_lloyd", "emb"),
    ("text_bpe_train", "docs"),
    ("export_tar_verify", "docs"),
    ("tpch_q18", "tpch"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument(
        "--tpch-all",
        action="store_true",
        help="sweep ALL of tpch_q1..q22 at --mult x instead of the "
        "heavy-family list (the relational-side scale table)",
    )
    args = ap.parse_args()
    heavy = (
        [(f"tpch_q{i}", "tpch") for i in range(1, 23)]
        if args.tpch_all
        else HEAVY
    )

    import scaling_ladder as SL

    from __spark_entry__ import queries
    from tajo_spark.session import build_spark

    spark = build_spark(app_name="sf1_spotbench")
    qs = queries()
    baseline = {}
    try:
        baseline = json.load(open(os.path.join(REPO, "bench_results.json")))
        baseline = baseline.get("queries", baseline)
    except Exception:
        pass

    root = tempfile.mkdtemp(prefix="tajo_spark_sf1_")
    try:
        dirs = (
            {"tpch": SL.stage_tpch(args.mult, root)}
            if args.tpch_all
            else {
                "docs": SL.stage(args.mult, root),
                "emb": SL.stage_emb(args.mult, root),
                "tpch": SL.stage_tpch(args.mult, root),
            }
        )
        # codegen warmup at tiny SF (same protocol as bench.py)
        for q, _ in heavy:
            try:
                qs[q](spark, "/root/testdata/sf0.001").write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception:
                pass
        print(f"| query | sf0.1 wall | {args.mult}x wall | ratio |")
        print("|---|---|---|---|")
        for q, which in heavy:
            t0 = time.time()
            status = ""
            try:
                qs[q](spark, dirs[which]).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:
                status = f" FAIL({str(exc).splitlines()[0][:50]})"
            wall = time.time() - t0
            base = baseline.get(q)
            ratio = f"{wall / base:.1f}x" if base else "—"
            base_s = f"{base:.2f} s" if base else "—"
            print(f"| `{q}` | {base_s} | {wall:.2f} s | {ratio}{status} |")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
