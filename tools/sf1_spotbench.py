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

# the heaviest budget rows (bench_results.json r07 ranking), one per
# heavy family: composed pipeline, containment (asym + weighted),
# cluster survivor choice (graph), PQ persisted ANN, k-means,
# BPE train+encode, tar export w/ consumer verify.
#
# r09 VERDICT task 2: the persisted-ANN row is SPLIT into its two
# production legs — `sim_ann_pq_build` (index build, once per corpus
# version; measured with the per-process memo cleared) and
# `sim_ann_pq_probe` (steady-state serving against the warm index, the
# production-repeated number). The old single row timed build + exact
# brute-force leg + probe in whichever run hit the cold memo, which is
# why r08 AND r09 each needed a "measurement pressure" adjudication.
HEAVY = [
    ("pipeline_corpus_prep_v7", "docs"),
    ("dedup_containment_asym", "docs"),
    ("dedup_weighted_containment", "docs"),
    ("dedup_best_by_centrality", "docs"),
    ("dedup_best_of_cluster", "docs"),
    ("sim_ann_pq_build", "emb"),
    ("sim_ann_pq_probe", "emb"),
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
    baseline_full = {}
    try:
        baseline_full = json.load(
            open(os.path.join(REPO, "bench_results.json"))
        )
        baseline = baseline_full.get("queries", baseline_full)
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
        from tajo_spark.queries import datapipe as DP

        def run_one(q: str, sf_dir: str) -> str:
            """Execute one measured leg; raises on failure."""
            if q == "sim_ann_pq_build":
                # build-once leg: clear the per-process memo so the
                # timed call IS the build (KMeans + codebooks + encode
                # + partitioned persist)
                DP._IVFPQ_INDEX.clear()
                DP._ivfpq_index(spark, sf_dir, n_centroids=8)
                return ""
            # sim_ann_pq_probe rides the registry body: by protocol it
            # runs AFTER the build leg, so the memoized index is warm
            # and the timing is steady-state serving only
            qs[q](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return ""

        # codegen warmup at tiny SF (same protocol as bench.py)
        for q, _ in heavy:
            try:
                run_one(q, "/root/testdata/sf0.001")
            except Exception:
                pass

        # host-speed probe AFTER warmup, same regime as the measured
        # runs (r09 VERDICT task 8: raw one-shot walls needed prose
        # adjudication every round — normalize like bench.py does)
        import bench as B

        probe_sec = B._host_speed_probe(spark)
        host_factor = 1.0
        base_factor = 1.0
        try:
            budgets = json.load(
                open(os.path.join(REPO, "perf_budgets.json"))
            )
            ref = budgets.get("_probe_reference_sec")
            if ref:
                host_factor = round(min(3.0, max(1.0, probe_sec / ref)), 3)
                base_probe = baseline_full.get("host_probe_sec")
                if base_probe:
                    base_factor = round(
                        min(3.0, max(1.0, base_probe / ref)), 3
                    )
        except Exception:
            pass

        rows = {}
        print(
            f"| query | sf0.1 wall | {args.mult}x wall | ratio "
            f"(host-normalized) |"
        )
        print("|---|---|---|---|")
        for q, which in heavy:
            t0 = time.time()
            status = ""
            try:
                run_one(q, dirs[which])
            except Exception as exc:
                status = f" FAIL({str(exc).splitlines()[0][:50]})"
            wall = time.time() - t0
            base = baseline.get(q)
            # normalize each side by ITS run's host factor so the
            # ratio compares engine work, not bench-host load
            ratio_norm = (
                (wall / host_factor) / (base / base_factor)
                if base
                else None
            )
            ratio = f"{ratio_norm:.1f}x" if base else "—"
            base_s = f"{base:.2f} s" if base else "—"
            print(f"| `{q}` | {base_s} | {wall:.2f} s | {ratio}{status} |")
            rows[q] = {
                "wall_sec": round(wall, 3),
                "base_sec": base,
                "ratio_norm": round(ratio_norm, 2) if ratio_norm else None,
                "status": status.strip() or "ok",
            }
        out = {
            "mult": args.mult,
            "host_probe_sec": probe_sec,
            "host_factor": host_factor,
            "baseline_host_factor": base_factor,
            "queries": rows,
        }
        with open(
            os.path.join(REPO, "sf1_spotbench.json"), "w"
        ) as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(
            f"\nhost_probe={probe_sec}s factor={host_factor} "
            f"(baseline factor={base_factor}) → sf1_spotbench.json"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
