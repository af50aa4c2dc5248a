"""DSIR importance-resampling tests (operators/dsir.py).

Pins the statistical behavior (target-like docs outrank off-target
docs), the resampling contract (k docs, no target members, seeded
determinism), and the numeric trajectory against a hashlib/numpy
reference computed independently of Spark.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from tajo_spark.operators import dsir

TARGET_TEXT = "the quick brown fox jumps over the lazy dog again and again"
OFFTGT_TEXT = "zzq qqf brr lorem ipsum dolor sit amet consectetur adipiscing"


def _docs(spark):
    rows = []
    for i in range(30):
        rows.append(Row(doc_id=i, text=TARGET_TEXT + f" t{i % 5}", grp="tgt"))
    for i in range(30, 60):
        # candidates: half echo the target vocabulary, half don't
        t = TARGET_TEXT if i % 2 == 0 else OFFTGT_TEXT
        rows.append(Row(doc_id=i, text=t + f" c{i % 7}", grp="raw"))
    return spark.createDataFrame(rows, "doc_id long, text string, grp string")


def _bucket(gram: str, n_buckets: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % n_buckets


def _gumbel(doc_id: int, seed: int) -> float:
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:6]
    u = (int(h, 16) + 0.5) / 16**6
    return -math.log(-math.log(u))


def _reference_logw(texts_by_id, target_ids, n_buckets):
    """Independent hashed-ngram importance weights (add-one smoothing)."""

    def grams(t):
        ts = [w for w in t.strip().lower().split() if w]
        return ts + [" ".join(ts[i : i + 2]) for i in range(len(ts) - 1)]

    ct = np.zeros(n_buckets)
    cr = np.zeros(n_buckets)
    per_doc = {}
    for did, t in texts_by_id.items():
        counts = {}
        for g in grams(t):
            b = _bucket(g, n_buckets)
            counts[b] = counts.get(b, 0) + 1
        per_doc[did] = counts
        for b, c in counts.items():
            cr[b] += c
            if did in target_ids:
                ct[b] += c
    lam = np.round(
        np.log((ct + 1) / (ct.sum() + n_buckets))
        - np.log((cr + 1) / (cr.sum() + n_buckets)),
        8,
    )
    return {
        did: round(sum(c * lam[b] for b, c in cnt.items()), 4)
        for did, cnt in per_doc.items()
        if did not in target_ids
    }


def test_logw_matches_hashlib_numpy_reference(spark):
    docs = _docs(spark)
    out = dsir.dsir_select(
        docs, F.col("grp") == "tgt", k=30, n_buckets=256
    ).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    ref = _reference_logw(texts, set(range(30)), 256)
    for r in out:
        assert abs(r.logw - ref[r.doc_id]) <= 1e-4, (r.doc_id, r.logw, ref[r.doc_id])
        want = round(ref[r.doc_id] + _gumbel(r.doc_id, dsir.DSIR_SEED), 4)
        assert abs(r.score - want) <= 2e-4, (r.doc_id, r.score, want)


def test_target_like_docs_outrank_offtarget(spark):
    docs = _docs(spark)
    scored = dsir.dsir_select(docs, F.col("grp") == "tgt", k=30).collect()
    logw = {r.doc_id: r.logw for r in scored}
    target_like = [logw[i] for i in range(30, 60) if i % 2 == 0]
    off_target = [logw[i] for i in range(30, 60) if i % 2 == 1]
    assert min(target_like) > max(off_target)


def test_selection_contract(spark):
    docs = _docs(spark)
    sel = dsir.dsir_select(docs, F.col("grp") == "tgt", k=10).collect()
    assert len(sel) == 10
    ids = {r.doc_id for r in sel}
    assert ids.isdisjoint(range(30))  # never selects target members
    # seeded determinism: same call, same draw
    again = {r.doc_id for r in dsir.dsir_select(docs, F.col("grp") == "tgt", k=10).collect()}
    assert again == ids


def test_plan_shape_takeordered_broadcast_only(spark):
    """Selection must be TakeOrdered (never a global sort) and every
    join against the B-row model tables must broadcast — a sort-merge
    join there would shuffle the corpus against kilobytes."""
    docs = _docs(spark)
    out = dsir.dsir_select(docs, F.col("grp") == "tgt", k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_gumbel_noise_distribution(spark):
    """Deterministic Gumbel draws should look Gumbel(0,1): mean near
    the Euler-Mascheroni constant, each value reproducible."""
    df = spark.range(2000).select(
        F.col("id"), dsir.gumbel_noise(F.col("id")).alias("g")
    )
    pdf = df.toPandas()
    assert abs(pdf.g.mean() - 0.5772) < 0.1
    some = pdf.set_index("id").g
    for did in (0, 7, 1999):
        assert abs(some[did] - _gumbel(did, dsir.DSIR_SEED)) < 1e-9
