"""Count-min sketch tests (operators/sketch.py): one-sidedness,
overcount bound behavior, mergeability == rebuild, and numpy parity.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from tajo_spark.operators import sketch


def _bucket(term: str, row: int, width: int) -> int:
    return int(hashlib.md5(f"{row}:{term}".encode()).hexdigest()[:8], 16) % width


def _terms_df(spark, words):
    return spark.createDataFrame([Row(term=w) for w in words], "term string")


def test_estimates_never_undercount_and_match_reference(spark):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(500)]
    words = list(rng.choice(vocab, size=5000, p=np.linspace(1, 5, 500) / np.linspace(1, 5, 500).sum()))
    df = _terms_df(spark, words)
    sk = sketch.cms_build(df)
    probes = _terms_df(spark, vocab[:50]).distinct()
    est = {r.term: r.cms_est for r in sketch.cms_estimate(probes, sk).collect()}
    # independent reference sketch
    counters = np.zeros((sketch.CMS_DEPTH, sketch.CMS_WIDTH), dtype=np.int64)
    from collections import Counter
    true = Counter(words)
    for w, c in true.items():
        for j in range(sketch.CMS_DEPTH):
            counters[j, _bucket(w, j, sketch.CMS_WIDTH)] += c
    for t in vocab[:50]:
        ref = min(counters[j, _bucket(t, j, sketch.CMS_WIDTH)] for j in range(sketch.CMS_DEPTH))
        assert est[t] == ref, (t, est[t], ref)
        assert est[t] >= true[t]  # one-sided, structural


def test_merge_equals_rebuild(spark):
    a = _terms_df(spark, ["x", "y", "x", "z"])
    b = _terms_df(spark, ["x", "q", "q"])
    merged = sketch.cms_merge(sketch.cms_build(a), sketch.cms_build(b))
    rebuilt = sketch.cms_build(a.unionByName(b))
    ma = {(r.row, r.bucket): r.c for r in merged.collect()}
    mb = {(r.row, r.bucket): r.c for r in rebuilt.collect()}
    assert ma == mb


def test_heavy_hitters_exact_leg_and_overcount(spark):
    words = ["hot"] * 100 + ["warm"] * 50 + [f"cold{i}" for i in range(200)]
    docs = spark.createDataFrame(
        [Row(doc_id=0, text=" ".join(words))], "doc_id long, text string"
    )
    out = sketch.cms_heavy_hitters(docs, k=2).toPandas().set_index("term")
    assert out.loc["hot", "true_count"] == 100
    assert out.loc["warm", "true_count"] == 50
    assert (out.overcount >= 0).all()
    # 252 tokens over 2048*4 cells: collisions are rare; the bound
    # eps*N = (e/2048)*252 < 1 rounds to tiny overcounts
    assert (out.overcount <= 3).all()
