"""Distributed-GD quality-classifier training tests
(operators/text.py::train_quality_classifier).

Pins the whole trajectory — features, per-iteration rounded gradients,
IEEE weight updates — against an independent numpy reference, and that
training actually learns (beats the base rate by a wide margin).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from tajo_spark.operators import text


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def _corpus():
    # half English-looking (stopword-rich), half not; varied lengths
    en = [
        " ".join(["the cat sat on the mat and it is a fine day for it"] * (1 + i % 4))
        for i in range(40)
    ]
    other = [
        " ".join([f"zz{j} qqf{j} brr{j}." for j in range(5 + i % 7)])
        for i in range(40)
    ]
    return en + other


def _numpy_reference(feats, iters, lr):
    X = np.concatenate([np.ones((len(feats), 1)), feats[:, :3]], axis=1)
    y = (feats[:, 0] > 0).astype(float)
    w = np.zeros(4)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        g = np.round(((p - y)[:, None] * X).mean(axis=0), 8)
        w = w - lr * g
    return w, y


def test_gd_trajectory_matches_numpy_reference(spark):
    docs = _docs(spark, _corpus())
    feats_pdf = text.quality_features(docs).toPandas()
    feats = feats_pdf[["x1", "x2", "x3"]].to_numpy()

    w_ref, y = _numpy_reference(feats, text.TRAIN_ITERS, text.TRAIN_LR)
    row = text.train_quality_classifier(docs).collect()[0]
    got = [row["w_bias"], row["w_stop"], row["w_logtok"], row["w_punct"]]
    assert np.allclose(got, np.round(w_ref, 6), atol=1e-6), (got, w_ref)


def test_training_beats_base_rate(spark):
    docs = _docs(spark, _corpus())
    row = text.train_quality_classifier(docs).collect()[0]
    base = 0.5  # balanced synthetic corpus
    assert row["n_docs"] == 80
    assert row["accuracy"] >= base + 0.3, row["accuracy"]
    # stopword feature must carry the model (it defines the label)
    assert row["w_stop"] > abs(row["w_logtok"])
    assert row["w_stop"] > abs(row["w_punct"])


def test_gradient_is_metadata_sized_per_iteration(spark):
    """Each iteration's driver exchange is one 4-scalar row — pin that
    the aggregate plan is a partial+final hash aggregate (map-side
    combine), not anything that moves rows."""
    docs = _docs(spark, _corpus())
    feats = text.quality_features(docs)
    from pyspark.sql import functions as F

    agg = feats.agg(F.round(F.avg(F.col("x1")), 8).alias("g"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert agg.count() == 1
