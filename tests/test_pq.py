"""IVF-PQ index tests (operators/pq.py).

Contract mirrors the reference's index tests (BST index: storage layout
+ pruned probe returns the same rows a full scan would,
tajo-storage/.../TestBSTIndex.java): the approximate structure must
degrade to EXACT under full probe, prune at the source, and its
distributed scoring must match a numpy reference bit-for-bit.
"""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from tajo_spark.operators import pq as P
from tajo_spark.operators.similarity import ann_join
from tajo_spark.queries.datapipe import load_table
from tests.conftest import SF_DIR

N_CENTROIDS = 4


@pytest.fixture(scope="module")
def pq_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    emb = load_table(spark, SF_DIR, "embeddings")
    model, codebooks = P.ivf_pq_persist_index(
        emb, path, n_centroids=N_CENTROIDS
    )
    return path, model, codebooks, emb


def _queries(emb):
    return emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )


def test_pq_full_probe_degrades_to_exact(spark, pq_index):
    # nprobe = all centroids + expand >> corpus: the PQ stage selects
    # everything, so the exact rerank must reproduce ann_join verbatim
    # (ranks, ids, scores) — the index-vs-full-scan contract.
    path, model, codebooks, emb = pq_index
    q = _queries(emb)
    full = P.ann_join_pq_persisted(
        spark, path, model, codebooks, q, emb,
        k=5, nprobe=N_CENTROIDS, expand=1000,
    )
    exact = ann_join(q, emb, k=5)
    got = sorted((r.q_id, r.rank, r.vec_id, r.cos) for r in full.collect())
    want = sorted((r.q_id, r.rank, r.vec_id, r.cos) for r in exact.collect())
    assert got == want


def test_pq_codes_schema_and_width(spark, pq_index):
    # 8 tinyint codes per vector (32x under 64 float32s), every code a
    # valid codebook row id.
    path, model, codebooks, emb = pq_index
    m, ksub, dsub = codebooks.shape
    idx = spark.read.parquet(path)
    assert dict(idx.dtypes)["codes"] == "array<tinyint>"
    bad = idx.filter(
        (F.size("codes") != m)
        | F.exists("codes", lambda c: (c < 0) | (c >= ksub))
    ).count()
    assert bad == 0


def test_pq_probe_prunes_partitions(spark, pq_index):
    # the probe scan must carry centroid_id PartitionFilters: directory
    # pruning happens at file listing, before any byte is read.
    path, model, codebooks, emb = pq_index
    q = _queries(emb)
    df = P.ann_join_pq_persisted(
        spark, path, model, codebooks, q, emb, k=3, nprobe=1, expand=2
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*centroid_id", plan), plan
    assert df.count() > 0


def test_pq_adc_matches_numpy(spark, pq_index):
    # the JVM zip_with/element_at ADC pipeline must equal the textbook
    # numpy computation: score = q̂·c + Σₘ LUT[m][code_m].
    path, model, codebooks, emb = pq_index
    m, ksub, dsub = codebooks.shape
    centers = np.asarray(
        [list(c) for c in model.clusterCenters()], dtype="float64"
    )
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = np.asarray(qrow.embedding, dtype="float64")
    qn = qv / max(float(np.linalg.norm(qv)), 1e-12)
    luts = np.stack(
        [qn[i * dsub : (i + 1) * dsub] @ codebooks[i].T for i in range(m)]
    )
    idx = spark.read.parquet(path).orderBy("vec_id").limit(20).collect()
    want = {
        r.vec_id: float(
            qn @ centers[r.centroid_id]
            + sum(luts[i][r.codes[i]] for i in range(m))
        )
        for r in idx
    }
    lut_lit = F.lit([[float(x) for x in row] for row in luts])
    qc_by_cent = F.lit([float(qn @ c) for c in centers])
    got_df = (
        spark.read.parquet(path)
        .filter(F.col("vec_id").isin(list(want)))
        .select(
            "vec_id",
            P._adc_score(
                F.col("codes"),
                lut_lit,
                F.element_at(qc_by_cent, F.col("centroid_id") + 1),
            ).alias("adc"),
        )
    )
    got = {r.vec_id: r.adc for r in got_df.collect()}
    assert set(got) == set(want)
    for vid in want:
        assert got[vid] == pytest.approx(want[vid], abs=1e-9)


def test_pq_codebooks_deterministic():
    rng = np.random.default_rng(7)
    res = rng.normal(size=(256, 64))
    a = P.pq_train(res, m=8, ksub=16, seed=42)
    b = P.pq_train(res, m=8, ksub=16, seed=42)
    assert np.array_equal(a, b)


def test_pq_residual_reconstruction_beats_zero(spark, pq_index):
    # PQ must actually encode information: reconstruction
    # ||r - codebook[code]||² averaged over the corpus has to be
    # materially under ||r||² (the all-zeros "no PQ" baseline).
    # ~0.54 measured on this near-isotropic synthetic corpus (4
    # codebook bits per 8-dim subspace); real embedding manifolds
    # compress far better — the bound only asserts information flows.
    path, model, codebooks, emb = pq_index
    m, ksub, dsub = codebooks.shape
    centers = np.asarray(
        [list(c) for c in model.clusterCenters()], dtype="float64"
    )
    rows = (
        spark.read.parquet(path)
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .collect()
    )
    err = base = 0.0
    for r in rows:
        v = np.asarray(r.embedding, dtype="float64")
        vn = v / max(float(np.linalg.norm(v)), 1e-12)
        res = vn - centers[r.centroid_id]
        rec = np.concatenate([codebooks[i][r.codes[i]] for i in range(m)])
        err += float(((res - rec) ** 2).sum())
        base += float((res**2).sum())
    assert err < 0.75 * base


def test_pq_train_rejects_int8_overflowing_ksub():
    rng = np.random.default_rng(1)
    with pytest.raises(ValueError, match="ksub"):
        P.pq_train(rng.normal(size=(64, 64)), m=8, ksub=256)


def test_cents_memo_bounds_same_session_models(spark):
    # r13 review: retrained models are new objects -> new memo keys;
    # the memo must evict oldest entries instead of holding one strong
    # (model, codebooks, frame) tuple per retrain for the session
    class _StubModel:
        def clusterCenters(self):
            return [np.asarray([1.0, 0.0])]

    saved = dict(P._PQ_CENTS_MEMO)
    P._PQ_CENTS_MEMO.clear()
    try:
        cb = np.zeros((1, 2, 2))
        kept = []
        for _ in range(P._CENTS_MEMO_MAX + 3):
            m = _StubModel()
            P._pq_cents_frame(spark, m, cb)
            kept.append(m)  # keep models alive so ids stay distinct
        assert len(P._PQ_CENTS_MEMO) == P._CENTS_MEMO_MAX
        # the newest model is still memoized (hit returns same frame)
        newest_key = (
            spark.sparkContext.applicationId, id(kept[-1]), id(cb)
        )
        assert newest_key in P._PQ_CENTS_MEMO
    finally:
        P._PQ_CENTS_MEMO.clear()
        P._PQ_CENTS_MEMO.update(saved)
