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


def test_cms_ingest_stream_equals_batch_build(spark, tmp_path):
    """Streamed sketch maintenance: after draining N micro-batches the
    persisted latest version must equal one batch build over the full
    corpus — mergeability is the whole point. Also pins replay: wiping
    the checkpoint and re-running converges to the same cells."""
    import os
    import re

    from tajo_spark.operators import sketch as SK
    from tajo_spark.operators import text as T
    from tajo_spark.streaming.pipeline import cms_ingest_stream

    rows1 = [(0, "alpha beta beta gamma"), (1, "alpha delta")]
    rows2 = [(10, "beta beta epsilon"), (11, "alpha")]
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(rows1, "doc_id LONG, text STRING").coalesce(1) \
        .write.mode("overwrite").parquet(src)
    spark.createDataFrame(rows2, "doc_id LONG, text STRING").coalesce(1) \
        .write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sk_path, ck = str(tmp_path / "sketch"), str(tmp_path / "ckpt")
    q = cms_ingest_stream(stream, sk_path, ck)
    sq = q.start(); sq.processAllAvailable(); sq.stop()

    latest = max(
        int(m.group(1))
        for d in os.listdir(sk_path)
        if (m := re.fullmatch(r"v=(\d+)", d))
        and os.path.exists(os.path.join(sk_path, d, "_SUCCESS"))
    )
    streamed = {
        (r.row, r.bucket): r.c
        for r in spark.read.parquet(os.path.join(sk_path, f"v={latest}")).collect()
    }
    full = spark.createDataFrame(rows1 + rows2, "doc_id LONG, text STRING")
    terms = full.select(F.explode(T.tokens(F.col("text"))).alias("term"))
    batch = {(r.row, r.bucket): r.c for r in SK.cms_build(terms).collect()}
    assert streamed == batch

    import shutil
    shutil.rmtree(ck)
    q2 = cms_ingest_stream(stream, sk_path, ck)
    sq2 = q2.start(); sq2.processAllAvailable(); sq2.stop()
    latest2 = max(
        int(m.group(1))
        for d in os.listdir(sk_path)
        if (m := re.fullmatch(r"v=(\d+)", d))
        and os.path.exists(os.path.join(sk_path, d, "_SUCCESS"))
    )
    replayed = {
        (r.row, r.bucket): r.c
        for r in spark.read.parquet(os.path.join(sk_path, f"v={latest2}")).collect()
    }
    assert replayed == batch


def test_hist_build_and_quantiles_hand_computed(spark):
    """Uniform 0..99 in 10 bins of width 10: p50 interpolates to 50,
    p90 to 90; out-of-range values clamp into edge bins."""
    from tajo_spark.operators.sketch import hist_build, hist_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(100)], "v DOUBLE")
    h = hist_build(df, "v", lo=0.0, hi=100.0, bins=10)
    cells = {r.bin: r.n for r in h.collect()}
    assert cells == {i: 10 for i in range(10)}
    qs = {r.q: r.est for r in
          hist_quantiles(h, [0.5, 0.9], lo=0.0, hi=100.0, bins=10).collect()}
    assert abs(qs[0.5] - 50.0) < 1e-9
    assert abs(qs[0.9] - 90.0) < 1e-9
    # clamping: values outside [lo, hi) land in the edge bins
    df2 = spark.createDataFrame([(-5.0,), (500.0,)], "v DOUBLE")
    cells2 = {r.bin: r.n for r in
              hist_build(df2, "v", lo=0.0, hi=100.0, bins=10).collect()}
    assert cells2 == {0: 1, 9: 1}


def test_hist_ingest_stream_equals_batch_build(spark, tmp_path):
    """Streamed histogram maintenance == one batch build over the full
    corpus (mergeability), and checkpoint-wipe replay converges to the
    same cells — the CMS contract, quantile flavor."""
    import os
    import re
    import shutil

    from tajo_spark.operators.sketch import hist_build
    from tajo_spark.streaming.pipeline import hist_ingest_stream

    rows1 = [(0, 100), (1, 250)]
    rows2 = [(10, 305), (11, 630), (12, None)]
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(rows1, "doc_id LONG, n_chars LONG").coalesce(1) \
        .write.mode("overwrite").parquet(src)
    spark.createDataFrame(rows2, "doc_id LONG, n_chars LONG").coalesce(1) \
        .write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id LONG, n_chars LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    hp, ck = str(tmp_path / "hist"), str(tmp_path / "ckpt")

    def latest_cells():
        latest = max(
            int(m.group(1))
            for d in os.listdir(hp)
            if (m := re.fullmatch(r"v=(\d+)", d))
            and os.path.exists(os.path.join(hp, d, "_SUCCESS"))
        )
        return {
            r.bin: r.n
            for r in spark.read.parquet(os.path.join(hp, f"v={latest}")).collect()
        }

    q = hist_ingest_stream(stream, hp, ck)
    sq = q.start(); sq.processAllAvailable(); sq.stop()
    full = spark.createDataFrame(
        rows1 + rows2, "doc_id LONG, n_chars LONG"
    )
    batch = {
        r.bin: r.n
        for r in hist_build(full, "n_chars", lo=0.0, hi=640.0).collect()
    }
    assert latest_cells() == batch

    shutil.rmtree(ck)
    q2 = hist_ingest_stream(stream, hp, ck)
    sq2 = q2.start(); sq2.processAllAvailable(); sq2.stop()
    assert latest_cells() == batch


def test_hist_l1_drift_identical_and_disjoint(spark):
    """Identical distributions -> 0; fully disjoint bins -> 2 (total
    mass moved); sensitive to a pure shift even when counts match."""
    from tajo_spark.operators.sketch import hist_build_by, hist_l1_drift

    a_rows = [("g", float(v)) for v in [5, 15, 25, 35]]
    df_a = spark.createDataFrame(a_rows, "lang STRING, v DOUBLE")
    h = lambda d: hist_build_by(d, "lang", "v", lo=0.0, hi=40.0, bins=4)  # noqa: E731
    same = hist_l1_drift(h(df_a), h(df_a)).collect()[0]
    assert same.l1_drift == 0.0 and same.old_docs == same.new_docs == 4
    df_b = spark.createDataFrame(
        [("g", float(v)) for v in [5, 5, 15, 15]], "lang STRING, v DOUBLE"
    )
    df_c = spark.createDataFrame(
        [("g", float(v)) for v in [25, 25, 35, 35]], "lang STRING, v DOUBLE"
    )
    disjoint = hist_l1_drift(h(df_b), h(df_c)).collect()[0]
    assert disjoint.l1_drift == 2.0
    # same counts, one bin shifted: |1/4-0| + |0-1/4| = 0.5
    df_d = spark.createDataFrame(
        [("g", float(v)) for v in [5, 15, 25, 35 - 10]],
        "lang STRING, v DOUBLE",
    )
    shifted = hist_l1_drift(h(df_a), h(df_d)).collect()[0]
    assert abs(shifted.l1_drift - 0.5) < 1e-9


def test_hist_quantiles_rejects_out_of_range_probes(spark):
    h = sketch.hist_build(
        spark.range(10).select(F.col("id").cast("double").alias("v")),
        "v", lo=0.0, hi=10.0,
    )
    import pytest

    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        sketch.hist_quantiles(h, [0.5, 1.5], lo=0.0, hi=10.0).collect()
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        sketch.hist_quantiles(h, [-0.1], lo=0.0, hi=10.0).collect()


def test_hist_quantiles_empty_histogram_yields_null_not_vanished(spark):
    """ADVICE r06 sketch.py:231: a probe with no spanning bin must
    surface as a NULL est row, not silently drop from the output."""
    empty = spark.createDataFrame([], "bin INT, n LONG")
    rows = sketch.hist_quantiles(
        empty, [0.25, 0.5, 0.75], lo=0.0, hi=10.0
    ).collect()
    assert [r.q for r in rows] == [0.25, 0.5, 0.75]
    assert all(r.est is None for r in rows)


def test_hist_ingest_crash_interleaving_replays_clean(spark, tmp_path):
    """Crash-window pin for hist_ingest_stream (VERDICT r06 #7), the
    interleaving 3616345 pinned for the Bloom store: a PARTIAL version
    directory (crash mid-write, no _SUCCESS) and an ORPHANED committed
    higher version (crashed future batch whose checkpoint never
    committed) must both be swept by the next real batch, which merges
    from the latest committed version STRICTLY older than itself and
    still equals one batch build over the union."""
    import os
    import re
    import shutil

    from tajo_spark.operators.sketch import hist_build
    from tajo_spark.streaming.pipeline import hist_ingest_stream

    rows1 = [(0, 100), (1, 250)]
    rows2 = [(10, 305), (11, 630)]
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(rows1, "doc_id LONG, n_chars LONG").coalesce(1) \
        .write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("doc_id LONG, n_chars LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    hp, ck = str(tmp_path / "hist"), str(tmp_path / "ckpt")
    q = hist_ingest_stream(stream, hp, ck)
    sq = q.start(); sq.processAllAvailable(); sq.stop()
    assert os.path.exists(os.path.join(hp, "v=0", "_SUCCESS"))

    # crash debris: partial v=1 (no _SUCCESS) + orphaned committed v=7
    os.makedirs(os.path.join(hp, "v=1"))
    open(os.path.join(hp, "v=1", "part-zzz.parquet"), "wb").write(b"junk")
    shutil.copytree(os.path.join(hp, "v=0"), os.path.join(hp, "v=7"))

    spark.createDataFrame(rows2, "doc_id LONG, n_chars LONG").coalesce(1) \
        .write.mode("append").parquet(src)
    q2 = hist_ingest_stream(stream, hp, ck)
    sq2 = q2.start(); sq2.processAllAvailable(); sq2.stop()

    versions = sorted(
        d for d in os.listdir(hp) if re.fullmatch(r"v=\d+", d)
    )
    assert "v=7" not in versions           # orphan swept
    assert os.path.exists(os.path.join(hp, "v=1", "_SUCCESS"))  # rewritten
    batch = {
        r.bin: r.n
        for r in hist_build(
            spark.createDataFrame(rows1 + rows2, "doc_id LONG, n_chars LONG"),
            "n_chars", lo=0.0, hi=640.0,
        ).collect()
    }
    got = {
        r.bin: r.n
        for r in spark.read.parquet(os.path.join(hp, "v=1")).collect()
    }
    assert got == batch
