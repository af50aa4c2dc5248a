"""Bloom-filter ingest-gate tests (operators/dedup.py::bloom_*).

Pins the contract the pattern rests on — NO false negatives — plus the
packed-word representation against a naive membership recomputation,
and the probe plan shape (broadcast join, no shuffle of the batch
beyond the final per-doc fold).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from tajo_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id long, text string"
    )


def _positions(text: str, m_bits: int = dedup.BLOOM_BITS) -> list[int]:
    fp = hashlib.md5(text.encode()).hexdigest()
    return [
        int(fp[8 * j : 8 * j + 8], 16) % m_bits
        for j in range(dedup.BLOOM_HASHES)
    ]


def test_bloom_no_false_negatives(spark):
    """Every key inserted into the filter MUST probe bloom_maybe=true."""
    corpus = _docs(spark, [(i, f"document number {i} body") for i in range(200)])
    words = dedup.bloom_build(corpus)
    probed = {
        r["doc_id"]: r["bloom_maybe"]
        for r in dedup.bloom_probe(corpus, words).collect()
    }
    assert len(probed) == 200 and all(probed.values())


def test_bloom_definite_new_and_exact_confirm(spark):
    corpus = _docs(spark, [(i, f"stored doc {i}") for i in range(100)])
    batch = _docs(
        spark,
        [(1000 + i, f"stored doc {i}") for i in range(0, 100, 10)]  # replays
        + [(2000 + i, f"fresh doc {i}") for i in range(50)],        # new
    )
    out = {
        r["doc_id"]: (r["bloom_maybe"], r["is_dup"])
        for r in dedup.bloom_prefilter_dedup(corpus, batch).collect()
    }
    assert len(out) == 60
    # replayed texts: maybe AND confirmed dup
    for i in range(0, 100, 10):
        assert out[1000 + i] == (True, True)
    # fresh texts: never a confirmed dup; bloom may rarely say maybe
    # (false positive) but the exact confirm must clear it
    for i in range(50):
        assert out[2000 + i][1] is False


def test_bloom_packed_words_match_reference_bits(spark):
    """The packed (word_idx, bits) table equals a per-key python
    recomputation of the same md5-slice positions."""
    texts = [f"bloom ref doc {i}" for i in range(64)]
    corpus = _docs(spark, list(enumerate(texts)))
    got = {
        r["word_idx"]: r["bits"]
        for r in dedup.bloom_build(corpus).collect()
    }
    want: dict[int, int] = {}
    for t in texts:
        for p in _positions(t):
            want[p // 32] = want.get(p // 32, 0) | (1 << (p % 32))
    assert got == want


def test_bloom_probe_plan_broadcasts_filter(spark):
    corpus = _docs(spark, [(i, f"plan doc {i}") for i in range(32)])
    words = dedup.bloom_build(corpus)
    plan = dedup.bloom_probe(corpus, words)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan


def test_bloom_false_positive_rate_bounded(spark):
    """With 100 inserted keys in a 16384-bit / 4-hash filter the load is
    ~2.4% set bits; probing 400 disjoint keys should see well under 1%
    maybe-hits ((400/16384*4)^... — theoretical fp ~3e-7). Allow a few."""
    corpus = _docs(spark, [(i, f"member {i}") for i in range(100)])
    probe = _docs(spark, [(i, f"outsider {i}") for i in range(400)])
    words = dedup.bloom_build(corpus)
    n_maybe = (
        dedup.bloom_probe(probe, words)
        .filter(F.col("bloom_maybe"))
        .count()
    )
    assert n_maybe <= 4
