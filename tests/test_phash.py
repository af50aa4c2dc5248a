"""Perceptual-hash near-dup tests (operators/phash.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tajo_spark.operators import multimodal, phash


def _hashes(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    return phash.image_blockhash(multimodal.attach_binary(df))


def test_blockhash_bits_matches_naive_reference():
    rng = np.random.default_rng(11)
    for n in (64, 65, 100, 1000):
        codes = rng.integers(0, 256, size=n).astype(np.int64)
        got = phash.blockhash_bits(codes)
        total, want = int(codes.sum()), []
        for b in range(64):
            lo, hi = (b * n) // 64, ((b + 1) * n) // 64
            s = int(codes[lo:hi].sum())
            want.append(1 if s * n > total * (hi - lo) else 0)
        assert got.tolist() == want


def test_banding_is_lossless_vs_all_pairs(spark):
    # pigeonhole: every pair at hamming <= 3 shares a band, so the
    # LSH join must equal the brute-force popcount join exactly.
    rng = np.random.default_rng(5)
    base = "".join(chr(32 + int(x)) for x in rng.integers(0, 90, 400))
    texts = [base]
    for i in range(1, 12):  # perturbed copies at growing distance
        s = list(base)
        for j in range(i):
            s[(37 * j) % len(s)] = chr(32 + (ord(s[j]) + 7) % 90)
        texts.append("".join(s))
    h = _hashes(spark, texts).cache()
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in phash.phash_neardup_pairs(h, max_hamming=3).collect()
    }
    rows = {r.doc_id: (r.b0, r.b1, r.b2, r.b3) for r in h.collect()}
    want = set()
    for a in rows:
        for b in rows:
            if a < b:
                d = sum(
                    bin(x ^ y).count("1")
                    for x, y in zip(rows[a], rows[b])
                )
                if d <= 3:
                    want.add((a, b, d))
    assert got == want
    assert len(want) > 0  # the construction must produce close pairs


def test_banding_rejects_lossy_threshold(spark):
    h = _hashes(spark, ["x" * 100])
    with pytest.raises(ValueError, match="lossless"):
        phash.phash_neardup_pairs(h, max_hamming=4)


def test_swap_twin_hamming_bound():
    # first/last-char swap preserves the total sum, so only the two
    # boundary blocks can flip: hamming(doc, twin) <= 2 always.
    rng = np.random.default_rng(9)
    for _ in range(20):
        n = int(rng.integers(64, 800))
        codes = rng.integers(32, 122, size=n).astype(np.int64)
        swapped = codes.copy()
        swapped[0], swapped[-1] = codes[-1], codes[0]
        d = int(
            np.abs(
                phash.blockhash_bits(codes) - phash.blockhash_bits(swapped)
            ).sum()
        )
        assert d <= 2


def test_short_payloads_dropped(spark):
    h = _hashes(spark, ["tiny", "x" * 64])
    assert h.count() == 1


def test_dct_phash_locality_and_determinism():
    rng = np.random.default_rng(3)
    sig = rng.integers(0, 256, 2048).astype(np.float64)
    near = sig.copy()
    near[:20] += 5.0
    far = rng.integers(0, 256, 2048).astype(np.float64)
    h0, h0b = phash.dct_phash64(sig), phash.dct_phash64(sig)
    assert h0 == h0b  # deterministic
    d_near = bin(h0 ^ phash.dct_phash64(near)).count("1")
    d_far = bin(h0 ^ phash.dct_phash64(far)).count("1")
    assert d_near < d_far  # perceptual: small edit << unrelated image
    assert d_far > 10
    assert 0 <= h0 < (1 << 63)  # sign-safe 63-bit payload


def test_dct_phash_sees_past_the_first_grid():
    # regression: a prefix-truncating resample ignored everything past
    # the first side*side samples — edits in the tail must change the
    # hash, and a long signal must not collide with its own prefix
    # padded by unrelated data.
    rng = np.random.default_rng(17)
    sig = rng.integers(0, 256, 8192).astype(np.float64)
    tail_edit = sig.copy()
    tail_edit[4096:] = rng.integers(0, 256, 4096).astype(np.float64)
    h0 = phash.dct_phash64(sig)
    h1 = phash.dct_phash64(tail_edit)
    assert h0 != h1
    assert bin(h0 ^ h1).count("1") > 5
