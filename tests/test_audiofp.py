"""Audio fingerprint near-dup tests (operators/audiofp.py).

Pins the Haitsma-Kalker kernel against a direct numpy re-derivation,
the gain-invariance property that distinguishes energy-difference
fingerprints from block-mean hashes, the twin-swap hamming bound, and
banding losslessness vs brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tajo_spark.operators import audiofp, multimodal, phash


def _ref_bits(sig: np.ndarray) -> np.ndarray:
    e = []
    n = len(sig)
    for f in range(audiofp.N_FRAMES):
        frame = sig[(f * n) // audiofp.N_FRAMES:((f + 1) * n) // audiofp.N_FRAMES]
        e.append(int((frame.astype(np.int64) ** 2).sum()))
    return np.array([1 if e[i + 1] > e[i] else 0 for i in range(64)])


def test_energy_diff_bits_match_reference_and_gain_invariance():
    rng = np.random.default_rng(7)
    sig = rng.integers(0, 256, size=1000, dtype=np.int64)
    bits = audiofp.energy_diff_bits(sig)
    assert (bits == _ref_bits(sig)).all()
    # gain invariance: the property a block-mean hash does NOT need
    # and an audio fingerprint cannot live without
    assert (audiofp.energy_diff_bits(sig * 3) == bits).all()
    assert (audiofp.energy_diff_bits(sig * 17) == bits).all()
    # level sensitivity check: adding a big constant DOES change
    # energies non-uniformly, so this is not a trivial always-equal test
    assert not (audiofp.energy_diff_bits(sig + 200) == bits).all()


def test_twin_swap_hamming_bound(spark):
    """First/last-char swap perturbs only the first and last frame
    energies -> at most bits 0 and 63 flip -> twin hamming <= 2."""
    texts = [
        "the quick brown fox jumps over the lazy dog " * 3,
        "pack my box with five dozen liquor jugs today " * 2,
    ]
    rows = []
    for i, t in enumerate(texts):
        rows.append((i, t))
        rows.append((i + 1000, t[-1] + t[1:-1] + t[0]))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = audiofp.audio_neardup_pairs(multimodal.attach_binary(df)).toPandas()
    for i in range(len(texts)):
        row = pairs[(pairs.doc_a == i) & (pairs.doc_b == i + 1000)]
        assert len(row) == 1, (i, pairs)
        assert row.hamming.iloc[0] <= 2


def test_banding_is_lossless_vs_brute_force(spark):
    """Every pair at hamming <= 3 must survive the banded join —
    pigeonhole over 4 bands, same guarantee phash pins."""
    rng = np.random.default_rng(3)
    payloads = []
    base = rng.integers(32, 127, size=300, dtype=np.uint8)
    for i in range(12):
        v = base.copy()
        # flip a few samples -> small hamming neighborhoods
        idx = rng.integers(0, 300, size=i)
        v[idx] = rng.integers(32, 127, size=i, dtype=np.uint8)
        payloads.append((i, bytes(v).decode("ascii")))
    df = spark.createDataFrame(payloads, "doc_id long, text string")
    binary = multimodal.attach_binary(df)
    banded = audiofp.audio_neardup_pairs(binary).toPandas()
    hashes = audiofp.audio_fingerprint(binary).toPandas()
    brute = []
    hs = hashes.set_index("doc_id")
    for a in hs.index:
        for b in hs.index:
            if a < b:
                d = sum(
                    bin(int(hs.loc[a][f"b{k}"]) ^ int(hs.loc[b][f"b{k}"])).count("1")
                    for k in range(4)
                )
                if d <= 3:
                    brute.append((a, b, d))
    got = sorted(map(tuple, banded[["doc_a", "doc_b", "hamming"]].values))
    assert got == sorted(brute)


def test_fingerprint_schema_shared_with_phash(spark):
    """The band schema is the phash one, so the LSH join is literally
    shared code — pin the contract."""
    df = spark.createDataFrame(
        [(0, "x" * 100)], "doc_id long, text string"
    )
    a = audiofp.audio_fingerprint(multimodal.attach_binary(df))
    p = phash.image_blockhash(multimodal.attach_binary(df))
    assert a.schema == p.schema
