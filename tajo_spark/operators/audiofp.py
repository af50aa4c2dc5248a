"""Audio fingerprint near-duplicate detection (the audio twin of the
pHash image path, with a genuinely different kernel).

Construction: the Haitsma–Kalker robust-hash bit rule ("A Highly
Robust Audio Fingerprinting System", ISMIR 2002) in its time-domain
single-band form — frame the waveform into 65 floor-boundary frames,
per-frame ENERGY E(i) = sum of squared samples, fingerprint bit i =
``E(i+1) > E(i)``.  Encoding energy *differences* rather than levels
makes the fingerprint GAIN-INVARIANT: scaling every sample by c scales
every energy by c², which cancels in the comparison — the property
that makes audio fingerprints survive volume normalization, and which
a block-mean hash does not need (pinned in tests).  The full
Haitsma–Kalker system computes the same rule over 33 spectral subbands
per frame; a deployment swaps the energy vector for subband energies
(FFT in the Arrow kernel) and everything downstream is unchanged.

Decoding follows operators/phash.py: with ``fake=False`` payloads are
decoded as REAL WAV/PCM through the pure-stdlib codec
(operators/codecs.py — RIFF via the ``wave`` module, integer mono
downmix); compressed formats raise NotImplementedError there (a
soundfile/ffmpeg deployment widens only that seam).  With
``fake=True`` the waveform is the payload's byte sequence —
deterministic AND locality-preserving — which is what the driver's
SQL oracle diffs against.

Scale shape: identical to phash — one Arrow map pass to 4×16-bit band
ints (8 bytes/clip of index state), then the SAME banded-LSH machinery
(`phash.phash_neardup_pairs`): pigeonhole-lossless at Hamming ≤ 3, one
shuffle on (band_idx, band_val), exact popcount verify on colliding
candidates only.  All arithmetic is integer (int64 energy sums), so
Spark, numpy, and the DuckDB oracle agree bit-for-bit.

Reference parity: apache/tajo has no media operators; this extends the
dedup family the same way phash.py does for images.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from tajo_spark.operators.phash import (
    N_BITS,
    banded_hash_frame,
    phash_neardup_pairs,
)

N_FRAMES = N_BITS + 1  # 65 frames -> 64 energy-difference bits


def _fake_waveform(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for decode→PCM: payload bytes as a 1-D
    amplitude signal (locality-preserving, same convention as
    phash._fake_gray_signal).  Real kernel: soundfile.read(...)[0]."""
    return np.frombuffer(payload, dtype=np.uint8)


def energy_diff_bits(samples: np.ndarray) -> np.ndarray:
    """64 Haitsma–Kalker bits from a waveform (integer-exact).

    65 floor-boundary frames; E(i) = sum of squared samples in frame i
    (int64 — exact for any realistic clip); bit i = E(i+1) > E(i).
    Strictly-greater keeps ties at 0 in every engine.  Gain-invariant:
    ``energy_diff_bits(c * s) == energy_diff_bits(s)`` for any c > 0.
    """
    sq = samples.astype(np.int64) ** 2
    csum = np.concatenate([[0], np.cumsum(sq)])
    bounds = (np.arange(N_FRAMES + 1) * len(samples)) // N_FRAMES
    e = csum[bounds[1:]] - csum[bounds[:-1]]
    return (e[1:] > e[:-1]).astype(np.int64)


def audio_fingerprint(
    binary_df: DataFrame, fake: bool = True, min_len: int = N_FRAMES
) -> DataFrame:
    """(doc_id, content) → (doc_id, b0..b3): the 64-bit
    energy-difference fingerprint as four 16-bit band ints, through the
    SHARED banded-hash Arrow loop (phash.banded_hash_frame — only the
    decode and bits kernels differ from the image hasher).  Clips
    shorter than ``min_len`` samples are dropped."""
    from tajo_spark.operators.codecs import audio_mono_signal

    return banded_hash_frame(
        binary_df,
        _fake_waveform,
        energy_diff_bits,
        fake,
        min_len,
        audio_mono_signal,
    )


def audio_neardup_pairs(
    binary_df: DataFrame, fake: bool = True, max_hamming: int = 3
) -> DataFrame:
    """End-to-end audio near-dup pairs: fingerprint → banded-LSH
    candidate join → exact popcount verify — the phash pipeline on the
    audio kernel."""
    return phash_neardup_pairs(
        audio_fingerprint(binary_df, fake=fake), max_hamming=max_hamming
    )
