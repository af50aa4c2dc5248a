"""Perceptual-hash image near-duplicate detection.

Multimodal × dedup crossover for training-data curation: image
near-dups (re-encodes, crops, brightness shifts) survive exact-hash
dedup, so large-scale image corpora dedup on PERCEPTUAL hashes —
block-mean hash (Yang et al. 2006, "Block mean value based image
perceptual hashing") and DCT pHash (the pHash.org construction used
in LAION-style curation).  Reference parity: apache/tajo has no media
ops; this extends the engine's dedup family (operators/dedup.py
SimHash) from token space to pixel space with the same banded-LSH
join shape.

Decoding: with ``fake=False`` payloads are decoded as REAL PNGs or
baseline JPEGs through the pure-stdlib codecs
(codecs.image_gray_signal — PNG: zlib inflate + scanline unfiltering;
JPEG: Huffman + IDCT, operators/jpeg.py; both land on the same
integer BT.601 luma); other formats raise NotImplementedError there
(a PIL deployment widens only that seam).
With ``fake=True`` the grayscale signal is the payload's byte
sequence (deterministic, and — unlike a hash — LOCALITY-PRESERVING:
near-identical payloads yield near-identical fake pixels), which is
what the driver's SQL oracle diffs against.  Block means, the
threshold rule, banding, and the verify join are identical on both
paths.

Scale shape (identical to SimHash dedup, dedup.py):
  * hashing is one Arrow map pass → 4 × 16-bit band ints per image
    (8 bytes/image of index state, any corpus fits);
  * candidate generation is a banded equi-join — ONE shuffle on
    (band_idx, band_val); by pigeonhole, Hamming distance ≤ 3 over 4
    bands guarantees ≥ 1 identical band, so banding is LOSSLESS for
    the ≤ 3 threshold (no recall tradeoff, unlike MinHash banding);
  * exact Hamming verify (bit_count of band XORs) runs only on
    band-colliding pairs — never all-pairs.

Integer-exact bit rule: bit b is set iff
``block_sum(b) * n_pixels > total_sum * block_len(b)`` — pure integer
arithmetic, so Spark, numpy, and the DuckDB oracle agree bit-for-bit
with no float-threshold ties.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BANDS = 4
BITS_PER_BAND = 16
N_BITS = N_BANDS * BITS_PER_BAND

BLOCKHASH_DDL = "doc_id BIGINT, b0 INT, b1 INT, b2 INT, b3 INT"


def _fake_gray_signal(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for decode→grayscale: the payload's
    byte values as a 1-D intensity signal (locality-preserving — the
    property the fake must keep for perceptual hashing to be tested
    honestly).  Real kernel: ``np.asarray(PIL.Image.open(...).
    convert('L'))`` flattened row-major."""
    return np.frombuffer(payload, dtype=np.uint8)


def blockhash_bits(codes: np.ndarray) -> np.ndarray:
    """64 block-mean bits from an intensity signal (integer-exact).

    Splits the signal into 64 floor-boundary blocks; bit b = block b's
    mean exceeds the global mean, compared via cross-multiplied integer
    sums (no float ties).  Signals shorter than 64 samples get no hash
    (caller filters)."""
    n = len(codes)
    csum = np.concatenate([[0], np.cumsum(codes.astype(np.int64))])
    total = int(csum[-1])
    bounds = (np.arange(N_BITS + 1) * n) // N_BITS
    bsum = csum[bounds[1:]] - csum[bounds[:-1]]
    blen = bounds[1:] - bounds[:-1]
    return (bsum * n > total * blen).astype(np.int64)


def _bits_to_bands(bits: np.ndarray) -> list[int]:
    out = []
    for band in range(N_BANDS):
        chunk = bits[band * BITS_PER_BAND : (band + 1) * BITS_PER_BAND]
        out.append(int((chunk << np.arange(BITS_PER_BAND - 1, -1, -1)).sum()))
    return out


def banded_hash_frame(
    binary_df: DataFrame,
    decode_fn,
    bits_fn,
    fake: bool,
    min_len: int,
    real_decode_fn,
) -> DataFrame:
    """Shared Arrow kernel loop for every banded perceptual hash:
    decode each payload with ``decode_fn`` (fake twin) or
    ``real_decode_fn`` (actual codec — operators/codecs.py; raises
    NotImplementedError on formats the stdlib can't decode, e.g.
    JPEG), derive 64 bits with ``bits_fn``, pack into 4×16-bit band
    ints.  Parameterizing the kernel calls keeps the image
    (block-mean) and audio (energy-difference) hashers on ONE loop, so
    batch handling / min-length drops / the codec gate cannot silently
    diverge."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["content"]):
                payload = bytes(payload)
                if fake:
                    sig = decode_fn(payload)
                else:
                    sig = real_decode_fn(payload)  # raises on gated fmts
                if len(sig) < min_len:
                    continue
                rows.append([doc_id, *_bits_to_bands(bits_fn(sig))])
            yield pd.DataFrame(
                rows, columns=["doc_id", "b0", "b1", "b2", "b3"]
            )

    return binary_df.select("doc_id", "content").mapInPandas(
        run, schema=BLOCKHASH_DDL
    )


def image_blockhash(
    binary_df: DataFrame, fake: bool = True, min_len: int = N_BITS
) -> DataFrame:
    """(doc_id, content) → (doc_id, b0..b3): the 64-bit block-mean
    perceptual hash as four 16-bit band ints (sign-safe in every
    engine).  One Arrow map pass; images shorter than ``min_len``
    samples are dropped (no meaningful blocks)."""
    from tajo_spark.operators.codecs import image_gray_signal

    return banded_hash_frame(
        binary_df,
        _fake_gray_signal,
        blockhash_bits,
        fake,
        min_len,
        image_gray_signal,
    )


def _hamming(a_prefix: str, b_prefix: str):
    return sum(
        F.bit_count(
            F.col(f"{a_prefix}b{i}").bitwiseXOR(F.col(f"{b_prefix}b{i}"))
        )
        for i in range(N_BANDS)
    )


def phash_neardup_pairs(
    hashes: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs at Hamming ≤ ``max_hamming`` over the banded
    hash — (doc_a, doc_b, hamming), doc_a < doc_b.

    Banded LSH: a pair collides iff some band matches exactly; for
    ``max_hamming ≤ N_BANDS - 1`` the pigeonhole guarantees every
    qualifying pair collides, so the output EQUALS the all-pairs
    result while the join only shuffles (band_idx, band_val) keys
    once.  Colliding candidates are verified with the exact popcount
    and de-duplicated across bands."""
    if max_hamming > N_BANDS - 1:
        raise ValueError(
            f"banding is lossless only up to hamming {N_BANDS - 1}; "
            f"got {max_hamming} (raise N_BANDS or use all-pairs)"
        )
    # the hash table feeds three subtrees (band explode + both verify
    # sides); without materialization the Arrow hashing pass over the
    # corpus would execute 3x per action
    h = hashes.select("doc_id", "b0", "b1", "b2", "b3").localCheckpoint()
    bands = h.select(
        "doc_id",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias(
            "band_idx", "band_val"
        ),
    )
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            ["band_idx", "band_val"],
        )
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    a = h.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{i}").alias(f"a_b{i}") for i in range(N_BANDS)],
    )
    b = h.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{i}").alias(f"b_b{i}") for i in range(N_BANDS)],
    )
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            _hamming("a_", "b_").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# DCT pHash — the production kernel a PIL deployment runs (pytest-pinned
# against a numpy reference; the SQL oracle covers the block-mean variant
# above, DCT-in-SQL being unreasonable).


def dct_phash64(signal: np.ndarray, side: int = 32, keep: int = 8) -> int:
    """Classic DCT perceptual hash (pHash.org construction): resample
    the grayscale signal to ``side × side`` by block means, 2-D DCT-II,
    keep the top-left ``keep × keep`` low-frequency block (minus DC),
    threshold at its median → 64-bit int.  Pure numpy — drop-in for
    the Arrow kernel body."""
    n = side * side
    sig = np.asarray(signal, dtype=np.float64)
    if len(sig) == 0:
        return 0
    if len(sig) < n:
        sig = np.tile(sig, int(np.ceil(n / len(sig))))[:n]
    # true block-mean downsample over the WHOLE signal (floor-boundary
    # blocks, same rule as blockhash_bits) — a prefix `[:n]` here would
    # make the hash blind to everything past the first n samples
    bounds = (np.arange(n + 1) * len(sig)) // n
    csum = np.concatenate([[0.0], np.cumsum(sig)])
    grid = (
        (csum[bounds[1:]] - csum[bounds[:-1]]) / (bounds[1:] - bounds[:-1])
    ).reshape(side, side)
    # orthonormal DCT-II via the explicit cosine basis (no scipy here)
    k = np.arange(side)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * side))
    basis *= np.sqrt(2.0 / side)
    basis[0] *= np.sqrt(0.5)
    d = basis @ grid @ basis.T
    block = d[:keep, :keep].flatten()[1:]  # drop DC
    med = np.median(block)
    # leading 0 bit keeps the int64 sign clear (63 payload bits)
    bits = np.concatenate([[0], (block > med).astype(np.int64)])
    return int((bits << np.arange(63, -1, -1)).sum())
