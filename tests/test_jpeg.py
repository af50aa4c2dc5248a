"""Baseline JPEG codec (operators/jpeg.py) + the codecs.image_*
dispatch seam, including end-to-end Arrow passes over REAL JPEG bytes
(r05 verdict #7: JPEG is the dominant web-corpus image format and was
the one still-gated decode path).

The round-trip tests alone could hide a shared encoder/decoder bug
(e.g. a wrong zigzag both ways), so two spec-derived witnesses pin the
bitstream itself: the hand-computed entropy bytes of a solid-gray
block under the Annex K canonical Huffman assignment, and exact
solid-color recovery through the quantizer."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tajo_spark.operators import multimodal as M
from tajo_spark.operators.codecs import (
    encode_png,
    image_gray_signal,
    image_header,
    png_gray_signal,
    sniff,
)
from tajo_spark.operators.jpeg import decode_jpeg, encode_jpeg, jpeg_header
from tajo_spark.operators.phash import image_blockhash, phash_neardup_pairs


def _gradient(h: int = 37, w: int = 53) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 3 + xx * 2) % 256).astype(np.uint8)


def _texture(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    grid = rng.integers(20, 220, (8, 8)).astype(np.uint8)
    return np.kron(grid, np.ones((h // 8, w // 8), dtype=np.uint8))


# ---------------------------------------------------------------------------
# codec core


def test_sniff_recognizes_jpeg():
    assert sniff(encode_jpeg(_gradient())) == "jpeg"


def test_gray_roundtrip_tight():
    g = _gradient()
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == (*g.shape, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 2


def test_rgb_roundtrip_tight():
    g = _gradient()
    rgb = np.stack([g, 255 - g, (g // 2 + 64).astype(np.uint8)], axis=2)
    dec = decode_jpeg(encode_jpeg(rgb, quality=92))
    assert dec.shape == rgb.shape
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 4


def test_rgb_420_subsampling_roundtrip():
    g = _gradient()
    rgb = np.stack([g, 255 - g, (g // 2 + 64).astype(np.uint8)], axis=2)
    enc = encode_jpeg(rgb, quality=92, subsample=True)
    dec = decode_jpeg(enc)
    assert dec.shape == rgb.shape
    # chroma is halved: looser bound, but luma structure must survive
    assert np.abs(dec.astype(int) - rgb.astype(int)).mean() < 4.0


def test_restart_interval_roundtrip_and_marker_presence():
    g = _gradient()
    enc = encode_jpeg(g, quality=90, restart_interval=2)
    assert b"\xff\xdd" in enc  # DRI segment
    assert b"\xff\xd0" in enc  # at least the first RST marker
    dec = decode_jpeg(enc)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 3


def test_jpeg_header_matches_decode_dims():
    g = _gradient(23, 41)  # deliberately not multiples of 8
    enc = encode_jpeg(g)
    assert jpeg_header(enc) == (41, 23, 1)
    rgb = np.stack([g] * 3, axis=2)
    enc = encode_jpeg(rgb, subsample=True)
    assert jpeg_header(enc) == (41, 23, 3)
    assert decode_jpeg(enc).shape == (23, 41, 3)


def test_lossless_frame_is_gated():
    enc = bytearray(encode_jpeg(_gradient()))
    idx = enc.index(b"\xff\xc0")
    enc[idx + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless)
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(bytes(enc))
    with pytest.raises(NotImplementedError, match="lossless"):
        jpeg_header(bytes(enc))


# ---------------------------------------------------------------------------
# progressive (SOF2) — r06 verdict #4: fixture-free round-trips via the
# progressive encoder, which codes the SAME quantized coefficients as
# the baseline encoder, so both streams must decode to IDENTICAL pixels


def test_progressive_default_script_matches_baseline_pixels():
    from tajo_spark.operators.jpeg import encode_jpeg_progressive

    g = _gradient()
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g)),
        decode_jpeg(encode_jpeg_progressive(g)),
    )
    rgb = np.stack(
        [_gradient(), (_gradient() * 3 + 17) % 256, 255 - _gradient()],
        axis=2,
    ).astype(np.uint8)
    for sub in (False, True):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(rgb, subsample=sub)),
            decode_jpeg(encode_jpeg_progressive(rgb, subsample=sub)),
        ), f"subsample={sub}"


def test_progressive_header_and_mislabeled_baseline():
    from tajo_spark.operators.jpeg import encode_jpeg_progressive

    g = _gradient()
    prog = encode_jpeg_progressive(g)
    assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog
    assert jpeg_header(prog) == (g.shape[1], g.shape[0], 1)
    # a baseline stream whose SOF marker is rewritten to SOF2 violates
    # the progressive scan rules (DC scan must have Se=0) -> ValueError
    enc = bytearray(encode_jpeg(g))
    idx = enc.index(b"\xff\xc0")
    enc[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(enc))


def _random_scan_script(rng, nch: int) -> list:
    """A random LEGAL progressive scan script: DC successive
    approximation chain, then per component random contiguous spectral
    bands each with its own successive-approximation chain to Al=0."""
    comps = list(range(nch))
    dc_al = int(rng.integers(0, 3))
    script = [(comps, 0, 0, 0, dc_al)]
    for al in range(dc_al - 1, -1, -1):
        script.append((comps, 0, 0, al + 1, al))
    for ci in range(nch):
        cuts = sorted(
            {1, 64}
            | set(int(x) for x in rng.integers(2, 64, size=int(rng.integers(0, 3))))
        )
        for b0, b1 in zip(cuts, cuts[1:]):
            ac_al = int(rng.integers(0, 3))
            script.append(([ci], b0, b1 - 1, 0, ac_al))
            for al in range(ac_al - 1, -1, -1):
                script.append(([ci], b0, b1 - 1, al + 1, al))
    return script


def test_progressive_property_random_scripts_gray():
    """Property sweep: random legal scan scripts over random images
    and dims — every progression must decode to the exact pixels of
    the baseline coding (same coefficients, different scan order)."""
    from tajo_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(20260815)
    for _ in range(8):
        h, w = int(rng.integers(8, 60)), int(rng.integers(8, 60))
        img = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        script = _random_scan_script(rng, 1)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img)),
            decode_jpeg(encode_jpeg_progressive(img, scan_script=script)),
        ), script


def test_progressive_property_random_scripts_rgb_subsampled():
    from tajo_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(7)
    for _ in range(4):
        h, w = int(rng.integers(9, 50)), int(rng.integers(9, 50))
        img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        script = _random_scan_script(rng, 3)
        sub = bool(rng.integers(0, 2))
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img, subsample=sub)),
            decode_jpeg(
                encode_jpeg_progressive(img, scan_script=script, subsample=sub)
            ),
        ), (script, sub)


def test_progressive_truncation_raises_valueerror():
    from tajo_spark.operators.jpeg import encode_jpeg_progressive

    enc = encode_jpeg_progressive(_gradient())
    sos = enc.index(b"\xff\xda")
    for cut in range(sos + 20, len(enc) - 2, 37):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(enc[:cut])


# ---------------------------------------------------------------------------
# spec-derived bitstream witnesses (independent of our own decoder)


def test_solid_gray_entropy_bytes_hand_derived():
    """An 8x8 solid-128 block level-shifts to all-zero coefficients:
    DC diff 0 (category 0) then EOB.  Under the T.81 Annex K canonical
    code assignment, DC-luma symbol 0 is '00' and AC-luma EOB (0x00)
    is '1010'; padded with 1-bits that is 0b00101011 = 0x2B — the
    entropy-coded data must be EXACTLY that byte."""
    enc = encode_jpeg(np.full((8, 8), 128, dtype=np.uint8), quality=50)
    sos = enc.index(b"\xff\xda")
    (ln,) = struct.unpack(">H", enc[sos + 2 : sos + 4])
    entropy = enc[sos + 2 + ln : -2]  # up to EOI
    assert entropy == b"\x2b"


def test_solid_color_exact_recovery_through_quantizer():
    """Solid 200 gray: DC = 64*(200-128)/8 = 576, exactly divisible by
    the q50 luma DC step (16) — quantization is lossless here, so the
    decoder must return exactly 200 everywhere."""
    dec = decode_jpeg(
        encode_jpeg(np.full((16, 24), 200, dtype=np.uint8), quality=50)
    )
    assert np.all(dec == 200)


# ---------------------------------------------------------------------------
# the dispatch seam


def test_image_header_dispatches_both_containers():
    g = _texture(3)
    assert image_header(encode_png(g)) == (64, 48, 1)
    assert image_header(encode_jpeg(g)) == (64, 48, 1)


def test_gray_signal_agrees_across_containers():
    """Same pixels through PNG (lossless) and JPEG (q95) must yield
    nearly identical gray signals — the dispatchers share the integer
    BT.601 luma rule, so the only difference is codec loss."""
    g = _texture(11)
    rgb = np.stack([g, g, g], axis=2)
    png_sig = png_gray_signal(encode_png(rgb)).astype(int)
    jpg_sig = image_gray_signal(encode_jpeg(rgb, quality=95)).astype(int)
    assert png_sig.shape == jpg_sig.shape
    assert np.abs(png_sig - jpg_sig).mean() < 2.0


# ---------------------------------------------------------------------------
# end-to-end through the Arrow passes on a MIXED png/jpeg corpus


@pytest.fixture(scope="module")
def mixed_corpus(spark):
    base = _texture(1)
    near = base.copy()
    rng = np.random.default_rng(1)
    ys = rng.integers(0, base.shape[0], 20)
    xs = rng.integers(0, base.shape[1], 20)
    near[ys, xs] = np.clip(near[ys, xs].astype(int) + 6, 0, 255)
    rows = [
        (1, bytearray(encode_png(base))),
        (2, bytearray(encode_jpeg(base, quality=95))),  # cross-codec dup
        (3, bytearray(encode_jpeg(near, quality=95))),  # near-dup
        (4, bytearray(encode_jpeg(_texture(999), quality=95))),
    ]
    return spark.createDataFrame(rows, "doc_id long, content binary")


def test_image_metadata_real_jpeg_dims(mixed_corpus):
    rows = {
        r.doc_id: r
        for r in M.image_metadata(mixed_corpus, fake=False).collect()
    }
    assert rows[2].width == 64 and rows[2].height == 48
    assert rows[2].channels == 1


def test_blockhash_neardup_across_codecs(mixed_corpus):
    """The PNG and its JPEG re-encode are the canonical perceptual
    near-dup (exact-hash dedup misses them); the perturbed JPEG is
    near; the unrelated texture is far."""
    pairs = {
        (r.doc_a, r.doc_b)
        for r in phash_neardup_pairs(
            image_blockhash(mixed_corpus, fake=False), max_hamming=3
        ).collect()
    }
    assert (1, 2) in pairs  # cross-codec re-encode caught
    assert (1, 3) in pairs or (2, 3) in pairs  # perturbation caught
    assert all(4 not in p for p in pairs)


def test_embed_content_real_jpeg(mixed_corpus):
    rows = {
        r.doc_id: np.array(r.embedding)
        for r in M.embed_content(mixed_corpus, dim=16, fake=False).collect()
    }
    assert all(v.shape == (16,) for v in rows.values())
    # cross-codec re-encode embeds ~identically; unrelated far
    assert np.linalg.norm(rows[1] - rows[2]) < 0.05
    assert np.linalg.norm(rows[1] - rows[4]) > 0.2


def test_resize_real_jpeg_thumbnail(mixed_corpus):
    out = {
        r.doc_id: r
        for r in M.resize_image(
            mixed_corpus, max_side=16, fake=False
        ).collect()
    }
    r2 = out[2]
    assert max(r2.width, r2.height) <= 16
    # thumbnails normalize to PNG (lossless at thumbnail size)
    from tajo_spark.operators.codecs import decode_png

    assert decode_png(bytes(r2.resized)).shape == (r2.height, r2.width, 1)


def test_truncated_entropy_raises_valueerror_not_indexerror():
    """Malformed-input contract (ADVICE r06 jpeg.py:384): a corrupt
    stream must raise ValueError/NotImplementedError — never a raw
    IndexError — so one bad image fails its Arrow batch diagnosably."""
    enc = encode_jpeg(_gradient())
    # truncate at many points inside the entropy-coded segment
    sos = enc.index(b"\xff\xda")
    for cut in range(sos + 20, len(enc) - 2, 7):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(enc[:cut])


def test_bitflipped_entropy_never_raises_indexerror():
    """Single-byte corruption anywhere in the entropy data decodes,
    or fails with the codec's contracted error types — an AC run
    pushing k past 63 must be ValueError, not IndexError."""
    enc = bytearray(encode_jpeg(_gradient()))
    sos = enc.index(b"\xff\xda")
    start = sos + 14
    for pos in range(start, len(enc) - 2, 3):
        mut = bytearray(enc)
        mut[pos] ^= 0x5A
        try:
            decode_jpeg(bytes(mut))
        except (ValueError, NotImplementedError):
            pass  # contracted failure modes
        # any other exception type (IndexError, struct.error) fails
