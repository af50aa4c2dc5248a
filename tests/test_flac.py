"""FLAC codec (operators/flac.py) + the codecs.audio_* dispatch seam.

Round-trip tests alone could hide a shared encoder/decoder bug, so the
bitstream itself is pinned: CRC polynomials against hand-computed
vectors, the UTF-8-style coded-number framing, STREAMINFO field
layout, and frame sync — all spec-derived witnesses independent of our
own decoder.
"""

from __future__ import annotations

import numpy as np
import pytest

from tajo_spark.operators.flac import (
    _crc8,
    _crc16,
    _Bits,
    _read_coded_number,
    _BitW,
    _write_coded_number,
    decode_flac,
    encode_flac,
    flac_header,
    flac_mono_signal,
    parse_streaminfo,
)


def _tone(n=20000, seed=0, amp=3000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = amp * np.sin(t / 29.0) + rng.integers(-150, 151, n)
    return np.clip(x, -(1 << 15), (1 << 15) - 1).astype(np.int64)


# ---------------------------------------------------------------------------
# spec witnesses (independent of our decoder)


def test_crc8_spec_vector():
    # x^8+x^2+x+1 over "123456789" is the standard CRC-8/SMBUS check
    assert _crc8(b"123456789") == 0xF4


def test_crc16_spec_vector():
    # x^16+x^15+x^2+1 (BUYPASS variant: init 0, no reflection)
    assert _crc16(b"123456789") == 0xFEE8


def test_coded_number_roundtrip_and_framing():
    for v in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF,
              0x3FFFFFF, (1 << 31) - 1, (1 << 36) - 1]:
        bw = _BitW()
        _write_coded_number(bw, v)
        bw.align()
        assert _read_coded_number(_Bits(bytes(bw.out))) == v, v
    # single-byte values use exactly one byte; 36-bit uses seven
    bw = _BitW(); _write_coded_number(bw, 0x7F); assert len(bw.out) == 1
    bw = _BitW(); _write_coded_number(bw, (1 << 36) - 1)
    assert len(bw.out) == 7 and bw.out[0] == 0xFE


def test_streaminfo_layout():
    enc = encode_flac(_tone(5000), 44100)
    assert enc[:4] == b"fLaC"
    info = parse_streaminfo(enc)
    assert info["sample_rate"] == 44100
    assert info["channels"] == 1
    assert info["bps"] == 16
    assert info["total_samples"] == 5000
    # frame sync directly after the single metadata block
    p = info["frames_pos"]
    assert enc[p] == 0xFF and (enc[p + 1] >> 2) == 0b111110


def test_streaminfo_md5_is_of_raw_samples():
    import hashlib

    x = _tone(3000)
    info = parse_streaminfo(encode_flac(x, 8000))
    assert info["md5"] == hashlib.md5(
        x.astype("<i2").tobytes()
    ).digest()


# ---------------------------------------------------------------------------
# lossless round trips


def test_mono_roundtrip_exact():
    x = _tone()
    sr, dec = decode_flac(encode_flac(x, 44100))
    assert sr == 44100 and np.array_equal(dec[:, 0], x)


def test_stereo_midside_and_independent_exact():
    rng = np.random.default_rng(3)
    left = _tone(12345, seed=4)
    right = np.clip(
        left + rng.integers(-80, 81, len(left)), -(1 << 15), (1 << 15) - 1
    )
    st = np.stack([left, right], axis=1)
    for ms in (True, False):
        _, dec = decode_flac(encode_flac(st, 48000, mid_side=ms))
        assert np.array_equal(dec, st), f"mid_side={ms}"


def test_midside_compresses_correlated_stereo():
    rng = np.random.default_rng(5)
    left = _tone(16384, seed=6)
    right = np.clip(left + rng.integers(-30, 31, len(left)),
                    -(1 << 15), (1 << 15) - 1)
    st = np.stack([left, right], axis=1)
    assert len(encode_flac(st, 48000, mid_side=True)) < len(
        encode_flac(st, 48000, mid_side=False)
    )


def test_constant_noise_short_and_odd_tail():
    rng = np.random.default_rng(7)
    cases = [
        np.full(5000, -123, dtype=np.int64),
        rng.integers(-30000, 30001, 9999).astype(np.int64),
        np.arange(-100, 101, dtype=np.int64),  # shorter than a block
        rng.integers(-5, 6, 4097).astype(np.int64),  # one-sample tail
    ]
    for x in cases:
        sr, dec = decode_flac(encode_flac(x, 16000))
        assert np.array_equal(dec[:, 0], x)


def test_compresses_tonal_audio():
    x = _tone(40000)
    assert len(encode_flac(x, 44100)) < 0.8 * (2 * len(x))


def test_property_random_signals(rng_seed=11):
    rng = np.random.default_rng(rng_seed)
    for _ in range(6):
        n = int(rng.integers(50, 12000))
        kind = rng.integers(0, 3)
        if kind == 0:
            x = rng.integers(-(1 << 15), 1 << 15, n)
        elif kind == 1:
            x = np.cumsum(rng.integers(-50, 51, n))
            x = np.clip(x, -(1 << 15), (1 << 15) - 1)
        else:
            t = np.arange(n)
            x = (2000 * np.sin(t / 7.0)).astype(np.int64)
        x = x.astype(np.int64)
        _, dec = decode_flac(encode_flac(x, 22050))
        assert np.array_equal(dec[:, 0], x), (n, kind)


# ---------------------------------------------------------------------------
# malformed-input contract


def test_corruption_detected_by_crc():
    enc = bytearray(encode_flac(_tone(4000), 8000))
    info = parse_streaminfo(bytes(enc))
    # flip one bit inside the first frame body (past its header)
    enc[info["frames_pos"] + 30] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(enc))


def test_truncation_raises_valueerror():
    enc = encode_flac(_tone(6000), 8000)
    info = parse_streaminfo(enc)
    for cut in range(info["frames_pos"] + 5, len(enc), 211):
        with pytest.raises(ValueError):
            decode_flac(enc[:cut])


def test_not_flac_raises():
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFFxxxxWAVE" + b"\x00" * 50)


# ---------------------------------------------------------------------------
# seam dispatch


def test_audio_seam_dispatches_wav_and_flac():
    from tajo_spark.operators.codecs import (
        audio_header,
        audio_mono_signal,
        encode_wav,
        sniff,
    )

    x = _tone(2500)
    flac_bytes = encode_flac(x, 16000)
    wav_bytes = encode_wav(x.astype(np.int16), 16000)
    assert sniff(flac_bytes) == "flac" and sniff(wav_bytes) == "wav"
    assert audio_header(flac_bytes) == (16000, 2500)
    assert audio_header(wav_bytes) == (16000, 2500)
    assert np.array_equal(
        audio_mono_signal(flac_bytes), audio_mono_signal(wav_bytes)
    )
    with pytest.raises(NotImplementedError):
        audio_header(b"ID3\x04" + b"\x00" * 60)  # MP3 stays gated


def test_audiofp_fingerprint_identical_across_containers(spark):
    """The SAME signal through WAV and FLAC yields the SAME Haitsma-
    Kalker fingerprint — the decode seam is container-transparent."""
    from tajo_spark.operators.audiofp import audio_fingerprint
    from tajo_spark.operators.codecs import encode_wav

    x = _tone(9000, seed=9)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(x.astype(np.int16), 16000))),
            (2, bytearray(encode_flac(x, 16000))),
        ],
        "doc_id LONG, content BINARY",
    )
    rows = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3)
        for r in audio_fingerprint(df, fake=False).collect()
    }
    assert rows[1] == rows[2]


# ---------------------------------------------------------------------------
# MJPEG-AVI video (operators/avi.py) — the video leg of the same round


def _mk_avi(n=6, w=32, h=24, salt=0):
    from tajo_spark.operators.avi import encode_avi_mjpeg
    from tajo_spark.operators.jpeg import encode_jpeg

    frames = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        g = ((yy * 3 + xx * 5 + i * 17 + salt) % 256).astype(np.uint8)
        frames.append(encode_jpeg(g, quality=90))
    return frames, encode_avi_mjpeg(frames, fps=5)


def test_avi_roundtrip_and_header():
    from tajo_spark.operators.avi import (
        avi_frame_jpegs,
        decode_avi_frames,
        video_header,
    )
    from tajo_spark.operators.jpeg import decode_jpeg

    frames, avi = _mk_avi()
    assert video_header(avi) == (32, 24, 6, 5.0)
    assert avi_frame_jpegs(avi) == frames  # byte-exact chunk spans
    for i, dec in zip([0, 3, 5], decode_avi_frames(avi, [0, 3, 5])):
        assert np.array_equal(dec, decode_jpeg(frames[i]))


def test_avi_rejects_non_avi_and_non_mjpeg():
    from tajo_spark.operators.avi import parse_avi

    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"RIFFxxxxWAVE" + b"\x00" * 40)
    _, avi = _mk_avi(2)
    bad = avi.replace(b"MJPG", b"H264")
    with pytest.raises(NotImplementedError, match="MJPG only"):
        parse_avi(bad)


def test_avi_sniff():
    from tajo_spark.operators.codecs import sniff

    _, avi = _mk_avi(1)
    assert sniff(avi) == "avi"


def test_sample_frames_real_decodes_sampled_frames(spark):
    """fake=False frame sampling on real MJPEG bytes: every_n stride,
    max_frames cap, and frame_key = md5 of DECODED pixels (identical
    frames across containers hash identically; distinct frames
    don't)."""
    from tajo_spark.operators.jpeg import decode_jpeg
    from tajo_spark.operators.multimodal import sample_frames
    import hashlib as hl

    frames, avi = _mk_avi(n=9)
    df = spark.createDataFrame(
        [(1, bytearray(avi))], "doc_id LONG, content BINARY"
    )
    rows = sorted(
        (r.frame_idx, r.frame_key)
        for r in sample_frames(
            df, every_n=3, max_frames=2, fake=False
        ).collect()
    )
    assert [i for i, _ in rows] == [0, 3]
    for i, key in rows:
        want = hl.md5(decode_jpeg(frames[i]).tobytes()).hexdigest()[:8]
        assert key == want


def test_residual_partition_order_must_divide_blocksize():
    """r07 advice: po that doesn't divide the blocksize produced a
    short residual list and a raw IndexError downstream; it must be
    rejected as malformed at the residual reader."""
    from tajo_spark.operators.flac import _decode_residual

    # method=0 (2 bits) then po=4 (4 bits): byte 0b000100_00
    bits = _Bits(bytes([0b00010000]) + b"\x00" * 64)
    with pytest.raises(ValueError, match="does not divide"):
        _decode_residual(bits, 3000, 0)


def test_encode_tiny_nonconstant_final_frame_roundtrips():
    """r07 advice: 4098 samples with a non-constant 2-sample tail
    crashed _write_residual (best=None).  Must round-trip exactly."""
    x = np.zeros(4098, dtype=np.int64)
    x[-1] = 7
    x[-2] = -3
    blob = encode_flac(x, 8000)
    sr, out = decode_flac(blob)
    assert sr == 8000
    np.testing.assert_array_equal(out[:, 0], x)


def test_flac_entry_points_wrap_malformed_as_valueerror():
    """Entry points carry @malformed_guard('FLAC'): any escaping
    low-level error surfaces as ValueError, never IndexError etc."""
    junk = b"fLaC" + bytes(50)  # magic but garbage metadata walk
    for fn in (flac_header, decode_flac, flac_mono_signal):
        with pytest.raises((ValueError, NotImplementedError)):
            fn(junk)
