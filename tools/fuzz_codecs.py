#!/usr/bin/env python
"""Offline codec fuzz sweep — the heavy version of the standing gate in
tests/test_codecs.py::test_codec_fuzz_contract_all_formats.

Three phases, each targeting a bug class that byte-flip fuzzing alone
missed in round 7 (the advisor's two FLAC findings were an encoder
shape-edge crash and a crafted semantic field, not random byte noise):

  1. encoder shape sweep — adversarial input shapes/params through every
     encoder; every successful encode must decode back bit-exact, and
     rejected inputs must raise ValueError only.
  2. structure-aware mutation — overwrite 1-4 byte fields at every offset
     in the first 64 bytes (headers live there) with boundary values
     (0x00, 0xFF, 0x7F, 0x80), plus truncation at EVERY byte boundary of
     small samples.  Decoders must raise ValueError/NotImplementedError
     or decode — nothing else, and never allocate unboundedly.
  3. random byte mutation at volume (the standing gate, more trials,
     more diverse seeds).

Usage: python tools/fuzz_codecs.py [--trials 2000] [--phase all]
Exit 0 = contract holds; nonzero prints repro snippets for each breach.
"""
from __future__ import annotations

import argparse
import sys
import traceback

import numpy as np

sys.path.insert(0, ".")

from tajo_spark.operators.avi import decode_avi_frames, encode_avi_mjpeg
from tajo_spark.operators.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)
from tajo_spark.operators.flac import decode_flac, encode_flac
from tajo_spark.operators.gif import decode_gif, encode_gif
from tajo_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)

OK_ERRORS = (ValueError, NotImplementedError)
BREACHES: list[str] = []


def breach(msg: str) -> None:
    BREACHES.append(msg)
    print(f"BREACH: {msg}", flush=True)


def _grad(h: int, w: int, c: int | None = None, depth: int = 8) -> np.ndarray:
    hi = 65535 if depth == 16 else 255
    g = (np.add.outer(np.arange(h) * 3, np.arange(w) * 5) * 97) % (hi + 1)
    if c is not None:
        g = np.stack([(g + i * 31) % (hi + 1) for i in range(c)], axis=2)
    return g.astype(np.uint16 if depth == 16 else np.uint8)


# ---------------------------------------------------------------- phase 1
def phase_encoder_shapes() -> None:
    print("== phase 1: encoder shape sweep ==", flush=True)

    # PNG: tiny dims x every filter x interlace x depth x channels.
    # Adam7 on dims < 8 yields empty passes — a classic crash site.
    for h, w in [(1, 1), (1, 7), (7, 1), (2, 3), (3, 2), (8, 8), (9, 5),
                 (5, 9), (16, 1), (1, 16), (13, 13)]:
        for c in [None, 3]:
            for ft in range(5):
                for il in (False, True):
                    for depth in (8, 16):
                        tag = f"png {h}x{w}x{c} ft={ft} il={il} d={depth}"
                        try:
                            px = _grad(h, w, c, depth)
                            enc = encode_png(px, filter_type=ft,
                                             interlaced=il, depth=depth)
                            out = decode_png(enc)
                            # contract: (H, W, C) uint8; 16-bit decodes
                            # to its high-byte 8-bit view
                            ref = (px >> 8 if depth == 16
                                   else px).astype(np.uint8)
                            if ref.ndim == 2:
                                ref = ref[:, :, None]
                            if out.shape != ref.shape or not np.array_equal(
                                    out, ref):
                                breach(f"{tag}: round-trip mismatch")
                        except OK_ERRORS:
                            pass
                        except Exception as e:
                            breach(f"{tag}: {type(e).__name__}: {e}")

    # FLAC: lengths straddling frame boundaries, tiny final frames (the
    # r7 ADVICE crash class), tiny blocksizes, constant and extreme
    # signals, mono + stereo + mid/side.
    lengths = [1, 2, 3, 4, 5, 15, 16, 17, 4095, 4096, 4097, 4098, 4099,
               8191, 8192, 8193, 3000]
    blocksizes = [16, 17, 192, 1000, 3000, 4096]
    rng = np.random.default_rng(7)
    for n in lengths:
        base = np.clip(3000 * np.sin(np.arange(n) / 7.0), -32768,
                       32767).astype(np.int64)
        tail = base.copy()
        if n >= 2:
            tail[-1] = 31000
            tail[-2] = -31000
        signals = {
            "sine": base, "tail-distinct": tail,
            "const": np.full(n, 123, np.int64),
            "extreme": ((np.arange(n) % 2) * 65535 - 32768).astype(np.int64),
            "rand": rng.integers(-32768, 32767, n).astype(np.int64),
        }
        for bs in blocksizes:
            for name, sig in signals.items():
                for ch in (1, 2):
                    for ms in ((True, False) if ch == 2 else (False,)):
                        s = (np.stack([sig, -sig // 2], axis=1)
                             if ch == 2 else sig)
                        tag = f"flac n={n} bs={bs} {name} ch={ch} ms={ms}"
                        try:
                            enc = encode_flac(s, 8000, blocksize=bs,
                                              mid_side=ms)
                            sr, out = decode_flac(enc)
                            if out.reshape(s.shape).tolist() != s.tolist():
                                breach(f"{tag}: lossless mismatch")
                        except OK_ERRORS:
                            pass
                        except Exception as e:
                            breach(f"{tag}: {type(e).__name__}: {e}")

    # GIF: tiny dims, interlaced heights below the pass strides,
    # frame-count edges, full-palette range.
    for h, w in [(1, 1), (1, 9), (9, 1), (2, 2), (3, 3), (4, 4), (7, 5),
                 (8, 8), (15, 3)]:
        for il in (False, True):
            for nf in (1, 2, 3):
                tag = f"gif {h}x{w} il={il} nf={nf}"
                try:
                    frames = [(_grad(h, w) + i * 17) % 256
                              for i in range(nf)]
                    frames = [f.astype(np.uint8) for f in frames]
                    enc = encode_gif(frames, interlaced=il)
                    # contract: decode_gif returns ONE composited
                    # (H, W, 3) RGB frame; grayscale palette means all
                    # channels carry the index value
                    for i, fr in enumerate(frames):
                        out = decode_gif(enc, frame=i)
                        if out.shape != (h, w, 3) or not np.array_equal(
                                out[:, :, 0], fr):
                            breach(f"{tag}: frame {i} mismatch")
                            break
                except OK_ERRORS:
                    pass
                except Exception as e:
                    breach(f"{tag}: {type(e).__name__}: {e}")

    # GIF: frames of mismatched shapes must be a clean error, not a crash.
    try:
        encode_gif([_grad(4, 4), _grad(5, 5)])
    except OK_ERRORS:
        pass
    except Exception as e:
        breach(f"gif mismatched frame shapes: {type(e).__name__}: {e}")

    # JPEG: sub-block and MCU-straddling dims, quality extremes,
    # gray/RGB, subsampled and not, progressive.
    for h, w in [(1, 1), (1, 8), (8, 1), (7, 7), (8, 8), (9, 9), (15, 17),
                 (16, 16), (17, 15), (24, 31)]:
        for c in (None, 3):
            for q in (1, 50, 100):
                for sub in ((False, True) if c == 3 else (False,)):
                    tag = f"jpeg {h}x{w}x{c} q={q} sub={sub}"
                    try:
                        px = _grad(h, w, c)
                        enc = encode_jpeg(px, quality=q, subsample=sub)
                        out = decode_jpeg(enc)
                        want = (h, w) if c is None else (h, w, c)
                        if out.shape[:2] != (h, w):
                            breach(f"{tag}: shape {out.shape} != {want}")
                    except OK_ERRORS:
                        pass
                    except Exception as e:
                        breach(f"{tag}: {type(e).__name__}: {e}")
            tag = f"jpeg-prog {h}x{w}x{c}"
            try:
                px = _grad(h, w, c)
                enc = encode_jpeg_progressive(px)
                out = decode_jpeg(enc)
                if out.shape[:2] != (h, w):
                    breach(f"{tag}: bad shape {out.shape}")
            except OK_ERRORS:
                pass
            except Exception as e:
                breach(f"{tag}: {type(e).__name__}: {e}")

    # WAV: empty / single-sample / extreme values.
    for n in (0, 1, 2, 3, 100):
        tag = f"wav n={n}"
        try:
            s = ((np.arange(n) % 2) * 65535 - 32768).astype(np.int16)
            enc = encode_wav(s, 8000)
            sr, out = decode_wav(enc)
            if out.tolist() != s.tolist():
                breach(f"{tag}: round-trip mismatch")
        except OK_ERRORS:
            pass
        except Exception as e:
            breach(f"{tag}: {type(e).__name__}: {e}")

    # AVI: frame-count edges, fps extremes, tiny embedded JPEGs.
    small = encode_jpeg(_grad(8, 8))
    for nf in (0, 1, 2, 5):
        for fps in (1, 5, 60):
            tag = f"avi nf={nf} fps={fps}"
            try:
                enc = encode_avi_mjpeg([small] * nf, fps=fps)
                out = decode_avi_frames(enc)
                if len(out) != nf:
                    breach(f"{tag}: {len(out)} frames != {nf}")
            except OK_ERRORS:
                pass
            except Exception as e:
                breach(f"{tag}: {type(e).__name__}: {e}")


# ---------------------------------------------------------------- phase 2
def _samples() -> list[tuple[str, bytes, object]]:
    g = _grad(24, 32)
    rgb = _grad(24, 32, 3)
    tone = np.clip(2000 * np.sin(np.arange(3000) / 17.0), -32768,
                   32767).astype(np.int64)
    return [
        ("jpeg", encode_jpeg(rgb, subsample=True), decode_jpeg),
        ("jpeg-prog", encode_jpeg_progressive(g), decode_jpeg),
        ("flac", encode_flac(tone, 8000), decode_flac),
        ("flac-stereo", encode_flac(
            np.stack([tone, -tone // 3], axis=1), 8000), decode_flac),
        ("gif", encode_gif([g, (255 - g)], interlaced=True), decode_gif),
        ("png", encode_png(g, filter_type=4, interlaced=True), decode_png),
        ("png16", encode_png(_grad(9, 9, None, 16), depth=16), decode_png),
        ("wav", encode_wav(tone.astype(np.int16), 8000), decode_wav),
        ("avi", encode_avi_mjpeg([encode_jpeg(g)] * 2, fps=5),
         decode_avi_frames),
    ]


def _try(tag: str, dec, payload: bytes) -> None:
    try:
        dec(payload)
    except OK_ERRORS:
        pass
    except MemoryError:
        breach(f"{tag}: MemoryError (pre-validation allocation)")
    except Exception as e:
        snippet = payload[:48].hex()
        breach(f"{tag}: {type(e).__name__}: {e} | head={snippet}")


def phase_structured() -> None:
    print("== phase 2: structure-aware field mutation ==", flush=True)
    field_vals = [b"\x00", b"\xff", b"\x7f", b"\x80",
                  b"\x00\x00", b"\xff\xff", b"\x7f\xff", b"\x80\x00",
                  b"\xff\xff\xff\xff", b"\x00\x00\x00\x00",
                  b"\x7f\xff\xff\xff"]
    for name, enc, dec in _samples():
        # overwrite fields at every offset in the header region and at a
        # stride through the body
        offsets = list(range(0, min(96, len(enc)))) + list(
            range(96, len(enc), 97))
        for off in offsets:
            for fv in field_vals:
                if off + len(fv) > len(enc):
                    continue
                mut = enc[:off] + fv + enc[off + len(fv):]
                _try(f"{name} field@{off}={fv.hex()}", dec, mut)
        # truncate at every boundary (cap work for big payloads)
        step = max(1, len(enc) // 512)
        for cut in range(0, len(enc), step):
            _try(f"{name} trunc@{cut}", dec, enc[:cut])
        print(f"  {name}: {len(offsets) * len(field_vals)} field cases + "
              f"{len(enc) // step} truncations", flush=True)


# ---------------------------------------------------------------- phase 3
def phase_random(trials: int) -> None:
    print(f"== phase 3: random mutation x{trials} ==", flush=True)
    rng = np.random.default_rng(20260816)
    for name, enc, dec in _samples():
        enc_b = bytearray(enc)
        for trial in range(trials):
            mut = bytearray(enc_b)
            kind = trial % 4
            if kind == 0:
                mut = mut[: int(rng.integers(1, len(mut)))]
            elif kind == 3 and len(mut) > 8:
                # splice: duplicate a random window over another offset
                a, b = sorted(rng.integers(0, len(mut), 2).tolist())
                b = min(b, a + 64)
                dst = int(rng.integers(0, len(mut) - (b - a) + 1))
                mut[dst:dst + (b - a)] = mut[a:b]
            else:
                for _ in range(1 + trial % 5):
                    mut[int(rng.integers(0, len(mut)))] ^= int(
                        rng.integers(1, 256))
            _try(f"{name} rnd#{trial}", dec, bytes(mut))
        print(f"  {name}: {trials} cases", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=1000)
    ap.add_argument("--phase", default="all",
                    choices=["all", "shapes", "struct", "random"])
    args = ap.parse_args()
    if args.phase in ("all", "shapes"):
        phase_encoder_shapes()
    if args.phase in ("all", "struct"):
        phase_structured()
    if args.phase in ("all", "random"):
        phase_random(args.trials)
    print(f"\n{len(BREACHES)} breaches")
    return 1 if BREACHES else 0


if __name__ == "__main__":
    sys.exit(main())
