"""Pure-stdlib media codecs: PNG (zlib) and WAV (wave module).

This container ships no media libraries (no PIL/opencv/soundfile), but
a real decode path matters: the perceptual near-dup operators
(operators/phash.py, operators/audiofp.py) and the multimodal stages
(operators/multimodal.py) should run on actual encoded bytes, not only
on the deterministic fake twins.  Both formats here need nothing
beyond the Python standard library:

  * PNG — container chunks are ``struct``-parsed, pixel data is
    ``zlib``-compressed scanlines with five per-row predictors
    (None/Sub/Up/Average/Paeth — RFC 2083 §6); unfiltering is the only
    real work and is implemented row-vectorized in numpy.  Supported:
    8- and 16-bit depth (16-bit reduced to the high byte for the
    uint8 pipeline), color types 0 (gray), 2 (RGB), 3 (palette), 4
    (gray+alpha), 6 (RGBA), and Adam7 interlacing (seven
    independently filtered passes, de-interleaved on decode) — the
    full practical PNG surface since round 7.
  * WAV — stdlib ``wave`` handles the RIFF container; 8/16/32-bit PCM
    frames are decoded with numpy and downmixed to mono by integer
    channel mean.

JPEG decodes for real since round 6 — operators/jpeg.py implements
baseline sequential T.81 (Huffman + IDCT, subsampling, restart
markers) from the public spec, and round 7 added progressive (SOF2,
spectral selection + successive approximation); arithmetic/12-bit
remain gated there.  FLAC decodes for real since round 7 —
operators/flac.py implements the full RFC 9639 frame/subframe family
(FIXED + LPC predictors, Rice partitions, stereo decorrelation) with a
scan-scripted lossless encoder for fixture-free round trips.  GIF
(LZW, interlace, animation — operators/gif.py) and MJPEG-in-AVI video
(operators/avi.py, real frame sampling through the JPEG codec) also
land in round 7.  MP3 and non-MJPEG video codecs stay gated (``sniff``
returns ``None`` → the callers' NotImplementedError path); deployments
carry ffmpeg for those.

The ``audio_*`` dispatchers (audio_header / audio_mono_signal) are the
audio twin of the image seam: every audio consumer (audio_metadata,
audiofp fingerprints) routes through them, so WAV and FLAC — and a
deployed soundfile/ffmpeg — plug in at exactly one place.

The ``image_*`` dispatchers below are the single seam every image
consumer goes through (metadata, resize, phash, embed): they sniff the
container and route to the right codec, so adding a format (or
swapping in PIL at deployment) touches exactly one place.

Everything is executor-side code — these functions run inside Arrow
``mapInPandas`` batches; nothing here touches Spark or the driver.

Reference parity: apache/tajo has no media operators; this closes the
"decode is the only simulated stage" gap called out in round 4.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def malformed_guard(kind: str):
    """Normalize a codec entry point's failure modes to the seam
    contract: malformed input raises ValueError (gated features keep
    NotImplementedError), never a raw struct.error / KeyError /
    IndexError / zlib.error / EOFError — fuzzing found all five
    escaping on mutated/truncated streams, and an untyped error fails
    a whole Arrow batch undiagnosably.

    Deliberately NOT caught: RuntimeError (incl. RecursionError) —
    those are codec bugs, not malformed input, and masking them as
    "malformed" hides the bug (round-7 advice).  Recursive walks in
    codecs were converted to explicit stacks so input shape can never
    trip the interpreter recursion limit."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except (ValueError, NotImplementedError):
                raise
            except (
                struct.error,
                KeyError,
                IndexError,
                EOFError,
                OverflowError,
                zlib.error,
                wave.Error,
            ) as exc:
                raise ValueError(
                    f"malformed {kind}: {type(exc).__name__}: {exc}"
                ) from exc

        return wrapped

    return deco

# channels per PNG color type (3 = palette expands to RGB on decode)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff(payload: bytes) -> str | None:
    """Cheap container sniff: png | jpeg | gif | wav | flac | avi |
    None (gated: WebP/TIFF/MP3/non-MJPEG video)."""
    if payload[:8] == PNG_SIG:
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


# ---------------------------------------------------------------------------
# PNG


def _png_chunks(payload: bytes):
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            break


@malformed_guard("PNG")
def png_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from IHDR alone — no decompression, so
    metadata extraction stays O(header) per image regardless of pixel
    count (what image_metadata wants at corpus scale)."""
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", data[:10])
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unknown PNG color type {color}")
            ch = 3 if color == 3 else _PNG_CHANNELS[color]
            return w, h, ch
    raise ValueError("PNG missing IHDR")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo the five per-scanline predictors (RFC 2083 §6.5-6.9).

    ``raw`` is the decompressed byte stream: h rows of
    (1 filter byte + stride pixel bytes).  Rows depend on the previous
    row, so the outer loop is per-row; within a row, Sub/Average/Paeth
    recurrences step by ``bpp`` — vectorized across the bpp lanes."""
    rows = raw.reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else zero.astype(np.int32)
        f = int(filters[y])
        if f == 0:  # None
            line = cur
        elif f == 2:  # Up
            line = (cur + prev) & 0xFF
        elif f == 1:  # Sub: pure left-recurrence = prefix sum per lane
            pad = (-stride) % bpp
            lanes = np.pad(cur, (0, pad)).reshape(-1, bpp)
            line = (lanes.cumsum(axis=0) & 0xFF).reshape(-1)[:stride]
        elif f in (3, 4):  # Average / Paeth: nonlinear left-recurrence
            # per-lane plain-int loops: the previous per-group numpy
            # segment ops paid ~5µs of dispatch per few-byte slice
            # (3 s for a 512² Paeth image; ~0.2 s this way)
            pad = (-stride) % bpp
            lanes_c = np.pad(cur, (0, pad)).reshape(-1, bpp)
            lanes_b = np.pad(prev, (0, pad)).reshape(-1, bpp)
            n = lanes_c.shape[0]
            cols = []
            for j in range(bpp):
                c = lanes_c[:, j].tolist()
                b = lanes_b[:, j].tolist()
                o = [0] * n
                a = ul = 0  # left, upper-left (0 at row start per spec)
                if f == 3:
                    for i in range(n):
                        a = (c[i] + ((a + b[i]) >> 1)) & 0xFF
                        o[i] = a
                else:
                    for i in range(n):
                        bi = b[i]
                        p = a + bi - ul
                        pa = p - a
                        if pa < 0:
                            pa = -pa
                        pb = p - bi
                        if pb < 0:
                            pb = -pb
                        pc = p - ul
                        if pc < 0:
                            pc = -pc
                        if pa <= pb and pa <= pc:
                            pred = a
                        elif pb <= pc:
                            pred = bi
                        else:
                            pred = ul
                        a = (c[i] + pred) & 0xFF
                        o[i] = a
                        ul = bi
                cols.append(o)
            line = np.array(cols, dtype=np.int32).T.reshape(-1)[:stride]
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = line.astype(np.uint8)
    return out


# Adam7 pass offsets/strides: (x0, y0, dx, dy) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


@malformed_guard("PNG")
def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8 array (palette expanded to RGB;
    16-bit samples reduced to their high byte, the standard 8-bit
    view; Adam7 interlaced images de-interleaved per pass)."""
    w = h = depth = color = None
    interlace = 0
    idat: list[bytes] = []
    plte = None
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
            if depth not in (8, 16):
                raise NotImplementedError(
                    f"PNG bit depth {depth} unsupported (8/16 only)"
                )
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unknown PNG color type {color}")
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = _PNG_CHANNELS[color]
    nbytes = depth // 8
    bpp = ch * nbytes
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)

    def to_samples(rows: np.ndarray, hh: int, ww: int) -> np.ndarray:
        if depth == 8:
            return rows.reshape(hh, ww, ch)
        pairs = rows.reshape(hh, ww, ch, 2).astype(np.uint16)
        return (pairs[..., 0] << 8) | pairs[..., 1]

    if interlace == 0:
        stride = w * bpp
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG pixel data length mismatch")
        px = to_samples(_unfilter(raw, h, stride, bpp), h, w)
    elif interlace == 1:  # Adam7: seven independently-filtered passes
        # validate the TOTAL expected stream size BEFORE allocating the
        # canvas: a corrupted IHDR width of ~2e9 would otherwise ask
        # numpy for a 100+ GiB array before any length check runs
        expected = 0
        for x0, y0, dx, dy in _ADAM7:
            ww = (w - x0 + dx - 1) // dx
            hh = (h - y0 + dy - 1) // dy
            if ww > 0 and hh > 0:
                expected += hh * (ww * bpp + 1)
        if expected != len(raw):
            raise ValueError("PNG pixel data length mismatch")
        px = np.zeros(
            (h, w, ch), dtype=np.uint16 if depth == 16 else np.uint8
        )
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            ww = (w - x0 + dx - 1) // dx
            hh = (h - y0 + dy - 1) // dy
            if ww <= 0 or hh <= 0:
                continue
            stride = ww * bpp
            n = hh * (stride + 1)
            if pos + n > len(raw):
                raise ValueError("PNG interlaced data ran short")
            sub = _unfilter(raw[pos : pos + n], hh, stride, bpp)
            pos += n
            px[y0::dy, x0::dx] = to_samples(sub, hh, ww)
        if pos != len(raw):
            raise ValueError("PNG pixel data length mismatch")
    else:
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        px = plte[px[:, :, 0]]
    if depth == 16:
        px = (px >> 8).astype(np.uint8)
    return px


def _filter_rows(
    byts: np.ndarray, bpp: int, filter_type: int
) -> bytes:
    """Apply one predictor to every row of a (h, stride) byte image —
    the byte-level inverse of _unfilter (PNG filters operate on bytes
    regardless of sample depth)."""
    h, stride = byts.shape
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    zero = np.zeros(bpp, dtype=np.int32)
    for y in range(h):
        cur = byts[y].astype(np.int32)
        left = np.concatenate([zero, cur[:-bpp]]) if stride > bpp else (
            np.zeros(stride, dtype=np.int32)
        )
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = (cur - left) & 0xFF
        elif filter_type == 2:
            filt = (cur - prev) & 0xFF
        elif filter_type == 3:
            filt = (cur - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:
            ul = np.concatenate([zero, prev[:-bpp]]) if stride > bpp else (
                np.zeros(stride, dtype=np.int32)
            )
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = (cur - pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {filter_type}")
        lines.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = cur
    return b"".join(lines)


def encode_png(
    arr: np.ndarray,
    filter_type: int = 0,
    interlaced: bool = False,
    depth: int = 8,
) -> bytes:
    """(H, W[, C]) uint8 (or uint16 with ``depth=16``) → PNG bytes.

    ``filter_type`` applies one predictor to every row (0-4) —
    exercising each unfilter path in tests is the point; production
    writers pick per-row.  ``interlaced=True`` writes Adam7 (seven
    independently filtered passes); ``depth=16`` writes big-endian
    16-bit samples."""
    a = np.asarray(arr, dtype=np.uint16 if depth == 16 else np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    nbytes = depth // 8
    bpp = ch * nbytes

    def as_bytes(img: np.ndarray) -> np.ndarray:
        hh, ww = img.shape[:2]
        if depth == 8:
            return img.reshape(hh, ww * ch)
        be = np.empty((hh, ww, ch, 2), dtype=np.uint8)
        be[..., 0] = (img >> 8).astype(np.uint8)
        be[..., 1] = (img & 0xFF).astype(np.uint8)
        return be.reshape(hh, ww * ch * 2)

    if not interlaced:
        stream = _filter_rows(as_bytes(a), bpp, filter_type)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = a[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_filter_rows(as_bytes(sub), bpp, filter_type))
        stream = b"".join(parts)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color, 0, 0, 1 if interlaced else 0
    )
    idat = zlib.compress(stream, 6)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


# integer ITU-R BT.601 luma — same cross-multiplied-integer discipline
# as phash.blockhash_bits, so every engine agrees bit-for-bit
_LUMA = np.array([299, 587, 114], dtype=np.int64)


def png_gray_signal(payload: bytes) -> np.ndarray:
    """PNG bytes → flattened row-major uint8 grayscale — the real
    decode twin of phash._fake_gray_signal (same output convention)."""
    px = decode_png(payload)
    ch = px.shape[2]
    if ch == 1:
        g = px[:, :, 0]
    elif ch == 2:  # gray+alpha: alpha does not change luminance
        g = px[:, :, 0]
    else:  # RGB / RGBA
        g = (
            (px[:, :, :3].astype(np.int64) * _LUMA).sum(axis=2) // 1000
        ).astype(np.uint8)
    return g.flatten()


def block_mean_resize(px: np.ndarray, rw: int, rh: int) -> np.ndarray:
    """(H, W, C) → (rh, rw, C) by floor-boundary block means — the same
    integer block rule as phash.blockhash_bits, lifted to 2-D.  Exact
    area-average downsample; for upscale it degenerates to nearest."""
    h, w, ch = px.shape
    yb = (np.arange(rh + 1) * h) // rh
    xb = (np.arange(rw + 1) * w) // rw
    # 2-D prefix sums per channel → any block sum is 4 lookups
    csum = np.zeros((h + 1, w + 1, ch), dtype=np.int64)
    csum[1:, 1:] = px.astype(np.int64).cumsum(0).cumsum(1)
    bsum = (
        csum[yb[1:, None], xb[None, 1:]]
        - csum[yb[:-1, None], xb[None, 1:]]
        - csum[yb[1:, None], xb[None, :-1]]
        + csum[yb[:-1, None], xb[None, :-1]]
    )
    area = (
        (yb[1:] - yb[:-1])[:, None] * (xb[1:] - xb[:-1])[None, :]
    )[:, :, None]
    area = np.maximum(area, 1)
    return (bsum // area).astype(np.uint8)


# ---------------------------------------------------------------------------
# format-dispatching image seam (PNG + JPEG; the one place a PIL
# deployment swaps in)


def image_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) for any supported image container —
    O(header), no pixel decode."""
    kind = sniff(payload)
    if kind == "png":
        return png_header(payload)
    if kind == "jpeg":
        from tajo_spark.operators.jpeg import jpeg_header

        return jpeg_header(payload)
    if kind == "gif":
        from tajo_spark.operators.gif import gif_header

        w, h, _n, ch = gif_header(payload)
        return w, h, ch
    raise NotImplementedError(
        "unsupported image container (PNG/JPEG/GIF decode "
        "in-container; deploy with PIL/opencv for WebP/TIFF)"
    )


# --- pluggable pixel-decode backend (the libjpeg/PIL deployment seam
# the JPEG/FLAC throughput notes point at).  "pure" (default) uses the
# spec-implemented stdlib codecs — deterministic everywhere, CI-grade
# throughput.  "pil" routes through Pillow's native decoders (~100x on
# JPEG entropy decode) and is what a 100 TB run deploys; "auto" picks
# pil when importable, else pure.  The default stays "pure" so result
# hashes never depend on what happens to be installed.
_IMAGE_BACKEND = "pure"


def pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def set_image_backend(name: str) -> None:
    """Select the pixel-decode backend: 'pure' | 'pil' | 'auto'."""
    global _IMAGE_BACKEND
    if name not in ("pure", "pil", "auto"):
        raise ValueError(f"unknown image backend {name!r}")
    if name == "pil" and not pil_available():
        raise NotImplementedError(
            "image backend 'pil' requested but Pillow is not "
            "importable in this environment"
        )
    _IMAGE_BACKEND = name


def active_image_backend() -> str:
    """The backend decode_image_px will actually use right now."""
    if _IMAGE_BACKEND == "auto":
        return "pil" if pil_available() else "pure"
    return _IMAGE_BACKEND


def _decode_image_pil(payload: bytes) -> np.ndarray:
    """Pillow decode normalized to the pure backend's (H, W, C) uint8
    contract: palette expands to RGB, grayscale keeps C=1, alpha is
    preserved — so PNG/GIF pixels are bit-identical across backends
    (lossless formats fully specify the pixels) and JPEG agrees within
    the T.81 Annex A IDCT tolerance (±1/LSB; the spec does not pin a
    bit-exact inverse DCT, and libjpeg uses the integer fast path
    where the pure backend uses the exact orthonormal transform)."""
    import io as _io

    import PIL.Image as PILImage

    img = PILImage.open(_io.BytesIO(payload))
    if img.mode == "P":
        img = img.convert("RGB")
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def decode_image_px(payload: bytes) -> np.ndarray:
    """Image bytes → (H, W, C) uint8 pixels for any supported
    container (via the selected backend, see set_image_backend)."""
    if active_image_backend() == "pil":
        return _decode_image_pil(payload)
    kind = sniff(payload)
    if kind == "png":
        return decode_png(payload)
    if kind == "jpeg":
        from tajo_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if kind == "gif":
        from tajo_spark.operators.gif import decode_gif

        return decode_gif(payload)
    raise NotImplementedError(
        "unsupported image container (PNG/JPEG/GIF decode "
        "in-container; deploy with PIL/opencv for WebP/TIFF, or "
        "set_image_backend('pil'))"
    )


def image_gray_signal(payload: bytes) -> np.ndarray:
    """Image bytes → flattened row-major uint8 grayscale, any supported
    container — the dispatching twin of png_gray_signal (same integer
    BT.601 luma rule, so hashes agree across containers of the same
    pixels up to codec loss)."""
    if sniff(payload) == "png":
        return png_gray_signal(payload)
    px = decode_image_px(payload)
    if px.shape[2] == 1:
        return px[:, :, 0].flatten()
    g = (
        (px[:, :, :3].astype(np.int64) * _LUMA).sum(axis=2) // 1000
    ).astype(np.uint8)
    return g.flatten()


# ---------------------------------------------------------------------------
# WAV


@malformed_guard("WAV")
def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, mono int32 samples).

    8-bit PCM is unsigned (centered at 128 → shifted to signed),
    16/32-bit are signed little-endian; channels downmix by integer
    mean.  Returns int32 so downstream int64 energy math never
    overflows."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            sr = wf.getframerate()
            nch = wf.getnchannels()
            width = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
    except RuntimeError as exc:
        # stdlib wave raises a BARE RuntimeError when a chunk size
        # field seeks past EOF (wave.py Chunk.skip) — at this one
        # boundary RuntimeError IS malformed input, not a codec bug,
        # so convert narrowly here rather than in malformed_guard
        raise ValueError("malformed WAV: chunk size past EOF") from exc
    if width == 1:
        s = np.frombuffer(frames, dtype=np.uint8).astype(np.int32) - 128
    elif width == 2:
        s = np.frombuffer(frames, dtype="<i2").astype(np.int32)
    elif width == 4:
        s = np.frombuffer(frames, dtype="<i4").astype(np.int32)
    else:
        raise NotImplementedError(f"{width * 8}-bit WAV unsupported")
    if nch > 1:
        s = s[: (len(s) // nch) * nch].reshape(-1, nch).sum(axis=1) // nch
    return sr, s


@malformed_guard("WAV")
def wav_header(payload: bytes) -> tuple[int, int]:
    """(sample_rate, n_samples) from the container alone — no frame
    read, O(header) per clip (what audio_metadata wants)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            return wf.getframerate(), wf.getnframes()
    except RuntimeError as exc:
        # see decode_wav: stdlib wave's chunk skip raises a bare
        # RuntimeError on a size field pointing past EOF
        raise ValueError("malformed WAV: chunk size past EOF") from exc


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono int16 samples → WAV bytes (test/fixture helper)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def wav_mono_signal(payload: bytes) -> np.ndarray:
    """WAV bytes → mono samples — the real decode twin of
    audiofp._fake_waveform (same 1-D convention)."""
    return decode_wav(payload)[1]


def audio_header(payload: bytes) -> tuple[int, int]:
    """(sample_rate, n_samples) for any supported audio container —
    container-dispatched, O(header) per clip (the audio twin of
    image_header)."""
    kind = sniff(payload)
    if kind == "wav":
        return wav_header(payload)
    if kind == "flac":
        from tajo_spark.operators.flac import flac_header

        return flac_header(payload)
    raise NotImplementedError(
        "only WAV/PCM and FLAC decode in-container (operators/"
        "codecs.py, operators/flac.py); deploy with soundfile/ffmpeg "
        "for MP3 and other compressed audio in this kernel"
    )


def audio_mono_signal(payload: bytes) -> np.ndarray:
    """Mono int32 samples for any supported audio container — the
    container-dispatched decode seam every audio consumer (audiofp,
    metadata) goes through, mirroring image_gray_signal."""
    kind = sniff(payload)
    if kind == "wav":
        return wav_mono_signal(payload)
    if kind == "flac":
        from tajo_spark.operators.flac import flac_mono_signal

        return flac_mono_signal(payload)
    raise NotImplementedError(
        "only WAV/PCM and FLAC decode in-container; deploy with "
        "soundfile/ffmpeg for MP3 and other compressed audio"
    )
