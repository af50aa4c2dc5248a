"""Pure-stdlib GIF codec (GIF89a specification, CompuServe/W3C).

GIF is the third of the dominant web image trio (JPEG/PNG/GIF); with
this module every one of them decodes for real in-container, and the
image seam's gated set shrinks to WebP/AVIF (a PIL deployment widens
only that seam).  Implemented from the PUBLIC specification with
nothing beyond ``struct`` + numpy.

Supported (decode):
  * GIF87a and GIF89a, global and local color tables,
  * variable-width LZW with CLEAR/EOI handling and 4096-entry
    dictionary growth,
  * interlaced images (the 4-pass row schedule),
  * multi-frame (animated) files: frame count exposed by the header
    walk; ``decode_gif`` returns the requested frame composited onto
    the previous state per the disposal rules' common cases
    (unspecified/keep — background/restore treated as keep, the
    training-corpus-safe approximation),
  * transparency (the transparent index keeps the prior pixel).

The encoder writes single- or multi-frame GIF89a with real LZW
compression (fixture-free round-trips, readable by any viewer).

Throughput note: LZW is bit-serial Python — the CI-path trade
documented on the JPEG/FLAC codecs; PIL swaps into the same
``codecs.sniff`` dispatch at deployment.

Reference parity: apache/tajo has no media operators; this extends
the multimodal surface the training-data brief requires.
"""

from __future__ import annotations

import struct

import numpy as np

from tajo_spark.operators.codecs import malformed_guard

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _color_table(buf: bytes, pos: int, size_field: int):
    n = 2 << size_field  # 2^(size+1) entries
    if pos + 3 * n > len(buf):
        raise ValueError("truncated GIF color table")
    table = np.frombuffer(
        buf[pos : pos + 3 * n], dtype=np.uint8
    ).reshape(n, 3)
    return table, pos + 3 * n


def _sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise ValueError("truncated GIF sub-blocks")
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += buf[pos : pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # bit reader, LSB-first per GIF spec
    acc = 0
    nbits = 0
    pos = 0
    width = min_code + 1
    dict_codes: list[bytes] = [bytes([i]) for i in range(clear)] + [
        b"", b""
    ]
    prev: bytes | None = None
    while n_out < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dict_codes = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = dict_codes[code]
        elif code < len(dict_codes):
            entry = dict_codes[code]
            dict_codes.append(prev + entry[:1])
        elif code == len(dict_codes):
            entry = prev + prev[:1]
            dict_codes.append(entry)
        else:
            raise ValueError("corrupt GIF LZW code")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(
            entry[:take], dtype=np.uint8
        )
        n_out += take
        prev = entry
        if len(dict_codes) == (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise ValueError("GIF pixel data ran short")
    return out


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out.reshape(-1)


def _walk(payload: bytes):
    """Yield parsed blocks: ('frame', dict) / ('gce', dict); validates
    the header and stops at the trailer."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF (bad magic)")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, _bg, _aspect = struct.unpack(
        "<HHBBB", payload[6:13]
    )
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _color_table(payload, pos, packed & 7)
    yield "screen", {"width": w, "height": h, "gct": gct}
    gce: dict = {}
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            if pos + 2 > len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos + 1]
            data, pos = _sub_blocks(payload, pos + 2)
            if label == 0xF9 and len(data) >= 4:
                gce = {
                    "transparent": data[3] if data[0] & 1 else None,
                }
            continue
        if b == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            left, top, iw, ih, ipacked = struct.unpack(
                "<HHHHB", payload[pos + 1 : pos + 10]
            )
            pos += 10
            lct = None
            if ipacked & 0x80:
                lct, pos = _color_table(payload, pos, ipacked & 7)
            if pos >= len(payload):
                raise ValueError("truncated GIF image data")
            min_code = payload[pos]
            data, pos = _sub_blocks(payload, pos + 1)
            yield "frame", {
                "left": left, "top": top, "w": iw, "h": ih,
                "interlaced": bool(ipacked & 0x40), "lct": lct,
                "min_code": min_code, "data": data,
                "transparent": gce.get("transparent"),
            }
            gce = {}
            continue
        raise ValueError(f"corrupt GIF: unknown block 0x{b:02x}")
    raise ValueError("truncated GIF (missing trailer)")


@malformed_guard("GIF")
def gif_header(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_frames, channels=3) from the block walk —
    no LZW decode (sub-block spans are skipped, not decompressed)."""
    w = h = None
    n = 0
    for kind, info in _walk(payload):
        if kind == "screen":
            w, h = info["width"], info["height"]
        elif kind == "frame":
            n += 1
    return w, h, n, 3


@malformed_guard("GIF")
def decode_gif(payload: bytes, frame: int = 0) -> np.ndarray:
    """GIF bytes → (H, W, 3) uint8 RGB of the requested frame,
    composited onto prior frames (keep disposal; transparent pixels
    preserve the underlying value)."""
    screen = None
    canvas = None
    seen = -1
    for kind, info in _walk(payload):
        if kind == "screen":
            screen = info
            canvas = np.zeros(
                (info["height"], info["width"], 3), dtype=np.uint8
            )
            continue
        seen += 1
        table = (
            info["lct"] if info["lct"] is not None else screen["gct"]
        )
        if table is None:
            raise ValueError("GIF frame without a color table")
        idx = _lzw_decode(
            info["data"], info["min_code"], info["w"] * info["h"]
        )
        if info["interlaced"]:
            idx = _deinterlace(idx, info["h"], info["w"])
        rgb = table[np.minimum(idx, len(table) - 1)].reshape(
            info["h"], info["w"], 3
        )
        y0, x0 = info["top"], info["left"]
        region = canvas[y0 : y0 + info["h"], x0 : x0 + info["w"]]
        if info["transparent"] is not None:
            mask = (idx != info["transparent"]).reshape(
                info["h"], info["w"]
            )
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        if seen == frame:
            return canvas.copy()
    if canvas is None or seen < 0:
        raise ValueError("GIF contains no image data")
    raise ValueError(f"GIF has only {seen + 1} frames")


# ---------------------------------------------------------------------------
# encode (test/fixture helper — real LZW output)


_BYTE1 = [bytes([i]) for i in range(256)]


def _lzw_encode(idx: np.ndarray, min_code: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    width = min_code + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {
        bytes([i]): i for i in range(clear)
    }
    next_code = eoi + 1
    emit(clear)
    cur = b""
    one = _BYTE1  # single-byte cache; iterating .tobytes() yields ints
    for px in idx.tobytes():
        nxt = cur + one[px]
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        cur = one[px]
    if cur:
        emit(table[cur])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray] | np.ndarray, interlaced: bool = False
) -> bytes:
    """(H, W) palette-index uint8 frames + an implied 256-entry
    grayscale palette → GIF89a bytes.  Multi-frame input writes an
    animated file (one image block per frame)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)
    for i in range(256):
        out += bytes([i, i, i])  # grayscale global table
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all GIF frames must share dimensions")
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                           0x40 if interlaced else 0)
        idx = np.asarray(fr, dtype=np.uint8).reshape(-1)
        if interlaced:
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            idx = np.asarray(fr, dtype=np.uint8)[order].reshape(-1)
        out.append(8)  # LZW minimum code size
        data = _lzw_encode(idx, 8)
        for off in range(0, len(data), 255):
            chunk = data[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
