"""Pure-stdlib baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

JPEG is the dominant image format in real web corpora, and until this
module it was the one decode path still gated behind
``NotImplementedError`` (r05 verdict #7).  Same spirit as the PNG/WAV
work in operators/codecs.py: implemented from the PUBLIC spec with
nothing beyond ``struct`` + numpy — no vendored library code.

Supported (decode):
  * baseline sequential DCT (SOF0) and extended sequential (SOF1),
    8-bit precision, Huffman entropy coding,
  * 1-component (grayscale) and 3-component (JFIF YCbCr) scans,
  * arbitrary sampling factors 1-4 per component (4:4:4, 4:2:2,
    4:2:0, 4:4:0, ... — chroma upsampled by pixel replication),
  * restart intervals (DRI + RST0-7, DC predictors reset per spec).

Gated (raise ``NotImplementedError`` — a libjpeg/PIL deployment widens
only this seam, exactly like the PNG 16-bit/Adam7 gates):
  * progressive (SOF2) and all other SOFn frames,
  * arithmetic coding, 12-bit precision, 4-component (CMYK) scans.

The encoder exists for the same reason ``encode_png``/``encode_wav``
do: tests need REAL encoded bytes without shipping binary fixtures.
It writes spec-compliant baseline JFIF (Annex K quantization + Huffman
tables, libjpeg quality scaling), optional 4:2:0 subsampling and
restart intervals — so the decoder's subsampling/restart paths are
exercised by round-trip, and any external baseline decoder can read
its output.

Throughput note: entropy decode is bit-serial Python — fine for the
Arrow-batched test/CI path, but a 100 TB multimodal run deploys
libjpeg (PIL) behind ``codecs.sniff``'s dispatch; the Spark-side
plumbing (mapInPandas batch shape, schema, gating) is identical either
way.  The IDCT/FDCT are exact orthonormal matrix transforms (numpy),
not the integer fast path — correctness over speed, same trade as the
PNG unfilter.

Reference parity: apache/tajo has no media operators; this extends the
multimodal surface the training-data brief requires.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Spec constants (ITU-T T.81 Annex K — public standard tables)

# zigzag index i -> raster position in the 8x8 block
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1/K.2 quantization tables, raster order
STD_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
STD_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 Huffman table specs: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II basis: forward F = C @ f @ C.T, inverse
# f = C.T @ F @ C — numerically identical to the T.81 FDCT/IDCT
# definitions (1/4 c(u)c(v) scaling folded into the orthonormal rows)
_k = np.arange(8).reshape(8, 1)
_n = np.arange(8).reshape(1, 8)
_DCT_C = np.cos((2 * _n + 1) * _k * np.pi / 16) * np.where(
    _k == 0, np.sqrt(1 / 8), np.sqrt(2 / 8)
)
del _k, _n


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman assignment (T.81 Annex C): {(length, code):
    symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[vi]
            vi += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """Inverse mapping for the encoder: {symbol: (code, length)}."""
    return {
        sym: (code, length)
        for (length, code), sym in _build_decode_table(bits, vals).items()
    }


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value."""
    if s and v < (1 << (s - 1)):
        return v - (1 << s) + 1
    return v


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; restart markers are consumed only at explicit
    ``restart()`` boundaries (T.81 F.2.1.3.1)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        # Malformed-input contract: the codec raises ValueError (never a
        # raw IndexError) so one corrupt image fails its Arrow batch
        # with a diagnosable error at the image seam.
        if self.pos >= len(self.buf):
            raise ValueError("truncated JPEG entropy data")
        b = self.buf[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.buf):
                raise ValueError("truncated JPEG entropy data")
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker inside entropy data: valid streams only hit
                # this as trailing pad before EOI/RST — feed 1-bits
                # (the spec's pad value) without consuming the marker
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        while self.n < nbits:
            self._fill()
        self.n -= nbits
        v = (self.acc >> self.n) & ((1 << nbits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def decode(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def restart(self) -> None:
        """Byte-align, consume the RSTn marker, reset bit state."""
        self.acc = 0
        self.n = 0
        if not (
            self.pos + 1 < len(self.buf)
            and self.buf[self.pos] == 0xFF
            and 0xD0 <= self.buf[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


# ---------------------------------------------------------------------------
# container parse


def _segments(buf: bytes):
    """Yield (marker, segment_data, end_pos); stops after SOS (the
    entropy-coded data follows and is not segment-framed)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            return
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn
            pos += 2
            continue
        (ln,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        yield marker, buf[pos + 4 : pos + 2 + ln], pos + 2 + ln
        pos += 2 + ln
        if marker == 0xDA:  # SOS: entropy data follows
            return


_SOF_GATED = {
    0xC2: "progressive DCT (SOF2)",
    0xC3: "lossless sequential (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _parse_sof(marker: int, data: bytes):
    if marker in _SOF_GATED:
        raise NotImplementedError(
            f"JPEG {_SOF_GATED[marker]} unsupported (baseline only); "
            "deploy with PIL/libjpeg for the full format family"
        )
    precision, h, w, ncomp = struct.unpack(">BHHB", data[:6])
    if precision != 8:
        raise NotImplementedError(f"{precision}-bit JPEG unsupported")
    if ncomp not in (1, 3):
        raise NotImplementedError(
            f"{ncomp}-component JPEG unsupported (grayscale/YCbCr only)"
        )
    comps = []
    for i in range(ncomp):
        cid, hv, tq = struct.unpack(">BBB", data[6 + 3 * i : 9 + 3 * i])
        comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
    return w, h, comps


def jpeg_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the SOF segment alone — no
    entropy decode, O(header) per image (what image_metadata wants at
    corpus scale; twin of codecs.png_header)."""
    for marker, data, _ in _segments(payload):
        if marker in _SOF_GATED or marker in (0xC0, 0xC1):
            w, h, comps = _parse_sof(marker, data)
            return w, h, len(comps)
    raise ValueError("JPEG missing SOF")


# ---------------------------------------------------------------------------
# decode


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (H, W, C) uint8 array (C = 1 or 3, RGB)."""
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    ri = 0
    w = h = None
    comps: list[dict] = []
    scan: list[dict] = []
    entropy_pos = None

    for marker, data, end in _segments(payload):
        if marker in (0xC0, 0xC1) or marker in _SOF_GATED:
            w, h, comps = _parse_sof(marker, data)
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(data):
                tc_th = data[p]
                bits = list(data[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(data[p + 17 : p + 17 + nv])
                table = _build_decode_table(bits, vals)
                (dc_tables if tc_th >> 4 == 0 else ac_tables)[
                    tc_th & 0xF
                ] = table
                p += 17 + nv
        elif marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(data):
                pq = data[p] >> 4
                tq = data[p] & 0xF
                if pq == 0:
                    vals = np.frombuffer(
                        data[p + 1 : p + 65], dtype=np.uint8
                    ).astype(np.int64)
                    p += 65
                else:
                    vals = np.frombuffer(
                        data[p + 1 : p + 129], dtype=">u2"
                    ).astype(np.int64)
                    p += 129
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = vals  # DQT ships zigzag order
                qt[tq] = raster
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS
            ns = data[0]
            by_id = {c["id"]: c for c in comps}
            for i in range(ns):
                cs, tdta = data[1 + 2 * i], data[2 + 2 * i]
                c = by_id[cs]
                scan.append(
                    {**c, "dc": tdta >> 4, "ac": tdta & 0xF}
                )
            entropy_pos = end
    if w is None or entropy_pos is None:
        raise ValueError("JPEG missing SOF or SOS")
    if len(scan) != len(comps):
        raise NotImplementedError(
            "multi-scan (non-interleaved) baseline JPEG unsupported"
        )

    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]))
        for c in scan
    }
    pred = {c["id"]: 0 for c in scan}
    reader = _BitReader(payload, entropy_pos)

    for imcu in range(mcux * mcuy):
        if ri and imcu and imcu % ri == 0:
            reader.restart()
            pred = {c["id"]: 0 for c in scan}
        my, mx = divmod(imcu, mcux)
        for c in scan:
            dct, act = dc_tables[c["dc"]], ac_tables[c["ac"]]
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef = np.zeros(64, dtype=np.float64)
                    s = reader.decode(dct)
                    pred[c["id"]] += _extend(reader.read(s), s)
                    coef[0] = pred[c["id"]] * q[0]
                    k = 1
                    while k < 64:
                        rs = reader.decode(act)
                        r, size = rs >> 4, rs & 0xF
                        if size == 0:
                            if rs == 0xF0:  # ZRL: run of 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError(
                                "corrupt JPEG: AC run past block end"
                            )
                        zz = ZIGZAG[k]
                        coef[zz] = _extend(reader.read(size), size) * q[zz]
                        k += 1
                    block = _DCT_C.T @ coef.reshape(8, 8) @ _DCT_C
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block

    # upsample to full resolution (pixel replication) and crop
    full = []
    for c in scan:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.rint(full[0] + 128), 0, 255).astype(np.uint8)
        return g[:, :, None]
    y, cb, cr = (p + 128 for p in full)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(
        np.rint(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# encode (test/fixture helper — real spec-compliant output)


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality → table scaling (public formula)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * s + 50) // 100, 1, 255).astype(np.int64)


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    pred: int,
    dc_tab: dict,
    ac_tab: dict,
) -> int:
    f = _DCT_C @ (block.astype(np.float64) - 128.0) @ _DCT_C.T
    quant = np.rint(f.flatten() / q).astype(np.int64)
    zz = quant[ZIGZAG]
    # DC
    diff = int(zz[0]) - pred
    s = int(abs(diff)).bit_length()
    code, ln = dc_tab[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    # AC
    run = 0
    last_nz = max(np.nonzero(zz[1:])[0], default=-1) + 1
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _pad_to(a: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Edge-replicate to (rows, cols) — spec-recommended pad that
    avoids ringing from hard borders."""
    return np.pad(
        a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])), mode="edge"
    )


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W[, C]) uint8 → baseline JFIF bytes.

    ``subsample=True`` writes 4:2:0 (Y at 2x2, chroma block-mean
    halved); ``restart_interval`` emits DRI + RST0-7 markers every N
    MCUs — both exist so the decoder's hard paths are round-trip
    tested, and both produce output any baseline decoder reads."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    if nch not in (1, 3):
        raise ValueError("encode_jpeg takes 1 (gray) or 3 (RGB) channels")
    q_luma = _quality_scale(STD_QT_LUMA, quality)
    q_chroma = _quality_scale(STD_QT_CHROMA, quality)

    if nch == 1:
        planes = [a[:, :, 0].astype(np.float64)]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        planes = [y, cb, cr]

    sub = 2 if (subsample and nch == 3) else 1
    # component geometry: Y at (sub, sub), chroma at (1, 1)
    hv = [(sub, sub)] + [(1, 1)] * (nch - 1)
    hmax = vmax = sub if nch == 3 else 1
    if nch == 1:
        hv = [(1, 1)]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    prepped = []
    for i, p in enumerate(planes):
        if i and sub == 2:  # chroma downsample by 2x2 block mean
            pp = _pad_to(p, mcuy * 16, mcux * 16)
            p = pp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        ch_, cw_ = mcuy * 8 * hv[i][1], mcux * 8 * hv[i][0]
        prepped.append(_pad_to(p, ch_, cw_))

    dc_enc = [_build_encode_table(*STD_DC_LUMA)] + [
        _build_encode_table(*STD_DC_CHROMA)
    ] * (nch - 1)
    ac_enc = [_build_encode_table(*STD_AC_LUMA)] + [
        _build_encode_table(*STD_AC_CHROMA)
    ] * (nch - 1)
    qts = [q_luma] + [q_chroma] * (nch - 1)

    bw = _BitWriter()
    pred = [0] * nch
    rst = 0
    for imcu in range(mcux * mcuy):
        if restart_interval and imcu and imcu % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            pred = [0] * nch
        my, mx = divmod(imcu, mcux)
        for ci in range(nch):
            hs, vs = hv[ci]
            for by in range(vs):
                for bx in range(hs):
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    pred[ci] = _encode_block(
                        bw,
                        prepped[ci][y0 : y0 + 8, x0 : x0 + 8],
                        qts[ci],
                        pred[ci],
                        dc_enc[ci],
                        ac_enc[ci],
                    )
    bw.flush()

    def seg(marker: int, data: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    def dqt(tq: int, raster: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tq]) + bytes(raster[ZIGZAG].astype(np.uint8)))

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, q_luma)
    if nch == 3:
        out += dqt(1, q_chroma)
    sof = struct.pack(">BHHB", 8, h, w, nch)
    for ci in range(nch):
        sof += bytes([ci + 1, (hv[ci][0] << 4) | hv[ci][1], 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    out += dht(0, 0, STD_DC_LUMA) + dht(1, 0, STD_AC_LUMA)
    if nch == 3:
        out += dht(0, 1, STD_DC_CHROMA) + dht(1, 1, STD_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nch])
    for ci in range(nch):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
