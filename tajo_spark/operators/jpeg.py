"""Pure-stdlib JPEG codec (ITU-T T.81 / ISO 10918-1).

JPEG is the dominant image format in real web corpora; baseline
landed in r06 (r05 verdict #7) and progressive — a large fraction of
real web JPEG — in r07 (r06 verdict #4).  Same spirit as the PNG/WAV
work in operators/codecs.py: implemented from the PUBLIC spec with
nothing beyond ``struct`` + numpy — no vendored library code.

Supported (decode):
  * baseline sequential DCT (SOF0) and extended sequential (SOF1),
    8-bit precision, Huffman entropy coding,
  * progressive DCT (SOF2): spectral selection + successive
    approximation per Annex G — DC first/refine, AC first/refine with
    EOB runs, interleaved DC and non-interleaved AC geometry,
  * 1-component (grayscale) and 3-component (JFIF YCbCr) scans,
  * arbitrary sampling factors 1-4 per component (4:4:4, 4:2:2,
    4:2:0, 4:4:0, ... — chroma upsampled by pixel replication),
  * restart intervals (DRI + RST0-7, DC predictors reset per spec).

Gated (raise ``NotImplementedError`` — a libjpeg/PIL deployment widens
only this seam, exactly like the PNG 16-bit/Adam7 gates):
  * lossless/differential/hierarchical SOFn frames,
  * arithmetic coding, 12-bit precision, 4-component (CMYK) scans.

The encoders exist for the same reason ``encode_png``/``encode_wav``
do: tests need REAL encoded bytes without shipping binary fixtures.
``encode_jpeg`` writes spec-compliant baseline JFIF (Annex K
quantization + Huffman tables, libjpeg quality scaling), optional
4:2:0 subsampling and restart intervals; ``encode_jpeg_progressive``
writes SOF2 streams from a parameterizable scan script with per-scan
optimal Huffman tables (two-pass, Annex K.2) and encodes the SAME
quantized coefficients — so progressive and baseline codings of one
image decode to bit-identical pixels, the property the round-trip
tests pin.

Throughput note: entropy decode is bit-serial Python — fine for the
Arrow-batched test/CI path, but a 100 TB multimodal run deploys
libjpeg (PIL) behind ``codecs.sniff``'s dispatch; the Spark-side
plumbing (mapInPandas batch shape, schema, gating) is identical either
way.  The IDCT/FDCT are exact orthonormal matrix transforms (numpy),
not the integer fast path — correctness over speed, same trade as the
PNG unfilter.

Reference parity: apache/tajo has no media operators; this extends the
multimodal surface the training-data brief requires.

Malformed-input contract (ADVICE r08): the LUT-based entropy decoder
keeps a 16-bit lookahead window, padding with 1-bits when it reaches a
MARKER byte (so valid streams — which always terminate in at least an
EOI marker — decode to the last coefficient). A stream truncated at
hard EOF with no trailing marker raises ``truncated JPEG entropy
data`` where the old bit-serial decoder could sometimes limp to the
end of a symbol. Such streams are already malformed per T.81 (§B.2:
an image ends with EOI), so the strictness change only moves WHERE on
the acceptance boundary a broken file fails — corrupt in, error out,
never wrong pixels.
"""

from __future__ import annotations

import struct

import numpy as np

from tajo_spark.operators.codecs import malformed_guard

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


class _HuffTable:
    """Canonical Huffman table with a 9-bit first-level peek LUT:
    lut9[v] packs (symbol << 5) | code_length for the code prefixing
    the 9-bit window v (0 = longer than 9 bits or invalid; fall back
    to the canonical map).  One list lookup decodes the vast majority
    of symbols instead of up to 16 bit-by-bit tree steps, while the
    512-entry build stays cheap enough for per-scan tables on tiny
    images (a 2^16 LUT's build cost dominated small-image decode —
    caught by the bench, not the single-big-image microbench)."""

    __slots__ = ("map", "lut9")

    def __init__(self, table: dict, lut9: list[int]):
        self.map = table
        self.lut9 = lut9


def _build_decode_table(bits: list[int], vals: list[int]) -> _HuffTable:
    """Canonical Huffman assignment (T.81 Annex C)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    vi = 0
    if len(bits) < 16 or sum(bits) > len(vals):
        raise ValueError("truncated JPEG Huffman table")
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[vi]
            vi += 1
            code += 1
        code <<= 1
    lut9 = [0] * 512
    for (length, cd), sym in table.items():
        if cd >= (1 << length):
            raise ValueError("corrupt JPEG Huffman table (overfull)")
        if length <= 9:
            base = cd << (9 - length)
            entry = (sym << 5) | length
            for i in range(base, base + (1 << (9 - length))):
                lut9[i] = entry
    return _HuffTable(table, lut9)


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """Inverse mapping for the encoder: {symbol: (code, length)}."""
    return {
        sym: (code, length)
        for (length, code), sym in
        _build_decode_table(bits, vals).map.items()
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

    def decode(self, table: _HuffTable) -> int:
        # valid streams always have a marker byte ahead (EOI at the
        # least), so _fill's pad-with-1s branch lets the window reach
        # 16 bits at scan end; only true truncation raises
        while self.n < 16:
            self._fill()
        win = (self.acc >> (self.n - 16)) & 0xFFFF
        e = table.lut9[win >> 7]
        if e:
            self.n -= e & 31
            self.acc &= (1 << self.n) - 1
            return e >> 5
        m = table.map
        for length in range(10, 17):
            sym = m.get((length, win >> (16 - length)))
            if sym is not None:
                self.n -= length
                self.acc &= (1 << self.n) - 1
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
        hs, vs = hv >> 4, hv & 0xF
        if not (1 <= hs <= 4 and 1 <= vs <= 4):
            raise ValueError(
                f"corrupt JPEG: sampling factors {hs}x{vs} out of range"
            )
        comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
    if w == 0 or h == 0:
        raise ValueError("corrupt JPEG: zero frame dimension")
    return w, h, comps


@malformed_guard("JPEG")
def jpeg_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the SOF segment alone — no
    entropy decode, O(header) per image (what image_metadata wants at
    corpus scale; twin of codecs.png_header)."""
    for marker, data, _ in _segments(payload):
        if marker in _SOF_GATED or marker in (0xC0, 0xC1, 0xC2):
            w, h, comps = _parse_sof(marker, data)
            return w, h, len(comps)
    raise ValueError("JPEG missing SOF")


def _walk_stream(buf: bytes):
    """Yield (marker, segment_data, end_pos) across the WHOLE stream,
    including every SOS of a multi-scan (progressive) file — after an
    SOS the entropy-coded span is skipped (0xFF00 stuffing and RSTn
    markers are part of it) up to the next real marker."""
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
        if marker == 0xDA:  # skip entropy span to the next real marker
            p = pos
            while p + 1 < len(buf):
                if buf[p] != 0xFF:
                    p += 1
                elif buf[p + 1] == 0x00 or 0xD0 <= buf[p + 1] <= 0xD7:
                    p += 2
                else:
                    break
            pos = p


# ---------------------------------------------------------------------------
# decode


@malformed_guard("JPEG")
def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes → (H, W, C) uint8 array (C = 1 or 3, RGB).

    Baseline/extended sequential (SOF0/1) and progressive (SOF2), the
    latter with full spectral selection + successive approximation
    (T.81 Annex G): DC first/refine, AC first/refine with EOB runs,
    interleaved DC and non-interleaved AC scan geometry, restart
    intervals in both.
    """
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    ri = 0
    w = h = None
    sof_marker = None
    comps: list[dict] = []
    scans: list[dict] = []

    for marker, data, end in _walk_stream(payload):
        if marker in (0xC0, 0xC1, 0xC2) or marker in _SOF_GATED:
            w, h, comps = _parse_sof(marker, data)
            sof_marker = marker
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
        elif marker == 0xDA:  # SOS (tables snapshot per scan — DHT may
            # legally be redefined between progressive scans)
            if len(data) < 1 or len(data) < 4 + 2 * data[0]:
                raise ValueError("truncated JPEG scan header")
            ns = data[0]
            by_id = {c["id"]: c for c in comps}
            sel = []
            for i in range(ns):
                cs, tdta = data[1 + 2 * i], data[2 + 2 * i]
                c = by_id[cs]
                sel.append({**c, "dc": tdta >> 4, "ac": tdta & 0xF})
            ss, se, ahal = data[1 + 2 * ns : 4 + 2 * ns]
            scans.append(
                {
                    "comps": sel,
                    "ss": ss,
                    "se": se,
                    "ah": ahal >> 4,
                    "al": ahal & 0xF,
                    "pos": end,
                    "dc": dict(dc_tables),
                    "ac": dict(ac_tables),
                    "ri": ri,
                }
            )
    if w is None or not scans:
        raise ValueError("JPEG missing SOF or SOS")
    if sof_marker == 0xC2:
        return _decode_progressive(payload, w, h, comps, scans, qt)
    if len(scans) != 1 or len(scans[0]["comps"]) != len(comps):
        raise NotImplementedError(
            "multi-scan (non-interleaved) baseline JPEG unsupported"
        )
    scan = scans[0]["comps"]
    entropy_pos = scans[0]["pos"]
    dc_tables, ac_tables = scans[0]["dc"], scans[0]["ac"]
    ri = scans[0]["ri"]

    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    pred = {c["id"]: 0 for c in scan}
    reader = _BitReader(payload, entropy_pos)

    # entropy-decode every block's quantized coefficients into plain-int
    # zigzag rows first; dequant + IDCT run batched afterwards (one
    # einsum per component instead of an 8x8 matmul per block — the
    # decode twin of the encoder's _plane_zigzag_coefs, r08 pass)
    rows = {c["id"]: [] for c in scan}
    pos = {c["id"]: [] for c in scan}
    for imcu in range(mcux * mcuy):
        if ri and imcu and imcu % ri == 0:
            reader.restart()
            pred = {c["id"]: 0 for c in scan}
        my, mx = divmod(imcu, mcux)
        for c in scan:
            dct, act = dc_tables[c["dc"]], ac_tables[c["ac"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    row = [0] * 64
                    s = reader.decode(dct)
                    pred[c["id"]] += _extend(reader.read(s), s)
                    row[0] = pred[c["id"]]
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
                        row[k] = _extend(reader.read(size), size)
                        k += 1
                    rows[c["id"]].append(row)
                    pos[c["id"]].append(
                        ((my * c["v"] + by) * 8, (mx * c["h"] + bx) * 8)
                    )

    planes = {}
    for c in scan:
        cid = c["id"]
        ph, pw = mcuy * 8 * c["v"], mcux * 8 * c["h"]
        plane = np.zeros((ph, pw))
        if rows[cid]:
            zz = np.asarray(rows[cid], dtype=np.float64)
            nat = np.empty_like(zz)
            nat[:, ZIGZAG] = zz  # zigzag-k order -> natural order
            nat *= qt[c["tq"]]
            blocks = np.einsum(
                "ji,njk,kl->nil", _DCT_C,
                nat.reshape(-1, 8, 8), _DCT_C, optimize=True,
            )
            for (y0, x0), blk in zip(pos[cid], blocks):
                plane[y0 : y0 + 8, x0 : x0 + 8] = blk
        planes[cid] = plane

    return _planes_to_image(planes, scan, hmax, vmax, w, h)


def _planes_to_image(
    planes: dict, comps: list[dict], hmax: int, vmax: int, w: int, h: int
) -> np.ndarray:
    """Upsample component planes to full resolution (pixel
    replication), crop, and convert to gray / RGB uint8."""
    full = []
    for c in comps:
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
# progressive decode (T.81 Annex G — spectral selection + successive
# approximation, implemented from the public spec's flowcharts)


def _refine_nonzero(reader: _BitReader, cf: list, k: int, al: int):
    """Correction bit for a history-nonzero coefficient (G.1.2.3):
    a 1-bit appends bit ``al`` to the magnitude, keeping the sign.
    ``cf`` is the block's plain-int row (see the AC scan driver)."""
    p1 = 1 << al
    if reader.read(1) and (abs(cf[k]) & p1) == 0:
        cf[k] += p1 if cf[k] > 0 else -p1


def _ac_first(reader, act, cf, ss, se, al, eobrun):
    """One block of an AC first scan (Ah=0): run-length + EOB runs;
    values land shifted left by the successive-approximation Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode(act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:  # EOBn: run of 2^r + ext bits blocks
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read(r)
                break
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("corrupt JPEG: AC run past band end")
            cf[k] = _extend(reader.read(s), s) << al
            k += 1
    return eobrun


def _ac_refine(reader, act, cf, ss, se, al, eobrun):
    """One block of an AC refinement scan (Ah=Al+1): newly-nonzero
    insertions carry a sign bit; every history-nonzero coefficient
    passed over (or covered by an EOB run) reads a correction bit."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode(act)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r < 15:
                    # EOB run INCLUDES this block: the tail below reads
                    # its remaining correction bits and decrements
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError(
                        "corrupt JPEG: refinement size must be 1"
                    )
                newval = p1 if reader.read(1) else m1
            while k <= se:
                if cf[k] != 0:
                    _refine_nonzero(reader, cf, k, al)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                cf[k] = newval
            elif newval:
                raise ValueError("corrupt JPEG: refinement past band end")
            k += 1
    if eobrun > 0:
        while k <= se:
            if cf[k] != 0:
                _refine_nonzero(reader, cf, k, al)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(
    payload: bytes,
    w: int,
    h: int,
    comps: list[dict],
    scans: list[dict],
    qt: dict[int, np.ndarray],
) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient store in ZIGZAG order, padded to the
    # MCU grid (interleaved DC scans cover pad blocks; AC scans don't)
    coefs = {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
        for c in comps
    }
    # non-interleaved geometry: ceil over the component's sampled size
    bdims = {}
    for c in comps:
        ch_ = -(-(h * c["v"]) // vmax)  # ceil sampled height
        cw_ = -(-(w * c["h"]) // hmax)
        bdims[c["id"]] = (-(-ch_ // 8), -(-cw_ // 8))

    for sc in scans:
        reader = _BitReader(payload, sc["pos"])
        ri = sc["ri"]
        ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
        if ss == 0:
            if se != 0:
                raise ValueError(
                    "corrupt JPEG: progressive DC scan with Se != 0"
                )
            preds = {c["id"]: 0 for c in sc["comps"]}
            interleaved = len(sc["comps"]) > 1
            if interleaved:
                units = mcux * mcuy
            else:
                bh_, bw_ = bdims[sc["comps"][0]["id"]]
                units = bh_ * bw_
            for iu in range(units):
                if ri and iu and iu % ri == 0:
                    reader.restart()
                    preds = {c["id"]: 0 for c in sc["comps"]}
                if interleaved:
                    my, mx = divmod(iu, mcux)
                    blocks = [
                        (c, my * c["v"] + by, mx * c["h"] + bx)
                        for c in sc["comps"]
                        for by in range(c["v"])
                        for bx in range(c["h"])
                    ]
                else:
                    c = sc["comps"][0]
                    by, bx = divmod(iu, bdims[c["id"]][1])
                    blocks = [(c, by, bx)]
                for c, by, bx in blocks:
                    cf = coefs[c["id"]][by, bx]
                    if ah == 0:  # first DC scan: diff-coded, << al
                        s = reader.decode(sc["dc"][c["dc"]])
                        preds[c["id"]] += _extend(reader.read(s), s)
                        cf[0] = preds[c["id"]] << al
                    else:  # refinement: one raw bit appends bit al
                        cf[0] += reader.read(1) << al
        else:
            if len(sc["comps"]) != 1:
                raise ValueError(
                    "corrupt JPEG: progressive AC scan must be "
                    "single-component"
                )
            c = sc["comps"][0]
            act = sc["ac"][c["ac"]]
            bh_, bw_ = bdims[c["id"]]
            eobrun = 0
            fn = _ac_first if ah == 0 else _ac_refine
            # run the whole scan over plain-int rows: per-coefficient
            # numpy scalar access dominated refinement scans (~200us
            # per block); one bulk tolist/write-back per scan instead.
            # NB: the coefs plane is MCU-padded — the scan visits only
            # the bdims sub-rectangle, so slice it explicitly
            sub = coefs[c["id"]][:bh_, :bw_]
            rows = sub.reshape(-1, 64).tolist()
            for iu in range(bh_ * bw_):
                if ri and iu and iu % ri == 0:
                    reader.restart()
                    eobrun = 0
                eobrun = fn(reader, act, rows[iu], ss, se, al, eobrun)
            coefs[c["id"]][:bh_, :bw_] = np.asarray(
                rows, dtype=np.int64
            ).reshape(bh_, bw_, 64)

    planes = {}
    for c in comps:
        q = qt[c["tq"]]
        arr = coefs[c["id"]].astype(np.float64)
        raster = np.zeros_like(arr)
        raster[..., ZIGZAG] = arr  # zigzag index -> raster position
        raster *= q  # dequantize (q is raster order)
        bh_, bw_ = raster.shape[0], raster.shape[1]
        plane = np.zeros((bh_ * 8, bw_ * 8))
        # per-block matmul in the SAME expression order as the baseline
        # path — a batched einsum reorders float contractions by ulps,
        # which flips rint at .5 boundaries and breaks the pixel
        # identity between the two codings of one coefficient set
        for by in range(bh_):
            for bx in range(bw_):
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _DCT_C.T @ raster[by, bx].reshape(8, 8) @ _DCT_C
                )
        planes[c["id"]] = plane
    return _planes_to_image(planes, comps, hmax, vmax, w, h)


# ---------------------------------------------------------------------------
# encode (test/fixture helper — real spec-compliant output)


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality → table scaling (public formula)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * s + 50) // 100, 1, 255).astype(np.int64)


def _plane_zigzag_coefs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) padded float plane → (bh, bw, 64) zigzag-ordered
    quantized coefficients: ALL blocks' FDCT in one einsum instead of
    one 8x8 matmul per block (r08 throughput pass — the per-block
    numpy dispatch was half the encoder's wall)."""
    hh, ww = plane.shape
    bh, bw_ = hh // 8, ww // 8
    blocks = (plane - 128.0).reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3)
    f = np.einsum("ij,nmjk,lk->nmil", _DCT_C, blocks, _DCT_C,
                  optimize=True)
    quant = np.rint(f.reshape(bh, bw_, 64) / q).astype(np.int64)
    return quant[:, :, ZIGZAG]


def _encode_block_zz(
    bw: _BitWriter,
    zz: list[int],
    pred: int,
    dc_tab: dict,
    ac_tab: dict,
) -> int:
    # DC — symbol code and magnitude bits fused into ONE write
    diff = zz[0] - pred
    s = abs(diff).bit_length()
    code, ln = dc_tab[s]
    if s:
        bw.write((code << s) | (diff if diff > 0
                                else diff + (1 << s) - 1), ln + s)
    else:
        bw.write(code, ln)
    # AC
    last_nz = 63
    while last_nz and zz[last_nz] == 0:
        last_nz -= 1
    run = 0
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_tab[(run << 4) | s]
        bw.write((code << s) | (v if v > 0 else v + (1 << s) - 1),
                 ln + s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return zz[0]


def _pad_to(a: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Edge-replicate to (rows, cols) — spec-recommended pad that
    avoids ringing from hard borders."""
    return np.pad(
        a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])), mode="edge"
    )


def _seg(marker: int, data: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data


def _dqt(tq: int, raster: np.ndarray) -> bytes:
    return _seg(0xDB, bytes([tq]) + bytes(raster[ZIGZAG].astype(np.uint8)))


def _dht(tc: int, th: int, spec) -> bytes:
    bits, vals = spec
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def _prep_planes(arr: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front end: color convert, subsample, pad to the
    MCU grid; returns geometry + planes + scaled quant tables."""
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
    return h, w, nch, hv, hmax, vmax, mcux, mcuy, prepped, q_luma, q_chroma


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
    (h, w, nch, hv, hmax, vmax, mcux, mcuy, prepped, q_luma, q_chroma) = (
        _prep_planes(arr, quality, subsample)
    )

    dc_enc = [_build_encode_table(*STD_DC_LUMA)] + [
        _build_encode_table(*STD_DC_CHROMA)
    ] * (nch - 1)
    ac_enc = [_build_encode_table(*STD_AC_LUMA)] + [
        _build_encode_table(*STD_AC_CHROMA)
    ] * (nch - 1)
    qts = [q_luma] + [q_chroma] * (nch - 1)

    # batched front end: every block's quantized zigzag row up front
    zz_planes = [
        _plane_zigzag_coefs(prepped[ci], qts[ci]) for ci in range(nch)
    ]
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
                    pred[ci] = _encode_block_zz(
                        bw,
                        zz_planes[ci][my * vs + by,
                                      mx * hs + bx].tolist(),
                        pred[ci],
                        dc_enc[ci],
                        ac_enc[ci],
                    )
    bw.flush()

    seg, dqt, dht = _seg, _dqt, _dht
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


# ---------------------------------------------------------------------------
# progressive encode (T.81 Annex G encoder flowcharts + Annex K.2
# Huffman table generation — two-pass: count symbols, build optimal
# per-scan tables, emit; each scan ships its own DHT, which also
# exercises the decoder's per-scan table snapshots)


def _huffman_spec(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Symbol frequencies → (BITS[16], HUFFVAL) per T.81 K.2: pairwise
    merge of least-frequent values (ties broken toward the LARGEST
    symbol), code sizes limited to 16 by the Figure K.3 adjustment; a
    reserved 257th symbol guarantees no code is all ones."""
    freq = [0] * 257
    for sym, f in freqs.items():
        freq[sym] = f
    freq[256] = 1
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        present = [v for v in range(257) if freq[v] > 0]
        if len(present) < 2:
            break
        v1 = min(present, key=lambda v: (freq[v], -v))
        v2 = min(
            (v for v in present if v != v1), key=lambda v: (freq[v], -v)
        )
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for v in range(257):
        if codesize[v]:
            bits[codesize[v]] += 1
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved symbol's (longest) code
    huffval = sorted(
        (v for v in range(256) if codesize[v] > 0),
        key=lambda v: (codesize[v], v),
    )
    return bits[1:17], huffval


class _CountEmitter:
    """Pass 1: accumulate per-(class, table-id) symbol frequencies."""

    def __init__(self) -> None:
        self.freqs: dict[tuple[str, int], dict[int, int]] = {}

    def symbol(self, cls: str, tid: int, sym: int) -> None:
        f = self.freqs.setdefault((cls, tid), {})
        f[sym] = f.get(sym, 0) + 1

    def bits(self, v: int, n: int) -> None:
        pass


class _WriteEmitter:
    """Pass 2: emit through the per-scan tables into the bit writer."""

    def __init__(self, bw: _BitWriter, tables: dict) -> None:
        self.bw = bw
        self.tables = tables

    def symbol(self, cls: str, tid: int, sym: int) -> None:
        code, ln = self.tables[(cls, tid)][sym]
        self.bw.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.bw.write(v & ((1 << n) - 1), n)


def _enc_dc_scan(coefs, comp_ids, hv, mcux, mcuy, bdims, ah, al, emit):
    """DC scan: interleaved over the padded MCU grid when Ns > 1,
    non-interleaved over the component's own block grid when Ns = 1."""
    preds = {ci: 0 for ci in comp_ids}
    if len(comp_ids) > 1:
        units = [
            (ci, my * hv[ci][1] + by, mx * hv[ci][0] + bx)
            for imcu in range(mcux * mcuy)
            for my, mx in [divmod(imcu, mcux)]
            for ci in comp_ids
            for by in range(hv[ci][1])
            for bx in range(hv[ci][0])
        ]
    else:
        ci = comp_ids[0]
        bh_, bw_ = bdims[ci]
        units = [
            (ci, iu // bw_, iu % bw_) for iu in range(bh_ * bw_)
        ]
    for ci, by, bx in units:
        tid = 0 if ci == 0 else 1
        v = int(coefs[ci][by, bx, 0])
        if ah == 0:
            t = v >> al  # arithmetic shift per G.1.2.1
            diff = t - preds[ci]
            preds[ci] = t
            s = abs(diff).bit_length()
            emit.symbol("dc", tid, s)
            if s:
                emit.bits(diff if diff > 0 else diff + (1 << s) - 1, s)
        else:
            emit.bits((v >> al) & 1, 1)


def _enc_ac_first(coefs_c, bdims_c, ss, se, al, tid, emit):
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            emit.symbol("ac", tid, n << 4)
            if n:
                emit.bits(eobrun - (1 << n), n)
            eobrun = 0

    bh_, bw_ = bdims_c
    for iu in range(bh_ * bw_):
        cf = coefs_c[iu // bw_, iu % bw_]
        r = 0
        for k in range(ss, se + 1):
            v = int(cf[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                emit.symbol("ac", tid, 0xF0)
                r -= 16
            s = t.bit_length()
            emit.symbol("ac", tid, (r << 4) | s)
            tt = t if v > 0 else -t
            emit.bits(tt if tt > 0 else tt + (1 << s) - 1, s)
            r = 0
        if r:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _enc_ac_refine(coefs_c, bdims_c, ss, se, al, tid, emit):
    eobrun = 0
    be: list[int] = []  # correction bits pending with the EOB run

    def flush_eob():
        nonlocal eobrun, be
        if eobrun:
            n = eobrun.bit_length() - 1
            emit.symbol("ac", tid, n << 4)
            if n:
                emit.bits(eobrun - (1 << n), n)
            eobrun = 0
        for b in be:
            emit.bits(b, 1)
        be = []

    bh_, bw_ = bdims_c
    for iu in range(bh_ * bw_):
        cf = coefs_c[iu // bw_, iu % bw_]
        tvals = [abs(int(cf[k])) >> al for k in range(ss, se + 1)]
        # last newly-nonzero position: ZRLs beyond it fold into the EOB
        eob_k = ss - 1
        for i, t in enumerate(tvals):
            if t == 1:
                eob_k = ss + i
        r = 0
        br: list[int] = []
        for i, t in enumerate(tvals):
            k = ss + i
            if t == 0:
                r += 1
                continue
            # arrival at ANY nonzero position: keep r <= 15 while still
            # inside the newly-nonzero span, so every buffered
            # correction bit lands within the very next symbol's
            # decoder advance (the G.1.2.3 stream invariant)
            while r > 15 and k <= eob_k:
                flush_eob()
                emit.symbol("ac", tid, 0xF0)
                r -= 16
                for b in br:
                    emit.bits(b, 1)
                br = []
            if t > 1:  # history-nonzero: correction bit, run unaffected
                br.append(t & 1)
                continue
            # newly nonzero (|v| >> al == 1, history zero)
            flush_eob()
            emit.symbol("ac", tid, (r << 4) | 1)
            emit.bits(1 if int(cf[k]) > 0 else 0, 1)
            for b in br:
                emit.bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF or len(be) > 930:  # bounded buffer
                flush_eob()
    flush_eob()


def default_scan_script(nch: int) -> list[tuple]:
    """A libjpeg-shaped progression: DC at Al=1 then refined, luma AC
    split into two spectral bands with two successive-approximation
    refinements, chroma AC at Al=1 then refined — covers every decoder
    path (DC first/refine, AC first/refine, EOB runs, band splits)."""
    if nch == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return [
        ([0, 1, 2], 0, 0, 0, 1),
        ([0], 1, 5, 0, 2),
        ([2], 1, 63, 0, 1),
        ([1], 1, 63, 0, 1),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([2], 1, 63, 1, 0),
        ([1], 1, 63, 1, 0),
        ([0], 1, 63, 1, 0),
    ]


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    scan_script: list[tuple] | None = None,
) -> bytes:
    """(H, W[, C]) uint8 → progressive (SOF2) JFIF bytes.

    ``scan_script`` is a list of (component_indices, Ss, Se, Ah, Al);
    default :func:`default_scan_script`.  Encodes the SAME quantized
    coefficients as :func:`encode_jpeg` at equal quality, so decoding
    either stream yields bit-identical pixels — the fixture-free
    round-trip the tests rely on.  Each scan gets optimal Huffman
    tables built from its own symbol statistics (two-pass, Annex K.2)
    and ships them in a DHT immediately before its SOS.
    """
    (h, w, nch, hv, hmax, vmax, mcux, mcuy, prepped, q_luma, q_chroma) = (
        _prep_planes(arr, quality, subsample)
    )
    qts = [q_luma] + [q_chroma] * (nch - 1)
    script = scan_script or default_scan_script(nch)

    # quantized coefficients per component, zigzag order, MCU-padded
    coefs = {}
    bdims = {}
    for ci in range(nch):
        p = prepped[ci]
        bh_, bw_ = p.shape[0] // 8, p.shape[1] // 8
        # the SAME batched front end as the baseline encoder, so
        # coefficient identity (=> identical decoded pixels) holds by
        # construction rather than by matching expression order
        coefs[ci] = _plane_zigzag_coefs(p, qts[ci])
        ch_ = -(-(h * hv[ci][1]) // vmax)
        cw_ = -(-(w * hv[ci][0]) // hmax)
        bdims[ci] = (-(-ch_ // 8), -(-cw_ // 8))

    def run_scan(comp_ids, ss, se, ah, al, emit):
        if ss == 0:
            _enc_dc_scan(
                coefs, comp_ids, hv, mcux, mcuy, bdims, ah, al, emit
            )
        else:
            if len(comp_ids) != 1:
                raise ValueError("AC scans must be single-component")
            ci = comp_ids[0]
            tid = 0 if ci == 0 else 1
            fn = _enc_ac_first if ah == 0 else _enc_ac_refine
            fn(coefs[ci], bdims[ci], ss, se, al, tid, emit)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt(0, q_luma)
    if nch == 3:
        out += _dqt(1, q_chroma)
    sof = struct.pack(">BHHB", 8, h, w, nch)
    for ci in range(nch):
        sof += bytes(
            [ci + 1, (hv[ci][0] << 4) | hv[ci][1], 0 if ci == 0 else 1]
        )
    out += _seg(0xC2, sof)

    for comp_ids, ss, se, ah, al in script:
        counter = _CountEmitter()
        run_scan(comp_ids, ss, se, ah, al, counter)
        tables = {}
        for (cls, tid), fr in counter.freqs.items():
            bits, vals = _huffman_spec(fr)
            out += _dht(0 if cls == "dc" else 1, tid, (bits, vals))
            tables[(cls, tid)] = _build_encode_table(bits, vals)
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            tid = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (tid << 4) | tid])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        bw = _BitWriter()
        run_scan(comp_ids, ss, se, ah, al, _WriteEmitter(bw, tables))
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
