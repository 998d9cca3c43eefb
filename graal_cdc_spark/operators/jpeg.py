"""Baseline JPEG (JFIF) codec — pure numpy/stdlib, no PIL.

The LAST compressed-codec gap from VERDICT r8 ("close the JPEG gap or
park it"): a real ITU-T T.81 baseline sequential DCT codec —
8×8 forward/inverse DCT, quantization, zigzag, differential DC,
Annex-K Huffman entropy coding with byte stuffing, JFIF/DQT/SOF0/DHT/
SOS segment framing — implemented from the public spec (ITU-T T.81 /
ISO 10918-1; JFIF 1.02), the same environment-compatible route as the
PNG codec (RFC 2083, ``multimodal.encode_png``).

Scope: GRAYSCALE baseline (mm13: one component, no subsampling),
COLOR baseline (mm14, round 10: JFIF YCbCr, interleaved scan, 4:2:0
chroma subsampling or 4:4:4) with DRI/RST0–7 restart intervals in
both, and PROGRESSIVE grayscale (mm15, round 11: SOF2 spectral
selection — DC scan + AC band scans, general EOB-run decode; round
12 adds SUCCESSIVE APPROXIMATION, T.81 G.1.2/G.2: point-transformed
first scans + per-bit-plane DC raw-bit and AC newly-significant/
correction-bit refinement scans, encode and decode;
DRI-in-progressive still raises clearly). These are fully conformant JFIF streams — any standard viewer
decodes them — and the oracle story stays honest: JPEG is lossy in
general, so the gate fixtures synthesize images whose blocks are
CONSTANT (flat): a flat block's DCT is DC-only, the DC quantizer
here is 8, which divides the level-shifted flat DC ``8·(v−128)``
exactly, and a DC-only IDCT is a constant block again — so for THOSE
fixtures the round-trip is bit-exact and a SQL oracle can restate the
decoded pixel sums from the source text (the color fixture uses
gray-valued RGB, whose JFIF transform is exactly Y=v, Cb=Cr=128 —
see the color section below). General images round-trip within
quantization error (property-tested in ``tests/test_multimodal.py``),
exactly like any baseline JPEG at the same tables.

Scale shape: both directions are per-image pure functions used inside
Arrow-batched ``mapInPandas`` (see ``queries/llm.py`` mm13) — payload
bytes never leave the Python worker; the driver only ever sees the
integer census.
"""

from __future__ import annotations

import struct

import numpy as np

# --- tables ---------------------------------------------------------------

# zigzag order: index i holds the (row*8+col) position of the i-th
# coefficient in zigzag scan (ITU-T T.81 Figure 5)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 luminance quantization table, with ONE change: DC
# quantizer 8 instead of 16, so a flat block (DC = 8·(v−128),
# v integer) quantizes losslessly — the property the mm13 oracle
# fixture relies on. AC quantizers are the standard Annex K values.
QTABLE = np.array([
     8, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68,109,103, 77,
    24, 35, 55, 64, 81,104,113, 92,
    49, 64, 78, 87,103,121,120,101,
    72, 92, 95, 98,112,100,103, 99,
], dtype=np.int64)

# Annex K.3 luminance DC Huffman table: BITS (codes per length 1..16)
# and HUFFVAL (symbols in code order)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# Annex K.5 luminance AC Huffman table
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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
]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG Huffman assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _build_codes(DC_BITS, DC_VALS)
_AC_CODES = _build_codes(AC_BITS, AC_VALS)

# 8x8 DCT basis (type-II, orthonormal): D @ block @ D.T equals the
# T.81 §A.3.3 FDCT exactly (the (1/4)·Cu·Cv scaling is the same as
# the orthonormal α_u·α_v), and D.T @ coef @ D is the exact inverse
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_ALPHA = np.full(8, np.sqrt(2.0 / 8.0))
_ALPHA[0] = np.sqrt(1.0 / 8.0)
_DCT = _ALPHA[:, None] * _C


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _DCT.T @ coef @ _DCT


# --- bit IO ---------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: bitstream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("jpeg: truncated stuffing")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(f"jpeg: unexpected marker 0xFF{nxt:02X} in scan")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_restart_marker(self) -> int:
        """Discard padding bits, consume a byte-aligned RSTn marker,
        return n (0–7)."""
        self.nbits = 0  # drop the 1-padding before the marker
        if self.pos + 1 >= len(self.data):
            raise ValueError("jpeg: truncated at restart marker")
        if self.data[self.pos] != 0xFF:
            raise ValueError("jpeg: expected restart marker")
        m = self.data[self.pos + 1]
        if not 0xD0 <= m <= 0xD7:
            raise ValueError(f"jpeg: expected RSTn, got 0xFF{m:02X}")
        self.pos += 2
        return m - 0xD0


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category, extra bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    extra = v if v > 0 else v + (1 << cat) - 1
    return cat, extra


def _extend(extra: int, cat: int) -> int:
    if cat == 0:
        return 0
    if extra < (1 << (cat - 1)):
        return extra - (1 << cat) + 1
    return extra


# --- encoder --------------------------------------------------------------


def _entropy_encode_block(
    bw: "_BitWriter", block: np.ndarray, prev_dc: int
) -> int:
    """FDCT + quantize + zigzag + Huffman-encode ONE level-shifted 8×8
    block into ``bw``; returns the new DC predictor. Shared by the
    grayscale and color encoders (same Annex-K tables for every
    component — conformant, components may share tables)."""
    coef = _fdct(block)
    q = np.round(
        coef.reshape(64) / QTABLE.reshape(8, 8).reshape(64)
    ).astype(np.int64)
    zz = q[ZIGZAG]
    diff = int(zz[0]) - prev_dc
    prev_dc = int(zz[0])
    cat, extra = _magnitude(diff)
    code, length = _DC_CODES[cat]
    bw.write(code, length)
    if cat:
        bw.write(extra, cat)
    run = 0
    last_nz = 0
    for i in range(1, 64):
        if zz[i] != 0:
            last_nz = i
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = _AC_CODES[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        cat, extra = _magnitude(v)
        code, length = _AC_CODES[(run << 4) | cat]
        bw.write(code, length)
        bw.write(extra, cat)
        run = 0
    if last_nz != 63:
        code, length = _AC_CODES[0x00]  # EOB
        bw.write(code, length)
    return prev_dc


def encode_jpeg_gray(pixels: np.ndarray, restart_interval: int = 0) -> bytes:
    """Encode a (h, w) uint8 grayscale array as baseline JFIF.

    Edge blocks are replicated-padded to 8×8 multiples (standard
    practice; the decoder crops back to the SOF dimensions).

    ``restart_interval`` > 0 emits a DRI segment and RST0–7 markers
    every that-many MCUs (byte-aligned, DC predictor reset — ITU-T
    T.81 §B.2.4.4/§E.2.4), the error-resilience feature real encoders
    use so a corrupted scan loses one restart interval, not the rest
    of the image.
    """
    px = np.asarray(pixels)
    if px.ndim != 2:
        raise ValueError("encode_jpeg_gray: expected (h, w) grayscale")
    h, w = px.shape
    if h < 1 or w < 1 or h > 65535 or w > 65535:
        raise ValueError(f"encode_jpeg_gray: bad dims {h}x{w}")
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = np.empty((ph, pw), dtype=np.int64)
    padded[:h, :w] = px
    padded[h:, :w] = px[h - 1 : h, :]  # replicate last row
    padded[:, w:] = padded[:, w - 1 : w]  # replicate last col

    bw = _BitWriter()
    prev_dc = 0
    mcu = 0
    rst = 0
    shifted = padded.astype(np.float64) - 128.0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # byte-align (1-pad), emit RSTn raw (markers are never
                # byte-stuffed), reset the DC predictor
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                prev_dc = 0
            mcu += 1
            prev_dc = _entropy_encode_block(
                bw, shifted[by : by + 8, bx : bx + 8], prev_dc
            )
    bw.flush()

    out = bytearray()
    out += b"\xFF\xD8"  # SOI
    # APP0 / JFIF 1.02
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(
        [1, 2, 0, 0, 1, 0, 1, 0, 0]
    )
    # DQT (table 0, 8-bit, zigzag order)
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00"
    out += bytes(int(QTABLE[ZIGZAG[i]]) for i in range(64))
    # SOF0: baseline, 8-bit, 1 component, no subsampling (1x1)
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])  # id 1, h1v1, qtable 0
    # DHT: DC table 0 then AC table 0
    dc_payload = bytes(DC_BITS) + bytes(DC_VALS)
    ac_payload = bytes(AC_BITS) + bytes(AC_VALS)
    out += b"\xFF\xC4" + struct.pack(">H", 3 + len(dc_payload)) + b"\x00" + dc_payload
    out += b"\xFF\xC4" + struct.pack(">H", 3 + len(ac_payload)) + b"\x10" + ac_payload
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)  # DRI
    # SOS
    out += b"\xFF\xDA" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# --- decoder --------------------------------------------------------------


class _HuffTree:
    """length-indexed canonical decode: (length, code) -> symbol."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Decode a baseline JFIF grayscale stream produced by any
    conformant encoder (general DQT/DHT parsing — not tied to this
    module's tables; DRI/RST0–7 restart intervals honored, with DC
    predictor reset and marker-sequence validation). Returns
    (h, w) uint8."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_trees: dict[int, _HuffTree] = {}
    ac_trees: dict[int, _HuffTree] = {}
    h = w = 0
    comp_q = 0
    dc_id = ac_id = 0
    restart_interval = 0
    scan_data = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        # T.81 B.1.1.2: any marker may be preceded by any number of
        # 0xFF fill bytes — skip them before taking the marker byte
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly multiple tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise ValueError("jpeg: 16-bit qtable unsupported (baseline)")
                zz = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                p += 64
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = zz
                qtables[tq] = tbl
        elif marker == 0xC0:  # SOF0
            precision = seg[0]
            if precision != 8:
                raise ValueError("jpeg: only 8-bit baseline supported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp != 1:
                raise ValueError("jpeg: only grayscale (1 component) supported")
            sampling = seg[7]
            if sampling != 0x11:
                raise ValueError("jpeg: subsampling unsupported for grayscale")
            comp_q = seg[8]
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("jpeg: only baseline sequential (SOF0) supported")
        elif marker == 0xC4:  # DHT (possibly multiple tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                bits = list(seg[p : p + 16])
                p += 16
                n = sum(bits)
                vals = list(seg[p : p + n])
                p += n
                tree = _HuffTree(bits, vals)
                if tc == 0:
                    dc_trees[th] = tree
                else:
                    ac_trees[th] = tree
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ncomp = seg[0]
            if ncomp != 1:
                raise ValueError("jpeg: interleaved scans unsupported")
            dc_id, ac_id = seg[2] >> 4, seg[2] & 0x0F
            scan_data = payload[pos + seglen :]
            break
        pos += seglen
    if scan_data is None or h == 0:
        raise ValueError("jpeg: missing SOS/SOF")

    qt = qtables[comp_q]
    dct_t = dc_trees[dc_id]
    act = ac_trees[ac_id]
    br = _BitReader(scan_data)
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    out = np.zeros((ph, pw), dtype=np.float64)
    prev_dc = 0
    mcu = 0
    rst_expect = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                n = br.read_restart_marker()
                if n != rst_expect:
                    raise ValueError(
                        f"jpeg: RST out of sequence (got {n}, "
                        f"expected {rst_expect})"
                    )
                rst_expect = (rst_expect + 1) % 8
                prev_dc = 0
            mcu += 1
            zz = np.zeros(64, dtype=np.int64)
            cat = dct_t.decode(br)
            diff = _extend(br.read_bits(cat), cat) if cat else 0
            prev_dc += diff
            zz[0] = prev_dc
            i = 1
            while i < 64:
                sym = act.decode(br)
                if sym == 0x00:  # EOB
                    break
                run, cat = sym >> 4, sym & 0x0F
                if cat == 0:
                    if run == 15:  # ZRL
                        i += 16
                        continue
                    raise ValueError("jpeg: bad AC symbol")
                i += run
                if i > 63:
                    raise ValueError("jpeg: AC index overflow")
                zz[i] = _extend(br.read_bits(cat), cat)
                i += 1
            coef = np.zeros(64, dtype=np.int64)
            coef[ZIGZAG] = zz
            block = _idct((coef * qt).reshape(8, 8).astype(np.float64))
            out[by : by + 8, bx : bx + 8] = block
    return np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)[:h, :w]


# --- color (YCbCr, optional 4:2:0) -----------------------------------------
#
# ITU-T T.81 interleaved baseline with the JFIF YCbCr transform
# (JFIF 1.02 §7): Y/Cb/Cr components in one interleaved scan, Y at
# full resolution, chroma either full (4:4:4, sampling 1×1) or
# 2×2-averaged (4:2:0, Y sampling 2×2) — the MCU is then 16×16 pixels
# carrying 4 Y blocks + 1 Cb + 1 Cr, each component with its own DC
# predictor. All components share the Annex-K table set (conformant;
# table ids are per-component declarations, not per-type mandates).
#
# Exactness contract for the mm14 oracle (same honest-oracle trick as
# the grayscale mm13 fixture): GRAY-VALUED RGB (r=g=b=v) converts to
# Y=v, Cb=Cr=128 EXACTLY under the JFIF equations, flat 16×16
# macroblocks make every component block DC-only, the DC quantizer 8
# divides 8·(v−128) exactly, and the inverse transform at Cb=Cr=128
# returns r=g=b=Y — so the full color path (subsampling, interleaved
# entropy coding, three predictors, upsampling, color conversion)
# round-trips BIT-EXACTLY on that fixture. General color images
# round-trip within quantization error (property-tested).


def _rgb_to_ycbcr(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def encode_jpeg_color(
    pixels: np.ndarray,
    restart_interval: int = 0,
    subsample: bool = True,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as baseline JFIF YCbCr.

    ``subsample=True`` → 4:2:0 (Y 2×2, chroma 2×2-averaged; 16×16
    MCUs); ``False`` → 4:4:4 (8×8 MCUs, one block per component).
    ``restart_interval`` as in :func:`encode_jpeg_gray` (all three DC
    predictors reset at each RSTn)."""
    px = np.asarray(pixels)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_jpeg_color: expected (h, w, 3) RGB")
    h, w, _ = px.shape
    if h < 1 or w < 1 or h > 65535 or w > 65535:
        raise ValueError(f"encode_jpeg_color: bad dims {h}x{w}")
    m = 16 if subsample else 8
    ph = (h + m - 1) // m * m
    pw = (w + m - 1) // m * m
    padded = np.empty((ph, pw, 3), dtype=np.uint8)
    padded[:h, :w] = px
    padded[h:, :w] = px[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]

    y, cb, cr = _rgb_to_ycbcr(padded)
    if subsample:
        cb = (cb[0::2, 0::2] + cb[0::2, 1::2] + cb[1::2, 0::2] + cb[1::2, 1::2]) / 4.0
        cr = (cr[0::2, 0::2] + cr[0::2, 1::2] + cr[1::2, 0::2] + cr[1::2, 1::2]) / 4.0
    y -= 128.0
    cb -= 128.0
    cr -= 128.0

    bw = _BitWriter()
    pred = [0, 0, 0]
    mcu = 0
    rst = 0
    for my in range(0, ph, m):
        for mx in range(0, pw, m):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0, 0, 0]
            mcu += 1
            if subsample:
                for by in (0, 8):
                    for bx in (0, 8):
                        pred[0] = _entropy_encode_block(
                            bw,
                            y[my + by : my + by + 8, mx + bx : mx + bx + 8],
                            pred[0],
                        )
                cy, cx = my // 2, mx // 2
                pred[1] = _entropy_encode_block(
                    bw, cb[cy : cy + 8, cx : cx + 8], pred[1]
                )
                pred[2] = _entropy_encode_block(
                    bw, cr[cy : cy + 8, cx : cx + 8], pred[2]
                )
            else:
                pred[0] = _entropy_encode_block(
                    bw, y[my : my + 8, mx : mx + 8], pred[0]
                )
                pred[1] = _entropy_encode_block(
                    bw, cb[my : my + 8, mx : mx + 8], pred[1]
                )
                pred[2] = _entropy_encode_block(
                    bw, cr[my : my + 8, mx : mx + 8], pred[2]
                )
    bw.flush()

    samp_y = 0x22 if subsample else 0x11
    out = bytearray()
    out += b"\xFF\xD8"
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(
        [1, 2, 0, 0, 1, 0, 1, 0, 0]
    )
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00"
    out += bytes(int(QTABLE[ZIGZAG[i]]) for i in range(64))
    # SOF0: 3 components — Y (id 1, sampling per mode), Cb/Cr (id 2/3,
    # 1x1), all on quant table 0
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, samp_y, 0, 2, 0x11, 0, 3, 0x11, 0])
    dc_payload = bytes(DC_BITS) + bytes(DC_VALS)
    ac_payload = bytes(AC_BITS) + bytes(AC_VALS)
    out += b"\xFF\xC4" + struct.pack(">H", 3 + len(dc_payload)) + b"\x00" + dc_payload
    out += b"\xFF\xC4" + struct.pack(">H", 3 + len(ac_payload)) + b"\x10" + ac_payload
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    # SOS: 3 components, all DC/AC table 0
    out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += bw.out
    out += b"\xFF\xD9"
    return bytes(out)


def decode_jpeg_color(payload: bytes) -> np.ndarray:
    """Decode a baseline JFIF YCbCr stream (interleaved scan, 4:4:4 or
    4:2:0 sampling, general DQT/DHT parsing, DRI/RSTn honored).
    Returns (h, w, 3) uint8 RGB."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_trees: dict[int, _HuffTree] = {}
    ac_trees: dict[int, _HuffTree] = {}
    h = w = 0
    comps: list[tuple[int, int, int, int]] = []  # (id, hs, vs, tq)
    scan_tables: dict[int, tuple[int, int]] = {}
    restart_interval = 0
    scan_data = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        # T.81 B.1.1.2: any marker may be preceded by any number of
        # 0xFF fill bytes — skip them before taking the marker byte
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise ValueError("jpeg: 16-bit qtable unsupported (baseline)")
                zzv = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                p += 64
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = zzv
                qtables[tq] = tbl
        elif marker == 0xC0:
            if seg[0] != 8:
                raise ValueError("jpeg: only 8-bit baseline supported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for k in range(ncomp):
                cid = seg[6 + 3 * k]
                hs, vs = seg[7 + 3 * k] >> 4, seg[7 + 3 * k] & 0x0F
                comps.append((cid, hs, vs, seg[8 + 3 * k]))
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("jpeg: only baseline sequential (SOF0) supported")
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                bits = list(seg[p : p + 16])
                p += 16
                nv = sum(bits)
                vals = list(seg[p : p + nv])
                p += nv
                tree = _HuffTree(bits, vals)
                if tc == 0:
                    dc_trees[th] = tree
                else:
                    ac_trees[th] = tree
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            for k in range(ns):
                cid = seg[1 + 2 * k]
                scan_tables[cid] = (seg[2 + 2 * k] >> 4, seg[2 + 2 * k] & 0x0F)
            scan_data = payload[pos + seglen :]
            break
        pos += seglen
    if scan_data is None or h == 0 or not comps:
        raise ValueError("jpeg: missing SOS/SOF")
    if len(comps) == 1:
        gray = decode_jpeg_gray(payload)
        return np.stack([gray, gray, gray], axis=-1)
    if len(comps) != 3:
        raise ValueError(f"jpeg: {len(comps)} components unsupported")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    planes = {}
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)

    br = _BitReader(scan_data)
    pred = {cid: 0 for cid, *_ in comps}
    mcu = 0
    rst_expect = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                n = br.read_restart_marker()
                if n != rst_expect:
                    raise ValueError(
                        f"jpeg: RST out of sequence (got {n}, "
                        f"expected {rst_expect})"
                    )
                rst_expect = (rst_expect + 1) % 8
                pred = {cid: 0 for cid, *_ in comps}
            mcu += 1
            for cid, hs, vs, tq in comps:
                dct_t = dc_trees[scan_tables[cid][0]]
                act = ac_trees[scan_tables[cid][1]]
                qt = qtables[tq]
                for bv in range(vs):
                    for bh_ in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        cat = dct_t.decode(br)
                        diff = _extend(br.read_bits(cat), cat) if cat else 0
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        i = 1
                        while i < 64:
                            sym = act.decode(br)
                            if sym == 0x00:
                                break
                            run, cat = sym >> 4, sym & 0x0F
                            if cat == 0:
                                if run == 15:
                                    i += 16
                                    continue
                                raise ValueError("jpeg: bad AC symbol")
                            i += run
                            if i > 63:
                                raise ValueError("jpeg: AC index overflow")
                            zz[i] = _extend(br.read_bits(cat), cat)
                            i += 1
                        coef = np.zeros(64, dtype=np.int64)
                        coef[ZIGZAG] = zz
                        block = _idct(
                            (coef * qt).reshape(8, 8).astype(np.float64)
                        )
                        py = (my * vs + bv) * 8
                        px_ = (mx * hs + bh_) * 8
                        planes[cid][py : py + 8, px_ : px_ + 8] = block

    # upsample each plane to full padded resolution by replication,
    # then crop and color-convert
    full = {}
    for cid, hs, vs, _tq in comps:
        p = planes[cid] + 128.0
        if hs < hmax or vs < vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full[cid] = p[: mcus_y * mcu_h, : mcus_x * mcu_w][:h, :w]
    y_id, cb_id, cr_id = (c[0] for c in comps)
    return _ycbcr_to_rgb(full[y_id], full[cb_id], full[cr_id])


# --- progressive (SOF2, spectral-selection scan script) --------------------
#
# ITU-T T.81 Annex G progressive DCT, spectral-selection mode: the
# quantized coefficients are IDENTICAL to baseline's (same FDCT, same
# tables) but delivered across MULTIPLE scans — a DC-only first scan
# (Ss=Se=0), then AC band scans (Ss..Se inside 1..63), each its own
# SOS. This is the web's "image sharpens as it loads" format and the
# second SOF the reference's users would actually hit (SOF2 is ~2/3
# of large-site JPEGs). Successive approximation (Ah/Al != 0) is out
# of scope and raises clearly — spectral selection alone is a legal,
# conformant progressive stream (T.81 G.1.1.1.1).
#
# Exactness contract: because the coefficients equal baseline's, a
# progressive decode of a progressive encode is BIT-IDENTICAL to the
# baseline round-trip of the same image — not just on flat-block
# fixtures but on EVERY image (property-tested cross-codec in
# tests/test_multimodal.py). The mm15 oracle reuses the mm13
# flat-block fixture arithmetic unchanged.
#
# The AC decoder handles general EOB runs (EOBn symbols, r extra
# bits, run = (1 << r) + extra — other encoders emit them); this
# encoder emits only EOB1 (symbol 0x00), which the Annex-K table
# already contains, so the standard table set serves both directions.


def _quantized_blocks_gray(px: np.ndarray) -> tuple[int, int, np.ndarray]:
    """(h, w, zz) — zigzag-ordered quantized coefficients, one row per
    8×8 block in raster order, replicate-padded like the baseline
    encoder."""
    h, w = px.shape
    if h < 1 or w < 1 or h > 65535 or w > 65535:
        raise ValueError(f"jpeg progressive: bad dims {h}x{w}")
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = np.empty((ph, pw), dtype=np.int64)
    padded[:h, :w] = px
    padded[h:, :w] = px[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    shifted = padded.astype(np.float64) - 128.0
    out = []
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            coef = _fdct(shifted[by : by + 8, bx : bx + 8])
            q = np.round(coef.reshape(64) / QTABLE.astype(np.float64)).astype(
                np.int64
            )
            out.append(q[ZIGZAG])
    return h, w, np.stack(out)


def _write_ac_first_scan(
    bw_: "_BitWriter", zz: np.ndarray, ss: int, se: int, al: int,
    b0: int = 0, b1: int | None = None,
) -> None:
    """One AC band scan with Ah=0: run/size coding of the
    point-transformed values sign·(|v| >> Al) (T.81 G.1.2.2; Al=0
    degenerates to plain spectral selection). ``b0``/``b1`` bound the
    block range so restart-interval encoders can segment the scan
    (EOB runs here are per-block, so no run ever crosses a segment)."""
    for b in range(b0, zz.shape[0] if b1 is None else b1):
        band = zz[b]
        shifted = [
            (1 if band[i] > 0 else -1) * (abs(int(band[i])) >> al)
            for i in range(ss, se + 1)
        ]
        last_nz = -1
        for j, v in enumerate(shifted):
            if v != 0:
                last_nz = j
        if last_nz < 0:
            code, length = _AC_CODES[0x00]  # EOB (run length 1)
            bw_.write(code, length)
            continue
        run = 0
        for j in range(last_nz + 1):
            v = shifted[j]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = _AC_CODES[0xF0]  # ZRL
                bw_.write(code, length)
                run -= 16
            cat, extra = _magnitude(v)
            code, length = _AC_CODES[(run << 4) | cat]
            bw_.write(code, length)
            bw_.write(extra, cat)
            run = 0
        if last_nz != se - ss:
            code, length = _AC_CODES[0x00]
            bw_.write(code, length)


def _write_ac_refine_scan(
    bw_: "_BitWriter", zz: np.ndarray, ss: int, se: int, ah: int, al: int,
    b0: int = 0, b1: int | None = None,
) -> None:
    """One AC successive-approximation refinement scan (Ah = Al + 1,
    T.81 G.1.2.3): newly-significant coefficients (|v| >> Al == 1)
    are coded run/size with S=1 + a sign bit, where the run counts
    only ZERO-HISTORY zeros; already-nonzero coefficients contribute
    one buffered correction bit ((|v| >> Al) & 1) appended after the
    next symbol; a block with no (further) new significance ends
    with EOB1 + its buffered correction bits. This encoder emits
    per-block EOB1 because the Annex-K AC table defines no EOBn>1
    codes (same constraint as the first-scan encoder); the DECODER
    handles general EOBn runs from other encoders."""
    for b in range(b0, zz.shape[0] if b1 is None else b1):
        band = zz[b]
        shifted = [abs(int(band[i])) >> al for i in range(ss, se + 1)]
        # last newly-significant index (relative): |v|>>Al == 1 means
        # zero history, because |v|>>Al > 1 implies |v|>>Ah >= 1
        eob_rel = -1
        for j, t in enumerate(shifted):
            if t == 1:
                eob_rel = j
        r = 0
        cur_bits: list[int] = []  # corrections within this block
        for j, t in enumerate(shifted):
            if t == 0:
                r += 1
                continue
            while r > 15 and j <= eob_rel:
                code, length = _AC_CODES[0xF0]  # ZRL
                bw_.write(code, length)
                r -= 16
                for bit in cur_bits:
                    bw_.write(bit, 1)
                cur_bits = []
            if t > 1:
                cur_bits.append(t & 1)  # history-nonzero: correction
                continue
            code, length = _AC_CODES[(r << 4) | 1]
            bw_.write(code, length)
            bw_.write(1 if band[ss + j] > 0 else 0, 1)
            for bit in cur_bits:
                bw_.write(bit, 1)
            cur_bits = []
            r = 0
        if r > 0 or cur_bits:
            # trailing zero-history zeros / corrections: end the
            # block with EOB1 followed by its tail correction bits
            # (a block whose last position is a new significance
            # needs no EOB: the decoder's k passes Se)
            code, length = _AC_CODES[0x00]
            bw_.write(code, length)
            for bit in cur_bits:
                bw_.write(bit, 1)


def encode_jpeg_gray_progressive(
    pixels: np.ndarray,
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
    al: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """Encode a (h, w) uint8 grayscale array as PROGRESSIVE JFIF
    (SOF2). ``al = 0``: pure spectral selection — one DC scan, then
    one AC scan per ``(Ss, Se)`` band. ``al > 0``: spectral selection
    PLUS successive approximation (T.81 G.1.2) — first scans deliver
    the point-transformed coefficients (DC arithmetic-shifted, AC
    sign-magnitude-shifted by ``al``), then one refinement scan per
    remaining bit plane (Ah = Al + 1 … down to Al = 0) for DC (raw
    bits) and each AC band (newly-significant run/size + buffered
    correction bits). Bands must be ascending, disjoint, and cover
    1..63 so every coefficient is delivered exactly once per plane.
    ``restart_interval`` > 0 emits a DRI segment and RST0–7 markers
    every that-many MCUs in EVERY scan (T.81 allows DRI in
    progressive streams): per-segment byte alignment, DC predictor
    reset, and no EOB run crossing a boundary — a corrupted scan
    loses one restart interval, not the rest of the image."""
    px = np.asarray(pixels)
    if px.ndim != 2:
        raise ValueError("encode_jpeg_gray_progressive: expected (h, w)")
    if not (0 <= al <= 10):
        raise ValueError(f"jpeg progressive: al must be 0..10, got {al}")
    expect = 1
    for ss, se in bands:
        if ss != expect or se < ss or se > 63:
            raise ValueError(
                f"jpeg progressive: bands must tile 1..63, got {bands}"
            )
        expect = se + 1
    if expect != 64:
        raise ValueError(
            f"jpeg progressive: bands must cover through 63, got {bands}"
        )
    h, w, zz = _quantized_blocks_gray(px)

    out = bytearray()
    out += b"\xFF\xD8"
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(
        [1, 2, 0, 0, 1, 0, 1, 0, 0]
    )
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00"
    out += bytes(int(QTABLE[ZIGZAG[i]]) for i in range(64))
    # SOF2: progressive, 8-bit, 1 component, no subsampling
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])
    dc_payload = bytes(DC_BITS) + bytes(DC_VALS)
    ac_payload = bytes(AC_BITS) + bytes(AC_VALS)
    out += (
        b"\xFF\xC4" + struct.pack(">H", 3 + len(dc_payload)) + b"\x00"
        + dc_payload
    )
    out += (
        b"\xFF\xC4" + struct.pack(">H", 3 + len(ac_payload)) + b"\x10"
        + ac_payload
    )
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)

    nb_total = zz.shape[0]

    def segmented(write_blocks) -> bytes:
        """Entropy-code the scan, splitting into restart segments:
        each segment is independently flushed (byte-aligned) and
        separated by cycling RST0–7 markers."""
        if not restart_interval:
            bw_ = _BitWriter()
            write_blocks(bw_, 0, nb_total)
            bw_.flush()
            return bytes(bw_.out)
        body = bytearray()
        m = 0
        for start in range(0, nb_total, restart_interval):
            end = min(start + restart_interval, nb_total)
            bw_ = _BitWriter()
            write_blocks(bw_, start, end)
            bw_.flush()
            body += bw_.out
            if end < nb_total:
                body += bytes([0xFF, 0xD0 + (m % 8)])
                m += 1
        return bytes(body)

    def sos(ss: int, se: int, ah: int, al_: int, body: bytes) -> bytes:
        return (
            b"\xFF\xDA"
            + struct.pack(">HB", 8, 1)
            + bytes([1, 0x00, ss, se, (ah << 4) | al_])
            + body
        )

    # scan 1: DC first scan (Ss=Se=0, Ah=0, Al=al) — differential
    # coding of the ARITHMETIC-shifted DC values (T.81 G.1.2.1); the
    # predictor resets at every restart segment
    def dc_first(bw_, b0, b1):
        prev_dc = 0
        for b in range(b0, b1):
            dc = int(zz[b, 0]) >> al
            diff = dc - prev_dc
            prev_dc = dc
            cat, extra = _magnitude(diff)
            code, length = _DC_CODES[cat]
            bw_.write(code, length)
            if cat:
                bw_.write(extra, cat)

    out += sos(0, 0, 0, al, segmented(dc_first))

    # AC first scans (Ah=0, Al=al): run/size coding of the
    # sign-magnitude point transform per band
    for ss, se in bands:
        out += sos(
            ss, se, 0, al,
            segmented(
                lambda bw_, b0, b1, _ss=ss, _se=se:
                _write_ac_first_scan(bw_, zz, _ss, _se, al, b0, b1)
            ),
        )

    # successive-approximation refinement planes, Al = al-1 .. 0:
    # DC refinements are one raw bit per block; AC refinements are
    # the G.1.2.3 newly-significant/correction coding per band
    for plane in range(al - 1, -1, -1):
        def dc_refine(bw_, b0, b1, _plane=plane):
            for b in range(b0, b1):
                bw_.write((int(zz[b, 0]) >> _plane) & 1, 1)

        out += sos(0, 0, plane + 1, plane, segmented(dc_refine))
        for ss, se in bands:
            out += sos(
                ss, se, plane + 1, plane,
                segmented(
                    lambda bw_, b0, b1, _ss=ss, _se=se, _p=plane:
                    _write_ac_refine_scan(
                        bw_, zz, _ss, _se, _p + 1, _p, b0, b1
                    )
                ),
            )

    out += b"\xFF\xD9"
    return bytes(out)


def _entropy_end(payload: bytes, start: int) -> int:
    """Index just past an entropy-coded segment: the first 0xFF
    followed by a real marker (not 0x00 stuffing, not RSTn)."""
    p = start
    n = len(payload)
    while p < n - 1:
        if payload[p] == 0xFF:
            nxt = payload[p + 1]
            if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                return p
            p += 2
            continue
        p += 1
    raise ValueError("jpeg progressive: unterminated scan")


def decode_jpeg_gray_progressive(payload: bytes) -> np.ndarray:
    """Decode a PROGRESSIVE (SOF2) grayscale JFIF stream: general
    marker parsing, any number of spectral-selection scans in any
    band order, general EOB-run (EOBn) handling in AC scans, and
    FULL successive approximation (T.81 G.2): point-transformed
    first scans, DC raw-bit refinements, AC newly-significant +
    correction-bit refinements with EOB runs that still consume the
    covered blocks' correction bits. DRI/RST0–7 restart intervals
    honored in every scan type (per-segment byte alignment, DC
    predictor reset, EOB runs validated against boundary crossing).
    Returns (h, w) uint8."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_trees: dict[int, _HuffTree] = {}
    ac_trees: dict[int, _HuffTree] = {}
    h = w = 0
    comp_q = 0
    restart_interval = 0
    coefs: np.ndarray | None = None
    # per zigzag index: -1 = no first scan yet, else the Al of the
    # last scan == the Ah the next refinement must carry; fully
    # delivered when every entry reaches 0 (T.81 successive-
    # approximation progression: Ah = previous Al, Al = Ah - 1)
    next_ah = np.full(64, -1, dtype=np.int64)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        # T.81 B.1.1.2: any marker may be preceded by any number of
        # 0xFF fill bytes — skip them before taking the marker byte
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(payload):
            raise ValueError("jpeg progressive: truncated segment header")
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        if pos + seglen > len(payload):
            raise ValueError("jpeg progressive: truncated segment")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise ValueError("jpeg: 16-bit qtable unsupported")
                zzt = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                    np.int64
                )
                p += 64
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = zzt
                qtables[tq] = tbl
        elif marker == 0xC2:  # SOF2
            if seg[0] != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            h, w = struct.unpack(">HH", seg[1:5])
            if seg[5] != 1:
                raise ValueError(
                    "jpeg progressive: only grayscale supported"
                )
            if seg[7] != 0x11:
                raise ValueError("jpeg progressive: subsampling unsupported")
            comp_q = seg[8]
            nb = ((h + 7) // 8) * ((w + 7) // 8)
            coefs = np.zeros((nb, 64), dtype=np.int64)
        elif marker in (0xC0, 0xC1, 0xC3):
            raise ValueError(
                "decode_jpeg_gray_progressive: stream is not SOF2 "
                "(use decode_jpeg_gray for baseline)"
            )
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                bits = list(seg[p : p + 16])
                p += 16
                nsym = sum(bits)
                vals = list(seg[p : p + nsym])
                p += nsym
                tree = _HuffTree(bits, vals)
                (dc_trees if tc == 0 else ac_trees)[th] = tree
        elif marker == 0xDD:  # DRI — restart intervals per T.81
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — one scan
            if coefs is None:
                raise ValueError("jpeg: SOS before SOF2")
            if seg[0] != 1:
                raise ValueError("jpeg progressive: interleaved scan")
            dc_id, ac_id = seg[2] >> 4, seg[2] & 0x0F
            ss, se, ahal = seg[3], seg[4], seg[5]
            ah, al = ahal >> 4, ahal & 0x0F
            if ah != 0 and ah != al + 1:
                raise ValueError(
                    f"jpeg progressive: refinement must reduce the "
                    f"bit position by one (Ah={ah}, Al={al})"
                )
            data_start = pos + seglen
            data_end = _entropy_end(payload, data_start)
            br = _BitReader(payload[data_start:data_end])
            nb = coefs.shape[0]
            p1 = 1 << al

            def _refine_nonzero(b: int, i: int) -> None:
                # one correction bit for an already-nonzero coef
                # (T.81 G.2): magnitude gains the Al bit if set
                if br.read_bit():
                    v = int(coefs[b, i])
                    if v > 0:
                        if not (v & p1):
                            coefs[b, i] = v + p1
                    elif v < 0:
                        if not ((-v) & p1):
                            coefs[b, i] = v - p1

            if ss == 0:  # DC scan
                if se != 0:
                    raise ValueError("jpeg progressive: DC scan with Se != 0")
                if ah == 0:  # first DC scan at bit position al
                    if next_ah[0] != -1:
                        raise ValueError(
                            "jpeg progressive: band 0..0 overlaps a "
                            "previous scan"
                        )
                    tree = dc_trees[dc_id]
                    pred = 0
                    for b in range(nb):
                        if restart_interval and b and b % restart_interval == 0:
                            br.read_restart_marker()
                            pred = 0  # predictor resets per segment
                        cat = tree.decode(br)
                        pred += (
                            _extend(br.read_bits(cat), cat) if cat else 0
                        )
                        coefs[b, 0] = pred << al
                else:  # DC refinement: one raw bit per block
                    if next_ah[0] != ah:
                        raise ValueError(
                            f"jpeg progressive: DC refinement Ah={ah} "
                            f"does not continue the previous scan"
                        )
                    for b in range(nb):
                        if restart_interval and b and b % restart_interval == 0:
                            br.read_restart_marker()
                        if br.read_bit():
                            # arithmetic-shift accumulation: OR works
                            # for negatives in two's complement
                            coefs[b, 0] = int(coefs[b, 0]) | p1
                next_ah[0] = al
            else:  # AC band scan
                if ss > se or se > 63:
                    raise ValueError(
                        f"jpeg progressive: bad band {ss}..{se}"
                    )
                tree = ac_trees[ac_id]
                if ah == 0:  # first scan for this band
                    if (next_ah[ss : se + 1] != -1).any():
                        raise ValueError(
                            f"jpeg progressive: band {ss}..{se} overlaps "
                            "a previous scan"
                        )
                    eobrun = 0
                    for b in range(nb):
                        if restart_interval and b and b % restart_interval == 0:
                            if eobrun:
                                raise ValueError(
                                    "jpeg progressive: EOB run crosses "
                                    "a restart boundary (T.81 forbids)"
                                )
                            br.read_restart_marker()
                        if eobrun > 0:
                            eobrun -= 1
                            continue
                        i = ss
                        while i <= se:
                            sym = tree.decode(br)
                            run, cat = sym >> 4, sym & 0x0F
                            if cat == 0:
                                if run == 15:  # ZRL
                                    i += 16
                                    continue
                                # EOBn: (1 << run) + extra bands end
                                eobrun = (1 << run) - 1
                                if run:
                                    eobrun += br.read_bits(run)
                                break
                            i += run
                            if i > se:
                                raise ValueError(
                                    "jpeg progressive: AC index past Se"
                                )
                            coefs[b, i] = (
                                _extend(br.read_bits(cat), cat) << al
                            )
                            i += 1
                else:  # AC refinement scan (G.2.2)
                    if (next_ah[ss : se + 1] != ah).any():
                        raise ValueError(
                            f"jpeg progressive: AC refinement "
                            f"{ss}..{se} Ah={ah} does not continue "
                            "the previous scan"
                        )
                    eobrun = 0
                    for b in range(nb):
                        if restart_interval and b and b % restart_interval == 0:
                            if eobrun:
                                raise ValueError(
                                    "jpeg progressive: EOB run crosses "
                                    "a restart boundary (T.81 forbids)"
                                )
                            br.read_restart_marker()
                        if eobrun > 0:
                            # block covered by an EOB run: its
                            # nonzero coefs still carry corrections
                            for i in range(ss, se + 1):
                                if coefs[b, i] != 0:
                                    _refine_nonzero(b, i)
                            eobrun -= 1
                            continue
                        k = ss
                        in_eob = False
                        while k <= se:
                            sym = tree.decode(br)
                            run, cat = sym >> 4, sym & 0x0F
                            s = 0
                            if cat == 0:
                                if run != 15:
                                    eobrun = 1 << run
                                    if run:
                                        eobrun += br.read_bits(run)
                                    in_eob = True
                                    break
                                r = 15  # ZRL: 16 zero-history slots
                            else:
                                if cat != 1:
                                    raise ValueError(
                                        "jpeg progressive: refinement "
                                        "symbol size != 1"
                                    )
                                r = run
                                s = p1 if br.read_bit() else -p1
                            while k <= se:
                                if coefs[b, k] != 0:
                                    _refine_nonzero(b, k)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if s:
                                if k > se:
                                    raise ValueError(
                                        "jpeg progressive: refinement "
                                        "run past Se"
                                    )
                                coefs[b, k] = s
                            k += 1
                        if in_eob:
                            # the EOBn covers THIS block's tail too
                            for i in range(k, se + 1):
                                if coefs[b, i] != 0:
                                    _refine_nonzero(b, i)
                            eobrun -= 1
                next_ah[ss : se + 1] = al
            pos = data_end
            continue
        pos += seglen
    if coefs is None or h == 0:
        raise ValueError("jpeg progressive: missing SOF2")
    if (next_ah != 0).any():
        missing = np.flatnonzero(next_ah != 0)
        raise ValueError(
            f"jpeg progressive: coefficients never delivered: "
            f"{missing[:6].tolist()}…"
        )

    qt = qtables[comp_q]
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    out = np.zeros((ph, pw), dtype=np.float64)
    bpr = pw // 8
    for b in range(coefs.shape[0]):
        zzb = coefs[b]
        coef = np.zeros(64, dtype=np.int64)
        coef[ZIGZAG] = zzb
        block = _idct((coef * qt).reshape(8, 8).astype(np.float64))
        by, bx = (b // bpr) * 8, (b % bpr) * 8
        out[by : by + 8, bx : bx + 8] = block
    return np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)[:h, :w]
