"""Pure-stdlib+numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Closes the last hash-faked corner of the multimodal layer: JPEG was
dims-only (header walk) because no codec library exists in the sandbox.
This module implements the public baseline process from the JPEG spec —
everything here (marker syntax, Annex K quantization and Huffman tables,
zigzag order, the EXTEND procedure, byte stuffing, restart markers) is
textbook-published format knowledge:

* `make_jpeg(w, h, bgr, subsample=...)` — baseline sequential JFIF
  encoder: BGR→YCbCr (BT.601 full-range, the JFIF convention), 8x8
  forward DCT (orthonormal matrix form, numpy), Annex K table K.1/K.2
  quantization, zigzag, DC-difference + AC run-length entropy coding
  with the Annex K "typical" Huffman tables, 0xFF byte stuffing.
  `subsample=True` emits 4:2:0 (chroma boxed-averaged 2x2), else 4:4:4.
* `jpeg_pixels(payload)` — baseline decoder: marker parse (DQT 8/16-bit,
  DHT, SOF0, DRI, SOS), canonical Huffman decode, dequant + inverse
  zigzag, 8x8 IDCT, per-component sampling-factor upsampling, YCbCr→BGR,
  crop to the frame dims. Returns (w, h, BGR bytes) like the other
  `*_pixels` decoders in codecs.py, or None on any malformed input.
  Handles 1- and 3-component frames, any sampling factors ≤ 4, and
  restart intervals. Progressive (SOF2) and arithmetic coding are out of
  scope — sniffed and refused cleanly (None), never misparsed.

The pair is lossy-roundtrip-consistent (pinned by test_codecs.py:
flat fields survive exactly, smooth ramps within quantization error) and
the decoder is the real pixel source for multimodal JPEG features.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Spec constants (ITU-T T.81 Annex K — published example tables)
# ---------------------------------------------------------------------------

# K.1 / K.2 quantization tables, natural (row-major) order
QT_LUM = np.array(
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
    dtype=np.int32,
).reshape(8, 8)

QT_CHROM = np.array(
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
    dtype=np.int32,
).reshape(8, 8)

# zigzag scan: ZZ[k] = (row, col) of the k-th coefficient
def _zigzag_order() -> list[tuple[int, int]]:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )
    return order


ZZ = _zigzag_order()
ZZ_FLAT = np.array([r * 8 + c for r, c in ZZ])

# K.3 "typical" Huffman tables: (bits[1..16], huffval)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    u = x.reshape(8, 1)
    m = np.cos((2 * x + 1) * u * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return m * 0.5  # orthonormal: M @ M.T == I


DCT_M = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]):
    """(code, length) per symbol in spec order (T.81 C.2)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]):
    """(length, code) -> symbol for the decoder."""
    return {(l, c): v for v, (c, l) in _canonical_codes(bits, vals).items()}


# ---------------------------------------------------------------------------
# Bit I/O with 0xFF stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:
                # hit a marker mid-entropy-stream: callers handle RSTn by
                # calling restart(); anything else is a decode error
                raise _MarkerHit(nxt)
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_eat_rst(self) -> None:
        """Byte-align and consume an RSTn marker (restart interval)."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _huff_decode(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t low bits to a signed coefficient."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _bgr_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    b = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    r = arr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=0)


def _pad_to_block(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, bh - h), (0, bw - w)), mode="edge")


def _encode_block(
    bw_: _BitWriter, block: np.ndarray, qt: np.ndarray, dc_codes, ac_codes,
    pred: int,
) -> int:
    coef = DCT_M @ (block - 128.0) @ DCT_M.T
    q = np.round(coef / qt).astype(np.int64)
    zz = q.flatten()[ZZ_FLAT]
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    code, length = dc_codes[t]
    bw_.write(code, length)
    if t:
        bw_.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw_.write(code, length)
            run -= 16
        t = _category(v)
        code, length = ac_codes[(run << 4) | t]
        bw_.write(code, length)
        bw_.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        bw_.write(code, length)
    return dc


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(table.flatten()[i]) for i in ZZ_FLAT)
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def make_jpeg(
    width: int,
    height: int,
    pixels_bgr: bytes,
    subsample: bool = False,
    restart: int = 0,
) -> bytes:
    """Encode 24bpp BGR pixels as a baseline JFIF JPEG (4:2:0 when
    `subsample`, else 4:4:4), Annex K tables throughout. `restart` > 0
    emits a DRI segment and an RSTn marker every `restart` MCUs (resets
    DC predictors), exercising the decoder's restart path."""
    arr = np.frombuffer(pixels_bgr, dtype=np.uint8).reshape(height, width, 3)
    ycc = _bgr_to_ycbcr(arr)
    hmax = 2 if subsample else 1
    planes = [ycc[0]]
    for c in (1, 2):
        p = ycc[c]
        if subsample:
            ph = _pad_to_block(p, (height + 1) // 2 * 2, (width + 1) // 2 * 2)
            p = ph.reshape(ph.shape[0] // 2, 2, ph.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
        planes.append(p)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (  # APP0 JFIF 1.01, no density, no thumbnail
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, QT_LUM)
    out += _dqt_segment(1, QT_CHROM)
    comp = bytes([1, (hmax << 4) | hmax, 0]) + bytes([2, 0x11, 1]) + bytes(
        [3, 0x11, 1]
    )
    out += (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 8 + 3 * 3, 8, height, width, 3)
        + comp
    )
    out += _dht_segment(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += _dht_segment(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    out += _dht_segment(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
    out += _dht_segment(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * 3, 3) + bytes(
        [1, 0x00, 2, 0x11, 3, 0x11]
    ) + bytes([0, 63, 0])

    dc_l = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * hmax - 1) // (8 * hmax)
    padded = [
        _pad_to_block(planes[0], mcuy * hmax * 8, mcux * hmax * 8),
        _pad_to_block(planes[1], mcuy * 8, mcux * 8),
        _pad_to_block(planes[2], mcuy * 8, mcux * 8),
    ]
    bw_ = _BitWriter()
    preds = [0, 0, 0]
    n_mcu = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                bw_.flush()
                out += bw_.out  # markers go in UNstuffed
                out += bytes([0xFF, 0xD0 + rst_n % 8])
                rst_n += 1
                bw_ = _BitWriter()
                preds = [0, 0, 0]
            n_mcu += 1
            for by in range(hmax):
                for bx in range(hmax):
                    r0, c0 = (my * hmax + by) * 8, (mx * hmax + bx) * 8
                    preds[0] = _encode_block(
                        bw_, padded[0][r0 : r0 + 8, c0 : c0 + 8], QT_LUM,
                        dc_l, ac_l, preds[0],
                    )
            for c in (1, 2):
                r0, c0 = my * 8, mx * 8
                preds[c] = _encode_block(
                    bw_, padded[c][r0 : r0 + 8, c0 : c0 + 8], QT_CHROM,
                    dc_c, ac_c, preds[c],
                )
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def jpeg_pixels(payload: bytes) -> tuple[int, int, bytes] | None:
    """Decode a baseline (SOF0) JPEG to (width, height, BGR bytes);
    None for progressive/arithmetic/malformed input."""
    try:
        return _decode(payload)
    except Exception:
        return None


def _decode(data: bytes) -> tuple[int, int, bytes] | None:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        # spec-legal 0xFF fill bytes may pad the gap between segments
        # (ITU-T T.81 B.1.1.2); skip the run so the marker code is read
        # from the byte after the LAST 0xFF (ADVICE r05)
        while pos + 2 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            return None  # EOI before SOS
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                n = 64 * (2 if pq else 1)
                raw = seg[i : i + n]
                vals = (
                    np.array(struct.unpack(f">{64}H", raw))
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                )
                table = np.zeros(64, dtype=np.int32)
                table[ZZ_FLAT] = vals
                qts[tq] = table.reshape(8, 8)
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                huff[(tc, th)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8 or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, sf, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, sf >> 4, sf & 0xF, tq))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            return None  # progressive / extended: refuse, don't misparse
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0xF))
            return _decode_scan(
                data, pos + seglen, frame, scan, qts, huff, restart
            )
        pos += seglen
    return None


def _decode_scan(data, pos, frame, scan, qts, huff, restart):
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not (1 <= hmax <= 4 and 1 <= vmax <= 4):
        return None
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    order = []  # (comp_idx, hi, vi, qt, dc_table, ac_table)
    for cid, hi, vi, tq in comps:
        sel = next((s for s in scan if s[0] == cid), None)
        if sel is None or tq not in qts:
            return None
        _, td, ta = sel
        if (0, td) not in huff or (1, ta) not in huff:
            return None
        planes[cid] = np.zeros((mcuy * vi * 8, mcux * hi * 8))
        order.append((cid, hi, vi, qts[tq], huff[(0, td)], huff[(1, ta)]))

    br = _BitReader(data, pos)
    preds = {cid: 0 for cid, *_ in order}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                br.align_and_eat_rst()
                preds = {cid: 0 for cid in preds}
            elif (
                n_mcu
                and br.nbits < 8
                and br.pos + 1 < len(data)
                and data[br.pos] == 0xFF
                and 0xD0 <= data[br.pos + 1] <= 0xD7
            ):
                # RST sitting exactly on an MCU boundary without matching
                # DRI bookkeeping (encoder quirk): tolerate it — consume
                # the marker, reset predictors, decode this MCU normally.
                # (nbits < 8 means only sub-byte padding remains buffered,
                # i.e. the entropy stream is genuinely at the marker.)
                br.align_and_eat_rst()
                preds = {cid: 0 for cid in preds}
            try:
                for cid, hi, vi, qt, dct, act in order:
                    for by in range(vi):
                        for bx in range(hi):
                            blk, preds[cid] = _decode_block(
                                br, qt, dct, act, preds[cid]
                            )
                            r0 = (my * vi + by) * 8
                            c0 = (mx * hi + bx) * 8
                            planes[cid][r0 : r0 + 8, c0 : c0 + 8] = blk
            except _MarkerHit:
                # ANY marker mid-MCU — including an unexpected RSTn — is a
                # decode error: the former skip-the-rest-of-the-MCU
                # tolerance left zero-initialized blocks decoding as
                # silent mid-gray pixels (ADVICE r05); the contract is
                # None on malformed input.
                return None
            n_mcu += 1

    # upsample each component to full resolution and crop
    full = []
    for cid, hi, vi, *_ in order:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        bgr = np.repeat(y[:, :, None], 3, axis=2)
    else:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        bgr = np.stack(
            [np.clip(b, 0, 255), np.clip(g, 0, 255), np.clip(r, 0, 255)],
            axis=2,
        )
    return int(w), int(h), np.round(bgr).astype(np.uint8).tobytes()


def _decode_block(br, qt, dc_table, ac_table, pred):
    t = _huff_decode(br, dc_table)
    diff = _extend(br.read_bits(t), t) if t else 0
    dc = pred + diff
    zz = np.zeros(64, dtype=np.int64)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC index overflow")
        zz[k] = _extend(br.read_bits(s), s)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[ZZ_FLAT] = zz
    block = DCT_M.T @ (coef.reshape(8, 8) * qt) @ DCT_M + 128.0
    return block, dc
