"""Minimal deterministic PNG encoder (stdlib zlib/struct + numpy).

The container has no ImageMagick/GhostScript and no imaging libraries, so
— in the spirit of the reference's all-stdlib constraint
(/root/reference/specs/001-pdf-to-png-mailer/spec.md:122 FR-029) — page
rasters are written with a hand-rolled 8-bit grayscale PNG encoder.
Output is a fully valid PNG: IHDR, pHYs (DPI metadata, the analog of the
``-density`` flag at /root/reference/src/services/pdf_converter.py:77),
one zlib IDAT with filter type 0 per scanline, IEND.

Geometry is exact: the encoder asserts the array is (height, width) so the
contract tests can assert 1920x1080 exactly, mirroring
/root/reference/tests/contract/test_imagemagick.py:77-85.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def write_png_gray(arr: np.ndarray, dpi: int = 300, compress_level: int = 1) -> bytes:
    """Encode a (H, W) uint8 array as an 8-bit grayscale PNG with DPI metadata."""
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError("expected a 2-D uint8 array (height, width)")
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bitdepth 8, grayscale
    ppm = int(round(dpi / 0.0254))  # pixels per metre
    phys = struct.pack(">IIB", ppm, ppm, 1)
    # Prepend filter byte 0 to each scanline, single contiguous buffer.
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr
    idat = zlib.compress(raw.tobytes(), compress_level)
    return b"".join(
        [
            _PNG_SIG,
            _chunk(b"IHDR", ihdr),
            _chunk(b"pHYs", phys),
            _chunk(b"IDAT", idat),
            _chunk(b"IEND", b""),
        ]
    )


# ---------------------------------------------------------------------------
# Segment-cached fast raster path
# ---------------------------------------------------------------------------
#
# A naive render (fill a H×W array, deflate 2 MB) is memory-bandwidth
# bound: measured on this 32-core box, per-process throughput halves by
# ~28 parallel workers, capping cluster scaling efficiency at ~0.55.
# Page rasters here are mostly uniform background, so the fast path
# assembles the zlib stream from independent raw-deflate segments
# (Z_FULL_FLUSH boundaries): background row-runs are compressed ONCE per
# template and reused byte-for-byte; only text-band rows are deflated per
# page.  The zlib adler32 trailer is combined arithmetically
# (adler32_combine), so untouched background bytes are never even read.
# Bytes touched per page drop ~10×; output is a fully valid PNG.

_ADLER_BASE = 65521


def _adler_combine(ad1: int, ad2: int, len2: int) -> int:
    """adler32(A+B) from adler32(A), adler32(B), len(B) — zlib's combine."""
    s1a, s2a = ad1 & 0xFFFF, (ad1 >> 16) & 0xFFFF
    s1b, s2b = ad2 & 0xFFFF, (ad2 >> 16) & 0xFFFF
    rem = len2 % _ADLER_BASE
    sum1 = (s1a + s1b - 1) % _ADLER_BASE
    sum2 = (s2a + s2b + rem * (s1a - 1)) % _ADLER_BASE
    return (sum2 << 16) | sum1


def _deflate_segment(raw: bytes, level: int = 1) -> bytes:
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    return c.compress(raw) + c.flush(zlib.Z_FULL_FLUSH)


_DEFLATE_FINISH = zlib.compressobj(1, zlib.DEFLATED, -15).flush(zlib.Z_FINISH)


class PageTemplate:
    """Per-(geometry, background, dpi) raster template with segment cache.

    Built once per worker (kept in a module lru_cache → actor-warm state),
    then ``assemble(segments)`` emits a valid PNG from (deflate, adler,
    rawlen) triples.
    """

    def __init__(self, width: int, height: int, background: int, dpi: int) -> None:
        self.width, self.height = width, height
        self.background = background
        ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
        ppm = int(round(dpi / 0.0254))
        phys = struct.pack(">IIB", ppm, ppm, 1)
        self.header = _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"pHYs", phys)
        self.bg_row = b"\x00" + bytes([background]) * width  # filter byte 0 + row
        self._bg_cache: dict[int, tuple[bytes, int, int]] = {}

    def bg_rows(self, count: int) -> tuple[bytes, int, int]:
        """Cached deflate segment for ``count`` background scanlines."""
        seg = self._bg_cache.get(count)
        if seg is None:
            raw = self.bg_row * count
            seg = (_deflate_segment(raw), zlib.adler32(raw), len(raw))
            self._bg_cache[count] = seg
        return seg

    def band(self, row: bytes, count: int) -> tuple[bytes, int, int]:
        """Fresh segment: one scanline pattern repeated ``count`` times."""
        raw = row * count
        return (_deflate_segment(raw), zlib.adler32(raw), len(raw))

    def assemble(self, segments: list[tuple[bytes, int, int]]) -> bytes:
        adler = 1
        body = bytearray(b"\x78\x01")  # zlib header, level-1 flags
        for deflate, ad, rawlen in segments:
            body += deflate
            adler = _adler_combine(adler, ad, rawlen)
        body += _DEFLATE_FINISH
        body += struct.pack(">I", adler)
        return self.header + _chunk(b"IDAT", bytes(body)) + _chunk(b"IEND", b"")


def decode_png_gray(png: bytes) -> np.ndarray:
    """Inverse of ``write_png_gray`` for this engine's own rasters.

    Supports exactly what the encoder emits (8-bit grayscale, filter 0
    per scanline, single IDAT) — enough for real decode → transform →
    re-encode multimodal stages over our page rasters.  Raises ValueError
    on anything else (general PNG decoding is out of scope; see
    stages/multimodal.py for the stubbed general path).
    """
    if png[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i, w, h, idat = 8, 0, 0, b""
    bitdepth = colortype = None
    while i < len(png):
        (length,) = struct.unpack(">I", png[i : i + 4])
        tag = png[i + 4 : i + 8]
        body = png[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            w, h, bitdepth, colortype = struct.unpack(">IIBB", body[:10])
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + length
    if bitdepth != 8 or colortype != 0:
        raise ValueError("decoder supports 8-bit grayscale only")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w + 1)
    if not (raw[:, 0] == 0).all():
        raise ValueError("decoder supports filter type 0 only")
    return raw[:, 1:].copy()


def read_png_size(png: bytes) -> tuple[int, int]:
    """Return (width, height) from a PNG header — for tests/validation only."""
    if png[:8] != _PNG_SIG or png[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", png[16:24])
    return w, h


def read_png_dpi(png: bytes) -> int:
    """Return the x-DPI recorded in the pHYs chunk — for tests/validation."""
    i = 8
    while i < len(png):
        (length,) = struct.unpack(">I", png[i : i + 4])
        tag = png[i + 4 : i + 8]
        if tag == b"pHYs":
            ppm_x, _, unit = struct.unpack(">IIB", png[i + 8 : i + 17])
            if unit != 1:
                raise ValueError("pHYs not in metres")
            return int(round(ppm_x * 0.0254))
        i += 12 + length
    raise ValueError("no pHYs chunk")
