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
