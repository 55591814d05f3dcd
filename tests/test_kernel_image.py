"""kernel/image.py: general pure-Python image decode (PNG all-filters /
palette / RGB, PGM/PPM, BMP) against independently constructed bytes."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from png_from_pdf_extracter_ray.kernel.image import (
    UnsupportedImageError,
    decode_image,
    sniff_image_format,
)
from png_from_pdf_extracter_ray.kernel.png import write_png_gray

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png(arr: np.ndarray, colortype: int, filters: list[int], plte: bytes = b"") -> bytes:
    """Hand-rolled encoder with a CHOSEN filter type per scanline —
    independent of the package's own writer (filter 0 only)."""
    h = arr.shape[0]
    w = arr.shape[1]
    ch = arr.shape[2] if arr.ndim == 3 else 1
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    flat = arr.reshape(h, w * ch).astype(np.int32)
    out = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        line = flat[y]
        if f == 0:
            enc = line
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            enc = (line - left) & 0xFF
        elif f == 2:  # Up
            enc = (line - prev) & 0xFF
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            enc = (line - ((left + prev) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            p = left + prev - upleft
            pa_, pb_, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa_ <= pb_) & (pa_ <= pc_), left, np.where(pb_ <= pc_, prev, upleft)
            )
            enc = (line - pred) & 0xFF
        out += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = line
    body = _SIG + _chunk(b"IHDR", ihdr)
    if plte:
        body += _chunk(b"PLTE", plte)
    return body + _chunk(b"IDAT", zlib.compress(bytes(out))) + _chunk(b"IEND", b"")


@pytest.fixture()
def gray():
    rng = np.random.default_rng(5)
    return rng.integers(0, 256, size=(13, 17), dtype=np.uint8)


def test_decodes_own_encoder_output(gray) -> None:  # noqa: ANN001
    assert np.array_equal(decode_image(write_png_gray(gray)), gray)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_each_filter_type(gray, filt) -> None:  # noqa: ANN001
    assert np.array_equal(decode_image(_png(gray, 0, [filt])), gray)


def test_png_mixed_filters(gray) -> None:  # noqa: ANN001
    assert np.array_equal(decode_image(_png(gray, 0, [0, 1, 2, 3, 4])), gray)


def test_png_rgb_to_gray() -> None:
    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    want = (
        (299 * rgb[:, :, 0].astype(np.uint32)
         + 587 * rgb[:, :, 1].astype(np.uint32)
         + 114 * rgb[:, :, 2].astype(np.uint32)) // 1000
    ).astype(np.uint8)
    for filters in ([0], [1, 4]):
        assert np.array_equal(decode_image(_png(rgb, 2, filters)), want)


def test_png_palette() -> None:
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [200, 200, 200]], np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    png = _png(idx, 3, [0], plte=pal.tobytes())
    want = (
        (299 * pal[:, 0].astype(np.uint32)
         + 587 * pal[:, 1].astype(np.uint32)
         + 114 * pal[:, 2].astype(np.uint32)) // 1000
    ).astype(np.uint8)[idx]
    assert np.array_equal(decode_image(png), want)


def test_png_gray_alpha_and_rgba(gray) -> None:  # noqa: ANN001
    ga = np.dstack([gray, np.full_like(gray, 200)])
    assert np.array_equal(decode_image(_png(ga, 4, [2])), gray)
    rng = np.random.default_rng(8)
    rgba = rng.integers(0, 256, size=(7, 5, 4), dtype=np.uint8)
    want = (
        (299 * rgba[:, :, 0].astype(np.uint32)
         + 587 * rgba[:, :, 1].astype(np.uint32)
         + 114 * rgba[:, :, 2].astype(np.uint32)) // 1000
    ).astype(np.uint8)
    assert np.array_equal(decode_image(_png(rgba, 6, [4])), want)


def test_pgm_and_ppm(gray) -> None:  # noqa: ANN001
    h, w = gray.shape
    pgm = b"P5\n# a comment\n%d %d\n255\n" % (w, h) + gray.tobytes()
    assert np.array_equal(decode_image(pgm), gray)
    rgb = np.dstack([gray, gray // 2, gray // 3])
    ppm = b"P6 %d %d 255\n" % (w, h) + rgb.tobytes()
    want = (
        (299 * rgb[:, :, 0].astype(np.uint32)
         + 587 * rgb[:, :, 1].astype(np.uint32)
         + 114 * rgb[:, :, 2].astype(np.uint32)) // 1000
    ).astype(np.uint8)
    assert np.array_equal(decode_image(ppm), want)


def _bmp24(rgb: np.ndarray, top_down: bool = False) -> bytes:
    h, w, _ = rgb.shape
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = rgb[:, :, ::-1].reshape(h, w * 3)  # BGR
    px = rows if top_down else rows[::-1]
    data = px.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 14 + 40)
    return hdr + info + data


def test_bmp24_both_orientations() -> None:
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    want = (
        (299 * rgb[:, :, 0].astype(np.uint32)
         + 587 * rgb[:, :, 1].astype(np.uint32)
         + 114 * rgb[:, :, 2].astype(np.uint32)) // 1000
    ).astype(np.uint8)
    assert np.array_equal(decode_image(_bmp24(rgb)), want)
    assert np.array_equal(decode_image(_bmp24(rgb, top_down=True)), want)


def test_bmp8_palette() -> None:
    idx = np.array([[0, 1], [1, 0], [0, 0]], dtype=np.uint8)
    pal = bytes([10, 20, 30, 0, 200, 210, 220, 0])  # BGRX × 2
    h, w = idx.shape
    row_bytes = (w + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w] = idx
    data = rows[::-1].tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(data), 2835, 2835, 2, 0)
    bmp = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + 8 + len(data), 0, 0, 14 + 40 + 8)
        + info
        + pal
        + data
    )
    g0 = (299 * 30 + 587 * 20 + 114 * 10) // 1000
    g1 = (299 * 220 + 587 * 210 + 114 * 200) // 1000
    assert decode_image(bmp).tolist() == [[g0, g1], [g1, g0], [g0, g0]]


def test_entropy_coded_formats_rejected() -> None:
    # Every sniffed format decodes for real now (JPEG/GIF/TIFF since
    # r4, both WebP flavours since r5) — a recognized magic with a
    # garbage payload fails as MALFORMED (ValueError), never silently
    for magic, name in [
        (b"\xff\xd8\xff\xe0" + b"x" * 32, "jpeg"),
        (b"GIF89a" + b"x" * 32, "gif"),
        (b"II*\x00" + b"x" * 32, "tiff"),
        (b"RIFF1234WEBP" + b"x" * 32, "webp"),
    ]:
        assert sniff_image_format(magic) == name
        with pytest.raises(ValueError):
            decode_image(magic)
    import struct as _struct

    # lossy VP8 decodes for real since r5 (kernel/vp8.py, pinned in
    # tests/test_vp8.py); a garbage VP8 chunk is malformed, not
    # unsupported
    lossy = (
        b"RIFF"
        + _struct.pack("<I", 4 + 8 + 12)
        + b"WEBP"
        + b"VP8 "
        + _struct.pack("<I", 12)
        + b"\x00" * 12
    )
    with pytest.raises(ValueError):
        decode_image(lossy)
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image(b"garbage bytes here")


def test_pnm_maxval_rescaled(gray) -> None:  # noqa: ANN001
    """PNM samples are proportional to maxval: full-scale at maxval=15
    must decode as full white, not near-black."""
    pgm = b"P5\n2 2\n15\n" + bytes([15, 0, 7, 15])
    out = decode_image(pgm)
    assert out[0, 0] == 255 and out[0, 1] == 0
    assert out[1, 0] == 7 * 255 // 15
    with pytest.raises(ValueError):
        decode_image(b"P5\n2 2\n0\n" + bytes(4))


def test_truncated_and_corrupt_pngs_raise_catchable_errors() -> None:
    """Malformed PNGs with a valid signature must raise exceptions the
    decoder stage dead-letters (ValueError family or zlib/struct errors),
    never succeed silently."""
    import struct as _struct
    import zlib as _zlib

    valid = write_png_gray(np.zeros((4, 4), dtype=np.uint8))
    cases = [
        valid[:20],                      # truncated mid-IHDR
        valid[:50],                      # truncated mid-IDAT
        valid.replace(b"IDAT", b"IDAT", 1)[:33] + b"\x00" * 8,  # garbage body
    ]
    # corrupt the deflate stream inside an otherwise-valid IDAT
    i = valid.index(b"IDAT")
    corrupted = valid[: i + 8] + b"\xff\xff\xff\xff" + valid[i + 12 :]
    cases.append(corrupted)
    for c in cases:
        with pytest.raises((ValueError, _zlib.error, _struct.error, IndexError)):
            decode_image(c)
