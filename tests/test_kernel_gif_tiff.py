"""GIF (kernel/gif.py) and uncompressed-TIFF (kernel/image.py) decode."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from png_from_pdf_extracter_ray.kernel.gif import (
    _deinterlace,
    decode_gif,
    encode_gif_gray,
)
from png_from_pdf_extracter_ray.kernel.image import (
    UnsupportedImageError,
    decode_image,
    sniff_image_format,
)


class TestGif:
    def test_roundtrip_exact(self) -> None:
        rng = np.random.default_rng(9)
        a = rng.integers(0, 256, (23, 37), dtype=np.uint8)
        g = encode_gif_gray(a)
        assert sniff_image_format(g) == "gif"
        assert np.array_equal(decode_gif(g), a)
        assert np.array_equal(decode_image(g), a)  # dispatch

    def test_large_enough_to_force_clear_codes(self) -> None:
        # > 252 pixels forces the encoder's periodic clear codes and the
        # decoder's table-reset path
        rng = np.random.default_rng(2)
        a = rng.integers(0, 256, (40, 50), dtype=np.uint8)
        assert np.array_equal(decode_gif(encode_gif_gray(a)), a)

    def test_deinterlace_inverts_pass_order(self) -> None:
        # storing rows in GIF pass order then de-interlacing must
        # restore raster order
        h = 19
        rows = np.arange(h, dtype=np.uint8)[:, None] * np.ones((1, 3), np.uint8)
        order = np.concatenate(
            [
                np.arange(0, h, 8),
                np.arange(4, h, 8),
                np.arange(2, h, 4),
                np.arange(1, h, 2),
            ]
        )
        assert np.array_equal(_deinterlace(rows[order]), rows)

    def test_errors(self) -> None:
        with pytest.raises(ValueError):
            decode_gif(b"GIF89a" + b"\x00" * 4)  # truncated header
        with pytest.raises(ValueError):
            decode_gif(b"not a gif")
        ok = encode_gif_gray(np.zeros((4, 4), np.uint8))
        with pytest.raises(ValueError):
            decode_gif(ok[: len(ok) - 20])  # truncated LZW stream


def _tiff_bytes(pix: np.ndarray, bo: str = "<", compression: int = 1) -> bytes:
    h, w = pix.shape[:2]
    spp = 1 if pix.ndim == 2 else pix.shape[2]
    raw = pix.tobytes()
    ntags = 7
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * ntags + 4

    def tag(t: int, typ: int, cnt: int, val: int) -> bytes:
        # TIFF left-justifies values shorter than 4 bytes in the field
        v = struct.pack(bo + ("H" if typ == 3 else "I"), val)
        return struct.pack(bo + "HHI", t, typ, cnt) + v.ljust(4, b"\x00")

    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    out = magic + struct.pack(bo + "I", ifd_off)
    out += struct.pack(bo + "H", ntags)
    out += tag(256, 4, 1, w) + tag(257, 4, 1, h) + tag(258, 3, 1, 8)
    out += tag(259, 3, 1, compression) + tag(273, 4, 1, data_off)
    out += tag(277, 3, 1, spp) + tag(279, 4, 1, len(raw))
    out += struct.pack(bo + "I", 0) + raw
    return out


class TestTiff:
    def test_gray_both_byte_orders(self) -> None:
        rng = np.random.default_rng(5)
        pix = rng.integers(0, 256, (6, 9), dtype=np.uint8)
        for bo in ("<", ">"):
            t = _tiff_bytes(pix, bo)
            assert sniff_image_format(t) == "tiff"
            assert np.array_equal(decode_image(t), pix)

    def test_rgb_to_gray(self) -> None:
        rng = np.random.default_rng(6)
        pix = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
        d = decode_image(_tiff_bytes(pix))
        ref = (
            (
                299 * pix[:, :, 0].astype(np.uint32)
                + 587 * pix[:, :, 1].astype(np.uint32)
                + 114 * pix[:, :, 2].astype(np.uint32)
            )
            // 1000
        ).astype(np.uint8)
        assert np.array_equal(d, ref)

    def test_compressed_unsupported(self) -> None:
        pix = np.zeros((4, 4), np.uint8)
        with pytest.raises(UnsupportedImageError):
            decode_image(_tiff_bytes(pix, compression=5))  # LZW

    def test_truncated(self) -> None:
        t = _tiff_bytes(np.zeros((8, 8), np.uint8))
        with pytest.raises(ValueError):
            decode_image(t[: len(t) - 30])
