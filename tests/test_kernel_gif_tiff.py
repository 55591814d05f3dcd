"""GIF (kernel/gif.py) and uncompressed-TIFF (kernel/image.py) decode."""

from __future__ import annotations

import struct
import zlib

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


def _lzw_encode(data: bytes) -> bytes:
    """Reference TIFF-LZW encoder (MSB-first, early change) — written
    independently from the decoder so roundtrips validate both sides."""
    out = bytearray()
    bitbuf = bitcnt = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(256)  # initial clear
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        # the encoder's table is one entry ahead of the decoder's, so
        # its early-change trips at 2^w where the decoder's trips at
        # 2^w - 1 — both switch before the same emitted code
        if next_code == (1 << width):
            if width < 12:
                width += 1
            else:
                emit(256)
                table = {bytes([i]): i for i in range(256)}
                next_code, width = 258, 9
        w = bytes([byte])
    if w:
        emit(table[w])
    emit(257)  # EOI
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Naive PackBits: runs of >=3 as repeats, else literal packets."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out.append(i - lit - 1)
        out += data[lit:i]
    return bytes(out)


def _tiff_bytes(
    pix: np.ndarray, bo: str = "<", compression: int = 1, predictor: int = 1
) -> bytes:
    h, w = pix.shape[:2]
    spp = 1 if pix.ndim == 2 else pix.shape[2]
    arr = pix.reshape(h, w, spp)
    if predictor == 2:
        arr = np.diff(arr, axis=1, prepend=np.zeros((h, 1, spp), np.uint8))
        arr = arr.astype(np.uint8)
    raw = arr.tobytes()
    if compression == 5:
        raw = _lzw_encode(raw)
    elif compression == 8:
        raw = zlib.compress(raw)
    elif compression == 32773:
        raw = _packbits_encode(raw)

    tag_vals = [
        (256, 4, w),
        (257, 4, h),
        (258, 3, 8),
        (259, 3, compression),
        (273, 4, None),  # strip offset, patched below
        (277, 3, spp),
        (279, 4, len(raw)),
    ]
    if predictor != 1:
        tag_vals.append((317, 3, predictor))
    tag_vals.sort()
    ntags = len(tag_vals)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * ntags + 4

    def tag(t: int, typ: int, cnt: int, val: int) -> bytes:
        # TIFF left-justifies values shorter than 4 bytes in the field
        v = struct.pack(bo + ("H" if typ == 3 else "I"), val)
        return struct.pack(bo + "HHI", t, typ, cnt) + v.ljust(4, b"\x00")

    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    out = magic + struct.pack(bo + "I", ifd_off)
    out += struct.pack(bo + "H", ntags)
    for t, typ, val in tag_vals:
        out += tag(t, typ, 1, data_off if val is None else val)
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
            decode_image(_tiff_bytes(pix, compression=7))  # JPEG-in-TIFF

    def test_truncated(self) -> None:
        t = _tiff_bytes(np.zeros((8, 8), np.uint8))
        with pytest.raises(ValueError):
            decode_image(t[: len(t) - 30])

    @pytest.mark.parametrize("compression", [5, 8, 32773])
    @pytest.mark.parametrize("predictor", [1, 2])
    def test_compressed_roundtrip_gray(
        self, compression: int, predictor: int
    ) -> None:
        rng = np.random.default_rng(compression * 10 + predictor)
        pix = rng.integers(0, 256, (13, 21), dtype=np.uint8)
        t = _tiff_bytes(pix, compression=compression, predictor=predictor)
        assert np.array_equal(decode_image(t), pix)

    def test_lzw_rgb_predictor_roundtrip(self) -> None:
        rng = np.random.default_rng(17)
        pix = rng.integers(0, 256, (7, 11, 3), dtype=np.uint8)
        t = _tiff_bytes(pix, compression=5, predictor=2)
        ref = decode_image(_tiff_bytes(pix))  # uncompressed baseline
        assert np.array_equal(decode_image(t), ref)

    def test_lzw_width_growth_and_clear(self) -> None:
        # random bytes barely compress, so the LZW table crosses the
        # 9->10->11->12-bit early-change boundaries and the encoder's
        # 12-bit clear/reset path; exact roundtrip proves lockstep
        rng = np.random.default_rng(23)
        pix = rng.integers(0, 256, (90, 130), dtype=np.uint8)
        t = _tiff_bytes(pix, compression=5)
        assert np.array_equal(decode_image(t), pix)

    def test_lzw_repetitive_data(self) -> None:
        # long runs exercise multi-byte table entries and KwKwK codes
        pix = np.tile(np.arange(16, dtype=np.uint8), (20, 25))[:20, :100]
        t = _tiff_bytes(pix, compression=5)
        assert np.array_equal(decode_image(t), pix)

    def test_packbits_run_lengths(self) -> None:
        # constant image: pure repeat packets
        pix = np.full((9, 40), 7, np.uint8)
        t = _tiff_bytes(pix, compression=32773)
        assert np.array_equal(decode_image(t), pix)

    def test_corrupt_lzw_raises(self) -> None:
        pix = np.zeros((4, 4), np.uint8)
        t = _tiff_bytes(pix, compression=5)
        # blow away the compressed payload with out-of-range codes
        bad = t[:-6] + b"\xff\xff\xff\xff\xff\xff"
        with pytest.raises(ValueError):
            decode_image(bad)
