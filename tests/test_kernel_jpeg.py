"""Baseline JPEG codec (kernel/jpeg.py): roundtrip fidelity, structure,
determinism, error taxonomy, and the decode_image dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from png_from_pdf_extracter_ray.kernel.image import (
    UnsupportedImageError,
    decode_image,
    sniff_image_format,
)
from png_from_pdf_extracter_ray.kernel.jpeg import (
    _rgb_to_ycbcr,
    decode_jpeg,
    encode_jpeg_color,
    encode_jpeg_gray,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


class TestGrayRoundtrip:
    def test_gradient_high_fidelity(self) -> None:
        g = (np.add.outer(np.arange(96), np.arange(120)) % 256).astype(np.uint8)
        d = decode_jpeg(encode_jpeg_gray(g, 85))
        assert d.shape == g.shape
        assert _psnr(g, d) > 45

    def test_text_like_page(self) -> None:
        p = np.full((100, 200), 255, np.uint8)
        p[10:12, 5:180] = 0
        p[30:32, 5:150] = 20
        d = decode_jpeg(encode_jpeg_gray(p, 85))
        assert d.shape == p.shape
        assert _psnr(p, d) > 25  # sharp edges ring at q85, but stay close

    def test_non_multiple_of_8_dims(self) -> None:
        rng = np.random.default_rng(7)
        q = rng.integers(0, 256, (37, 53), dtype=np.uint8)
        d = decode_jpeg(encode_jpeg_gray(q, 90))
        assert d.shape == (37, 53)

    def test_flat_image_exact_at_mid_quality(self) -> None:
        flat = np.full((16, 24), 200, np.uint8)
        d = decode_jpeg(encode_jpeg_gray(flat, 50))
        assert np.array_equal(d, flat)

    def test_deterministic(self) -> None:
        rng = np.random.default_rng(11)
        a = rng.integers(0, 256, (40, 40), dtype=np.uint8)
        j1, j2 = encode_jpeg_gray(a, 85), encode_jpeg_gray(a, 85)
        assert j1 == j2
        assert np.array_equal(decode_jpeg(j1), decode_jpeg(j2))

    def test_jfif_structure(self) -> None:
        j = encode_jpeg_gray(np.zeros((8, 8), np.uint8))
        assert j[:2] == b"\xff\xd8" and j[-2:] == b"\xff\xd9"
        assert b"JFIF\x00" in j[:32]
        assert sniff_image_format(j) == "jpeg"


class TestColorDecode:
    """3-component paths: decoded gray must track the Y (luma) plane."""

    @pytest.fixture(scope="class")
    def smooth_rgb(self) -> np.ndarray:
        h, w = 64, 80
        r = np.tile(np.linspace(0, 255, w), (h, 1))
        g = np.tile(np.linspace(255, 0, h)[:, None], (1, w))
        b = np.full((h, w), 128.0)
        return np.stack([r, g, b], axis=2).round().astype(np.uint8)

    def test_444(self, smooth_rgb) -> None:  # noqa: ANN001
        yref = _rgb_to_ycbcr(smooth_rgb)[0]
        d = decode_jpeg(encode_jpeg_color(smooth_rgb, 90))
        assert d.shape == yref.shape
        assert _psnr(yref, d) > 40

    def test_420_subsampled(self, smooth_rgb) -> None:  # noqa: ANN001
        yref = _rgb_to_ycbcr(smooth_rgb)[0]
        d = decode_jpeg(encode_jpeg_color(smooth_rgb, 90, subsample=True))
        assert d.shape == yref.shape
        # luma is full-res in 4:2:0; chroma subsampling must not touch it
        assert _psnr(yref, d) > 40

    def test_odd_dims_subsampled(self) -> None:
        rng = np.random.default_rng(3)
        c = rng.integers(0, 256, (19, 27, 3), dtype=np.uint8)
        d = decode_jpeg(encode_jpeg_color(c, 90, subsample=True))
        assert d.shape == (19, 27)


class TestProgressive:
    """SOF2 decode (r5): the progressive encoder quantizes identically
    to the baseline one, so decode(progressive) must be BIT-EQUAL to
    decode(baseline) of the same input — the strongest possible
    roundtrip check without an external JPEG producer."""

    def _page(self) -> np.ndarray:
        rng = np.random.RandomState(3)
        img = np.full((123, 217), 255, np.uint8)
        img[10:20, 10:200] = 30
        img[40:42, :] = 0
        img[60:100, 50:60] = rng.randint(0, 256, (40, 10)).astype(np.uint8)
        return img

    def test_gray_matches_baseline(self) -> None:
        from png_from_pdf_extracter_ray.kernel.jpeg import encode_jpeg_progressive

        img = self._page()
        for q in (50, 85, 95):
            base = decode_jpeg(encode_jpeg_gray(img, q))
            prog = decode_jpeg(encode_jpeg_progressive(img, q))
            assert np.array_equal(base, prog)

    def test_color_444_and_420_match_baseline(self) -> None:
        from png_from_pdf_extracter_ray.kernel.jpeg import encode_jpeg_progressive

        rng = np.random.RandomState(7)
        rgb = rng.randint(0, 256, (64, 77, 3)).astype(np.uint8)
        for sub in (False, True):
            base = decode_jpeg(encode_jpeg_color(rgb, 85, subsample=sub))
            prog = decode_jpeg(encode_jpeg_progressive(rgb, 85, subsample=sub))
            assert np.array_equal(base, prog)

    def test_sparse_image_long_eob_runs(self) -> None:
        # an almost-flat 16×16-block image accumulates EOB runs >> 1
        from png_from_pdf_extracter_ray.kernel.jpeg import encode_jpeg_progressive

        sparse = np.full((128, 128), 200, np.uint8)
        sparse[64, 64] = 0
        base = decode_jpeg(encode_jpeg_gray(sparse, 85))
        prog = decode_jpeg(encode_jpeg_progressive(sparse, 85))
        assert np.array_equal(base, prog)

    def test_progressive_via_decode_image(self) -> None:
        from png_from_pdf_extracter_ray.kernel.jpeg import encode_jpeg_progressive

        img = self._page()
        d = decode_image(encode_jpeg_progressive(img, 90))
        assert d.shape == img.shape
        # hard glyph edges bound fidelity; bit-exactness vs baseline is
        # pinned by the roundtrip tests above — this checks dispatch
        assert _psnr(img, d) > 25

    def test_truncated_progressive_raises(self) -> None:
        from png_from_pdf_extracter_ray.kernel.jpeg import encode_jpeg_progressive

        j = encode_jpeg_progressive(self._page(), 85)
        with pytest.raises(ValueError):
            decode_jpeg(j[: len(j) // 3])

    def test_partial_scans_still_decode(self) -> None:
        # a progressive stream cut at a SCAN boundary is a legal coarse
        # image: find the 3rd SOS and truncate just before it, then
        # append EOI — decode must succeed with the right shape
        from png_from_pdf_extracter_ray.kernel.jpeg import encode_jpeg_progressive

        img = self._page()
        j = encode_jpeg_progressive(img, 85)
        pos = -1
        for _ in range(3):
            pos = j.find(b"\xff\xda", pos + 1)
        assert pos > 0
        coarse = decode_jpeg(j[:pos] + b"\xff\xd9")
        assert coarse.shape == img.shape


class TestErrors:
    def test_arithmetic_sof_unsupported(self) -> None:
        sof9 = b"\xff\xd8\xff\xc9\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
        with pytest.raises(UnsupportedImageError):
            decode_jpeg(sof9)

    def test_not_a_jpeg(self) -> None:
        with pytest.raises(ValueError):
            decode_jpeg(b"not a jpeg at all")

    def test_truncated_stream(self) -> None:
        j = encode_jpeg_gray(np.full((16, 16), 99, np.uint8), 85)
        with pytest.raises(ValueError):
            decode_jpeg(j[: len(j) // 2])

    def test_encoder_input_validation(self) -> None:
        with pytest.raises(ValueError):
            encode_jpeg_gray(np.zeros((8, 8, 3), np.uint8))
        with pytest.raises(ValueError):
            encode_jpeg_color(np.zeros((8, 8), np.uint8))


class TestDecodeImageDispatch:
    def test_jpeg_via_decode_image(self) -> None:
        a = (np.add.outer(np.arange(24), np.arange(32)) % 256).astype(np.uint8)
        d = decode_image(encode_jpeg_gray(a, 90))
        assert d.shape == a.shape
        assert _psnr(a, d) > 40

    def test_webp_lossless_via_decode_image(self) -> None:
        # VP8L decodes for real since r5 (kernel/webp.py); only lossy
        # VP8 still raises UnsupportedImageError (tests/test_webp.py)
        from png_from_pdf_extracter_ray.kernel.webp import encode_webp_lossless

        a = (np.add.outer(np.arange(24), np.arange(32)) % 256).astype(np.uint8)
        d = decode_image(encode_webp_lossless(a))
        assert np.array_equal(d, a)
