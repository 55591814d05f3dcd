"""Lossy VP8 (WebP keyframe) decoder — kernel/vp8.py.

Coverage strategy (mirrors test_webp.py for VP8L):

1. PINNED libwebp-encoded streams (hex fixtures below, generated once
   with the real encoder) decode to YUV planes whose blake2b digest is
   pinned — each fixture was chosen to exercise a distinct decoder
   path: B_PRED with diagonal sub-modes and no loop filter
   (grad_nofilter), the Y2/WHT path with skipped MBs and the normal
   loop filter (skip_y2_filter), odd dimensions + simple filter + 4
   token partitions (odd_simple_parts), and 4-segment quantization
   with nonzero sharpness (segments_sharp).
2. A LIVE libwebp differential runs when the shared library is present
   (ctypes, stdlib-only; skipped otherwise): encode across qualities /
   filters / segments / partitions and require BIT-EXACT YUV equality
   with WebPDecodeYUV.  This is the same differential that validated
   164 conformance cases during development.
3. decode_webp() RGBA integration and decode_image() native-luma
   grayscale dispatch; malformed streams raise (never wrong pixels).

Reference parity: the reference renders opaque image payloads per
attachment (src/services/pdf_converter.py:133-158 semantics); this
decoder is the byte-in/array-out kernel those stages call.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import hashlib
import struct

import numpy as np
import pytest

from png_from_pdf_extracter_ray.kernel.errors import UnsupportedImageError
from png_from_pdf_extracter_ray.kernel.image import decode_image
from png_from_pdf_extracter_ray.kernel.vp8 import (
    decode_vp8_frame,
    decode_vp8_webp,
    encode_vp8_gray,
)
from png_from_pdf_extracter_ray.kernel.webp import decode_webp

# ---------------------------------------------------------------------------
# pinned libwebp fixtures (lossy VP8 encoder output, hex)
# ---------------------------------------------------------------------------

_GRAD_NOFILTER_HEX = (
    "52494646020100005745425056503820f6000000b408009d012a200018003e913e9a4982"
    "80aa80012096c009d3284799fa6f086697f7e3240f9c2d3ff2805c3075807a0074877ec8"
    "7ed27b348f6009b98f7f6ac7d7c467e8af3d7cd8a3894a4b97a000fe5213a65589b2b9cf"
    "febc7c294fb84947fdffebed915ca1af95c32e91937d38768b565a8403467cb5ffa8d719"
    "2ae55efe4498cd114f6d6f0866dd669082ec23bf7748a453b08efddd23699328c0ecbd15"
    "a2473a5ef90d6073b3bd43143b9f42f104a5f107253a97e4ee05d70e9bdfaecdb97a3c3b"
    "02330696fede65f7ffe021004af917f6a90cd8cbfc638203eab6c9a2b34707581bfe2e51"
    "d4f4a810f9ed2dc033b70e200000"
)
_SKIP_Y2_FILTER_HEX = (
    "52494646520000005745425056503820460000003003009d012a300020003f399cc55baf"
    "2b27a4256801e0270967000018a7b1cbce0000f5d0918b3d7a1fc15b757328b1d77d9a5e"
    "1f918d3390081264e469200f90075c4e0000"
)
_ODD_SIMPLE_PARTS_HEX = (
    "5249464630020000574542505650382024020000b00c009d012a210011003eb54ea14c27"
    "2423222aa800e016896c009d3284600f303a8bd007fe8dd01fa81d2cbfdcffa36a947a17"
    "fec07a607eccfc16cb6fa904702e1575c6fec1e00dde9cfad9917a2f7e6fa207eb9091be"
    "cf5a0f541e1baa44b4ba363b42901daacbb54184d5a000ce2c0f6370b1a878fc699b255d"
    "1618f4b8f32070af5ae39d2ffb2a00e48b8727b9dca68aba29676c5015d6a2004c8a1f1c"
    "fd82462029ad35502f11f2550a9a3507ea2ae9554731170f0fe3239912d0c9b8c906d7de"
    "563edc6b0a96b9a273f7bdee00b86e612fe6b425c6c0a2bb0b0cfee83321877e79310b2a"
    "87aab4a8c9dc55808e2b4a1248176470abdb0ec9f306047636595e6c4595fe005c078fb1"
    "2794790e8e7665a6b17b5c6752a8d4c1b7ef233d1de43a9f9afaf924737802e35d43e05b"
    "a06f6cc3f269db5ad2d5d713ba9d04a047d20b3a91fbc07502cf46b9ea52465e1a3e2e9e"
    "f719d7bdf8be1d67ba3aa845f24ad156018e8fd39ec8a511be965980c05fbb8b496d108e"
    "2ca8d891b3037e33f075ee702e4ec849fc1f2261fa85ac0f88cfc8dec6f82a9a59c738dd"
    "6a393704ba8a3c3825cc45fd52ae0f9a3eeb73224f93601bff0dd9f8b6626728255d587e"
    "3ff3aa3bb007f51fcce1d1b2fd0570e3cce1d1b2fd098245f27d6dbe47f77e4fadb7cb9e"
    "5d8c2e23ffbb56dec2b7777b7e1ad61da81b8ebde4803eb808ed96436e6be926eb45ec7b"
    "8a548ae9f3e76d551e35ab2bf8b159e16beaedf5fbfa520ae2000000"
)
_SEGMENTS_SHARP_HEX = (
    "524946469a00000057454250565038208e0000001005009d012a180018003edd60a84d27"
    "24a321b00800e41b89690006cb86c00d10037dbc446030460526ab4f596836f9a000fef4"
    "a32ca80ea2cfb3ae2aa2f5d4fa1d4d199330b2c4bdec69c5a88d519978def3e96e631f2e"
    "fdb21f5a4acbff1e8fffabffeffea64e4802a04cf13c24f68a0009a572c5ec37f32f9e39"
    "3583dff56512fffca93effec202e7ee00000"
)

_FIXTURES = {
    "grad_nofilter": _GRAD_NOFILTER_HEX,
    "skip_y2_filter": _SKIP_Y2_FILTER_HEX,
    "odd_simple_parts": _ODD_SIMPLE_PARTS_HEX,
    "segments_sharp": _SEGMENTS_SHARP_HEX,
}

# blake2b-16 over Y.tobytes()+U.tobytes()+V.tobytes()
_DIGESTS = {
    "grad_nofilter": "e0278348834151be1d6f5aca599db14c",
    "skip_y2_filter": "9efdf9024aa070a7b2c38ae2cc9a002c",
    "odd_simple_parts": "b966b1fdd6212c4dc03cc17aefece388",
    "segments_sharp": "b026964c83dd26f15ef15d59bcbd6541",
}

_SHAPES = {
    "grad_nofilter": (24, 32),
    "skip_y2_filter": (32, 48),
    "odd_simple_parts": (17, 33),
    "segments_sharp": (24, 24),
}


@pytest.mark.parametrize("name", sorted(_FIXTURES))
def test_pinned_fixture_yuv_digest(name: str) -> None:
    data = bytes.fromhex(_FIXTURES[name])
    Y, U, V = decode_vp8_webp(data)
    assert Y.shape == _SHAPES[name]
    h, w = Y.shape
    assert U.shape == V.shape == ((h + 1) // 2, (w + 1) // 2)
    assert Y.dtype == U.dtype == V.dtype == np.uint8
    dig = hashlib.blake2b(
        Y.tobytes() + U.tobytes() + V.tobytes(), digest_size=16
    ).hexdigest()
    assert dig == _DIGESTS[name]


def test_decode_is_deterministic() -> None:
    data = bytes.fromhex(_FIXTURES["grad_nofilter"])
    a = decode_vp8_webp(data)
    b = decode_vp8_webp(data)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))


# ---------------------------------------------------------------------------
# error handling
# ---------------------------------------------------------------------------


def test_truncated_payload_raises() -> None:
    with pytest.raises(ValueError):
        decode_vp8_frame(b"\x00\x01")


def test_bad_start_code_raises() -> None:
    with pytest.raises(ValueError, match="start code"):
        decode_vp8_frame(b"\x00\x00\x00" + b"\xff\xff\xff" + b"\x00" * 8)


def test_interframe_raises_unsupported() -> None:
    # low bit of the frame tag set = interframe; still images are
    # always keyframes, so this is an honest dead-letter
    good = bytes.fromhex(_FIXTURES["grad_nofilter"])
    body = bytearray(good[20:])  # VP8 chunk payload starts at 20
    body[0] |= 1
    with pytest.raises(UnsupportedImageError, match="interframe"):
        decode_vp8_frame(bytes(body))


def test_zero_dimensions_raise() -> None:
    good = bytes.fromhex(_FIXTURES["grad_nofilter"])
    body = bytearray(good[20:])
    body[6] = body[7] = 0  # width = 0
    with pytest.raises(ValueError, match="dimensions"):
        decode_vp8_frame(bytes(body))


# ---------------------------------------------------------------------------
# decode_webp / decode_image integration
# ---------------------------------------------------------------------------


def test_decode_webp_rgba_integration() -> None:
    data = bytes.fromhex(_FIXTURES["grad_nofilter"])
    rgba = decode_webp(data)
    assert rgba.shape == (24, 32, 4)
    assert rgba.dtype == np.uint8
    assert (rgba[:, :, 3] == 255).all()
    # the RGBA conversion is a deterministic function of the pinned YUV
    Y, U, V = decode_vp8_webp(data)
    assert rgba[0, 0, 0] == np.clip(
        (((int(Y[0, 0]) * 19077) >> 8) + ((int(V[0, 0]) * 26149) >> 8) - 14234)
        >> 6,
        0,
        255,
    )


def test_decode_image_uses_native_luma() -> None:
    data = bytes.fromhex(_FIXTURES["skip_y2_filter"])
    gray = decode_image(data)
    Y, _, _ = decode_vp8_webp(data)
    assert np.array_equal(gray, Y)


# ---------------------------------------------------------------------------
# live libwebp differential (development-grade conformance, when available)
# ---------------------------------------------------------------------------


def _load_libwebp():
    name = ctypes.util.find_library("webp")
    if not name:
        return None
    try:
        return ctypes.CDLL(name)
    except OSError:
        return None


_LIBWEBP = _load_libwebp()


def _lw_decode_yuv(lw, data: bytes):
    lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lw.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lw.WebPFree.argtypes = [ctypes.c_void_p]
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)(); v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = lw.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                         ctypes.byref(u), ctypes.byref(v),
                         ctypes.byref(stride), ctypes.byref(uv_stride))
    assert y, "WebPDecodeYUV failed"
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    Y = np.ctypeslib.as_array(y, shape=(H * S,)).copy().reshape(H, S)[:, :W]
    U = np.ctypeslib.as_array(u, shape=(ch * US,)).copy().reshape(ch, US)[:, :cw]
    V = np.ctypeslib.as_array(v, shape=(ch * US,)).copy().reshape(ch, US)[:, :cw]
    lw.WebPFree(y)
    return Y, U, V


@pytest.mark.skipif(_LIBWEBP is None, reason="libwebp not available")
@pytest.mark.parametrize("name", sorted(_FIXTURES))
def test_fixtures_match_live_libwebp(name: str) -> None:
    data = bytes.fromhex(_FIXTURES[name])
    Y0, U0, V0 = _lw_decode_yuv(_LIBWEBP, data)
    Y1, U1, V1 = decode_vp8_webp(data)
    assert np.array_equal(Y0, Y1)
    assert np.array_equal(U0, U1)
    assert np.array_equal(V0, V1)


# ---------------------------------------------------------------------------
# encoder (encode_vp8_gray) — roundtrip + differential vs libwebp decode
# ---------------------------------------------------------------------------


def test_encoder_roundtrip_quality_and_determinism() -> None:
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    d1 = encode_vp8_gray(a, qi=4)
    d2 = encode_vp8_gray(a, qi=4)
    assert d1 == d2  # deterministic bytes
    Y, U, V = decode_vp8_webp(d1)
    assert Y.shape == a.shape
    assert np.abs(Y.astype(int) - a.astype(int)).mean() < 2.0  # qi=4 is fine
    assert (U == 128).all() and (V == 128).all()  # flat chroma


def test_encoder_odd_size_and_extreme_qi() -> None:
    g = (np.add.outer(np.arange(17), np.arange(33)) * 5 % 256).astype(np.uint8)
    for qi in (0, 127):
        Y, _, _ = decode_vp8_webp(encode_vp8_gray(g, qi=qi))
        assert Y.shape == g.shape
    assert np.array_equal(
        decode_vp8_webp(encode_vp8_gray(g, qi=0))[0].shape, g.shape
    )


def test_encoder_rejects_bad_input() -> None:
    with pytest.raises(ValueError):
        encode_vp8_gray(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        encode_vp8_gray(np.zeros((0, 4), np.uint8))


def test_fdct_idct_inverse_pair() -> None:
    from png_from_pdf_extracter_ray.kernel.vp8 import _fdct4x4, _idct4x4

    rng = np.random.default_rng(0)
    for _ in range(50):
        res = rng.integers(-255, 256, (4, 4)).astype(np.int32)
        back = _idct4x4(_fdct4x4(res))
        assert np.abs(res - back).max() <= 1


@pytest.mark.skipif(_LIBWEBP is None, reason="libwebp not available")
def test_encoder_streams_match_live_libwebp() -> None:
    rng = np.random.default_rng(9)
    for shape in ((16, 16), (17, 33), (48, 40)):
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        data = encode_vp8_gray(a, qi=24)
        Y0, U0, V0 = _lw_decode_yuv(_LIBWEBP, data)
        Y1, U1, V1 = decode_vp8_webp(data)
        assert np.array_equal(Y0, Y1)
        assert np.array_equal(U0, U1)
        assert np.array_equal(V0, V1)
