"""WebP lossless (VP8L) codec — kernel/webp.py.

Coverage strategy (mirrors test_kernel_jpeg.py / test_kernel_gif_tiff.py):

1. PINNED libwebp streams (hex fixtures below, generated once with the
   real library): decode must reproduce the exact source array.  The
   four fixtures were chosen by instrumenting which decoder paths the
   real encoder exercises — predictor transform (photo), colour
   indexing (palette), subtract-green + dense complex prefix codes
   (noise), and a long LZ77 row-copy (stripes).
2. A HAND-BUILT minimal stream pins the LZ77 semantics bit-by-bit
   (complex prefix-code form, max_symbol shortcut, the 2-D distance
   map's plane-code 2 → distance 1).
3. Encoder→decoder roundtrips (colour cache on/off, subtract-green
   on/off, gray + RGB, 1×1 .. 120×80) pin the encoder side.
4. A LIVE libwebp cross-check in BOTH directions runs when the shared
   library is present (ctypes, stdlib-only; skipped otherwise).
5. Container / error handling: malformed streams → ValueError (lossy
   VP8 decodes for real — pinned separately in tests/test_vp8.py);
   decode_image() grayscale integration.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct

import numpy as np
import pytest

from png_from_pdf_extracter_ray.kernel.image import decode_image
from png_from_pdf_extracter_ray.kernel.webp import (
    _BitWriter,
    decode_webp,
    encode_webp_lossless,
)

# ---------------------------------------------------------------------------
# pinned libwebp fixtures (WebPEncodeLosslessRGB output, hex)
# ---------------------------------------------------------------------------


def _fixture_arrays() -> dict[str, np.ndarray]:
    """Regenerate the exact source arrays the fixtures encode (same rng
    construction that produced them)."""
    rng = np.random.default_rng(5)
    y, x = np.mgrid[0:24, 0:32]
    photo = np.clip(
        np.stack([x * 8, y * 10, (x + y) * 4], axis=-1)
        + rng.normal(0, 6, (24, 32, 3)),
        0,
        255,
    ).astype(np.uint8)
    pal4 = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [40, 80, 120]], np.uint8
    )
    pal = pal4[rng.integers(0, 4, (20, 20))]
    noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    rng9 = np.random.default_rng(9)
    stripes = np.tile(rng9.integers(0, 256, (1, 40, 3), dtype=np.uint8), (40, 1, 1))
    return {"photo": photo, "palette": pal, "noise": noise, "stripes": stripes}
_PHOTO_HEX = (
    "52494646f0050000574542505650384ce30500002f1fc005000932018b6f43ffca3a44f4"
    "3fb6e5580491b64d737cff5a0715b56d0359c530fe38cf47ff23a97964108f0205d9b6db"
    "3612c2c7cf4824a5ee9eb8fffd756480b6213100d8b66db04880a448251e5dffffb7ab45"
    "11a418006cda8091258b0c8176bcfdff1eafe0c4724400c0ac27797c079fed17cfb096b0"
    "3a28dcd203496812d8c9fce4f179e5107f06fedef5e7f649bf0c32cb6feb4128140bf00e"
    "6f493745a5a73927fa8d6290224021e5b668d1922d41c1b47d4a4b903c88a953717e944f"
    "324f3f3ef2484bbd083aae07327a0d16c0e9d5add3817b61ab7bf92d873f12142fd5c1b8"
    "a56dcfe98fc4b823f12bf7ee585cfe05b6e23f554f0aa5544e53be774eaedf0abca662cc"
    "9efaacb590aab55fa66dbde7cb0aac1856b7f09d08668ccca37fb8bc46ca578650a0c475"
    "e2720fbffa6eb6a9db06c5a5d19cc1a51d413933651790800959d8720c894f7c113e25d8"
    "eed053c6cf4cf09c60cde6b494836e03b6dd3ce601adad38b900888580e9e3b62bd9650e"
    "6c07cbb75a73e5bd9564a5ce64f304dfff9673971f5d288e434bad77621a450c79bb0ed9"
    "4bbb73795222fe97d0886791e87c3fe7c9011e9014d670de96726bb0eaf95b4cd1ae224f"
    "1adc6b8cdf01ae74f59f592d342ee673389e170b200fe816c8d23d356eb19de50674dd32"
    "b0d5d7cb02b51df8d55a56f9c04eeefc24ff11c774adfa602e5c67b1bf13bd5acb69bcc0"
    "682202bd136f3c339584769fe3b1ad3173c7ed4abc76c7746d6ab846f7c5ccd2137ffaa2"
    "34a1a7944f1f6630d191768a06614b8dde2b45cd7bcbd8e0c8511ffd2fb92ad411379b5b"
    "e8ddcda36939abc1af3e4aaa450334115eb95f94463ab0964b084be4f70d92121fea322b"
    "4071b93f11163915ccf06f3feddf602acce091ff73a7a14323b7ff1ff5559e1f40ab65d6"
    "31f5b0ec2fb188fd8cb9c5f227a9ef7e98aae8a624fa7116cb0368971fffb61ffad11c36"
    "8cdb2a7734daa252239bfa73165124b1b26460a53f4a531a53e2dbce2a556bacfd94836b"
    "86dad013df3dfa90d5280a32cd0d5ae3034f5a03b8ca8577ef37535d7c3f098292baa6d2"
    "7137be08ab119674d6949d819c03c52b8989db60ed2a7321ec0007a594ad197e65dc12b3"
    "7c6c15cfa0fb830000c7e3dd341c93ce49b76dce0c5b5d60dcc67cec5161f33bd1918805"
    "9be2b58fcd2449f220704942216884929604a0984f65f3432f600ec0e06e243e4c379e0b"
    "b589ac284870e396af7dbada5f3a0680edc769c1b34f14c4cefb9abdf6b56d8be2e73945"
    "0fa936dbfcafb67b1c7984dc45075e2099f1a95a6e5b18cd7cc0de68452dcf156774cace"
    "18fd96d9c752782611084e80abdc40a4a300386f6270f0ea52883f5707d5b68ae47bda53"
    "8733e25fae6164c6fde63fba67f9b09dc1edadd488fa2e58f5c6aee85d424c1de22e3e82"
    "bf1be0793753b2807b4bf83f2e38ea478e3a8ffdd3c75b5c862da75ecd7d6290893226da"
    "54f3607d70cf57dde7c5c417c9cb372bca4e91bbb6a31bb5ef242334a6ba9eb05d13e44c"
    "7f760acc3c79912f7f3bae424f35361bcb5e8c5b999197d050d5543861256c23c7b2ebc2"
    "c23540d215fceeca99aaadd68132568c6d962bc3b38f392464be30630c822b263d846a55"
    "a40cb4a21ccb161351ba706b1240f52dc4984c0cfa78d3d1d17a21c68f4f811d617c32d0"
    "bcc6f688eb66542b76203287b23e34ec057c5e79f9ffb1a66e0e3ccd1dd3bf125fda8402"
    "23971769ecacc09576d2cb060010742859511b6681145c0ec97feb018bd6293d6414c54b"
    "2762966bcdcc726477a135c1b9cf74442c6b16e96b8f77c31551e5e2f2825f60b58af3c2"
    "0fd3a6acc7c948d5140a09923e1fae389f15a1faacbd404a45ccc03011df5c46ad8b237c"
    "0fd0bfea2973fd2879dc21cddf4186bb6f8237b6b34628381dfa372e98ef0743d8f5598f"
    "e3fffb6a429babe7d1269fc7a3cf6b0b11782a1dd85ea419fa211fb4664a21209d364a0a"
    "b0b6ed865e7c62a8563e502b358e0bb4de2cfec26102fddab5d4d4fd28123123f07db5aa"
    "b76ab5630b5e13595f15e1e9973ff4d7effba843ff998409521f92fd79f5396b56f9bf32"
    "ef1c86538b74ae75d4c4eb55e3b80000"
)
_PALETTE_HEX = (
    "52494646a8000000574542505650384c9c0000002f13c004001f20102038f43f63432090"
    "a4b33fe08337ff018753018a0000049c63b2d96cdb66b4952ef96e46435a72f6d6bc07d8"
    "b67f60a5dd3b22fa1fafd0b5cdfec73dd02c7bc83f8e6853fea79b49c9600bfd25bd7b84"
    "fa6b12be60d7f43c39b1f0e16cb50eacc4effb04070b23f3cefb07bde1f07c88f6b16e5f"
    "af38ee708f134b9fafaa49b4bb3017ee7cdf98fbb6145934e629ad37609e6100"
)
_NOISE_HEX = (
    "524946460e070000574542505650384c020700002f17c005008542000008dbb66ddbb66d"
    "dbb66ddbb66ddbb66d5b1b1018002098d8b66ddbb66ddbb66ddbb66ddbb6fd6cbb290000"
    "80f8fffffffffffffffffffffa1fa785de693dc263e63e4e59375f3d29995d5a3316ef4d"
    "287312d857162584b817bc2492252a25f81178e49d26a7d92e8a268adf75da61f9ef4877"
    "f069f89c3eb7a60a0f3f996a9ece7bff563635f7b92ef6704a7cdc0082e386615c84b003"
    "5075c07727a91a46ed25c4c0d84c6a1971ca57fe6bcbc22dd9b3a3f2e210fbae209c2b01"
    "801086ecfcc76af7378172da03383eea1d31ca2b8ea346c0901f06aed63f2d3491365657"
    "4a1035ee2d32dcef4bf50b944b23432f93eef077f59d8d45d68543b440840fa9f50c7e7d"
    "50501e2a570c844c917c676d947ea7277cbe6b83b708dde6734bcabf9acb5012bfe1e85e"
    "3d5ea3d7e167599d460fe6e237bc97b58bd4119de532dad45da5bcbc3e6303a79c29f631"
    "dceedb3a782e6162accd460e37c412ab125cc97b7a859a9e0387e782cde3b0cb45841fa4"
    "4c8910e564aaec596265a5931f2916b6afd8d2b99fc1e58a14fb2fd294a147c985e40619"
    "473d965f8ccf987ecfad638da564fa83f31509aa96de3d20fc6fd7bd51b736cf737b047e"
    "a75330d2b3d23c879204d0029ed10d301a39030fd982291569a4fe87a90f07ce94c60e65"
    "1704856e8dfcb4011aeecd9f1c60e489f4422bff0bb0a307bcc8999e5a4c72b35efa7408"
    "f4faead71c4164780ae0f2bad899b5dcc06cad731ee6f459ec58b44866aded5fefeaef4d"
    "5e018d645c1403b54ec0ac2ebc54da1efc6d824b99feb4d4e4c1e9a135bcf726a380bf5f"
    "dba5126467db82ff9f9f5ce66ca598a14c69f49a3751eb554ccc6c0b3a69a5c6a4e9c4ca"
    "e66974ed1cc5a0574456186d3ebe4e568074a51a3b8dcb839ea9bf6fbc1a19381583bc21"
    "ff8c860d6c04d05b99a4bcb2940ebb1f227f90bb278980388043bd2e5affbabf84cba0b8"
    "7932bcae60f700d7fd17e987c0140fb9b33ac670d6ed9ef6fe69300f0f9421fdffb3881a"
    "49c72a77f6fb7cbc33a95cb49c6074d94e7e079cca96f37d2f57d7ed122a04bcbd01a8c0"
    "8f52c56baa176b1557a50ae98cb1ea9fdd0bf58e059eac7bdeb7bd0e9e1c4222080a22c5"
    "66085176d33a11c84675b5e0444bee1ad234a98846bfb9daba209ed1b0fa277be8a0bcd9"
    "094d9f32abc8bf961dcac1e2f8189b150a6737fa7416d5533a2ae738863347a19e8c4d8b"
    "42a50d405a76cda63b45151d84373258bf89ea9f69a08372b4e3e67121bf63553221c422"
    "0d948e6514075bbdc1e283fe0d8ebec0d4c06278eb81a177a559c31dda1e65e0bfbd9475"
    "1061d680ae9d40b899d77212f0a4f3c6ca952e78cd086a759863d410056d11983fee92d5"
    "00372555980cdc530bddca3164f63b7ac2e23c5c4c552b39726096fb6bdee6ec2dc55fe5"
    "6bef109610f5314a331d9b3c0c65fdded22d02cc8d14321cb52c749c7b9fec92c02909b4"
    "64cfce48ad41dcd04f0dd4990ebf9fda4399b532d961f2a0e03d4da0443a37a0c4db7cd8"
    "0ec68f3e3510f30cc197682ba370a1a3e9bbdc63159348448b23a319b66b340b01c85c69"
    "ad6b9b0f8b90f0723bcd5633c8d00b615738015a8239c71c7936099803c5ce73e4dd19a1"
    "1398e07c6ff602829014ec20a5c8de6e80318ab248908c16d128684ea2d981e23ec95b87"
    "b07c8fb57537bba14bfd0c554c60fa80ae8d04c15626581d43ceda1193afd8366cb813cd"
    "a72aa192384dbf1ef5e43b8df5432fcbe01aefcdb97d91d72d67d12763bd42cb04f1874e"
    "1f007932ab427a8422a88ceafbdd13cc8264b29496c8e9c86f3fcd9e2fdcf4a0dfafe804"
    "06460bd58a452609b403e060b9ba2406922fcc20336f44539e0ed4b5f09faf526250d103"
    "30a54128d8c511032d2449fe5f9fa8c352b1f5c2fe1d6671660b2b77054661ca88d28468"
    "62f4551b9f82bd773d1dc9d3e584f23d19d637bf27bdb7631e6730c3b56e4997670b499a"
    "dc138bcc79d316902ee5a5a938e73956cb834096e128c6fd41d2981979461247e4dc4f7d"
    "d1e912e702cf73f9d730c4eb7752f7a6ca5cd0a8ef9cddf035fa21624389a778a78132e1"
    "01c38b26388c154539ddba7c5afee6c864d3b9fd0d8a33814784a0e6191bfe3c4d7d2f38"
    "580a926a91ac675ae69d027de0b63f199e2ea44469a24e788b20456ebd695237d584436b"
    "bf9407e2e3af761b8db8cefe89eac10554e8c6614fe6882f6d324ddda2435c647caf0de2"
    "6bc3e373002b0a3a9e873bb85f60c5a6b658ac5ea80d2a161433e0608bdf4cc985eef8ae"
    "9c8c139ab438f4771b402c1e00624718918d215d15fc3dab8f6f6311911f946a3173fbb8"
    "473151bcd7f4403ba4f642685b7f3efd7b9a378de803977a5350b90f85f9837c14f5cc17"
    "a941ee34f446015f2244462d151f685d4ad36756b732fa10bd495687a5f03da6715ca836"
    "472e1b3ca012aaae35f7631e78309494926a94a74659cb059d84ef35c0ca8926a184ee69"
    "8bbc90c21428eac4e1810acead00"
)
_STRIPES_HEX = (
    "52494646ec000000574542505650384cdf0000002f27c009003fc136b26d25ff7fdcdda5"
    "01628a808ca1311aa20442427752a714a6b5b62df9fdc72dd12c91e874966019c6620076"
    "e0b080377773130000d2e00ea7bb74a0014d6843102b41001ad8e7ee6cdffc0745de4a9f"
    "2312125823a5f837534f7301f61684ef3eadfca9f71f0734babb20e78a2083a5e24a356b"
    "59f8987c182b847c5d431480e07f3db5207174d29eba220ee4b8d306459f230c0eb77512"
    "d581e5012a82892b578e32456afa07de11070c6c03002c13dbaaadff8fed12d1ff10fe05"
    "842223e3c7fbb6df0bdcdc3c5e679794aee199b03d5696cbf05f0000"
)
_FIXTURES = {
    "photo": _PHOTO_HEX,
    "palette": _PALETTE_HEX,
    "noise": _NOISE_HEX,
    "stripes": _STRIPES_HEX,
}


@pytest.mark.parametrize("name", sorted(_FIXTURES))
def test_pinned_libwebp_stream_decodes_exactly(name: str) -> None:
    arr = _fixture_arrays()[name]
    dec = decode_webp(bytes.fromhex("".join(_FIXTURES[name])))
    assert dec.shape == (*arr.shape[:2], 4)
    assert np.array_equal(dec[:, :, :3], arr)
    assert np.all(dec[:, :, 3] == 255)


# ---------------------------------------------------------------------------
# hand-built stream: LZ77 backward reference, complex prefix-code form
# ---------------------------------------------------------------------------


def _hand_built_lz77_stream() -> bytes:
    """4×1 image: one literal ARGB(255,10,42,7) then a backward
    reference (length 3, plane code 2 → dx=1,dy=0 → distance 1) copying
    it three times.  The green tree uses the COMPLEX prefix-code form
    (symbol 258 > 255 cannot ride a simple code) with the max_symbol
    shortcut and both zero-run CLC symbols' wide form (18)."""
    bw = _BitWriter()
    bw.write(0x2F, 8)  # VP8L signature
    bw.write(4 - 1, 14)  # width
    bw.write(1 - 1, 14)  # height
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    # main image (_decode_pixels): no colour cache, no meta
    bw.write(0, 1)
    bw.write(0, 1)
    # --- green tree: lengths {42: 1, 258: 1} over alphabet 280 ---
    bw.write(0, 1)  # complex form
    bw.write(0, 4)  # num_cl = 4 → CLC order slots [17, 18, 0, 1]
    bw.write(2, 3)  # len(17) = 2
    bw.write(2, 3)  # len(18) = 2
    bw.write(0, 3)  # len(0) = 0
    bw.write(1, 3)  # len(1) = 1
    bw.write(1, 1)  # use max_symbol
    bw.write(0, 3)  # length_nbits = 2
    bw.write(3, 2)  # max_symbol = 2 + 3 = 5 CLC reads
    # canonical CLC: sym1 → 0 (1 bit); sym17 → 10, sym18 → 11 (2 bits)
    bw.write_code(0b11, 2)  # 18: zero-run …
    bw.write(42 - 11, 7)  # … of 42 (symbols 0-41)
    bw.write_code(0b0, 1)  # symbol 42 → length 1
    bw.write_code(0b11, 2)  # 18: zero-run 138 (symbols 43-180)
    bw.write(138 - 11, 7)
    bw.write_code(0b11, 2)  # 18: zero-run 77 (symbols 181-257)
    bw.write(77 - 11, 7)
    bw.write_code(0b0, 1)  # symbol 258 → length 1
    # --- R / B / A trees: one-symbol simple codes (decode reads 0 bits)
    for val in (10, 7, 255):
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        bw.write(1, 1)  # 8-bit first symbol
        bw.write(val, 8)
    # --- distance tree: single symbol 1 (→ _lz77_value = 2 → plane
    # code 2 → dx=1, dy=0 → distance 1)
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(0, 1)  # 1-bit first symbol
    bw.write(1, 1)
    # --- pixel stream: canonical green codes are 42 → 0, 258 → 1
    bw.write_code(0, 1)  # literal G=42 (R/B/A trees are 0-bit)
    bw.write_code(1, 1)  # symbol 258 → length code 2 → length 3
    payload = bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_hand_built_lz77_backref() -> None:
    dec = decode_webp(_hand_built_lz77_stream())
    assert dec.shape == (1, 4, 4)
    expected = np.tile(np.array([10, 42, 7, 255], np.uint8), (1, 4, 1))
    assert np.array_equal(dec, expected)


# ---------------------------------------------------------------------------
# encoder → decoder roundtrips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cache_bits", [0, 4, 8])
@pytest.mark.parametrize("subtract_green", [False, True])
def test_roundtrip_rgb_modes(cache_bits: int, subtract_green: bool) -> None:
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (15, 23, 3), dtype=np.uint8)
    data = encode_webp_lossless(
        arr, cache_bits=cache_bits, subtract_green=subtract_green
    )
    dec = decode_webp(data)
    assert np.array_equal(dec[:, :, :3], arr)
    assert np.all(dec[:, :, 3] == 255)


@pytest.mark.parametrize(
    "shape", [(1, 1), (1, 7), (9, 1), (32, 32), (80, 120)]
)
def test_roundtrip_gray_shapes(shape: tuple[int, int]) -> None:
    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    dec = decode_webp(encode_webp_lossless(arr))
    # gray encodes r=g=b
    assert np.array_equal(dec[:, :, 0], arr)
    assert np.array_equal(dec[:, :, 1], arr)
    assert np.array_equal(dec[:, :, 2], arr)


def test_roundtrip_solid_and_gradient() -> None:
    solid = np.full((12, 12), 200, np.uint8)
    assert np.array_equal(decode_webp(encode_webp_lossless(solid))[:, :, 0], solid)
    grad = np.outer(np.arange(16, dtype=np.uint8) * 16, np.ones(16, np.uint8))
    assert np.array_equal(decode_webp(encode_webp_lossless(grad))[:, :, 0], grad)


# ---------------------------------------------------------------------------
# container / error handling and decode_image integration
# ---------------------------------------------------------------------------


def test_garbage_vp8_chunk_raises_valueerror() -> None:
    # lossy VP8 decodes for real since r5 (kernel/vp8.py, pinned in
    # tests/test_vp8.py); a VP8 chunk with a bad start code must still
    # fail loudly rather than emit wrong pixels
    lossy = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + 12)
        + b"WEBP"
        + b"VP8 "
        + struct.pack("<I", 12)
        + b"\x00" * 12
    )
    with pytest.raises(ValueError, match="start code"):
        decode_webp(lossy)


def test_malformed_container_raises_valueerror() -> None:
    with pytest.raises(ValueError):
        decode_webp(b"RIFF1234WEBP" + b"x" * 32)  # no VP8L chunk
    with pytest.raises(ValueError):
        decode_webp(b"not a riff container at all!")
    # valid container, corrupt VP8L payload (bad signature byte)
    bad = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + 4)
        + b"WEBP"
        + b"VP8L"
        + struct.pack("<I", 4)
        + b"\x00\x00\x00\x00"
    )
    with pytest.raises(ValueError):
        decode_webp(bad)


def test_decode_image_webp_grayscale() -> None:
    arr = _fixture_arrays()["photo"]
    gray = decode_image(bytes.fromhex("".join(_FIXTURES["photo"])))
    r = arr[:, :, 0].astype(np.uint32)
    g = arr[:, :, 1].astype(np.uint32)
    b = arr[:, :, 2].astype(np.uint32)
    expected = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
    assert np.array_equal(gray, expected)


# ---------------------------------------------------------------------------
# live libwebp cross-check (both directions; skipped if lib absent)
# ---------------------------------------------------------------------------


def _load_libwebp():
    name = ctypes.util.find_library("webp")
    if not name:
        return None
    try:
        lw = ctypes.CDLL(name)
        lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lw.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lw.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
        lw.WebPEncodeLosslessRGB.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lw.WebPFree.argtypes = [ctypes.c_void_p]
        return lw
    except (OSError, AttributeError):
        return None


_LIBWEBP = _load_libwebp()


@pytest.mark.skipif(_LIBWEBP is None, reason="libwebp not available")
def test_live_libwebp_cross_check() -> None:
    lw = _LIBWEBP
    rng = np.random.default_rng(21)
    for shape in [(5, 3), (17, 13), (40, 56)]:
        arr = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        # our encoder → libwebp decoder
        ours = encode_webp_lossless(arr)
        w = ctypes.c_int()
        h = ctypes.c_int()
        p = lw.WebPDecodeRGBA(ours, len(ours), ctypes.byref(w), ctypes.byref(h))
        assert p, "libwebp rejected our stream"
        flat = np.ctypeslib.as_array(p, shape=(h.value * w.value * 4,)).copy()
        lw.WebPFree(p)
        lib_dec = flat.reshape(h.value, w.value, 4)
        assert np.array_equal(lib_dec[:, :, :3], arr)
        # libwebp encoder → our decoder
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lw.WebPEncodeLosslessRGB(
            arr.tobytes(), shape[1], shape[0], shape[1] * 3, ctypes.byref(out)
        )
        assert n > 0
        lib_stream = ctypes.string_at(out, n)
        lw.WebPFree(out)
        mine = decode_webp(lib_stream)
        assert np.array_equal(mine[:, :, :3], arr)
