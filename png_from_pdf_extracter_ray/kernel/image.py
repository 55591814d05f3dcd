"""General image decoding — pure stdlib + numpy (no imaging library in
this container, in the spirit of the reference's all-stdlib constraint,
/root/reference/specs/001-pdf-to-png-mailer/spec.md:122 FR-029).

``decode_image`` sniffs magic bytes and returns an (H, W) uint8
GRAYSCALE array for:

- **PNG** — a real decoder: 8-bit depth, color types 0 (gray), 2 (RGB),
  3 (palette), 4 (gray+alpha), 6 (RGBA); all five scanline filters
  (None/Sub/Up/Average/Paeth; Sub via per-lane cumsum, Up vectorized,
  Average/Paeth per-pixel only on the rows that use them).  Strictly a
  superset of ``kernel.png.decode_png_gray`` (which stays as the fast
  path for this engine's own filter-0 rasters).
- **PGM/PPM** (P5/P6 binary) — header parse + buffer reshape.
- **BMP** — BITMAPINFOHEADER, uncompressed 8-bit (palette) and 24-bit,
  bottom-up or top-down, 4-byte row padding.
- **JPEG** — a real baseline-sequential AND progressive (SOF2) decoder
  (kernel/jpeg.py): 1- or 3-component, sampling factors ≤ 2, restart
  markers, spectral-selection/successive-approximation scans; grayscale
  output is the Y plane.  Arithmetic-coded streams raise
  ``UnsupportedImageError``.
- **GIF** — real LZW decode of the first frame (kernel/gif.py):
  87a/89a, global/local palettes, interlacing.
- **TIFF** — 8-bit gray / RGB in strips, II/MM byte orders;
  Compression 1 (none), 5 (LZW, MSB-first with the spec's
  early-change rule), 8/32946 (Deflate via zlib), 32773 (PackBits),
  and horizontal-differencing Predictor 2.  Other compressions
  (JPEG-in-TIFF, CCITT) raise ``UnsupportedImageError``.

- **WebP lossless (VP8L)** — a real decoder (kernel/webp.py): canonical
  prefix codes, colour cache, meta-prefix groups, LZ77 backrefs with
  the 2-D distance map, all four inverse transforms; alpha is dropped
  before the grayscale conversion.
- **WebP lossy (VP8 keyframe)** — a real decoder (kernel/vp8.py):
  boolean entropy decoder, token partitions, WHT/DCT inverses, all
  intra predictors, both loop filters — bit-exact vs libwebp; the
  grayscale path uses the native Y plane directly.  VP8 interframes
  (never valid as still images) raise ``UnsupportedImageError``.

Color → grayscale uses the integer ITU-R 601 weights
``(299·R + 587·G + 114·B) // 1000`` so results are deterministic
across platforms (no float rounding).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


from .errors import UnsupportedImageError  # noqa: F401  (re-export)


def sniff_image_format(data: bytes) -> str:
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] in (b"P5", b"P6"):
        return "pnm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    return "unknown"


def decode_image(data: bytes) -> np.ndarray:
    """Bytes → (H, W) uint8 grayscale.  Raises ``UnsupportedImageError``
    for entropy-coded formats, ``ValueError`` for malformed input."""
    fmt = sniff_image_format(data)
    if fmt == "png":
        return _decode_png(data)
    if fmt == "pnm":
        return _decode_pnm(data)
    if fmt == "bmp":
        return _decode_bmp(data)
    if fmt == "jpeg":
        # baseline or progressive decode (kernel/jpeg.py);
        # arithmetic-coded streams raise UnsupportedImageError there
        return _decode_jpeg(data)
    if fmt == "gif":
        # LZW decode of the first frame (kernel/gif.py)
        return _decode_gif(data)
    if fmt == "tiff":
        return _decode_tiff(data)
    if fmt == "webp":
        # VP8L lossless decode (kernel/webp.py); lossy VP8 keyframe
        # decode (kernel/vp8.py) — its Y plane IS the native luma, so
        # grayscale skips the YUV→RGB→gray roundtrip entirely
        if _webp_chunk_tag(data) == b"VP8 ":
            return _decode_vp8_webp(data)[0]
        return _to_gray(_decode_webp(data)[:, :, :3])
    raise ValueError("unrecognized image format")


def _to_gray(arr: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 → (H, W) uint8 via integer ITU-R 601 weights."""
    if arr.ndim == 2:
        return arr
    r = arr[:, :, 0].astype(np.uint32)
    g = arr[:, :, 1].astype(np.uint32)
    b = arr[:, :, 2].astype(np.uint32)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering.  ``raw`` is (h, 1+stride) bytes
    (filter byte + filtered data); returns (h, stride) reconstructed."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        if ftype == 0:  # None
            rec = line
        elif ftype == 1:  # Sub: per-bpp-lane cumsum (mod 256 survives int cumsum)
            rec = line.reshape(-1, bpp).cumsum(axis=0).reshape(-1) & 0xFF
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 3:  # Average — sequential left-dependency
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth — sequential left-dependency
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        prev = rec.astype(np.uint8)
        out[y] = prev
    return out


def _decode_png(data: bytes) -> np.ndarray:
    i, w, h, idat, plte = 8, 0, 0, [], b""
    bitdepth = colortype = interlace = None
    while i + 8 <= len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            w, h, bitdepth, colortype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
        elif tag == b"PLTE":
            plte = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        i += 12 + length
    if not idat or w == 0 or h == 0:
        raise ValueError("malformed PNG (no IDAT/IHDR)")
    if bitdepth != 8:
        raise UnsupportedImageError(f"PNG bit depth {bitdepth} (only 8 supported)")
    if interlace:
        raise UnsupportedImageError("Adam7-interlaced PNG not supported")
    if colortype not in _CHANNELS:
        raise ValueError(f"bad PNG color type {colortype}")
    ch = _CHANNELS[colortype]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    rec = _unfilter(raw.reshape(h, stride + 1), h, stride, ch)
    if colortype == 0:
        return rec
    px = rec.reshape(h, w, ch)
    if colortype == 3:  # palette lookup, then gray
        if not plte:
            raise ValueError("palette PNG without PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        return _to_gray(pal[px[:, :, 0]])
    if colortype == 4:  # gray + alpha: alpha dropped
        return px[:, :, 0].copy()
    return _to_gray(px[:, :, :3])  # RGB / RGBA (alpha dropped)


# ---------------------------------------------------------------------------
# PNM (PGM P5 / PPM P6, binary)
# ---------------------------------------------------------------------------


def _decode_pnm(data: bytes) -> np.ndarray:
    magic = data[:2]
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        # skip whitespace and '#' comments between header tokens
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise UnsupportedImageError("16-bit PNM not supported")
    if maxval <= 0:
        raise ValueError("PNM maxval must be positive")
    ch = 1 if magic == b"P5" else 3
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * ch, offset=pos)
    if maxval != 255:
        # PNM samples are proportional to maxval — rescale to full range
        px = (px.astype(np.uint16) * 255 // maxval).clip(0, 255).astype(np.uint8)
    if ch == 1:
        return px.reshape(h, w).copy()
    return _to_gray(px.reshape(h, w, 3))


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, uncompressed)
# ---------------------------------------------------------------------------


def _decode_bmp(data: bytes) -> np.ndarray:
    if len(data) < 54:
        raise ValueError("truncated BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise UnsupportedImageError("BITMAPCOREHEADER BMP not supported")
    w, h_signed = struct.unpack("<ii", data[18:26])
    bpp, compression = struct.unpack("<HI", data[28:34])
    if compression != 0:
        raise UnsupportedImageError(f"compressed BMP (method {compression})")
    if bpp not in (8, 24):
        raise UnsupportedImageError(f"{bpp}-bit BMP (only 8/24 supported)")
    top_down = h_signed < 0
    h = abs(h_signed)
    row_bytes = ((w * bpp // 8) + 3) & ~3  # rows padded to 4 bytes
    px = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=offset)
    rows = px.reshape(h, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        # palette: 4-byte BGRX entries right after the info header
        pal_off = 14 + hdr_size
        (colors_used,) = struct.unpack("<I", data[46:50])
        n_colors = colors_used or 256
        pal = np.frombuffer(
            data, dtype=np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(-1, 4)
        gray_pal = (
            (299 * pal[:, 2].astype(np.uint32)
             + 587 * pal[:, 1].astype(np.uint32)
             + 114 * pal[:, 0].astype(np.uint32)) // 1000
        ).astype(np.uint8)
        idx = rows[:, :w]
        return gray_pal[idx]
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return _to_gray(rgb)


def _tiff_lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (MSB-first bit packing, early-change width
    bump at next_code == 2^w - 1; Clear=256, EOI=257).

    This differs from GIF's LZW (kernel/gif.py) in bit order and the
    early-change rule, so it gets its own decoder.  A missing EOI at
    end-of-stream is tolerated (some writers omit it)."""
    clear, eoi = 256, 257
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width, next_code = 9, 258
    bitbuf = bitcnt = pos = 0
    n = len(data)
    out = bytearray()
    prev: bytes | None = None
    while True:
        while bitcnt < width:
            if pos >= n:
                return bytes(out)
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bitcnt += 8
        code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
        bitcnt -= width
        if code == clear:
            table = table[:258]
            width, next_code = 9, 258
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= next_code:
                raise ValueError("corrupt TIFF LZW stream (bad first code)")
            entry = table[code]
        else:
            if code < next_code:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt TIFF LZW stream (code gap)")
            table.append(prev + entry[:1])
            next_code += 1
            # early change: width grows one entry sooner than GIF
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        out += entry
        prev = entry


def _packbits_decode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF Compression 32773)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        i += 1
        if b < 128:
            cnt = b + 1
            if i + cnt > n:
                raise ValueError("truncated PackBits literal run")
            out += data[i : i + cnt]
            i += cnt
        elif b > 128:
            if i >= n:
                raise ValueError("truncated PackBits repeat run")
            out += data[i : i + 1] * (257 - b)
            i += 1
        # 128 is a no-op per the spec
    return bytes(out)


def _decode_tiff(data: bytes) -> np.ndarray:
    """Baseline TIFF → (H, W) uint8 grayscale.

    Supports 8-bit grayscale and RGB in strips, both byte orders;
    Compression 1 (none), 5 (LZW), 8/32946 (Deflate), 32773
    (PackBits); Predictor 2 (horizontal differencing).  Entropy-coded
    compressions with no pure-Python baseline (JPEG-in-TIFF, CCITT)
    raise ``UnsupportedImageError``."""
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("truncated TIFF IFD")
    (n_tags,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    type_size = {1: 1, 3: 2, 4: 4}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    for t in range(n_tags):
        off = ifd_off + 2 + 12 * t
        if off + 12 > len(data):
            raise ValueError("truncated TIFF tag")
        tag, typ = struct.unpack(bo + "HH", data[off : off + 4])
        (count,) = struct.unpack(bo + "I", data[off + 4 : off + 8])
        if typ not in type_size:
            continue
        total = type_size[typ] * count
        if total <= 4:
            raw = data[off + 8 : off + 8 + total]
        else:
            (voff,) = struct.unpack(bo + "I", data[off + 8 : off + 12])
            raw = data[voff : voff + total]
        if len(raw) < total:
            raise ValueError("truncated TIFF value")
        tags[tag] = list(struct.unpack(bo + type_fmt[typ] * count, raw))
    try:
        w = tags[256][0]
        h = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as exc:
        raise ValueError(f"TIFF missing required tag: {exc}") from exc
    comp = tags.get(259, [1])[0]
    decomp = {
        1: lambda b: b,
        5: _tiff_lzw_decode,
        8: zlib.decompress,
        32946: zlib.decompress,
        32773: _packbits_decode,
    }
    if comp not in decomp:
        raise UnsupportedImageError(
            f"TIFF compression {comp} requires an imaging library not "
            "present in this environment "
            "(supported: none/LZW/Deflate/PackBits)"
        )
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8])[0]
    predictor = tags.get(317, [1])[0]
    if bps != 8 or spp not in (1, 3):
        raise UnsupportedImageError("only 8-bit gray/RGB TIFF supported")
    if predictor not in (1, 2):
        raise UnsupportedImageError(f"TIFF predictor {predictor} unsupported")
    raw = b"".join(decomp[comp](data[o : o + c]) for o, c in zip(offsets, counts))
    need = h * w * spp
    if len(raw) < need:
        raise ValueError("truncated TIFF strip data")
    arr = np.frombuffer(raw, dtype=np.uint8, count=need).reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing: each row stores per-sample deltas;
        # mod-256 cumsum across the width restores the pixels
        arr = np.cumsum(arr, axis=1, dtype=np.uint8)
    return _to_gray(arr if spp == 3 else arr[:, :, 0])


# Imported at the BOTTOM: kernel.jpeg needs UnsupportedImageError from
# this module (defined above), and this module dispatches to its decoder
# — the tail import breaks the cycle while staying module-level (a
# function-local relative import would fail on foreign-cwd workers,
# ROUND_NOTES lesson 4).
from .gif import decode_gif as _decode_gif  # noqa: E402
from .jpeg import decode_jpeg as _decode_jpeg  # noqa: E402
from .vp8 import decode_vp8_webp as _decode_vp8_webp  # noqa: E402
from .webp import decode_webp as _decode_webp  # noqa: E402


def _webp_chunk_tag(data: bytes) -> bytes:
    """First image-chunk tag of a WebP RIFF (b'VP8 ' lossy, b'VP8L'
    lossless) or b'' when none found."""
    i = 12
    while i + 8 <= len(data):
        tag = data[i : i + 4]
        if tag in (b"VP8 ", b"VP8L"):
            return tag
        size = int.from_bytes(data[i + 4 : i + 8], "little")
        i += 8 + size + (size & 1)
    return b""
