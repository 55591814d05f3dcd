"""GIF decoder — pure stdlib + numpy (kernel/jpeg.py's sibling; together
with the TIFF LZW/Deflate/PackBits codecs in kernel/image.py they
retire the "entropy-coded formats dead-letter" list down to WebP and
progressive JPEG, which genuinely have no pure-Python baseline).

``decode_gif`` handles GIF87a/GIF89a: global/local color tables, LZW
with variable code width and dictionary resets, interlaced frames, and
extensions (skipped).  STILL-IMAGE semantics: the FIRST image frame is
decoded and blitted onto a logical-screen-sized canvas prefilled with
the background color; later animation frames are ignored.  Output is
(H, W) uint8 grayscale via the same integer ITU-R 601 weights the rest
of the kernel uses — fully deterministic.

``encode_gif_gray`` writes a valid uncompressed-style GIF (every pixel
emitted as a literal LZW code, with clear codes keeping the code width
fixed) — it exists so the decoder is testable in a container with no
other GIF producer, same pattern as the JPEG encoder.
"""

from __future__ import annotations

import struct

import numpy as np

from .errors import UnsupportedImageError


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF LZW (LSB-first variable-width codes) → index array."""
    clear = 1 << min_code_size
    end = clear + 1
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little"
    )
    pos = 0
    nbits = len(bits)
    width = min_code_size + 1
    # dictionary: list of byte sequences (as lists of ints)
    base = [(i,) for i in range(clear)] + [(), ()]
    table = list(base)
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    while pos + width <= nbits:
        code = 0
        for k in range(width):
            code |= int(bits[pos + k]) << k
        pos += width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        if prev is not None:
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError("truncated GIF LZW stream")
    return np.asarray(out[:n_pixels], dtype=np.uint8)


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def _palette_gray(pal: np.ndarray) -> np.ndarray:
    r = pal[:, 0].astype(np.uint32)
    g = pal[:, 1].astype(np.uint32)
    b = pal[:, 2].astype(np.uint32)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → (H, W) uint8 grayscale (first frame on the canvas)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=i).reshape(-1, 3)
        i += 3 * n

    while i < len(data):
        b0 = data[i]
        if b0 == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image frame")
        if b0 == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(data) and data[i] != 0:
                i += 1 + data[i]
            i += 1
            continue
        if b0 != 0x2C:
            raise ValueError("corrupt GIF block stream")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", data[i + 1 : i + 10])
        i += 10
        pal = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            pal = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=i).reshape(
                -1, 3
            )
            i += 3 * n
        if pal is None:
            raise ValueError("GIF frame without a color table")
        interlaced = bool(fpacked & 0x40)
        min_code = data[i]
        i += 1
        chunks = []
        while i < len(data) and data[i] != 0:
            ln = data[i]
            chunks.append(data[i + 1 : i + 1 + ln])
            i += 1 + ln
        idx = _lzw_decode(min_code, b"".join(chunks), fw * fh).reshape(fh, fw)
        if interlaced:
            idx = _deinterlace(idx)
        gray_pal = _palette_gray(pal)
        frame = gray_pal[np.minimum(idx, len(gray_pal) - 1)]
        bg_gray = (
            gray_pal[bg] if gct is not None and bg < len(gray_pal) else np.uint8(0)
        )
        canvas = np.full((sh, sw), bg_gray, dtype=np.uint8)
        canvas[top : top + fh, left : left + fw] = frame[
            : max(0, sh - top), : max(0, sw - left)
        ]
        return canvas
    raise ValueError("truncated GIF (no trailer)")


def encode_gif_gray(arr: np.ndarray) -> bytes:
    """(H, W) uint8 → GIF89a with a 256-gray palette, LZW literals only
    (a clear code before every dictionary-width increase keeps all codes
    9-bit literals — valid, just uncompressed).  Test producer."""
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError("encode_gif_gray expects an (H, W) uint8 array")
    h, w = arr.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    for v in range(256):
        out += bytes([v, v, v])
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(8)  # LZW min code size
    clear, _end = 256, 257
    acc = 0
    nacc = 0
    payload = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc  # LSB-first
        nacc += 9
        while nacc >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    budget = 0
    for v in arr.reshape(-1):
        # every literal grows the decoder's table by one; clear before
        # it would force a width bump past 9 bits
        if budget == (1 << 9) - 258 - 2:
            emit(clear)
            budget = 0
        emit(int(v))
        budget += 1
    emit(_end)
    if nacc:
        payload.append(acc & 0xFF)
    for s in range(0, len(payload), 255):
        block = payload[s : s + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)
