"""Multimodal column operations over the extracted page rasters.

The ``pages`` column (list<struct{page_number, png:binary, width,
height, dpi, filename}>) is this engine's opaque-binary-with-typed-
metadata multimodal surface.  Stages:

- ``explode_pages``   — 1 doc row → N page rows (url, page_number, png,
  meta);
- ``page_meta``       — parse real geometry/DPI out of the PNG bytes
  (validates the binary against its typed metadata);
- ``PngResizer``      — actor-pool decode → block-mean downscale →
  re-encode.  REAL for this engine's own rasters (8-bit gray, filter 0,
  via kernel.png.decode_png_gray);
- ``GeneralImageDecoder`` — REAL general decode (kernel/image.py: full
  PNG, PGM/PPM, uncompressed BMP, baseline JPEG via kernel/jpeg.py,
  GIF via kernel/gif.py, TIFF incl. LZW/Deflate/PackBits) → grayscale
  feature extraction; the remainder (progressive JPEG, WebP — no
  pure-Python baseline) dead-letters per row rather than raising;
- ``JpegRoundtrip``   — baseline JPEG encode → decode fidelity rows over
  the engine's own rasters (the lossy-format ingestion stage);
- ``sample_pages``    — frame-sampling: keep every Nth page of each doc
  (the video-frame-sample analog).

Heavy-binary guidance: small ``batch_size`` (pages are ~13 KB-1 MB
each), ``batch_format="pyarrow"`` throughout so binaries never round-
trip through pandas object dtype.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..kernel.image import decode_image
from ..kernel.jpeg import decode_jpeg, encode_jpeg_gray, encode_jpeg_progressive
from ..kernel.vp8 import decode_vp8_webp, encode_vp8_gray
from ..kernel.webp import decode_webp, encode_webp_lossless
from ..kernel.png import decode_png_gray, read_png_dpi, read_png_size, write_png_gray

PAGE_ROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("page_number", pa.int32()),
        ("png", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("dpi", pa.int32()),
        ("filename", pa.string()),
    ]
)


def explode_pages(batch: pa.Table) -> pa.Table:
    """Un-nest the pages list<struct> column into one row per page.

    Pure Arrow: ``list_flatten`` + ``list_parent_indices`` + struct-field
    selection — the raster binaries are never copied through Python
    objects (null pages lists — failed docs — flatten to zero rows).
    """
    pages = batch["pages"].combine_chunks()
    flat = pc.list_flatten(pages)
    parent = pc.list_parent_indices(pages)
    cols: dict[str, pa.Array] = {"url": pc.take(batch["url"].combine_chunks(), parent)}
    for k in ("page_number", "png", "width", "height", "dpi", "filename"):
        cols[k] = pc.struct_field(flat, k)
    return pa.Table.from_pydict(cols).cast(PAGE_ROW_SCHEMA)


def page_meta(batch: pa.Table) -> pa.Table:
    """Parse geometry/DPI from the PNG bytes (ground truth vs metadata).

    The per-row chunk walk is byte-level by nature, but it only ever
    needs the header: slice a 96-byte prefix in Arrow first (IHDR +
    pHYs are always the first two chunks of this engine's rasters) so
    the full rasters are never copied out of the Arrow buffers.
    """
    sizes = pc.binary_length(batch["png"])
    heads = pc.binary_slice(batch["png"].combine_chunks(), 0, 96)
    widths, heights, dpis = [], [], []
    for h in heads.to_pylist():
        w, ht = read_png_size(h)
        widths.append(w)
        heights.append(ht)
        dpis.append(read_png_dpi(h))
    return (
        batch.drop_columns(["png"])
        .append_column("png_width", pa.array(widths, pa.int32()))
        .append_column("png_height", pa.array(heights, pa.int32()))
        .append_column("png_dpi", pa.array(dpis, pa.int32()))
        .append_column("png_bytes", pc.cast(sizes, pa.int64()))
    )


class PngResizer:
    """Actor-pool stage: real decode → block-mean resize → re-encode.

    Works on this engine's own rasters; target dims must divide evenly
    into the source (block mean), otherwise falls back to stride
    sampling.  State (target geometry) is per-actor, set once.
    """

    def __init__(self, target_w: int = 480, target_h: int = 270) -> None:
        self.tw, self.th = target_w, target_h

    def _resize(self, arr: np.ndarray) -> np.ndarray:
        h, w = arr.shape
        if h % self.th == 0 and w % self.tw == 0:
            fh, fw = h // self.th, w // self.tw
            return (
                arr.reshape(self.th, fh, self.tw, fw).mean(axis=(1, 3)).astype(np.uint8)
            )
        ys = (np.arange(self.th) * h) // self.th
        xs = (np.arange(self.tw) * w) // self.tw
        return arr[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        pngs = batch["png"].to_pylist()
        dpis = batch["dpi"].to_pylist()
        out = [
            write_png_gray(self._resize(decode_png_gray(b)), dpi=d)
            for b, d in zip(pngs, dpis)
        ]
        t = batch.drop_columns(["png", "width", "height"])
        return (
            t.append_column("png", pa.array(out, pa.binary()))
            .append_column("width", pa.array([self.tw] * len(out), pa.int32()))
            .append_column("height", pa.array([self.th] * len(out), pa.int32()))
        )


class GeneralImageDecoder:
    """Actor-pool stage: general image decode → grayscale features.

    REAL decode for PNG (all filter types / gray / RGB / palette /
    alpha), PGM/PPM, uncompressed BMP, baseline JPEG (kernel/jpeg.py),
    GIF (kernel/gif.py) and TIFF (none/LZW/Deflate/PackBits,
    Predictor 2) via the pure-Python ``kernel.image.decode_image``;
    the remainder (progressive JPEG, WebP — no pure-Python baseline
    in this container) dead-letters per ROW
    (``image_ok=false`` + ``image_error``) —
    errors are data, same policy as the extraction kernel.

    Output per row: true geometry, mean/std intensity, and an
    ``feat_grid``×``feat_grid`` block-mean thumbnail vector
    (list<double>, the downstream-model feature shape).
    """

    def __init__(self, feat_grid: int = 8) -> None:
        self.grid = feat_grid

    def _features(self, arr: np.ndarray) -> list[float]:
        h, w = arr.shape
        gh, gw = min(self.grid, h), min(self.grid, w)
        ys = (np.arange(gh + 1) * h) // gh
        xs = (np.arange(gw + 1) * w) // gw
        out = np.empty((self.grid, self.grid), dtype=np.float64)
        out.fill(0.0)
        for i in range(gh):
            band = arr[ys[i] : ys[i + 1]]
            for j in range(gw):
                out[i, j] = float(band[:, xs[j] : xs[j + 1]].mean()) / 255.0
        return out.reshape(-1).round(4).tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        # decode_image imported at MODULE level: a function-local relative
        # import would execute a real import on the worker, which fails
        # when the driver runs from a foreign cwd (ROUND_NOTES #4)
        n = batch.num_rows
        ok = np.zeros(n, dtype=bool)
        errs = [""] * n
        widths = np.zeros(n, dtype=np.int32)
        heights = np.zeros(n, dtype=np.int32)
        means = np.zeros(n, dtype=np.float64)
        stds = np.zeros(n, dtype=np.float64)
        feats: list[list[float] | None] = [None] * n
        import struct
        import zlib

        for i, b in enumerate(batch["png"].to_pylist()):
            try:
                arr = decode_image(b or b"")
            except (
                ValueError,  # covers UnsupportedImageError
                NotImplementedError,
                zlib.error,  # corrupt deflate stream in a valid-signature PNG
                struct.error,  # truncated header fields
                IndexError,  # malformed offsets (palette/BMP)
                OverflowError,
            ) as exc:
                errs[i] = f"{type(exc).__name__}: {exc}"
                continue
            ok[i] = True
            heights[i], widths[i] = arr.shape
            means[i] = round(float(arr.mean()), 4)
            stds[i] = round(float(arr.std()), 4)
            feats[i] = self._features(arr)
        return (
            batch.drop_columns(["png"])
            .append_column("image_ok", pa.array(ok))
            .append_column("image_error", pa.array(errs, pa.string()))
            .append_column("img_width", pa.array(widths, pa.int32()))
            .append_column("img_height", pa.array(heights, pa.int32()))
            .append_column("img_mean", pa.array(means, pa.float64()))
            .append_column("img_std", pa.array(stds, pa.float64()))
            .append_column("image_feat", pa.array(feats, pa.list_(pa.float64())))
        )


class JpegRoundtrip:
    """Actor-pool stage: page raster → baseline JPEG encode → decode →
    fidelity row (the lossy-format ingestion stage of a multimodal
    pipeline, run on this engine's own rasters because the container has
    no other JPEG producer).

    Per page: ``page_id``, compressed size, md5 of the DECODED raster
    bytes (pins the decoder bit-for-bit — kernel/jpeg.py is fully
    deterministic), and the mean absolute reconstruction error.  Meant
    for RESIZED thumbs (480×270) — encoding full 1080p pages is the
    same code, just slower.

    ``progressive=True`` routes each page through the PROGRESSIVE
    (SOF2) encode→decode path instead — exercising the spectral-
    selection / successive-approximation scans real crawl images
    heavily use; the decoded raster (and hence ``dec_md5``/``mae``) is
    bit-equal to the baseline path by the codec's roundtrip contract,
    while ``jpeg_bytes`` reflects the progressive stream."""

    def __init__(self, quality: int = 85, progressive: bool = False) -> None:
        self.quality = quality
        self.progressive = progressive

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        urls = batch["url"].to_pylist()
        nums = batch["page_number"].to_pylist()
        pngs = batch["png"].to_pylist()
        ids = [f"{u}#{n}" for u, n in zip(urls, nums)]
        n = len(pngs)
        jpeg_bytes = np.zeros(n, dtype=np.int64)
        digests: list[str] = []
        mae = np.zeros(n, dtype=np.float64)
        for i, b in enumerate(pngs):
            arr = decode_png_gray(b)
            if self.progressive:
                j = encode_jpeg_progressive(arr, self.quality)
            else:
                j = encode_jpeg_gray(arr, self.quality)
            dec = decode_jpeg(j)
            jpeg_bytes[i] = len(j)
            digests.append(hashlib.md5(dec.tobytes()).hexdigest())
            mae[i] = round(
                float(np.mean(np.abs(arr.astype(np.float64) - dec))), 4
            )
        return pa.Table.from_pydict(
            {
                "page_id": pa.array(ids, pa.string()),
                "jpeg_bytes": pa.array(jpeg_bytes),
                "dec_md5": pa.array(digests, pa.string()),
                "mae": pa.array(mae, pa.float64()),
            }
        )


class WebpRoundtrip:
    """Actor-pool stage: page raster → WebP LOSSLESS (VP8L) encode →
    decode → attestation row (the lossless-web-format ingestion stage of
    a multimodal pipeline — real crawls carry WebP heavily, and this
    container has no other WebP producer, so the engine's own rasters
    are the payloads).

    Per page: ``page_id``, compressed ``webp_bytes``, ``dec_md5`` of the
    DECODED grayscale raster (pins kernel/webp.py's decoder bit-for-bit
    — VP8L is lossless, so it must equal the md5 of the source raster),
    and ``lossless_ok`` asserting that bit-equality per row.  Meant for
    RESIZED thumbs (480×270), like JpegRoundtrip.

    ``cache_bits``/``subtract_green`` select the encoder's colour-cache
    size and transform use, exercising both the cache-hit and
    transform-inverse decode paths."""

    def __init__(self, cache_bits: int = 8, subtract_green: bool = True) -> None:
        self.cache_bits = cache_bits
        self.subtract_green = subtract_green

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        urls = batch["url"].to_pylist()
        nums = batch["page_number"].to_pylist()
        pngs = batch["png"].to_pylist()
        ids = [f"{u}#{n}" for u, n in zip(urls, nums)]
        n = len(pngs)
        webp_bytes = np.zeros(n, dtype=np.int64)
        digests: list[str] = []
        lossless = np.zeros(n, dtype=bool)
        for i, b in enumerate(pngs):
            arr = decode_png_gray(b)
            wb = encode_webp_lossless(
                arr, cache_bits=self.cache_bits, subtract_green=self.subtract_green
            )
            dec = decode_webp(wb)[:, :, 0]  # gray encodes r=g=b
            webp_bytes[i] = len(wb)
            digests.append(hashlib.md5(dec.tobytes()).hexdigest())
            lossless[i] = bool(np.array_equal(dec, arr))
        return pa.Table.from_pydict(
            {
                "page_id": pa.array(ids, pa.string()),
                "webp_bytes": pa.array(webp_bytes),
                "dec_md5": pa.array(digests, pa.string()),
                "lossless_ok": pa.array(lossless),
            }
        )


class Vp8Roundtrip:
    """Actor-pool stage: page raster → lossy WebP (VP8 keyframe) encode
    → decode → attestation row — the LOSSY-web-format twin of
    WebpRoundtrip (real crawls carry lossy WebP far more than lossless,
    and this container has no other VP8 producer, so the engine's own
    rasters are the payloads).

    Per page: ``page_id``, compressed ``vp8_bytes``, ``dec_md5`` of the
    DECODED luma raster (pins kernel/vp8.py's decoder AND encoder
    bit-for-bit — both are fully deterministic, so the digest is stable
    even though the codec is lossy), and ``mae`` vs the source raster
    (the quantization-error attestation, like JpegRoundtrip's).

    Meant for SMALL thumbs (96×54 by default upstream): the pure-Python
    per-subblock encode costs ~40 ms/page at that size and scales
    linearly in pixels, so thumbnail scale keeps the stage inside the
    same per-batch envelope as the other codec stages."""

    def __init__(self, qi: int = 24) -> None:
        self.qi = qi

    def __call__(self, batch: pa.Table) -> pa.Table:
        # kernel imports live at module top level (ROUND_NOTES lesson
        # 24): a function-local relative import executes ON the worker,
        # where the package is not importable from a foreign cwd.
        import hashlib

        urls = batch["url"].to_pylist()
        nums = batch["page_number"].to_pylist()
        pngs = batch["png"].to_pylist()
        ids = [f"{u}#{n}" for u, n in zip(urls, nums)]
        n = len(pngs)
        vp8_bytes = np.zeros(n, dtype=np.int64)
        digests: list[str] = []
        mae = np.zeros(n, dtype=np.float64)
        for i, b in enumerate(pngs):
            arr = decode_png_gray(b)
            wb = encode_vp8_gray(arr, qi=self.qi)
            dec = decode_vp8_webp(wb)[0]  # native luma plane
            vp8_bytes[i] = len(wb)
            digests.append(hashlib.md5(dec.tobytes()).hexdigest())
            mae[i] = round(
                float(np.mean(np.abs(arr.astype(np.float64) - dec))), 4
            )
        return pa.Table.from_pydict(
            {
                "page_id": pa.array(ids, pa.string()),
                "vp8_bytes": pa.array(vp8_bytes),
                "dec_md5": pa.array(digests, pa.string()),
                "mae": pa.array(mae, pa.float64()),
            }
        )


def phash64_ink(arr: np.ndarray, grid: int = 32, levels: int = 32) -> int:
    """64-bit perceptual hash of a grayscale page raster.

    Document rasters are mostly background with identically-placed text
    blocks, so the classic global-threshold hashes (block-mean aHash,
    DCT pHash, gradient dHash) collapse: measured on this engine's own
    corpus they produced ≤37 distinct values over 952 pages — the
    LAYOUT is the only thing they see, and every page shares it.  The
    discriminating signal is the glyph-level INK pattern, so this hash
    SimHashes it: partition into a ``grid``×``grid`` lattice (integer
    boundary cuts), sum the ink mass (255−pixel) per cell, quantize each
    inked cell to one of ``levels`` page-relative levels, and treat each
    ``(cell_index, level)`` as a token hashed with the process-stable
    64-bit siphash (``pd.util.hash_array``); bit b of the output is the
    sign of the token-vote sum on bit b — exactly the text-SimHash vote,
    over image-derived tokens.  Near-identical renders (re-rendered url
    variants; measured ≤0.15 % differing pixels) share almost every
    token → hamming 0-3; distinct pages land ≥11 — a clean margin for
    the block-probing radius.  Deterministic end to end (integer cuts,
    float64 sums, fixed hash key).  All-background pages hash to 0.
    """
    ink = 255.0 - arr.astype(np.float64)
    h, w = arr.shape
    gh, gw = min(grid, h), min(grid, w)
    ys = (np.arange(gh + 1) * h) // gh
    xs = (np.arange(gw + 1) * w) // gw
    rows = np.add.reduceat(ink, ys[:-1], axis=0)
    cells = np.add.reduceat(rows, xs[:-1], axis=1)
    peak = cells.max()
    if peak <= 0:
        return 0
    import pandas as pd

    q = np.minimum((cells.reshape(-1) / peak * levels).astype(np.int64), levels)
    inked = np.nonzero(q > 0)[0]
    toks = (inked * (levels + 1) + q[inked]).astype(np.uint64)
    hashes = pd.util.hash_array(toks)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int32
    )
    votes = (2 * bits - 1).sum(axis=0)
    out = (votes >= 0).astype(np.uint64)
    return int((out << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


class PagePHasher:
    """Actor-pool stage: page raster → (page_id, phash) rows.

    Decodes this engine's own rasters (8-bit gray, filter 0 — the fast
    ``decode_png_gray`` path) and emits one 64-bit perceptual hash per
    page; ``page_id`` is ``url#page_number`` (unique per raster).  The
    output rows are tiny (string + int64), so everything downstream of
    this stage — the hamming block-probe pair machinery — never ships a
    raster byte.
    """

    def __init__(self, grid: int = 32) -> None:
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        nums = batch["page_number"].to_pylist()
        pngs = batch["png"].to_pylist()
        ids = [f"{u}#{n}" for u, n in zip(urls, nums)]
        hashes = np.empty(len(pngs), dtype=np.uint64)
        for i, b in enumerate(pngs):
            hashes[i] = phash64_ink(decode_png_gray(b), grid=self.grid)
        return pa.Table.from_pydict(
            {
                "page_id": pa.array(ids, pa.string()),
                "phash": pa.array(hashes.view(np.int64), pa.int64()),
            }
        )


def image_feature_summary(batch: pa.Table) -> pa.Table:
    """Scalar projection of ``GeneralImageDecoder`` output for the SQL
    oracle: the list<double> feature vector is folded into an md5 over
    the repr of its rounded doubles (both sides compute the identical
    doubles, so the digest is deterministic), failed decodes digest to
    the empty string.  Keeps the SQL-checked entry free of list-typed
    columns while still pinning every feature value bit-for-bit."""
    import hashlib

    feats = batch["image_feat"].to_pylist()
    digests = [
        "" if f is None else hashlib.md5(",".join(repr(x) for x in f).encode()).hexdigest()
        for f in feats
    ]
    return batch.select(
        [
            "url",
            "page_number",
            "image_ok",
            "image_error",
            "img_width",
            "img_height",
            "img_mean",
            "img_std",
        ]
    ).append_column("feat_md5", pa.array(digests, pa.string()))


def sample_pages(ds: rd.Dataset, stride: int = 2) -> rd.Dataset:
    """Frame sampling: keep pages where (page_number-1) % stride == 0.

    Pure Arrow (mirrors ``explode_pages``): flatten the list<struct>
    column, mask on ``page_number``, and re-nest with
    ``ListArray.from_arrays`` — the raster binaries are sliced inside the
    Arrow buffers, never copied through Python objects.  A null pages
    list (failed doc) becomes an empty list, same as the semantics the
    old row-walk implemented.
    """

    def _sample(batch: pa.Table) -> pa.Table:
        list_type = batch.schema.field("pages").type
        pages = batch["pages"].combine_chunks()
        flat = pc.list_flatten(pages)
        parent = np.asarray(pc.list_parent_indices(pages))
        pn = np.asarray(pc.struct_field(flat, "page_number"))
        mask = ((pn - 1) % stride) == 0
        kept = flat.filter(pa.array(mask))
        counts = np.bincount(parent[mask], minlength=batch.num_rows)
        offsets = np.zeros(batch.num_rows + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        sampled = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept)
        idx = batch.schema.get_field_index("pages")
        return batch.set_column(idx, "pages", sampled.cast(list_type))

    return ds.map_batches(_sample, batch_format="pyarrow", batch_size=16)
