"""Mini-PDF parser + page raster — the PdfToPng core, dependency-free.

The reference shells out to ImageMagick to rasterize every PDF page at a
fixed geometry (/root/reference/src/services/pdf_converter.py:50-160).
This sandbox has no ImageMagick/GhostScript/PyMuPDF, and the task brief
lets us synthesise the corpus, so the kernel operates on *well-formed
uncompressed PDFs that our corpus generator emits* (see
``corpus/pdfgen.py``) and preserves the reference's externally observable
semantics:

- error taxonomy: encrypted → ``PDFPasswordProtectedError``
  (pdf_converter.py:104-108); corrupt/invalid → ``PDFCorruptedError``
  (:110-116); zero pages → ``PDFConversionError`` (:136-139); work-cap
  exceeded → ``PDFConversionError`` timeout message (:124-127);
- page rasters at exactly ``page_width x page_height`` with DPI metadata
  and a white background (argv semantics at :74-89, asserted like
  tests/contract/test_imagemagick.py:77-85);
- sequential 1-indexed page numbers and ``{sanitized}_pdf-%03d.png``
  filenames (:72, :141-158);
- text-span extraction per page (the north-star addition: the engine also
  emits the text the reference's raster step discards).

Parsing strategy: objects are located with a single compiled regex,
pages are ordered by the page tree's /Kids array (depth-first), content
streams are read between stream/endstream, and text is pulled from
``(...) Tj`` operators in order.  All failures anywhere in this path map
to ``PDFCorruptedError`` — exactly how the reference treats unreadable
input.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from ..config import ExtractConfig
from .errors import PDFConversionError, PDFCorruptedError, PDFPasswordProtectedError
from .png import PageTemplate

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R\b")
_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")
_ESC_RE = re.compile(rb"\\([nrtbf()\\]|[0-7]{1,3})")

_ESC_MAP = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _unescape(s: bytes) -> bytes:
    def repl(m: re.Match[bytes]) -> bytes:
        g = m.group(1)
        if g in _ESC_MAP:
            return _ESC_MAP[g]
        return bytes([int(g, 8) & 0xFF])

    return _ESC_RE.sub(repl, s)


@dataclass
class ParsedPage:
    page_number: int  # 1-indexed, matching pdf_converter.py:141-146
    lines: list[str]


def parse_pdf(payload: bytes, cfg: ExtractConfig) -> list[ParsedPage]:
    """Parse a PDF payload into ordered pages of text lines.

    Raises the reference error taxonomy on malformed input.
    """
    if not payload.startswith(b"%PDF-"):
        raise PDFCorruptedError("PDF is corrupted or malformed: missing %PDF- header")
    if b"%%EOF" not in payload[-1024:]:
        raise PDFCorruptedError("PDF is corrupted or malformed: truncated (no %%EOF)")

    # Trailer-level encryption marker — the analog of ImageMagick's
    # "password/encrypted" stderr (pdf_converter.py:104-108).
    trailer_at = payload.rfind(b"trailer")
    trailer = payload[trailer_at:] if trailer_at != -1 else b""
    if b"/Encrypt" in trailer:
        raise PDFPasswordProtectedError("PDF is password-protected or encrypted")

    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(payload):
        objs[int(m.group(1))] = m.group(3)
    if not objs:
        raise PDFCorruptedError("PDF is corrupted or malformed: no objects")

    # Find the catalog → /Pages root.
    root_num = None
    if trailer:
        rm = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", trailer)
        if rm:
            root_num = int(rm.group(1))
    if root_num is None or root_num not in objs:
        for num, body in objs.items():
            if b"/Type" in body and b"/Catalog" in body:
                root_num = num
                break
    if root_num is None or root_num not in objs:
        raise PDFCorruptedError("PDF is corrupted or malformed: no document catalog")

    pm = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", objs[root_num])
    if not pm:
        raise PDFCorruptedError("PDF is corrupted or malformed: catalog has no /Pages")

    # Depth-first walk of the page tree, preserving /Kids order — this is
    # the deterministic page ordering (≈ the sorted output glob at
    # pdf_converter.py:133-134).
    page_objs: list[bytes] = []
    seen: set[int] = set()

    def walk(num: int) -> None:
        if num in seen or num not in objs:
            return
        seen.add(num)
        body = objs[num]
        if re.search(rb"/Type\s*/Page\b", body):  # \b excludes /Pages tree nodes
            page_objs.append(body)
            return
        km = re.search(rb"/Kids\s*\[(.*?)\]", body, re.S)
        if km:
            for ref in _REF_RE.finditer(km.group(1)):
                walk(int(ref.group(1)))

    walk(int(pm.group(1)))

    if not page_objs:
        # ≈ "No PNG files generated from PDF ... may be empty or have 0
        # pages" (pdf_converter.py:136-139).
        raise PDFConversionError("No pages in PDF: document may be empty or have 0 pages")

    if len(page_objs) > cfg.page_budget:
        # Deterministic stand-in for the 120 s subprocess timeout
        # (pdf_converter.py:96,124-127): the work cap is a function of the
        # input, so distributed and oracle runs fail identically.
        raise PDFConversionError(
            f"PDF conversion timed out: page count {len(page_objs)} "
            f"exceeds budget {cfg.page_budget}"
        )

    pages: list[ParsedPage] = []
    for idx, body in enumerate(page_objs, start=1):
        cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
        lines: list[str] = []
        if cm:
            cnum = int(cm.group(1))
            cbody = objs.get(cnum, b"")
            sm = re.search(rb"stream\r?\n(.*?)\r?\nendstream", cbody, re.S)
            if sm is None and cbody:
                raise PDFCorruptedError(
                    f"PDF is corrupted or malformed: unreadable content stream on page {idx}"
                )
            if sm:
                for tm in _TJ_RE.finditer(sm.group(1)):
                    lines.append(_unescape(tm.group(1)).decode("utf-8", "replace"))
        pages.append(ParsedPage(page_number=idx, lines=lines))
    return pages


def page_text(page: ParsedPage) -> str:
    return "\n".join(page.lines)


def document_text(pages: list[ParsedPage]) -> str:
    """Join page texts with form-feed, the classic pdftotext convention."""
    return "\f".join(page_text(p) for p in pages)


# ---------------------------------------------------------------------------
# Deterministic page raster
# ---------------------------------------------------------------------------

_MARGIN = 40
_LINE_H = 22
_GLYPH_H = 16
_GLYPH_W = 8


# One template per geometry per process — warm actor state.  A plain
# dict, NOT functools.lru_cache: an lru_cache wrapper object in module
# globals pickles by reference (it is neither a function nor a class),
# which breaks cloudpickle by-value shipping of this module to Ray
# workers that don't have the repo on sys.path.
_TEMPLATES: dict[tuple[int, int, int, int], PageTemplate] = {}


def _template(width: int, height: int, background: int, dpi: int) -> PageTemplate:
    key = (width, height, background, dpi)
    tpl = _TEMPLATES.get(key)
    if tpl is None:
        tpl = _TEMPLATES[key] = PageTemplate(width, height, background, dpi)
    return tpl


def render_page(lines: list[str], cfg: ExtractConfig) -> bytes:
    """Render a page's text lines into a W x H grayscale PNG.

    A deterministic stand-in for the ImageMagick raster: white background
    (``-background white``), fixed extent (``-resize/-extent WxH!``),
    content drawn as per-character shade blocks derived purely from the
    text bytes.  Exact geometry and DPI metadata are the asserted
    invariants (test_imagemagick.py:77-85).

    Uses the segment-cached PNG path (kernel/png.py): background row runs
    are pre-deflated once per worker and reused; only text-band scanlines
    are compressed per page, keeping the stage compute-bound instead of
    memory-bandwidth-bound at high parallelism.
    """
    h, w = cfg.page_height, cfg.page_width
    tpl = _template(w, h, cfg.background, cfg.dpi)
    max_chars = (w - 2 * _MARGIN) // _GLYPH_W
    bg = bytes([cfg.background])

    segs = []
    prev_end = 0
    y = _MARGIN
    for line in lines:
        if y + _GLYPH_H > h - _MARGIN:
            break
        data = line.encode("utf-8", "replace")[:max_chars]
        if data:
            if y > prev_end:
                segs.append(tpl.bg_rows(y - prev_end))
            codes = np.frombuffer(data, dtype=np.uint8)
            shades = (codes % 160).astype(np.uint8)  # dark-ish, text-derived
            block = np.repeat(shades, _GLYPH_W).tobytes()
            row = b"\x00" + bg * _MARGIN + block + bg * (w - _MARGIN - len(block))
            segs.append(tpl.band(row, _GLYPH_H))
            prev_end = y + _GLYPH_H
        y += _LINE_H
    if prev_end < h:
        segs.append(tpl.bg_rows(h - prev_end))
    return tpl.assemble(segs)
