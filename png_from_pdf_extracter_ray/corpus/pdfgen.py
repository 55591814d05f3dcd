"""Deterministic minimal-PDF generator (well-formed, uncompressed).

Emits spec-conformant PDF 1.4 bytes: catalog → page tree → page objects
with uncompressed content streams of ``BT … (line) Tj … ET`` text
operators, a Type1 font resource, an xref table and trailer.  Variants
cover the reference's full error taxonomy
(/root/reference/src/services/pdf_converter.py:100-139, exercised by
/root/reference/tests/unit/test_pdf_converter.py:65-189): encrypted
marker, truncated bytes, garbage body, zero pages.
"""

from __future__ import annotations


def _escape(s: str) -> bytes:
    return (
        s.encode("utf-8", "replace")
        .replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
    )


def make_pdf(
    pages: list[list[str]],
    *,
    encrypted: bool = False,
    corrupt: str | None = None,  # None | "truncate" | "garbage" | "noeof"
) -> bytes:
    """Build a PDF whose page i contains ``pages[i]`` as text lines."""
    n_pages = len(pages)
    # Object numbering: 1=catalog, 2=page tree, 3=font,
    # then per page i: (4+2i)=page, (5+2i)=contents.
    objects: list[tuple[int, bytes]] = []
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    objects.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    objects.append(
        (2, b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages)
    )
    objects.append(
        (3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    )
    for i, lines in enumerate(pages):
        page_num = 4 + 2 * i
        content_num = 5 + 2 * i
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            if j:
                ops.append(b"0 -14 Td")
            ops.append(b"(" + _escape(line) + b") Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        objects.append(
            (
                page_num,
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
                % content_num,
            )
        )
        objects.append(
            (
                content_num,
                b"<< /Length %d >>\nstream\n" % len(stream) + stream + b"\nendstream",
            )
        )

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num, body in objects:
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num + body + b"\nendobj\n"

    xref_at = len(buf)
    max_obj = max(offsets) if offsets else 0
    buf += b"xref\n0 %d\n" % (max_obj + 1)
    buf += b"0000000000 65535 f \n"
    for num in range(1, max_obj + 1):
        buf += b"%010d 00000 n \n" % offsets.get(num, 0)
    trailer = b"trailer\n<< /Size %d /Root 1 0 R" % (max_obj + 1)
    if encrypted:
        trailer += b" /Encrypt 99 0 R"
    trailer += b" >>\nstartxref\n%d\n%%%%EOF\n" % xref_at
    buf += trailer

    out = bytes(buf)
    if corrupt == "truncate":
        out = out[: max(16, len(out) // 3)]
    elif corrupt == "garbage":
        out = b"%PDF-1.4\n" + b"\x00\xff" * 64 + b"\n%%EOF\n"
    elif corrupt == "noeof":
        out = out.replace(b"%%EOF", b"")
    return out


def lines_for_page(doc_id: int, variant: int, page_no: int, words: list[str]) -> list[str]:
    """Deterministic text lines for one synthetic PDF page."""
    if not words:
        words = ["lorem"]
    lines = []
    for row in range(6):
        start = (doc_id * 31 + variant * 7 + page_no * 13 + row * 3) % len(words)
        picked = [words[(start + w) % len(words)] for w in range(8)]
        lines.append(f"p{page_no} l{row}: " + " ".join(picked))
    return lines
