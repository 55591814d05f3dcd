"""Content-type sniffing: magic-byte dispatch on the binary payload.

This is the branch point of the pipeline — the analog of the reference's
MIME walk deciding whether a part is a PDF attachment
(/root/reference/src/services/job_processor.py:186-221).  ``%PDF-`` is the
PDF magic (same prefix ImageMagick/GhostScript key on); anything whose
first non-whitespace byte opens a tag (including ``<!doctype``/comments)
is HTML; everything else is unknown.
"""

from __future__ import annotations

PDF_MAGIC = b"%PDF-"
MULTIPART_MAGIC = b"=MULTIPART/1.0\n"
MULTIPART_BOUNDARY = b"\n--PART-BOUNDARY--\n"

CT_PDF = "pdf"
CT_HTML = "html"
CT_MULTIPART = "multipart"
CT_UNKNOWN = "unknown"
CT_EMPTY = "empty"


def sniff_content_type(payload: bytes | None) -> str:
    if not payload:
        return CT_EMPTY
    if payload.startswith(PDF_MAGIC):
        return CT_PDF
    if payload.startswith(MULTIPART_MAGIC):
        return CT_MULTIPART
    head = payload[:512].lstrip(b" \t\r\n\f\x00")
    if head[:1] == b"<":
        return CT_HTML
    return CT_UNKNOWN


def split_multipart(payload: bytes) -> list[bytes]:
    """Split a multipart container into its part payloads.

    The corpus's stand-in for the reference's MIME attachment walk
    (/root/reference/src/services/job_processor.py:186-221): one logical
    document carrying 0..n nested binary payloads.
    """
    body = payload[len(MULTIPART_MAGIC):]
    return [p for p in body.split(MULTIPART_BOUNDARY) if p]
