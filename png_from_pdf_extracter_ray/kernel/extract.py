"""The single-document extraction kernel — oracle AND distributed UDF.

``extract_one`` is the re-expression of the reference's per-email
lifecycle (/root/reference/src/services/job_processor.py:51-184):
validate → sniff/branch on payload type → stateful conversion producing
1→N page records → aggregate per document → emit-or-dead-letter.  One
logical document in, one output row out; every kernel error becomes data
(``status="failed"`` + error taxonomy columns), never an exception — the
analog of "failed email stays in INBOX and an error notification is sent"
(job_processor.py:155-179).

Status values (≈ JobStatus, /root/reference/src/models/processing_job.py:12-18
plus the no-PDF short-circuit at job_processor.py:96-101):
- ``completed`` — text (and pages, for PDFs) extracted;
- ``skipped``   — unsupported payload (≈ email with no PDF attachment:
  acknowledged, no reply);
- ``failed``    — dead-letter row carrying error_type/error_msg.
"""

from __future__ import annotations

import hashlib
import time
from typing import Any

from ..config import ExtractConfig
from . import pdf as pdfmod
from .errors import EmptyPayloadError, ExtractionError, PayloadTooLargeError
from .html_extract import extract_html
from .sanitize import sanitize_filename
from .sniff import CT_EMPTY, CT_HTML, CT_PDF, CT_UNKNOWN, sniff_content_type

STATUS_COMPLETED = "completed"
STATUS_SKIPPED = "skipped"
STATUS_FAILED = "failed"


def _empty_result(url: str, content_type: str) -> dict[str, Any]:
    return {
        "url": url,
        "content_type": content_type,
        "extracted_text": "",
        "spans": [],
        "pages": [],
        "title": "",
        "status": STATUS_COMPLETED,
        "error_type": "",
        "error_msg": "",
        "n_pages": 0,
        "n_spans": 0,
        "text_chars": 0,
        "duration_ms": 0.0,
        "content_hash": "",
    }


def content_hash(text: str) -> str:
    """Stable per-document fingerprint of the extracted text (lineage/dedup)."""
    return hashlib.blake2b(text.encode("utf-8"), digest_size=16).hexdigest()


def extract_one(url: str, payload: bytes | None, cfg: ExtractConfig) -> dict[str, Any]:
    """Extract one document.  Pure, deterministic in everything except
    ``duration_ms`` (a metric, not part of the byte-identity invariant)."""
    t0 = time.perf_counter()
    ct = sniff_content_type(payload)
    out = _empty_result(url, ct)
    try:
        if ct == CT_EMPTY:
            raise EmptyPayloadError("payload is empty")
        assert payload is not None
        if len(payload) > cfg.max_payload_bytes:
            raise PayloadTooLargeError(
                f"payload is {len(payload)} bytes, cap is {cfg.max_payload_bytes}"
            )
        if ct == CT_HTML:
            doc = extract_html(payload, cfg)
            out["extracted_text"] = doc.text
            out["title"] = doc.title
            out["spans"] = [
                {"start": s.start, "end": s.end, "path": s.path, "kind": s.kind}
                for s in doc.spans
            ]
        elif ct == CT_PDF:
            pages = pdfmod.parse_pdf(payload, cfg)
            out["extracted_text"] = pdfmod.document_text(pages)
            # Span per page: path "page:N", offsets into the joined text.
            offset = 0
            spans = []
            for p in pages:
                ptext = pdfmod.page_text(p)
                start = offset + (1 if spans else 0)  # "\f" joiner
                end = start + len(ptext)
                spans.append(
                    {"start": start, "end": end, "path": f"page:{p.page_number}", "kind": "pdf_page"}
                )
                offset = end
            out["spans"] = spans
            if cfg.render_pages:
                # {sanitized}_pdf-%03d.png naming + 1-indexed sequential
                # pages (pdf_converter.py:72,141-158).  %03d counts from
                # 000 for page 1, exactly like the ImageMagick pattern.
                prefix = sanitize_filename(url.rstrip("/").rsplit("/", 1)[-1] or "unnamed")
                deadline = t0 + cfg.timeout_s
                page_rows = []
                for p in pages:
                    if time.perf_counter() > deadline:
                        raise pdfmod.PDFConversionError(
                            f"PDF conversion timed out after {cfg.timeout_s} seconds"
                        )
                    png = pdfmod.render_page(p.lines, cfg)
                    page_rows.append(
                        {
                            "page_number": p.page_number,
                            "png": png,
                            "width": cfg.page_width,
                            "height": cfg.page_height,
                            "dpi": cfg.dpi,
                            "filename": f"{prefix}_pdf-{p.page_number - 1:03d}.png",
                        }
                    )
                out["pages"] = page_rows
            out["n_pages"] = len(pages)
        else:  # CT_UNKNOWN — ≈ no-PDF short-circuit (job_processor.py:96-101)
            out["status"] = STATUS_SKIPPED
    except ExtractionError as exc:
        out["status"] = STATUS_FAILED
        out["error_type"] = type(exc).__name__
        out["error_msg"] = str(exc)
        out["extracted_text"] = ""
        out["spans"] = []
        out["pages"] = []
        out["n_pages"] = 0

    out["n_spans"] = len(out["spans"])
    out["text_chars"] = len(out["extracted_text"])
    out["content_hash"] = content_hash(out["extracted_text"])
    out["duration_ms"] = (time.perf_counter() - t0) * 1000.0
    return out
