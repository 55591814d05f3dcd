"""The single-document extraction kernel — oracle AND distributed UDF.

``extract_one`` is the re-expression of the reference's per-email
lifecycle (/root/reference/src/services/job_processor.py:51-184):
validate → sniff/branch on payload type → stateful conversion producing
1→N page records → aggregate per document → emit-or-dead-letter.  One
logical document in, one output row out; every kernel error becomes data
(``status="failed"`` + error taxonomy columns), never an exception — the
analog of "failed email stays in INBOX and an error notification is sent"
(job_processor.py:155-179).

Multipart containers model the reference's 0..n-attachments-per-email
cardinality (1 email → 0..n PDFs → 1..n pages each, job_processor.py
:94,:109-146): each part is extracted like a top-level payload, texts and
pages are gathered into the single output row (≈ "all pages of all PDFs
of one email in a single reply"), ``n_payloads`` counts the processed
parts, and any part failure dead-letters the whole document (the
reference marks the whole job failed, :155-179).

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
from .sniff import (
    CT_EMPTY,
    CT_HTML,
    CT_MULTIPART,
    CT_PDF,
    sniff_content_type,
    split_multipart,
)

STATUS_COMPLETED = "completed"
STATUS_SKIPPED = "skipped"
STATUS_FAILED = "failed"


def content_hash(text: str) -> str:
    """Stable per-document fingerprint of the extracted text (lineage/dedup)."""
    return hashlib.blake2b(text.encode("utf-8"), digest_size=16).hexdigest()


def timeout_row(url: str, payload: bytes | None, cfg: ExtractConfig) -> dict[str, Any]:
    """Dead-letter row for a document whose extraction exceeded the
    wall-clock budget — the reference's subprocess-timeout outcome
    (/root/reference/src/services/pdf_converter.py:96) as data."""
    return {
        "url": url,
        "content_type": sniff_content_type(payload),
        "extracted_text": "",
        "spans": [],
        "pages": [],
        "title": "",
        "status": STATUS_FAILED,
        "error_type": "Timeout",
        "error_msg": f"extraction exceeded the wall-clock budget of {cfg.timeout_s} seconds",
        "n_payloads": 0,
        "n_pages": 0,
        "n_spans": 0,
        "text_chars": 0,
        "duration_ms": cfg.timeout_s * 1000.0,
        "content_hash": content_hash(""),
    }


def _extract_payload(
    url: str,
    payload: bytes,
    ct: str,
    cfg: ExtractConfig,
    deadline: float,
    part_idx: int | None = None,
    cancel: Any | None = None,
) -> dict[str, Any] | None:
    """Extract one (sub-)payload.  Returns None for unsupported types
    (≈ non-PDF attachment skipped during the MIME walk)."""
    if ct == CT_HTML:
        doc = extract_html(payload, cfg)
        prefix = "" if part_idx is None else f"part{part_idx}:"
        return {
            "text": doc.text,
            "title": doc.title,
            "spans": [
                {"start": s.start, "end": s.end, "path": prefix + s.path, "kind": s.kind}
                for s in doc.spans
            ],
            "pages": [],
            "n_pages": 0,
        }
    if ct == CT_PDF:
        pages = pdfmod.parse_pdf(payload, cfg)
        text = pdfmod.document_text(pages)
        path_prefix = "" if part_idx is None else f"part{part_idx}:"
        offset = 0
        spans = []
        for p in pages:
            ptext = pdfmod.page_text(p)
            start = offset + (1 if spans else 0)  # "\f" joiner
            end = start + len(ptext)
            spans.append(
                {
                    "start": start,
                    "end": end,
                    "path": f"{path_prefix}page:{p.page_number}",
                    "kind": "pdf_page",
                }
            )
            offset = end
        page_rows: list[dict[str, Any]] = []
        if cfg.render_pages:
            # {sanitized}_pdf-%03d.png naming + 1-indexed sequential pages
            # (pdf_converter.py:72,141-158); page numbering restarts per
            # payload exactly like per-attachment numbering in the
            # reference (PNGImage.page_number is per-PDF).
            base = sanitize_filename(url.rstrip("/").rsplit("/", 1)[-1] or "unnamed")
            if part_idx is not None:
                base = f"{base}_part{part_idx}"
            for p in pages:
                # ``cancel`` is the watchdog's cooperative abandon flag:
                # once the caller has given up on this thread its output
                # is discarded, so exiting early only saves CPU.
                if (cancel is not None and cancel.is_set()) or (
                    time.perf_counter() > deadline
                ):
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
                        "filename": f"{base}_pdf-{p.page_number - 1:03d}.png",
                    }
                )
        return {
            "text": text,
            "title": "",
            "spans": spans,
            "pages": page_rows,
            "n_pages": len(pages),
        }
    return None  # unsupported part type — skipped, like non-PDF attachments


def extract_one(
    url: str,
    payload: bytes | None,
    cfg: ExtractConfig,
    cancel: Any | None = None,
) -> dict[str, Any]:
    """Extract one document.  Pure, deterministic in everything except
    ``duration_ms`` (a metric, not part of the byte-identity invariant).
    ``cancel`` (a threading.Event-like) is only consulted to abandon
    work whose output the caller has already discarded."""
    t0 = time.perf_counter()
    deadline = t0 + cfg.timeout_s
    ct = sniff_content_type(payload)
    out: dict[str, Any] = {
        "url": url,
        "content_type": ct,
        "extracted_text": "",
        "spans": [],
        "pages": [],
        "title": "",
        "status": STATUS_COMPLETED,
        "error_type": "",
        "error_msg": "",
        "n_payloads": 0,
        "n_pages": 0,
        "n_spans": 0,
        "text_chars": 0,
        "duration_ms": 0.0,
        "content_hash": "",
    }
    try:
        if ct == CT_EMPTY:
            raise EmptyPayloadError("payload is empty")
        assert payload is not None
        if len(payload) > cfg.max_payload_bytes:
            raise PayloadTooLargeError(
                f"payload is {len(payload)} bytes, cap is {cfg.max_payload_bytes}"
            )
        if ct == CT_MULTIPART:
            parts = split_multipart(payload)
            results = []
            for i, part in enumerate(parts, start=1):
                pct = sniff_content_type(part)
                r = _extract_payload(url, part, pct, cfg, deadline, part_idx=i, cancel=cancel)
                if r is not None:
                    results.append(r)
            if not results:
                # ≈ email with no PDF attachments: acknowledged, no reply
                out["status"] = STATUS_SKIPPED
            else:
                texts, offset = [], 0
                for r in results:
                    start = offset + (2 if texts else 0)  # "\n\n" joiner
                    for s in r["spans"]:
                        s["start"] += start
                        s["end"] += start
                    out["spans"].extend(r["spans"])
                    out["pages"].extend(r["pages"])
                    out["n_pages"] += r["n_pages"]
                    texts.append(r["text"])
                    offset = start + len(r["text"])
                out["extracted_text"] = "\n\n".join(texts)
                out["title"] = next((r["title"] for r in results if r["title"]), "")
                out["n_payloads"] = len(results)
        else:
            r = _extract_payload(url, payload, ct, cfg, deadline, cancel=cancel)
            if r is None:
                out["status"] = STATUS_SKIPPED
            else:
                out["extracted_text"] = r["text"]
                out["title"] = r["title"]
                out["spans"] = r["spans"]
                out["pages"] = r["pages"]
                out["n_pages"] = r["n_pages"]
                out["n_payloads"] = 1
    except ExtractionError as exc:
        out["status"] = STATUS_FAILED
        out["error_type"] = type(exc).__name__
        out["error_msg"] = str(exc)
        out["extracted_text"] = ""
        out["spans"] = []
        out["pages"] = []
        out["n_pages"] = 0
        out["n_payloads"] = 0

    out["n_spans"] = len(out["spans"])
    out["text_chars"] = len(out["extracted_text"])
    out["content_hash"] = content_hash(out["extracted_text"])
    out["duration_ms"] = (time.perf_counter() - t0) * 1000.0
    return out
