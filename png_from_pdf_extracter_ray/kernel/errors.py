"""Error taxonomy for the extraction kernel.

Mirrors the reference converter's stderr classification
(/root/reference/src/services/pdf_converter.py:100-139):
password/encrypted → PDFPasswordProtectedError (:104-108), corrupt/invalid
→ PDFCorruptedError (:110-116), generic/timeout/zero-output →
PDFConversionError (:118-139).  Additional classes cover the entity
validation rules the reference enforces at construction time
(/root/reference/src/models/email_message.py:27-34 non-empty bytes;
/root/reference/src/models/pdf_attachment.py:30-31 size cap).

In the pipeline these are *data*, not control flow: every kernel error is
caught and becomes a dead-letter row with ``status="failed"``,
``error_type=<class name>``, ``error_msg=<str(exc)>`` — the analog of the
failed email staying in the INBOX with an error notification
(/root/reference/src/services/job_processor.py:155-179).
"""

from __future__ import annotations


class ExtractionError(Exception):
    """Base class for all per-document extraction failures."""


class PDFConversionError(ExtractionError):
    """Generic PDF conversion failure (incl. timeout / zero pages)."""


class PDFPasswordProtectedError(PDFConversionError):
    """PDF is password-protected or encrypted."""


class PDFCorruptedError(PDFConversionError):
    """PDF is corrupted or malformed."""


class EmptyPayloadError(ExtractionError):
    """Payload is empty (≈ EmailMessage raw_bytes must be non-empty)."""


class PayloadTooLargeError(ExtractionError):
    """Payload exceeds the configured size cap (≈ 100 MB attachment cap)."""


class HTMLExtractionError(ExtractionError):
    """HTML branch failed to produce a document."""


class UnsupportedImageError(ValueError):
    """Image format recognized but not decodable without an imaging
    library (lives here — not in kernel/image.py — so the image/jpeg/gif
    decoders can all import it without forming an import cycle)."""
