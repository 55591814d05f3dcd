"""Arrow schemas for the pages input table and the extracted output table.

Input shape is fixed by BASELINE.json ``input_hint``; output re-expresses
the reference's entities (EmailMessage/PDFAttachment/PNGImage/
ProcessingJob, /root/reference/src/models/) as flat + list<struct> Arrow
columns — see SURVEY.md §1.2.
"""

from __future__ import annotations

import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

SPAN_TYPE = pa.struct(
    [
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("path", pa.string()),
        ("kind", pa.string()),
    ]
)

PAGE_TYPE = pa.struct(
    [
        ("page_number", pa.int32()),
        ("png", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("dpi", pa.int32()),
        ("filename", pa.string()),
    ]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("content_type", pa.string()),
        ("extracted_text", pa.large_string()),
        ("title", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("pages", pa.list_(PAGE_TYPE)),
        ("status", pa.string()),
        ("error_type", pa.string()),
        ("error_msg", pa.string()),
        ("n_payloads", pa.int32()),
        ("n_pages", pa.int32()),
        ("n_spans", pa.int32()),
        ("text_chars", pa.int64()),
        ("duration_ms", pa.float64()),
        ("content_hash", pa.string()),
    ]
)
