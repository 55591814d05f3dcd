"""Synthesize the Common-Crawl-style ``pages`` table from ``documents``.

The driver testdata has no pages table, so one is derived
deterministically (FIXTURES.md §1, §4): each ``documents`` row fans out
into ``expand`` page rows whose payload mix is ~70% HTML, ~20% PDF, ~10%
adversarial (empty / truncated PDF / encrypted PDF / zero-page PDF /
unknown magic), with a heavy tail of mega-PDFs for skew and ~5% injected
duplicate urls (differing ``warc_ts`` and payload) to exercise the
groupby-url dedup.  Everything is a pure function of (doc_id, variant) —
no RNG state, so any subset of rows can be regenerated independently and
the table is identical across processes and partitionings.

The per-batch function is used both inside Ray ``map_batches`` (pages
built in parallel, streaming) and directly on pyarrow tables in tests.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

from ..kernel.schema import PAGES_SCHEMA
from ..kernel.sniff import MULTIPART_BOUNDARY, MULTIPART_MAGIC
from .htmlgen import make_html
from .pdfgen import lines_for_page, make_pdf

_BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

CORPUS_VERSION = 2  # bump when payload generation changes (invalidates caches)

ADVERSARIAL_KINDS = ["empty", "truncated_pdf", "encrypted_pdf", "zero_page_pdf", "unknown_magic"]


def _h(key: str) -> int:
    return int.from_bytes(hashlib.blake2b(key.encode(), digest_size=8).digest(), "big")


def page_url(doc_id: int, variant: int) -> str:
    site = _h(f"site:{doc_id}:{variant}") % 97
    return f"https://site{site}.example/doc/{doc_id}-{variant}"


def _pdf_page_count(h: int) -> int:
    """Mostly 1-3 pages; deterministic heavy tail of mega-docs (skew)."""
    r = h % 1000
    if r < 700:
        return 1 + h % 3
    if r < 930:
        return 4 + h % 5
    if r < 990:
        return 12 + h % 8
    return 40 + h % 11  # the "50-page PDF" tail (README.md:140)


def make_payload(doc_id: int, variant: int, text: str, lang: str) -> bytes:
    """Deterministic payload bytes for one page row."""
    h = _h(f"kind:{doc_id}:{variant}")
    kind = h % 10
    words = text.split() or ["lorem"]
    if kind < 7:  # HTML (a slice of which are multipart containers)
        payload, _ = make_html(doc_id, variant, text, lang)
        if h % 100 < 4:  # ~3-4%: multipart container (html part + pdf part)
            pdf_part = make_pdf([lines_for_page(doc_id, variant, 1, words)])
            return (
                MULTIPART_MAGIC
                + payload
                + MULTIPART_BOUNDARY
                + pdf_part
            )
        return payload
    if kind < 9:  # PDF
        n = _pdf_page_count(_h(f"npages:{doc_id}:{variant}"))
        pages = [lines_for_page(doc_id, variant, p, words) for p in range(1, n + 1)]
        return make_pdf(pages)
    # adversarial
    adv = ADVERSARIAL_KINDS[h // 10 % len(ADVERSARIAL_KINDS)]
    if adv == "empty":
        return b""
    if adv == "truncated_pdf":
        return make_pdf([lines_for_page(doc_id, variant, 1, words)], corrupt="truncate")
    if adv == "encrypted_pdf":
        return make_pdf([lines_for_page(doc_id, variant, 1, words)], encrypted=True)
    if adv == "zero_page_pdf":
        return make_pdf([])
    return b"\x00BINARYGARBAGE" + str(h).encode()


def _ts_us(doc_id: int, variant: int, dup_no: int = 0) -> int:
    jitter = _h(f"ts:{doc_id}:{variant}:{dup_no}") % 86_400_000_000
    return _BASE_TS_US + (doc_id * 257 + variant * 13) * 1_000_000 + jitter


def pages_rows_for_doc(
    doc_id: int, text: str, lang: str, expand: int, include_html: bool = True
) -> dict[str, list]:
    """All pages rows derived from one documents row (incl. duplicates).

    ``include_html=False`` skips payload generation (PDF/HTML bytes are
    by far the dominant synthesis cost) for consumers that only need the
    slim ``(url, warc_ts, text, lang)`` columns — url/ts/text derivation
    is untouched, so the slim rows are exactly the full rows minus the
    ``html`` column."""
    urls, tss, payloads, texts, langs = [], [], [], [], []
    for v in range(expand):
        url = page_url(doc_id, v)
        urls.append(url)
        tss.append(_ts_us(doc_id, v, 0))
        if include_html:
            payloads.append(make_payload(doc_id, v, text, lang))
        texts.append(text)
        langs.append(lang)
        if _h(f"dup:{doc_id}:{v}") % 20 == 0:  # ~5%: same url, later ts, drifted payload
            urls.append(url)
            tss.append(_ts_us(doc_id, v, 1))
            if include_html:
                payloads.append(make_payload(doc_id, v + 100_000, text + " recrawl drift", lang))
            texts.append(text + " recrawl drift")
            langs.append(lang)
    return {"url": urls, "warc_ts": tss, "html": payloads, "text": texts, "lang": langs}


def pages_from_documents_batch(
    batch: pa.Table, expand: int = 4, include_html: bool = True
) -> pa.Table:
    """documents batch (doc_id, text, lang) → pages batch.  map_batches UDF.

    ``include_html=False`` emits the slim 4-column table (no payload
    bytes built or shipped) for url/ts/text-only consumers."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    cols: dict[str, list] = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for doc_id, text, lang in zip(doc_ids, texts, langs):
        rows = pages_rows_for_doc(doc_id, text or "", lang or "", expand, include_html)
        for k in cols:
            cols[k].extend(rows[k])
    arrays = [
        pa.array(cols["url"], pa.string()),
        pa.array(cols["warc_ts"], pa.timestamp("us")),
        pa.array(cols["html"], pa.binary()),
        pa.array(cols["text"], pa.string()),
        pa.array(cols["lang"], pa.string()),
    ]
    if not include_html:
        slim = [f for f in PAGES_SCHEMA if f.name != "html"]
        return pa.Table.from_arrays(
            [a for a, f in zip(arrays, PAGES_SCHEMA) if f.name != "html"],
            schema=pa.schema(slim),
        )
    return pa.Table.from_arrays(arrays, schema=PAGES_SCHEMA)


def build_pages_parquet(sf_dir: str, out_dir: str, expand: int = 4) -> str:
    """Materialize the synthetic pages table as partitioned parquet (Ray).

    Build cost is kept off the benchmarked path: bench/tests call this
    once per (sf, expand) and reuse the files.
    """
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    done_marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done_marker):
        return out_dir
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    ds.map_batches(
        lambda b: pages_from_documents_batch(b, expand=expand),
        batch_format="pyarrow",
        batch_size=64,
    ).write_parquet(out_dir)
    with open(done_marker, "w") as f:
        f.write("ok")
    return out_dir
