"""Pages-table sources.

The engine's native input is a Parquet pages table
``(url, warc_ts, html, text, lang)`` (BASELINE.json ``input_hint``) —
the distributed analog of the reference's IMAP INBOX poll
(/root/reference/src/services/imap_service.py:136-210): one file group
≈ one poll batch of pending documents.

Two sources:
- ``read_pages(paths)`` — real parquet, with column pruning at the read;
- ``synthesize_pages(sf_dir, expand)`` — derive pages on the fly from the
  driver's ``documents`` table (streaming, no materialization), used by
  tests and the flagship entry at small scale.
"""

from __future__ import annotations

import os

import ray.data as rd

from ..corpus.synth import pages_from_documents_batch


def read_pages(paths: str | list[str], columns: list[str] | None = None) -> rd.Dataset:
    """Read a pages-table parquet; prune to the needed columns at the read."""
    return rd.read_parquet(paths, columns=columns)


def synthesize_pages(
    sf_dir: str,
    expand: int = 4,
    num_docs: int | None = None,
    doc_range: tuple[int, int] | None = None,
    include_html: bool = True,
) -> rd.Dataset:
    """documents.parquet → streaming synthetic pages dataset.

    ``doc_range=(lo, hi)`` selects a half-open doc_id shard — the unit of
    the partition/resume protocol (state/manifest.py).  The predicate is
    pushed into the parquet read, so a shard only scans its row groups.
    ``include_html=False`` skips payload-byte generation entirely for
    consumers that only need ``(url, warc_ts, text, lang)`` — the slim
    rows are identical to the full rows minus the ``html`` column.
    """
    import pyarrow.compute as pc

    filt = None
    if doc_range is not None:
        lo, hi = doc_range
        filt = (pc.field("doc_id") >= lo) & (pc.field("doc_id") < hi)
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
        filter=filt,
    )
    if num_docs is not None:
        ds = ds.limit(num_docs)
    return ds.map_batches(
        lambda b: pages_from_documents_batch(b, expand=expand, include_html=include_html),
        batch_format="pyarrow",
        batch_size=64,
    )
