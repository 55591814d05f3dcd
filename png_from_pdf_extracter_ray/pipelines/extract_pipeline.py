"""The flagship extraction pipeline.

Distributed re-expression of the reference's document lifecycle
(/root/reference/src/services/job_processor.py:51-184):

    pages source → lang whitelist filter (≈ sender whitelist)
    → groupby-url dedup, keep min warc_ts (≈ the INBOX seen-set)
    → ExtractWorker actor pool (sniff → branch → extract → dead-letter)
    → slim result (pages binaries optional) → parquet sink (≈ SMTP reply)

Dedup runs BEFORE extraction so duplicate documents never pay the heavy
kernel — the shuffle moves raw payload bytes once; extraction output
(with PNG rasters, typically larger than input) is never shuffled.

Stage sizing: the extract pool autoscales ``(2, cpus-2)`` with
``num_cpus=1`` per actor and a small ``batch_size`` — per-document cost
is highly skewed (a mega-PDF is ~30× a 1-pager, README.md:138-140), so
small batches keep stragglers short and let the pool rebalance; the
remaining CPUs keep the read/synthesis and write stages fed.
"""

from __future__ import annotations

import ray
import ray.data as rd

from ..config import DEFAULT_CONFIG, ExtractConfig
from ..sources.pages_source import read_pages, synthesize_pages
from ..stages.dedup import dedup_keep_first
from ..stages.extract_stage import ExtractWorker
from ..stages.filters import filter_lang

# Columns cheap enough to return to a driver / write everywhere; the
# heavyweight ones (extracted_text, spans, pages) are kept only when the
# consumer asks for them.
SUMMARY_COLUMNS = [
    "url",
    "warc_ts",
    "lang",
    "content_type",
    "status",
    "error_type",
    "n_pages",
    "n_spans",
    "text_chars",
    "content_hash",
]


def _auto_concurrency() -> tuple[int, int]:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return (2, max(2, cpus - 2))


def extract_stage(
    pages: rd.Dataset,
    cfg: ExtractConfig | None = None,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 16,
) -> rd.Dataset:
    """Attach the actor-pool extraction stage to a pages dataset."""
    cfg = cfg or DEFAULT_CONFIG
    return pages.map_batches(
        ExtractWorker,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or _auto_concurrency(),
        num_cpus=1,
    )


def extract_pipeline(
    pages: rd.Dataset,
    cfg: ExtractConfig | None = None,
    *,
    dedup: bool = True,
    num_buckets: int = 64,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 16,
    summary_only: bool = False,
) -> rd.Dataset:
    """Full pipeline over an existing pages dataset."""
    cfg = cfg or DEFAULT_CONFIG
    ds = filter_lang(pages, cfg.lang_allow)
    if dedup:
        ds = dedup_keep_first(ds, key="url", order_col="warc_ts", num_buckets=num_buckets)
    ds = extract_stage(ds, cfg, concurrency=concurrency, batch_size=batch_size)
    if summary_only:
        ds = ds.select_columns(SUMMARY_COLUMNS)
    return ds


def flagship(
    sf_dir: str,
    cfg: ExtractConfig | None = None,
    *,
    expand: int = 4,
    pages_path: str | None = None,
    summary_only: bool = True,
    dedup: bool = True,
    num_buckets: int = 64,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 16,
) -> rd.Dataset:
    """Flagship: synthetic (or pre-built) pages → extraction → summary."""
    pages = (
        read_pages(pages_path)
        if pages_path
        else synthesize_pages(sf_dir, expand=expand)
    )
    return extract_pipeline(
        pages,
        cfg,
        dedup=dedup,
        num_buckets=num_buckets,
        concurrency=concurrency,
        batch_size=batch_size,
        summary_only=summary_only,
    )
