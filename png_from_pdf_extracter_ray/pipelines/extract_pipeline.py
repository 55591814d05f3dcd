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
    "n_payloads",
    "n_pages",
    "n_spans",
    "text_chars",
    "content_hash",
]


def _auto_concurrency() -> int:
    """Fixed pool of (cpus - 2): an autoscaling (min, max) pool ramps up
    too slowly for bounded batch runs — by the time it reaches max the
    wave is half done.  Two CPUs are left for the read and write stages
    so the pool doesn't starve them (pipeline would serialize)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    # Never reserve every CPU: a pool that fills the cluster starves the
    # read/write stages and the pipeline deadlocks (observed at cpus=2).
    return max(1, cpus - 2)


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
    dedup: bool | str = True,
    num_buckets: int = 64,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 16,
    summary_only: bool = False,
    slim_pages: rd.Dataset | None = None,
    shuffle_barrier: bool = True,
) -> rd.Dataset:
    """Full pipeline over an existing pages dataset.

    ``dedup``: ``"shuffle"``/True — hash-bucket payload shuffle (exact at
    any scale); ``"broadcast"`` — winner map computed on a slim
    (url, warc_ts) projection and broadcast, payloads never shuffled
    (right when distinct urls fit a worker's memory; ``slim_pages`` lets
    the caller supply a column-pruned read so the winner pass doesn't
    decode payloads); falsy — no dedup.

    ``shuffle_barrier`` (shuffle mode only): materialize the deduped
    stream BEFORE attaching the extraction pool.  Without it the actor
    pool's CPU reservation (cpus-2) is held while the payload sort runs,
    so the all-to-all executes on the ~2 leftover CPUs while the actors
    idle — measured 83 s without vs 53 s with the barrier at 32 CPUs,
    sf0.1 ×128 (broadcast mode: 35 s).  The cost is
    holding the deduped payload wave in the object store (it spills past
    memory), which is the standard shuffle/compute wave split.
    """
    cfg = cfg or DEFAULT_CONFIG
    ds = filter_lang(pages, cfg.lang_allow)
    if dedup == "broadcast":
        from ..stages.dedup import compute_winners, dedup_keep_first_broadcast

        slim = slim_pages if slim_pages is not None else ds.select_columns(["url", "warc_ts"])
        winners = compute_winners(slim, key="url", order_col="warc_ts")
        ds = dedup_keep_first_broadcast(ds, winners, key="url", order_col="warc_ts")
    elif dedup:
        ds = dedup_keep_first(ds, key="url", order_col="warc_ts", num_buckets=num_buckets)
        if shuffle_barrier:
            ds = ds.materialize()
    ds = extract_stage(ds, cfg, concurrency=concurrency, batch_size=batch_size)
    if summary_only:
        ds = ds.select_columns(SUMMARY_COLUMNS)
    return ds


def extract_pipeline_size_bucketed(
    pages_factory,  # Callable[[], rd.Dataset] — called once per bucket
    cfg: ExtractConfig | None = None,
    *,
    threshold_bytes: int = 64 * 1024,
    concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    """Size-bucketed skew routing (north rule; SURVEY §4.3.2).

    The reference's per-document skew is ~30× (a 50-page PDF vs a
    1-pager, README.md:138-140); at cluster scale that skew becomes
    straggler tasks.  The stream is split by payload size: the small
    bucket runs with large batches, the large bucket with ``batch_size=1``
    and its own pool slice so one mega-document never holds up a wave —
    the distributed analog of "the 120 s timeout protects the loop".

    ``pages_factory`` is called once per bucket because a Ray Dataset
    re-executes its upstream per consumer; with a parquet-backed factory
    each branch is an independent column-pruned scan (cheap); with an
    expensive synthetic source prefer materializing the pages to parquet
    first.
    """
    import pyarrow.compute as pc

    cfg = cfg or DEFAULT_CONFIG

    def size_filter(keep_large: bool):  # noqa: ANN202
        def _f(batch):  # noqa: ANN001, ANN202
            sizes = pc.binary_length(pc.fill_null(batch["html"], b""))
            mask = (
                pc.greater_equal(sizes, threshold_bytes)
                if keep_large
                else pc.less(sizes, threshold_bytes)
            )
            return batch.filter(mask)

        return _f

    conc = concurrency or _auto_concurrency()
    if isinstance(conc, int):
        small_conc, large_conc = max(1, conc * 3 // 4), max(1, conc // 4)
    else:
        small_conc, large_conc = conc, conc

    small = (
        pages_factory()
        .map_batches(size_filter(False), batch_format="pyarrow")
        .map_batches(
            ExtractWorker,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=64,
            concurrency=small_conc,
            num_cpus=1,
        )
    )
    large = (
        pages_factory()
        .map_batches(size_filter(True), batch_format="pyarrow")
        .map_batches(
            ExtractWorker,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=1,  # one mega-doc per task: stragglers stay short
            concurrency=large_conc,
            num_cpus=1,
        )
    )
    return small.union(large)


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
