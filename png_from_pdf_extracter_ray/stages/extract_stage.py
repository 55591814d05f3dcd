"""The extraction stage: an actor-pool ``map_batches`` over Arrow batches.

``ExtractWorker`` is the Ray analog of the reference's warm converter
service (/root/reference/src/services/pdf_converter.py:33-48: geometry/
timeout resolved once per process) plus the per-email orchestration
(/root/reference/src/services/job_processor.py:51-184): state is built
once per actor in ``__init__``; each ``__call__`` handles one Arrow batch
of documents, branching per row on the sniffed content type and emitting
the full extracted/dead-letter row — errors are data, so a poison row can
never kill (or be double-processed by) a Ray task retry.

The per-row body is a Python loop by necessity — DOM/PDF parsing is
per-document work, exactly like the reference's per-email kernel — but
all column assembly is Arrow, input batches arrive zero-copy, and the
heavy input column (``html``) is dropped from the output so it never
travels further down the pipeline.
"""

from __future__ import annotations

import threading
from typing import Any, Callable

import pyarrow as pa

from ..config import DEFAULT_CONFIG, ExtractConfig
from ..kernel.extract import extract_one, timeout_row
from ..kernel.schema import EXTRACTED_SCHEMA, PAGE_TYPE, SPAN_TYPE


def results_to_table(
    results: list[dict[str, Any]],
    warc_ts: pa.ChunkedArray | pa.Array,
    langs: pa.ChunkedArray | pa.Array,
) -> pa.Table:
    """Assemble kernel result dicts into an EXTRACTED_SCHEMA Arrow table."""
    return pa.Table.from_arrays(
        [
            pa.array([r["url"] for r in results], pa.string()),
            warc_ts.combine_chunks() if isinstance(warc_ts, pa.ChunkedArray) else warc_ts,
            langs.combine_chunks() if isinstance(langs, pa.ChunkedArray) else langs,
            pa.array([r["content_type"] for r in results], pa.string()),
            pa.array([r["extracted_text"] for r in results], pa.large_string()),
            pa.array([r["title"] for r in results], pa.string()),
            pa.array([r["spans"] for r in results], pa.list_(SPAN_TYPE)),
            pa.array([r["pages"] for r in results], pa.list_(PAGE_TYPE)),
            pa.array([r["status"] for r in results], pa.string()),
            pa.array([r["error_type"] for r in results], pa.string()),
            pa.array([r["error_msg"] for r in results], pa.string()),
            pa.array([r["n_payloads"] for r in results], pa.int32()),
            pa.array([r["n_pages"] for r in results], pa.int32()),
            pa.array([r["n_spans"] for r in results], pa.int32()),
            pa.array([r["text_chars"] for r in results], pa.int64()),
            pa.array([r["duration_ms"] for r in results], pa.float64()),
            pa.array([r["content_hash"] for r in results], pa.string()),
        ],
        schema=EXTRACTED_SCHEMA,
    )


def extract_batch(
    batch: pa.Table, cfg: ExtractConfig, cancel: "threading.Event | None" = None
) -> pa.Table:
    """Extract every row of a pages batch (shared by worker and oracle)."""
    urls = batch["url"].to_pylist()
    payloads = batch["html"].to_pylist()
    n = len(urls)
    warc_ts = (
        batch["warc_ts"]
        if "warc_ts" in batch.schema.names
        else pa.nulls(n, pa.timestamp("us"))
    )
    langs = batch["lang"] if "lang" in batch.schema.names else pa.nulls(n, pa.string())
    results = [extract_one(u, p, cfg, cancel=cancel) for u, p in zip(urls, payloads)]
    return results_to_table(results, warc_ts, langs)


_TIMED_OUT = object()


def _run_with_timeout(
    fn: Callable[[], Any], timeout_s: float, cancel: "threading.Event | None" = None
) -> Any:
    """Run ``fn`` in a daemon thread; return its result or ``_TIMED_OUT``.

    On timeout the thread is ABANDONED (daemon, so it never blocks actor
    exit); the caller continues, which is the "dead-letter without
    killing the actor" semantics.  If ``cancel`` is given it is SET on
    timeout — the kernel's render loop checks it cooperatively, so an
    abandoned thread exits at its next check instead of running the rest
    of the batch to completion while the caller re-extracts the same
    rows (a poison batch would otherwise do ~2× the work concurrently
    and accumulate live threads in a long-lived actor).  Caveat vs the
    reference's subprocess kill: a wedged pure-Python loop yields the
    GIL every switch interval so the timeout fires on schedule, but a
    single non-yielding C call (e.g. one catastrophic regex match) would
    also starve this watchdog — the kernel's own parsers are
    bounded-iteration Python loops with cooperative deadlines, so that
    mode is out of contract.
    """
    box: dict[str, Any] = {}

    def target() -> None:
        try:
            box["v"] = fn()
        except BaseException as e:  # noqa: BLE001 — re-raised in the caller
            box["e"] = e

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        if cancel is not None:
            cancel.set()
        return _TIMED_OUT
    if "e" in box:
        # propagate infrastructure errors with their real type/traceback
        # (only kernel-taxonomy errors become dead-letter rows, and those
        # never escape extract_one)
        raise box["e"]
    return box["v"]


class ExtractWorker:
    """Callable class for ``map_batches`` — one warm actor per pool slot.

    ``wall_clock_guard`` (default on) re-creates the reference's
    per-document wall-clock timeout (pdf_converter.py:96) without the
    per-row thread overhead in the common path: the whole batch runs
    under one budget of ``timeout_s + per_doc_grace_s × n_rows``; only
    if that trips does the batch re-run document-by-document, each under
    its own ``timeout_s``, and the wedged document becomes a
    ``status="failed", error_type="Timeout"`` dead-letter row.  The
    kernel is deterministic, so the re-run reproduces the non-poison
    rows byte-identically.  The actor survives (poison rows are data).
    """

    def __init__(
        self,
        cfg: ExtractConfig | None = None,
        wall_clock_guard: bool = True,
        per_doc_grace_s: float = 1.0,
    ) -> None:
        self.cfg = cfg or DEFAULT_CONFIG
        self.guard = wall_clock_guard
        self.grace = per_doc_grace_s

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.guard:
            return extract_batch(batch, self.cfg)
        budget = self.cfg.timeout_s + self.grace * batch.num_rows
        cancel = threading.Event()
        out = _run_with_timeout(
            lambda: extract_batch(batch, self.cfg, cancel=cancel), budget, cancel
        )
        if out is not _TIMED_OUT:
            return out
        return self._per_document(batch)

    def _per_document(self, batch: pa.Table) -> pa.Table:
        """Poison path: isolate the wedged document(s) one by one."""
        urls = batch["url"].to_pylist()
        payloads = batch["html"].to_pylist()
        n = len(urls)
        warc_ts = (
            batch["warc_ts"]
            if "warc_ts" in batch.schema.names
            else pa.nulls(n, pa.timestamp("us"))
        )
        langs = batch["lang"] if "lang" in batch.schema.names else pa.nulls(n, pa.string())
        results = []
        for u, p in zip(urls, payloads):
            cancel = threading.Event()
            r = _run_with_timeout(
                lambda u=u, p=p, c=cancel: extract_one(u, p, self.cfg, cancel=c),
                self.cfg.timeout_s,
                cancel,
            )
            results.append(timeout_row(u, p, self.cfg) if r is _TIMED_OUT else r)
        return results_to_table(results, warc_ts, langs)


def oracle_extract_table(pages: pa.Table, cfg: ExtractConfig | None = None) -> pa.Table:
    """Single-process oracle: the exact same kernel over one Arrow table.

    Tests compare this byte-for-byte against the distributed output —
    the re-expression of the reference's per-conversion assertions as
    per-row golden comparisons (SURVEY.md §5).
    """
    return extract_batch(pages, cfg or DEFAULT_CONFIG)
