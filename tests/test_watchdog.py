"""Wall-clock watchdog: a wedged document dead-letters as
``error_type="Timeout"`` without killing the worker (the reference's
subprocess-timeout semantics, pdf_converter.py:96 — SURVEY §4.3.2)."""

from __future__ import annotations

import pyarrow as pa

from png_from_pdf_extracter_ray.config import ExtractConfig
from png_from_pdf_extracter_ray.stages.extract_stage import ExtractWorker

FAST_HTML = b"<html><head><title>ok</title></head><body><p>hello world</p></body></html>"
# big enough that parsing takes well over the 50 ms test budget
SLOW_HTML = (
    b"<html><body>"
    + b"".join(
        b"<div><p>the quick brown fox %d jumps over the lazy dog</p></div>" % i
        for i in range(60_000)
    )
    + b"</body></html>"
)


def _batch(rows: dict) -> pa.Table:
    return pa.Table.from_pydict(rows)


def test_wedged_document_dead_letters_as_timeout() -> None:
    cfg = ExtractConfig(timeout_s=0.05, render_pages=False)
    worker = ExtractWorker(cfg, wall_clock_guard=True, per_doc_grace_s=0.0)
    out = worker(
        _batch({"url": ["https://a/fast", "https://a/slow"], "html": [FAST_HTML, SLOW_HTML]})
    )
    rows = {r["url"]: r for r in out.to_pylist()}
    slow = rows["https://a/slow"]
    assert slow["status"] == "failed"
    assert slow["error_type"] == "Timeout"
    assert "wall-clock" in slow["error_msg"]
    # the innocent document in the same batch still extracts
    fast = rows["https://a/fast"]
    assert fast["status"] == "completed"
    assert "hello world" in fast["extracted_text"]


def test_worker_survives_poison_batch() -> None:
    cfg = ExtractConfig(timeout_s=0.05, render_pages=False)
    worker = ExtractWorker(cfg, wall_clock_guard=True, per_doc_grace_s=0.0)
    poisoned = worker(_batch({"url": ["https://a/slow"], "html": [SLOW_HTML]}))
    assert poisoned.to_pylist()[0]["error_type"] == "Timeout"
    # same worker instance processes the next batch normally
    ok = worker(_batch({"url": ["https://a/next"], "html": [FAST_HTML]}))
    assert ok.to_pylist()[0]["status"] == "completed"


def test_guard_off_matches_guarded_output_for_wellformed_docs() -> None:
    cfg = ExtractConfig(render_pages=False)
    guarded = ExtractWorker(cfg, wall_clock_guard=True)
    plain = ExtractWorker(cfg, wall_clock_guard=False)
    batch = _batch({"url": ["https://a/x"], "html": [FAST_HTML]})
    a = guarded(batch).drop_columns(["duration_ms"])
    b = plain(batch).drop_columns(["duration_ms"])
    assert a.equals(b)


def test_infrastructure_errors_propagate_with_real_type() -> None:
    """A non-timeout exception inside the guarded batch must surface as
    itself, not as KeyError('v') from the result box."""
    import pytest

    from png_from_pdf_extracter_ray.stages.extract_stage import (
        _TIMED_OUT,
        _run_with_timeout,
    )

    def boom() -> None:
        raise MemoryError("payload too large for worker heap")

    with pytest.raises(MemoryError, match="payload too large"):
        _run_with_timeout(boom, timeout_s=5.0)
    assert _run_with_timeout(lambda: 42, timeout_s=5.0) == 42
    assert _run_with_timeout(lambda: __import__("time").sleep(1), 0.05) is _TIMED_OUT


def test_cancel_flag_set_on_timeout_and_aborts_render_loop() -> None:
    """On timeout the watchdog sets the cooperative cancel event, and a
    kernel render loop that sees it exits early (the abandoned thread
    stops burning CPU instead of finishing a discarded batch)."""
    import threading

    from png_from_pdf_extracter_ray.kernel.extract import extract_one
    from png_from_pdf_extracter_ray.stages.extract_stage import (
        _TIMED_OUT,
        _run_with_timeout,
    )

    cancel = threading.Event()
    out = _run_with_timeout(
        lambda: __import__("time").sleep(1), 0.05, cancel
    )
    assert out is _TIMED_OUT
    assert cancel.is_set()

    # a pre-set cancel makes the PDF render loop bail out as a timeout
    # dead-letter instead of rendering every page
    from png_from_pdf_extracter_ray.corpus.pdfgen import make_pdf

    cfg = ExtractConfig(render_pages=True)
    pdf = make_pdf([["page one line"], ["page two line"], ["page three line"]])
    pre_set = threading.Event()
    pre_set.set()
    row = extract_one("https://a/doc.pdf", pdf, cfg, cancel=pre_set)
    assert row["status"] == "failed"
    assert row["error_type"] == "PDFConversionError"
