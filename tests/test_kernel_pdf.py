"""PDF branch: parse, page order, raster geometry, filenames, taxonomy.

Re-expresses the reference's converter assertions
(/root/reference/tests/unit/test_pdf_converter.py:65-217 and
/root/reference/tests/contract/test_imagemagick.py:25-143) as per-row
checks on the kernel output.
"""

import pytest

from png_from_pdf_extracter_ray.config import DEFAULT_CONFIG as CFG
from png_from_pdf_extracter_ray.config import ExtractConfig
from png_from_pdf_extracter_ray.corpus.pdfgen import lines_for_page, make_pdf
from png_from_pdf_extracter_ray.kernel.extract import extract_one
from png_from_pdf_extracter_ray.kernel.pdf import parse_pdf
from png_from_pdf_extracter_ray.kernel.png import read_png_dpi, read_png_size

WORDS = "alpha beta gamma delta epsilon zeta eta theta".split()


def _pdf(n_pages: int, **kw) -> bytes:
    return make_pdf([lines_for_page(1, 0, p, WORDS) for p in range(1, n_pages + 1)], **kw)


def test_multi_page_order_and_numbering() -> None:
    pages = parse_pdf(_pdf(5), CFG)
    assert [p.page_number for p in pages] == [1, 2, 3, 4, 5]
    for i, p in enumerate(pages, start=1):
        assert p.lines[0].startswith(f"p{i} l0:")


def test_page_rasters_exact_geometry_and_naming() -> None:
    r = extract_one("https://host/docs/report 2024.pdf", _pdf(3), CFG)
    assert r["status"] == "completed"
    # exactly 1920x1080 (test_imagemagick.py:77-85) at 300 DPI
    for pg in r["pages"]:
        assert read_png_size(pg["png"]) == (1920, 1080)
        assert read_png_dpi(pg["png"]) == 300
        assert pg["width"] == 1920 and pg["height"] == 1080 and pg["dpi"] == 300
    # sequential -000/-001/-002 naming (test_imagemagick.py:88-143),
    # sanitized prefix (file_utils.py:6-47)
    assert [pg["filename"] for pg in r["pages"]] == [
        "report_2024_pdf-000.png",
        "report_2024_pdf-001.png",
        "report_2024_pdf-002.png",
    ]
    assert [pg["page_number"] for pg in r["pages"]] == [1, 2, 3]


def test_custom_geometry() -> None:
    cfg = ExtractConfig(page_width=640, page_height=480, dpi=72)
    r = extract_one("u.pdf", _pdf(1), cfg)
    assert read_png_size(r["pages"][0]["png"]) == (640, 480)
    assert read_png_dpi(r["pages"][0]["png"]) == 72


def test_text_spans_per_page() -> None:
    r = extract_one("u", _pdf(2), CFG)
    assert r["extracted_text"].count("\f") == 1
    assert [s["path"] for s in r["spans"]] == ["page:1", "page:2"]
    p1 = r["spans"][0]
    assert r["extracted_text"][p1["start"] : p1["end"]] == r["extracted_text"].split("\f")[0]


@pytest.mark.parametrize(
    "payload,err",
    [
        (_pdf(1, corrupt="truncate"), "PDFCorruptedError"),
        (_pdf(1, corrupt="garbage"), "PDFCorruptedError"),
        (_pdf(1, corrupt="noeof"), "PDFCorruptedError"),
        (_pdf(1, encrypted=True), "PDFPasswordProtectedError"),
        (make_pdf([]), "PDFConversionError"),
        (b"", "EmptyPayloadError"),
    ],
)
def test_error_taxonomy_dead_letters(payload: bytes, err: str) -> None:
    r = extract_one("u", payload, CFG)
    assert r["status"] == "failed"
    assert r["error_type"] == err
    assert r["error_msg"]
    assert r["extracted_text"] == "" and r["pages"] == []


def test_unknown_magic_is_skipped_not_failed() -> None:
    r = extract_one("u", b"\x00\x01binarygarbage", CFG)
    assert r["status"] == "skipped" and r["error_type"] == ""


def test_deterministic_page_budget_timeout() -> None:
    cfg = ExtractConfig(page_budget=2)
    r = extract_one("u", _pdf(3), cfg)
    assert r["status"] == "failed"
    assert r["error_type"] == "PDFConversionError"
    assert "timed out" in r["error_msg"]


def test_payload_cap() -> None:
    cfg = ExtractConfig(max_payload_bytes=64)
    r = extract_one("u", _pdf(1), cfg)
    assert r["error_type"] == "PayloadTooLargeError"


def test_render_toggle_keeps_text() -> None:
    cfg = ExtractConfig(render_pages=False)
    r = extract_one("u", _pdf(2), cfg)
    assert r["status"] == "completed" and r["n_pages"] == 2 and r["pages"] == []
    assert r["extracted_text"]
