"""Parity operators: multipart payloads, env config, size bucketing, CLI."""

from __future__ import annotations

import json
import subprocess
import sys

import pyarrow as pa
import pytest

import ray

from png_from_pdf_extracter_ray.config import DEFAULT_CONFIG as CFG
from png_from_pdf_extracter_ray.config import ExtractConfig
from png_from_pdf_extracter_ray.corpus.htmlgen import make_html
from png_from_pdf_extracter_ray.corpus.pdfgen import lines_for_page, make_pdf
from png_from_pdf_extracter_ray.kernel.extract import extract_one
from png_from_pdf_extracter_ray.kernel.sniff import (
    MULTIPART_BOUNDARY,
    MULTIPART_MAGIC,
    sniff_content_type,
)
from png_from_pdf_extracter_ray.pipelines.extract_pipeline import (
    extract_pipeline,
    extract_pipeline_size_bucketed,
)
from png_from_pdf_extracter_ray.sources.pages_source import synthesize_pages

WORDS = "alpha beta gamma delta epsilon zeta".split()
TEXT = " ".join(WORDS * 6)


def _multipart(*parts: bytes) -> bytes:
    return MULTIPART_MAGIC + MULTIPART_BOUNDARY.join(parts)


class TestMultipart:
    def test_sniff(self) -> None:
        assert sniff_content_type(_multipart(b"<p>x</p>")) == "multipart"

    def test_gathers_all_parts_into_one_row(self) -> None:
        html, expected = make_html(1, 0, TEXT, "en")
        pdf = make_pdf([lines_for_page(1, 0, 1, WORDS), lines_for_page(1, 0, 2, WORDS)])
        r = extract_one("https://h/doc.bin", _multipart(html, pdf), CFG)
        assert r["status"] == "completed"
        assert r["n_payloads"] == 2
        assert r["n_pages"] == 2  # pdf part's pages
        # text = html part text + "\n\n" + pdf part text
        html_text = "\n\n".join(expected)
        assert r["extracted_text"].startswith(html_text + "\n\n")
        assert "\f" in r["extracted_text"]  # pdf pages joined by form-feed
        # page filenames carry the part index; numbering restarts per part
        assert [p["filename"] for p in r["pages"]] == [
            "doc_part2_pdf-000.png",
            "doc_part2_pdf-001.png",
        ]
        # spans carry part prefixes and index into the joined text
        pdf_spans = [s for s in r["spans"] if s["kind"] == "pdf_page"]
        assert [s["path"] for s in pdf_spans] == ["part2:page:1", "part2:page:2"]
        for s in r["spans"]:
            assert r["extracted_text"][s["start"] : s["end"]]

    def test_single_payload_n_payloads(self) -> None:
        html, _ = make_html(1, 0, TEXT, "en")
        assert extract_one("u", html, CFG)["n_payloads"] == 1
        assert extract_one("u", b"\x00junk", CFG)["n_payloads"] == 0

    def test_part_failure_dead_letters_whole_doc(self) -> None:
        html, _ = make_html(1, 0, TEXT, "en")
        bad_pdf = make_pdf([lines_for_page(1, 0, 1, WORDS)], encrypted=True)
        r = extract_one("u", _multipart(html, bad_pdf), CFG)
        assert r["status"] == "failed"
        assert r["error_type"] == "PDFPasswordProtectedError"
        assert r["extracted_text"] == "" and r["pages"] == []

    def test_all_parts_unsupported_is_skipped(self) -> None:
        r = extract_one("u", _multipart(b"\x00junk", b"\x01junk"), CFG)
        assert r["status"] == "skipped" and r["n_payloads"] == 0


class TestFromEnv:
    def test_defaults_and_overrides(self) -> None:
        cfg = ExtractConfig.from_env({})
        assert cfg == ExtractConfig()
        cfg = ExtractConfig.from_env(
            {"EXTRACT_PAGE_WIDTH": "640", "EXTRACT_LANG_ALLOW": "en|de",
             "EXTRACT_RENDER_PAGES": "0", "EXTRACT_TIMEOUT_S": "5.5"}
        )
        assert cfg.page_width == 640 and cfg.lang_allow == "en|de"
        assert cfg.render_pages is False and cfg.timeout_s == 5.5

    def test_invalid_values_raise(self) -> None:
        with pytest.raises(ValueError):
            ExtractConfig.from_env({"EXTRACT_DPI": "not-a-number"})
        with pytest.raises(ValueError):
            ExtractConfig.from_env({"EXTRACT_DPI": "0"})  # validation bound


def test_size_bucketed_equals_plain(ray_session, sf_dir) -> None:  # noqa: ANN001
    plain = extract_pipeline(
        synthesize_pages(sf_dir, expand=2, num_docs=40),
        dedup=False,
        concurrency=(1, 2),
        summary_only=True,
    ).to_pandas()
    bucketed_ds = extract_pipeline_size_bucketed(
        lambda: synthesize_pages(sf_dir, expand=2, num_docs=40),
        threshold_bytes=4096,
        concurrency=(1, 2),
    ).select_columns(["url", "status", "content_hash"])
    bucketed = bucketed_ds.to_pandas()
    a = plain[["url", "status", "content_hash"]].sort_values("url", ignore_index=True)
    b = bucketed.sort_values("url", ignore_index=True)
    assert a.equals(b)


def test_driver_contract_from_foreign_cwd(sf_dir, tmp_path) -> None:  # noqa: ANN001
    """The graft driver may import __ray_entry__ from any cwd; Ray workers
    then have no repo on sys.path.  UDF code must ship by value — this
    has regressed twice (module-level lru_cache pickling by reference;
    a function-local relative import executing on the worker)."""
    script = (
        "import ray, sys\n"
        "ray.init(address='local', num_cpus=2, include_dashboard=False, logging_level='ERROR')\n"
        "sys.path.insert(0, '/root/repo')\n"
        "import __ray_entry__ as e\n"
        "from png_from_pdf_extracter_ray.pipelines.extract_pipeline import flagship\n"
        f"n = flagship('{sf_dir}', expand=1, dedup='shuffle', summary_only=True).count()\n"
        "assert n > 0, n\n"
        "print('FOREIGN_CWD_OK', n)\n"
        "ray.shutdown()\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "FOREIGN_CWD_OK" in r.stdout


def test_cli_run_and_resume(ray_session, sf_dir, tmp_path) -> None:  # noqa: ANN001
    out = str(tmp_path / "cli_run")
    cmd = [
        sys.executable, "-m", "png_from_pdf_extracter_ray.main",
        "--sf-dir", sf_dir, "--out", out, "--shards", "2",
        "--expand", "1", "--dedup", "none", "--num-cpus", "2",
    ]
    r1 = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    res = json.loads(r1.stdout.strip().splitlines()[-1])
    assert res["partitions"] == 2 and res["rows"] > 0
    # resume: everything committed → identical summary, much faster
    r2 = subprocess.run(cmd + ["--resume"], capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    res2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert res2["rows"] == res["rows"] and res2["rows_by_status"] == res["rows_by_status"]


def test_pages_title_index_surface(ray_session, sf_dir) -> None:  # noqa: ANN001
    """The WAT-style title index: every row is a completed page with a
    non-empty title, title_chars is exact, and titles follow the
    deterministic corpus convention."""
    from png_from_pdf_extracter_ray.pipelines.textops import pages_title_index

    df = pages_title_index(sf_dir).to_pandas()
    assert len(df) > 0
    assert (df["title"] != "").all()
    assert (df["title_chars"] == df["title"].str.len()).all()
    assert df["title"].str.match(r"^Document \d+ variant \d+$").all()
    assert df["url"].is_unique
