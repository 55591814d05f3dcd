"""Property-based hardening (hypothesis) + null/nesting edges."""

from __future__ import annotations

import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from png_from_pdf_extracter_ray.config import DEFAULT_CONFIG as CFG
from png_from_pdf_extracter_ray.kernel.extract import extract_one
from png_from_pdf_extracter_ray.kernel.sanitize import sanitize_filename
from png_from_pdf_extracter_ray.kernel.sniff import (
    MULTIPART_BOUNDARY,
    MULTIPART_MAGIC,
    sniff_content_type,
)
from png_from_pdf_extracter_ray.stages.extract_stage import extract_batch

_VALID = re.compile(r"^[A-Za-z0-9_-]+$")


class TestSanitizerProperties:
    @given(st.text(max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_output_always_valid(self, s: str) -> None:
        out = sanitize_filename(s)
        assert 1 <= len(out) <= 50
        assert _VALID.match(out), out
        assert not out.startswith("_") and not out.endswith("_")
        assert "__" not in out

    @given(st.text(max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_idempotent_on_own_output(self, s: str) -> None:
        once = sanitize_filename(s)
        assert sanitize_filename(once) == once


class TestKernelNeverRaises:
    @given(st.binary(max_size=2048))
    @settings(max_examples=200, deadline=None)
    def test_arbitrary_bytes_become_rows_not_exceptions(self, payload: bytes) -> None:
        r = extract_one("https://x/fuzz", payload, CFG)
        assert r["status"] in ("completed", "skipped", "failed")
        assert isinstance(r["extracted_text"], str)
        assert len(r["content_hash"]) == 32

    @given(st.binary(max_size=512))
    @settings(max_examples=100, deadline=None)
    def test_pdf_prefixed_garbage_dead_letters(self, tail: bytes) -> None:
        r = extract_one("u", b"%PDF-" + tail, CFG)
        if r["status"] == "failed":
            assert r["error_type"].startswith("PDF") or r["error_type"] in (
                "PayloadTooLargeError",
            )

    @given(st.binary(max_size=256))
    @settings(max_examples=100, deadline=None)
    def test_sniff_total_function(self, payload: bytes) -> None:
        assert sniff_content_type(payload) in ("pdf", "html", "multipart", "unknown", "empty")


def test_null_payloads_through_batch() -> None:
    batch = pa.Table.from_pydict(
        {
            "url": ["a", "b"],
            "warc_ts": pa.array([0, 1], pa.timestamp("us")),
            "html": pa.array([None, b"<p>some real paragraph content here</p>"], pa.binary()),
            "text": ["", ""],
            "lang": ["en", "en"],
        }
    )
    out = extract_batch(batch, CFG)
    assert out["status"].to_pylist() == ["failed", "completed"]
    assert out["error_type"].to_pylist()[0] == "EmptyPayloadError"


def test_nested_multipart_part_is_skipped_not_recursed() -> None:
    inner = MULTIPART_MAGIC + b"<p>inner paragraph long enough to pass gates</p>"
    outer = MULTIPART_MAGIC + inner + MULTIPART_BOUNDARY + b"<p>outer paragraph long enough to pass</p>"
    r = extract_one("u", outer, CFG)
    assert r["status"] == "completed"
    assert r["n_payloads"] == 1  # only the plain html part; nested container skipped
    assert "outer paragraph" in r["extracted_text"]
    assert "inner paragraph" not in r["extracted_text"]


def test_normalize_text_whitespace_semantics() -> None:
    """Newline-separated words must normalize identically to
    space-separated ones (collapse BEFORE control-strip), and differently
    from concatenated ones."""
    import pandas as pd

    from png_from_pdf_extracter_ray.stages.text_stats import normalize_text_batch

    df = pd.DataFrame(
        {
            "text": [
                "foo\nbar",
                "foo bar",
                "foobar",
                "  Foo\t\tBAR  ",
                "foo\x01bar",
            ]
        }
    )
    fp = normalize_text_batch(df)["norm_fp"]
    assert fp[0] == fp[1] == fp[3]  # \n, space, tabs+case+padding all agree
    assert fp[2] != fp[0]  # concatenation stays distinct
    assert fp[4] == fp[2]  # non-ws control chars strip to concatenation


class TestHeavyHitterSuperset:
    """The pigeonhole guarantee behind heavy_hitter_tokens: the union of
    per-batch local-threshold candidates is a superset of the true
    global heavy hitters, for ANY batch split."""

    @given(
        st.lists(st.integers(0, 20), min_size=1, max_size=400),
        st.integers(2, 10),
        st.integers(1, 7),
    )
    @settings(max_examples=150, deadline=None)
    def test_local_candidates_cover_global(self, stream, s, n_batches) -> None:
        import numpy as np

        arr = np.asarray(stream)
        batches = np.array_split(arr, n_batches)
        cands: set = set()
        for b in batches:
            if b.size == 0:
                continue
            vals, cnts = np.unique(b, return_counts=True)
            cands.update(vals[cnts >= b.size / s])
        vals, cnts = np.unique(arr, return_counts=True)
        heavy = set(vals[cnts >= arr.size / s])
        assert heavy <= cands


class TestTokenChunkInvariants:
    @given(st.lists(st.text(alphabet="ab", min_size=1, max_size=3), max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_chunks_partition_the_token_stream(self, toks) -> None:
        chunk = 64
        windows = [toks[i : i + chunk] for i in range(0, len(toks), chunk)]
        assert sum(len(w) for w in windows) == len(toks)
        assert all(len(w) == chunk for w in windows[:-1])
        if windows:
            assert 1 <= len(windows[-1]) <= chunk


class TestUrlCanonicalizationProperties:
    """Property hardening for pipelines/urlops.py."""

    @given(
        doc=st.integers(min_value=0, max_value=10_000),
        variant=st.integers(min_value=0, max_value=3),
        ts1=st.integers(min_value=0, max_value=2**40),
        ts2=st.integers(min_value=0, max_value=2**40),
    )
    @settings(max_examples=200, deadline=None)
    def test_all_snapshots_share_one_canonical_form(
        self, doc: int, variant: int, ts1: int, ts2: int
    ) -> None:
        # THE invariant canonical-url dedup rests on: every messy
        # snapshot of a url canonicalizes to the SAME form (retained
        # "real" params are a function of the url alone; only the
        # noise varies with the timestamp), and that form differs from
        # the clean url at most by those retained real params.
        from png_from_pdf_extracter_ray.corpus.synth import page_url
        from png_from_pdf_extracter_ray.pipelines.urlops import (
            canonicalize_url,
            messy_url,
        )

        url = page_url(doc, variant)
        c1 = canonicalize_url(messy_url(url, ts1))
        c2 = canonicalize_url(messy_url(url, ts2))
        assert c1 == c2
        assert c1.split("?", 1)[0] == canonicalize_url(url).split("?", 1)[0]

    @given(
        host=st.from_regex(r"[a-z][a-z0-9.\-]{0,20}", fullmatch=True),
        path=st.from_regex(r"(/[A-Za-z0-9._\-]{0,8}){0,4}", fullmatch=True),
        params=st.lists(
            st.from_regex(r"[a-z]{1,6}=[A-Za-z0-9]{0,6}", fullmatch=True),
            max_size=4,
        ),
        frag=st.from_regex(r"(#[A-Za-z0-9]{0,6})?", fullmatch=True),
    )
    @settings(max_examples=200, deadline=None)
    def test_canonical_has_no_noise(
        self, host: str, path: str, params: list, frag: str
    ) -> None:
        from png_from_pdf_extracter_ray.pipelines.urlops import canonicalize_url

        raw = f"https://{host}{path}"
        if params:
            raw += "?" + "&".join(params)
        raw += frag
        out = canonicalize_url(raw)
        assert "#" not in out
        assert not out.split("?", 1)[0].endswith("/") or path.endswith("//")
        auth = out.split("?", 1)[0]
        assert auth == auth.split("://", 1)[0].lower() + "://" + auth.split("://", 1)[1]
        for p in out.split("?", 1)[1].split("&") if "?" in out else []:
            assert not p.startswith(("utm_", "fbclid=", "gclid=", "ref="))
