"""Kernel-level tests for url canonicalization (pipelines/urlops.py).

The DuckDB oracle parity (test_queries_vs_duckdb) pins the engine vs an
independent SQL implementation over the shared messy-urls input; these
tests pin the KERNEL's contract on adversarial inputs the synthetic
noise never produces (ROUND_NOTES: oracle-parity nets are blind to
cases absent from the shared input).
"""

from __future__ import annotations

import pytest

from png_from_pdf_extracter_ray.pipelines.urlops import (
    canonicalize_url,
    messy_url,
)


CASES = [
    # fragment stripped
    ("https://a.example/p#frag", "https://a.example/p"),
    # fragment strip happens before query split (spec order: # first)
    ("https://a.example/p?x=1#frag?y=2", "https://a.example/p?x=1"),
    # host + scheme case-folded, path case KEPT
    ("HTTPS://A.Example/Path/UPPER", "https://a.example/Path/UPPER"),
    # default ports stripped per scheme
    ("https://a.example:443/p", "https://a.example/p"),
    ("http://a.example:80/p", "http://a.example/p"),
    # non-default / cross-scheme ports kept
    ("https://a.example:80/p", "https://a.example:80/p"),
    ("http://a.example:443/p", "http://a.example:443/p"),
    ("https://a.example:8443/p", "https://a.example:8443/p"),
    # ONE trailing slash stripped; bare slash collapses to empty
    ("https://a.example/p/", "https://a.example/p"),
    ("https://a.example/p//", "https://a.example/p/"),
    ("https://a.example/", "https://a.example"),
    ("https://a.example", "https://a.example"),
    # tracking params dropped, survivors bytewise-sorted, frag+track+slash
    (
        "https://a.example/p/?z=1&utm_source=x&a=2&fbclid=F&gclid=G&ref=r#s",
        "https://a.example/p?a=2&z=1",
    ),
    # all params tracking -> no '?'
    ("https://a.example/p?utm_a=1&ref=x", "https://a.example/p"),
    # empty params and lone '?' vanish
    ("https://a.example/p?", "https://a.example/p"),
    ("https://a.example/p?&&a=1&", "https://a.example/p?a=1"),
    # 'ref' only matches as a whole param name ('refresh=1' survives;
    # 'utm_' prefix family all dropped)
    ("https://a.example/p?refresh=1&utm_x=2", "https://a.example/p?refresh=1"),
    # param VALUES containing 'ref=' survive (anchor is name-position)
    ("https://a.example/p?q=ref%3Dx", "https://a.example/p?q=ref%3Dx"),
    # bytewise sort: '=' (0x3d) orders within full param strings
    ("https://a.example/p?b=2&a=10&a=2", "https://a.example/p?a=10&a=2&b=2"),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_canonicalize_url_cases(raw: str, want: str) -> None:
    assert canonicalize_url(raw) == want


def test_canonicalize_idempotent() -> None:
    # spec strips exactly ONE trailing slash, so a path ending in '//'
    # is the one (intentional) non-fixed-point: skip canonical forms
    # that still end in '/'
    for raw, _ in CASES:
        once = canonicalize_url(raw)
        if once.split("?", 1)[0].endswith("/"):
            continue
        assert canonicalize_url(once) == once


def test_messy_url_roundtrips_to_one_canonical_form() -> None:
    # every snapshot of a url canonicalizes to the SAME form: retained
    # "real" params are a function of the url alone, noise varies by ts
    url = "https://site7.example/doc/123-0"
    forms = {canonicalize_url(messy_url(url, ts)) for ts in range(0, 40)}
    assert len(forms) == 1
    raws = {messy_url(url, ts) for ts in range(0, 40)}
    assert len(raws) > 1  # the noise actually varies


def test_messy_url_deterministic() -> None:
    assert messy_url("https://x.example/a", 7) == messy_url(
        "https://x.example/a", 7
    )


class TestHostGroupedSplit:
    def test_hosts_never_straddle_and_split_nonempty(self, ray_session, sf_dir):  # noqa: ANN001
        from png_from_pdf_extracter_ray.pipelines.urlops import host_grouped_split

        out = host_grouped_split(sf_dir).to_pandas()
        # one row per distinct url
        assert out["url"].is_unique
        # group integrity: every host maps to exactly one split
        assert (out.groupby("host")["split"].nunique() == 1).all()
        # both sides exist on the synth corpus (50 hosts, 12.5% test rate)
        assert set(out["split"]) == {"train", "test"}
        # split is a pure function of the host (md5 first hex char)
        import hashlib

        for h, s in out.drop_duplicates("host")[["host", "split"]].itertuples(index=False):
            expect = "test" if hashlib.md5(h.encode()).hexdigest()[0] in ("0", "1") else "train"
            assert s == expect


class TestUrlPathTemplates:
    def test_digit_runs_collapse_and_counts_are_distinct(self, ray_session, sf_dir):  # noqa: ANN001
        from png_from_pdf_extracter_ray.pipelines.urlops import url_path_templates

        out = url_path_templates(sf_dir).to_pandas()
        assert len(out) > 0
        assert out["template"].is_unique
        # no digits survive in any template
        assert not out["template"].str.contains(r"[0-9]").any()
        # the synth corpus serves /doc/<id> pages from many hosts: the
        # /doc/N template must aggregate across hosts
        doc_tpl = out[out["template"].str.startswith("/doc/")]
        assert len(doc_tpl) >= 1
        assert (doc_tpl["n_hosts"] > 1).any()
        assert (out["n_urls"] >= out["n_hosts"]).all()
