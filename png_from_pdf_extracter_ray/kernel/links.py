"""Hyperlink extraction from HTML payloads — the link-graph kernel.

A web-scale extraction pipeline needs the page's OUT-LINKS as much as its
main text: the link table feeds URL frontier dedup, in-degree/PageRank
quality priors, and anchor-text corpora.  The reference has no link
analog (it extracts PDF attachments from mail,
/root/reference/src/services/imap_service.py); this is one of the
engine's training-data growth operators.

Single-implementation rule (ROUND_NOTES "oracle-shared kernels"): this
module is the ONE place links are parsed — the Ray stages
(stages/linkgraph.py) and the flat single-process oracles
(pipelines/rowsonly_oracles.py) both call :func:`extract_links`, so the
contract cannot drift between the two sides.

Determinism: pure function of (payload bytes, base url); regexes are
compiled at module import (once per worker process); no dict-order or
float dependence.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

from .sniff import CT_HTML, CT_MULTIPART, sniff_content_type, split_multipart

# <a ... href="..." ...> ... </a> — double- or single-quoted href, any
# other attributes, case-insensitive, inner markup allowed (stripped
# below).  DOTALL so anchors spanning newlines are kept whole.
# The lookbehind rejects *-href attributes (data-href, ng-href,
# xlink:href): \b alone treats '-' and ':' as boundaries and would
# extract the WRONG url from <a data-href="/evil" href="/real">.
_ANCHOR_RE = re.compile(
    rb"<a\b[^>]*?(?<![\w:-])href\s*=\s*(\"([^\"]*)\"|'([^']*)')[^>]*>(.*?)</a\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(rb"<[^>]*>")
# Explicit whitespace class (never \s in a contract regex — ROUND_NOTES).
_WS_RE = re.compile(rb"[ \t\r\n\f\v]+")

# Target-classification patterns over the resolved URL's path.
_DOC_PATH_RE = re.compile(r"^/doc/(\d+)$")
_SRC_DOC_RE = re.compile(r"^/doc/(\d+)-\d+$")


def _clean_anchor(inner: bytes) -> str:
    """Anchor display text: strip nested tags, collapse whitespace."""
    text = _TAG_RE.sub(b" ", inner)
    text = _WS_RE.sub(b" ", text).strip()
    return text.decode("utf-8", "replace")


def extract_links(payload: bytes | None, base_url: str) -> list[dict]:
    """All hyperlinks of one page payload, resolved against ``base_url``.

    Returns one dict per anchor, in document order:
    ``href`` (resolved absolute URL), ``anchor`` (display text),
    ``internal`` (same host as the page), ``dst_doc`` (int doc id when
    the target path is a document node ``/doc/<n>``, else -1).
    Non-HTML payloads yield no links; EVERY HTML part of a multipart
    container is scanned in part order (mirroring the extractor's
    walk over all parts, kernel/extract.py).
    """
    if not payload:
        return []
    ct = sniff_content_type(payload)
    if ct == CT_MULTIPART:
        out: list[dict] = []
        for p in split_multipart(payload):
            if sniff_content_type(p) == CT_HTML:
                out.extend(_links_of_html(p, base_url))
        return out
    if ct != CT_HTML:
        return []
    return _links_of_html(payload, base_url)


def _links_of_html(payload: bytes, base_url: str) -> list[dict]:
    base_host = urlsplit(base_url).netloc
    out: list[dict] = []
    for m in _ANCHOR_RE.finditer(payload):
        raw = (m.group(2) if m.group(2) is not None else m.group(3)).decode(
            "utf-8", "replace"
        )
        href = urljoin(base_url, raw)
        parts_ = urlsplit(href)
        if parts_.scheme not in ("http", "https"):
            continue
        doc_m = _DOC_PATH_RE.match(parts_.path)
        out.append(
            {
                "href": href,
                "anchor": _clean_anchor(m.group(4)),
                "internal": parts_.netloc == base_host,
                "dst_doc": int(doc_m.group(1)) if doc_m else -1,
            }
        )
    return out


def src_doc_of_url(url: str) -> int:
    """Document node id of a page url (``…/doc/<id>-<variant>``), or -1."""
    m = _SRC_DOC_RE.match(urlsplit(url).path)
    return int(m.group(1)) if m else -1
