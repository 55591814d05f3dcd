"""Deterministic HTML page generator with known main content vs boilerplate.

Each page embeds, around a known main-content article, every boilerplate
class the extractor must strip (FIXTURES.md §1): chrome containers
(nav/header/footer/aside — DROP subtrees), script/style blocks, a
link-farm div whose link density fails the gate, and short crumbs that
fail the length gate.  The generator returns both the payload bytes and
the paragraphs that constitute the expected main content, so tests can
assert the extraction heuristics independently of the shared kernel.
"""

from __future__ import annotations

import hashlib


def _h(key: str) -> int:
    return int.from_bytes(hashlib.blake2b(key.encode(), digest_size=8).digest(), "big")


def paragraphs_from_text(text: str, words_per_para: int = 18) -> list[str]:
    words = text.split()
    if not words:
        return []
    return [
        " ".join(words[i : i + words_per_para])
        for i in range(0, len(words), words_per_para)
    ]


def make_html(doc_id: int, variant: int, text: str, lang: str) -> tuple[bytes, list[str]]:
    """Build one HTML payload.  Returns (payload, expected main paragraphs)."""
    paras = paragraphs_from_text(text)
    h = _h(f"html:{doc_id}:{variant}")
    title = f"Document {doc_id} variant {variant}"
    heading = f"Article {doc_id}: synthetic corpus entry"

    nav_links = "".join(
        f'<li><a href="/section/{i}">Section {i}</a></li>' for i in range(6)
    )
    farm_links = " ".join(
        f'<a href="/tag/{(h + i) % 997}">tag{(h + i) % 997}</a>' for i in range(24)
    )
    para_html = "\n".join(f"      <p>{p}</p>" for p in paras)
    related = "".join(
        f'<li><a href="/doc/{(h + i) % 9973}">Related article number {(h + i) % 9973}</a></li>'
        for i in range(5)
    )

    page = f"""<!DOCTYPE html>
<html lang="{lang}">
<head>
  <meta charset="utf-8">
  <title>{title}</title>
  <style>body {{ margin: 0; font-family: serif; }}</style>
  <script>var trackingId = {h % 100000}; console.log(trackingId);</script>
</head>
<body>
  <header><div class="branding">SyntheticCrawl News Network</div></header>
  <nav><ul>{nav_links}</ul></nav>
  <div class="crumb">&gt;&gt;</div>
  <main>
    <article>
      <h1>{heading}</h1>
{para_html}
    </article>
    <div class="linkfarm">{farm_links}</div>
  </main>
  <aside>
    <h3>Trending</h3>
    <ul>{related}</ul>
  </aside>
  <footer>
    <p>Copyright {2000 + h % 27} SyntheticCrawl. All rights reserved.</p>
    <ul>{nav_links}</ul>
  </footer>
</body>
</html>
"""
    expected = [heading] + paras
    return page.encode("utf-8"), expected
