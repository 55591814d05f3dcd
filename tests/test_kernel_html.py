"""HTML branch: boilerplate stripping, span offsets, determinism."""

from png_from_pdf_extracter_ray.config import DEFAULT_CONFIG as CFG
from png_from_pdf_extracter_ray.config import ExtractConfig
from png_from_pdf_extracter_ray.corpus.htmlgen import make_html
from png_from_pdf_extracter_ray.kernel.extract import extract_one
from png_from_pdf_extracter_ray.kernel.html_extract import extract_html

TEXT = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    " omicron pi rho sigma tau upsilon phi chi psi omega one two three four five"
)


def test_main_content_matches_generator_expectation() -> None:
    payload, expected = make_html(7, 0, TEXT, "en")
    doc = extract_html(payload, CFG)
    assert doc.text == "\n\n".join(expected)
    assert doc.title == "Document 7 variant 0"


def test_boilerplate_stripped() -> None:
    payload, _ = make_html(3, 1, TEXT, "en")
    doc = extract_html(payload, CFG)
    for leaked in ("Section 0", "Trending", "Copyright", "tag", "Related article", "trackingId"):
        assert leaked not in doc.text, leaked


def test_span_offsets_index_into_text() -> None:
    payload, _ = make_html(11, 2, TEXT, "en")
    doc = extract_html(payload, CFG)
    assert doc.spans, "expected at least one span"
    for s in doc.spans:
        piece = doc.text[s.start : s.end]
        assert piece and piece == piece.strip()
        assert s.path.endswith(f"{s.kind}[" + s.path.rsplit("[", 1)[1])
    # spans tile the text in order, separated by the blank-line joiner
    for a, b in zip(doc.spans, doc.spans[1:]):
        assert doc.text[a.end : b.start] == "\n\n"


def test_inline_markup_does_not_split_or_reorder() -> None:
    payload = b"<html><body><p>Hello <b>brave new</b> world with <a href='/x'>a link</a> inside</p></body></html>"
    doc = extract_html(payload, CFG)
    assert doc.text == "Hello brave new world with a link inside"


def test_link_density_gate() -> None:
    farm = "".join(f'<a href="/{i}">link number {i}</a> ' for i in range(20))
    payload = f"<html><body><div>{farm}</div><p>An ordinary paragraph with plenty of plain text</p></body></html>".encode()
    doc = extract_html(payload, CFG)
    assert "link number" not in doc.text
    assert "ordinary paragraph" in doc.text


def test_length_gate_and_heading_exception() -> None:
    payload = b"<html><body><h2>Hi</h2><p>no</p><p>long enough paragraph here</p></body></html>"
    doc = extract_html(payload, CFG)
    assert doc.text == "Hi\n\nlong enough paragraph here"


def test_config_gates_are_tunable() -> None:
    payload = b"<html><body><p>no</p></body></html>"
    loose = ExtractConfig(min_block_chars=1)
    assert extract_html(payload, loose).text == "no"


def test_deterministic() -> None:
    payload, _ = make_html(5, 5, TEXT, "de")
    a = extract_one("u", payload, CFG)
    b = extract_one("u", payload, CFG)
    assert a["extracted_text"] == b["extracted_text"]
    assert a["content_hash"] == b["content_hash"]


def test_stray_end_tag_does_not_undrop_boilerplate() -> None:
    # a </p> that was never opened inside <nav> must NOT close the
    # dropped region early and leak the nav text into the extraction
    html = (
        b"<html><body>"
        b"<nav></p><a href='/'>LEAKED NAV LINK</a></nav>"
        b"<p>real article content that is long enough to pass the length "
        b"gate of the extractor today</p>"
        b"</body></html>"
    )
    doc = extract_html(html, CFG)
    assert "LEAKED" not in doc.text
    assert "real article content" in doc.text


def test_misnested_drop_region_still_closes() -> None:
    # an unclosed <div> inside <nav> must not swallow the document after
    # </nav> (the region root closes the whole dropped subtree)
    html = (
        b"<html><body>"
        b"<nav><div>menu stuff</nav>"
        b"<p>visible body text long enough to pass the extractor length "
        b"gate right here</p>"
        b"</body></html>"
    )
    doc = extract_html(html, CFG)
    assert "menu stuff" not in doc.text
    assert "visible body text" in doc.text
