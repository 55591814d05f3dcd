"""HTML main-content extraction: DOM arena + boilerplate stripping.

The HTML branch of the engine (north-star: "lxml/selectolax DOM parse with
Readability/trafilatura-style boilerplate stripping — text-density +
link-density heuristics, tag-path scoring over a DOM-node arena"), built
on the stdlib ``html.parser`` in the spirit of the reference's all-stdlib
constraint (/root/reference/specs/001-pdf-to-png-mailer/spec.md:122).

Model:
- a single parse pass builds a flat node arena (parent index, tag,
  sibling ordinal) — no recursion, cheap allocation;
- entire subtrees under chrome/boilerplate containers (script, style,
  nav, header, footer, aside, form, …) are skipped during the parse;
- text data is attributed, *in document order*, to the nearest enclosing
  block-level element (so inline markup like <b>/<a> never splits or
  reorders a paragraph's text);
- each candidate block scores by text length and link density (chars
  under <a> / total chars); link farms and nav lists fail the density
  gate, short crumbs fail the length gate (headings get a lower bound);
- surviving blocks are emitted in document order, whitespace-normalized,
  joined by blank lines; a span record (start, end, tag-path, kind) is
  kept per block — the "span offsets as Arrow struct columns" surface.

Determinism: pure function of the payload bytes + config; no dict-order
dependence (arena is list-ordered), so distributed and oracle runs agree
byte-for-byte.
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser

from ..config import ExtractConfig

# Subtrees that never contribute main content (chrome + invisible).
DROP_TAGS = frozenset(
    {
        "script",
        "style",
        "noscript",
        "template",
        "svg",
        "iframe",
        "nav",
        "header",
        "footer",
        "aside",
        "form",
        "button",
        "select",
        "option",
    }
)

# Block-level elements that may be candidate text blocks.
BLOCK_TAGS = frozenset(
    {
        "p",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "li",
        "dd",
        "dt",
        "td",
        "th",
        "pre",
        "blockquote",
        "figcaption",
        "caption",
        "summary",
        "div",
        "article",
        "section",
        "main",
        "body",
    }
)

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Elements that never nest (void) — treated as self-closing.
VOID_TAGS = frozenset(
    {
        "area",
        "base",
        "br",
        "col",
        "embed",
        "hr",
        "img",
        "input",
        "link",
        "meta",
        "param",
        "source",
        "track",
        "wbr",
    }
)


@dataclass
class Span:
    start: int
    end: int
    path: str
    kind: str


@dataclass
class HtmlDoc:
    text: str
    spans: list[Span]
    title: str


class _Node:
    __slots__ = ("tag", "parent", "index", "sibling_no", "texts", "link_chars")

    def __init__(self, tag: str, parent: int, index: int, sibling_no: int) -> None:
        self.tag = tag
        self.parent = parent
        self.index = index
        self.sibling_no = sibling_no  # 1-based position among same-tag siblings
        self.texts: list[str] = []  # document-order text attributed to this block
        self.link_chars = 0


class _ArenaParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.arena: list[_Node] = [_Node("#root", -1, 0, 1)]
        self.stack: list[int] = [0]
        self.block_stack: list[int] = [0]  # nearest enclosing block-level node
        # Open-tag stack INSIDE a dropped subtree ([0] is the DROP_TAG
        # itself).  A plain depth counter would let any stray end tag
        # (e.g. a "</p>" that was never opened inside <nav>) un-drop the
        # subtree early and leak boilerplate on misnested HTML.
        self.drop_stack: list[str] = []
        self.anchor_depth = 0
        self.title_mode = False
        self.title_parts: list[str] = []
        self._sibling_counts: list[dict[str, int]] = [{}]

    # -- element open/close ------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if self.drop_stack:
            if tag not in VOID_TAGS:
                self.drop_stack.append(tag)
            return
        if tag == "title":
            self.title_mode = True
            return
        if tag in DROP_TAGS:
            self.drop_stack.append(tag)
            return
        if tag in VOID_TAGS:
            return
        if tag == "a":
            self.anchor_depth += 1
        counts = self._sibling_counts[-1]
        counts[tag] = counts.get(tag, 0) + 1
        parent = self.stack[-1]
        node = _Node(tag, parent, len(self.arena), counts[tag])
        self.arena.append(node)
        self.stack.append(node.index)
        self._sibling_counts.append({})
        if tag in BLOCK_TAGS:
            self.block_stack.append(node.index)

    def handle_endtag(self, tag: str) -> None:
        if self.drop_stack:
            # Pop to the nearest matching open tag inside the region; a
            # stray end tag that matches nothing is ignored (it cannot
            # close a subtree it never opened).
            for i in range(len(self.drop_stack) - 1, -1, -1):
                if self.drop_stack[i] == tag:
                    del self.drop_stack[i:]
                    break
            return
        if tag == "title":
            self.title_mode = False
            return
        if tag in VOID_TAGS:
            return
        if tag == "a" and self.anchor_depth:
            self.anchor_depth -= 1
        # Pop to the matching open tag if present (tolerates misnesting).
        for i in range(len(self.stack) - 1, 0, -1):
            if self.arena[self.stack[i]].tag == tag:
                del self.stack[i:]
                del self._sibling_counts[i:]
                live = set(self.stack)
                while len(self.block_stack) > 1 and self.block_stack[-1] not in live:
                    self.block_stack.pop()
                break

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        pass

    # -- text --------------------------------------------------------------
    def handle_data(self, data: str) -> None:
        if self.drop_stack:
            return
        if self.title_mode:
            self.title_parts.append(data)
            return
        if not data or data.isspace():
            return
        node = self.arena[self.block_stack[-1]]
        node.texts.append(data)
        if self.anchor_depth:
            node.link_chars += len(" ".join(data.split()))


def _normalize(s: str) -> str:
    return " ".join(s.split())


def extract_html(payload: bytes, cfg: ExtractConfig) -> HtmlDoc:
    """Extract main content text + spans from an HTML payload."""
    parser = _ArenaParser()
    parser.feed(payload.decode("utf-8", "replace"))
    parser.close()
    arena = parser.arena

    pieces: list[str] = []
    spans: list[Span] = []
    offset = 0
    for node in arena[1:]:
        if node.tag not in BLOCK_TAGS or not node.texts:
            continue
        text = _normalize(" ".join(node.texts))
        if not text:
            continue
        n = len(text)
        min_chars = cfg.heading_min_chars if node.tag in HEADING_TAGS else cfg.min_block_chars
        if n < min_chars:
            continue
        if node.link_chars / n > cfg.max_link_density:
            continue
        start = offset + (2 if pieces else 0)  # account for the "\n\n" joiner
        pieces.append(text)
        offset = start + n
        spans.append(Span(start=start, end=offset, path=_tag_path(arena, node.index), kind=node.tag))

    return HtmlDoc(
        text="\n\n".join(pieces),
        spans=spans,
        title=_normalize(" ".join(parser.title_parts)),
    )


def _tag_path(arena: list[_Node], index: int) -> str:
    parts: list[str] = []
    while index > 0:
        node = arena[index]
        parts.append(f"{node.tag}[{node.sibling_no}]")
        index = node.parent
    return "/".join(reversed(parts))
