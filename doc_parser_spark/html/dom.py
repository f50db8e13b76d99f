"""Minimal HTML DOM built on the stdlib ``html.parser`` tokenizer.

The reference parses HTML with BeautifulSoup's ``"html.parser"`` tree builder
(``docling/backend/html_backend.py:75``), which itself wraps this same stdlib
tokenizer. bs4/lxml are not available in this environment, so we build the
small DOM subset the extractor needs, replicating the behaviours the
reference's algorithms rely on:

* character references decoded by the tokenizer (``convert_charrefs=True``),
* HTML5 void elements never take children,
* stray end tags are ignored; an end tag closes intermediate open elements,
* ``<script>``/``<style>`` text and comments/doctypes are kept as distinct
  node kinds so text extraction can skip them (bs4 models these as
  ``PreformattedString``/``Script``/``Stylesheet``; the extractor's floating
  text rule at ``html_backend.py:152-154`` explicitly excludes them),
* ``Tag.text`` == concatenation of all descendant text nodes with no
  separator (bs4 ``.text`` semantics, load-bearing for byte parity),
* implied end tags for the common block-nesting cases the corpus hits
  (``<p>`` auto-closes an open ``<p>``, ``<li>`` closes an open ``<li>``,
  table-section tags close the previous cell/row) — mirroring how
  ``html.parser``-based trees behave on real-world pages.

This is an original implementation; only the *behavioural contract* comes
from the reference.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional, Union

from doc_parser_spark.html.encoding import decode_html

VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

RAW_TEXT_ELEMENTS = frozenset({"script", "style", "template"})

# tags whose open instance is implicitly closed by a new sibling of the kinds
# listed (subset of the HTML5 "implied end tag" rules that matter for
# real-world extraction corpora)
_IMPLIED_CLOSERS: dict[str, frozenset] = {
    "p": frozenset(
        {
            "p", "address", "article", "aside", "blockquote", "details", "div",
            "dl", "fieldset", "figcaption", "figure", "footer", "form", "h1",
            "h2", "h3", "h4", "h5", "h6", "header", "hr", "main", "nav", "ol",
            "pre", "section", "table", "ul",
        }
    ),
    "li": frozenset({"li"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "tr": frozenset({"tr"}),
    "td": frozenset({"td", "th", "tr"}),
    "th": frozenset({"td", "th", "tr"}),
    "thead": frozenset({"tbody", "tfoot"}),
    "tbody": frozenset({"tbody", "tfoot"}),
    "option": frozenset({"option", "optgroup"}),
}


class TextNode:
    """A run of character data (bs4 ``NavigableString`` analog)."""

    __slots__ = ("data", "parent", "kind")

    def __init__(self, data: str, kind: str = "text"):
        self.data = data
        self.parent: Optional[Tag] = None
        # kind: "text" | "raw" (script/style payload) | "comment" | "decl"
        self.kind = kind

    @property
    def is_text(self) -> bool:
        return self.kind == "text"

    @property
    def text(self) -> str:
        return self.data if self.kind == "text" else ""

    def __repr__(self) -> str:  # pragma: no cover
        return f"TextNode({self.data!r})"


Child = Union["Tag", TextNode]


class Tag:
    """An element node (bs4 ``Tag`` analog)."""

    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: Optional[dict] = None):
        self.name = name
        self.attrs = attrs or {}
        self.children: list[Child] = []
        self.parent: Optional[Tag] = None

    def append(self, child: Child) -> None:
        child.parent = self
        self.children.append(child)

    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    @property
    def text(self) -> str:
        """Concatenated descendant text (bs4 ``.text``: no separators)."""
        parts: list[str] = []
        stack: list[Child] = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, TextNode):
                if node.is_text:
                    parts.append(node.data)
            else:
                stack.extend(reversed(node.children))
        return "".join(parts)

    def find(self, names) -> Optional["Tag"]:
        """First descendant tag with a name in ``names`` (document order)."""
        if isinstance(names, str):
            names = [names]
        names = set(names)
        for tag in self.descendants_tags():
            if tag.name in names:
                return tag
        return None

    def find_all(self, names, recursive: bool = True) -> list["Tag"]:
        if isinstance(names, str):
            names = [names]
        names = set(names)
        if recursive:
            return [t for t in self.descendants_tags() if t.name in names]
        return [
            c for c in self.children if isinstance(c, Tag) and c.name in names
        ]

    def descendants_tags(self) -> Iterator["Tag"]:
        stack: list[Child] = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, Tag):
                yield node
                stack.extend(reversed(node.children))

    def next_siblings(self, child: Child) -> list[Child]:
        """Siblings after ``child`` in this tag (bs4 ``.next_siblings``)."""
        try:
            i = self.children.index(child)
        except ValueError:
            return []
        return self.children[i + 1 :]

    def replace_child(self, old: Child, new: Child) -> None:
        i = self.children.index(old)
        new.parent = self
        self.children[i] = new

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Tag {self.name} children={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Tag("[document]")
        self.stack: list[Tag] = [self.root]
        self._raw_depth = 0

    # -- helpers ----------------------------------------------------------

    def _top(self) -> Tag:
        return self.stack[-1]

    def _imply_close(self, incoming: str) -> None:
        # close innermost open elements whose implied-closer set contains the
        # incoming tag (repeat, e.g. <td> inside <tr> inside open <td>)
        while len(self.stack) > 1:
            open_name = self._top().name
            closers = _IMPLIED_CLOSERS.get(open_name)
            if closers and incoming in closers:
                self.stack.pop()
            else:
                break

    # -- HTMLParser events -------------------------------------------------

    def handle_starttag(self, name, attrs):
        self._imply_close(name)
        tag = Tag(name, dict(attrs))
        self._top().append(tag)
        if name in VOID_ELEMENTS:
            return
        self.stack.append(tag)
        if name in RAW_TEXT_ELEMENTS:
            self._raw_depth += 1

    def handle_startendtag(self, name, attrs):
        self._imply_close(name)
        self._top().append(Tag(name, dict(attrs)))

    def handle_endtag(self, name):
        if name in VOID_ELEMENTS:
            return
        # find matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == name:
                for popped in self.stack[i:]:
                    if popped.name in RAW_TEXT_ELEMENTS:
                        self._raw_depth -= 1
                del self.stack[i:]
                return

    def handle_data(self, data):
        if not data:
            return
        kind = "raw" if self._raw_depth > 0 else "text"
        top = self._top()
        # merge adjacent same-kind text nodes (parser may split on entities)
        if top.children and isinstance(top.children[-1], TextNode) and top.children[-1].kind == kind:
            top.children[-1].data += data
        else:
            top.append(TextNode(data, kind))

    def handle_comment(self, data):
        self._top().append(TextNode(data, "comment"))

    def handle_decl(self, decl):
        self._top().append(TextNode(decl, "decl"))

    def handle_pi(self, data):
        self._top().append(TextNode(data, "decl"))


def parse_html(data: Union[bytes, str], encoding: Optional[str] = None) -> Tag:
    """Parse HTML bytes/str into a DOM; returns the ``[document]`` root.

    Bytes with no explicit ``encoding`` go through the WHATWG-style
    sniffer (BOM → declared meta charset → UTF-8 trial → windows-1252),
    matching the reference's BeautifulSoup/UnicodeDammit behaviour on
    raw payloads (``html_backend.py:75``)."""
    if isinstance(data, bytes):
        if encoding is None:
            data = decode_html(data)
        else:
            data = data.decode(encoding, errors="replace")
    builder = _TreeBuilder()
    builder.feed(data)
    builder.close()
    return builder.root


def find_body(root: Tag) -> Tag:
    """``soup.body or soup`` (reference: html_backend.py:121)."""
    body = root.find("body")
    return body if body is not None else root
