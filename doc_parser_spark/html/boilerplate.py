"""Densitometric boilerplate detection: text-density + link-density
block classification over the DOM, the readability/boilerpipe signal
family (Kohlschütter, Fankhauser & Nejdl 2010, "Boilerplate Detection
Using Shallow Text Features", WSDM — the published NumWordsRules
decision tree), with trafilatura-style structural priors
(nav/aside/footer/form subtrees are boilerplate regardless of density).

This complements the structural furniture rule in ``html/extractor.py``
(which is byte-parity-matched to the reference backend): the density
classifier needs no site-specific structure and holds up on crawl pages
whose markup carries no semantic tags. Pure Python over the own-DOM —
runs inside the Arrow extraction kernel; all thresholds are the
published constants, so classification is deterministic.

Reference behavior: boilerpipe ``NumWordsRulesClassifier`` (decision
rules quoted from the WSDM paper's C4.8 tree over
(prev, curr, next) block features); the reference repo itself has no
density path — its HTML backend keeps the full body (html_backend.py) —
so this is engine-side capability for raw-crawl precision.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from doc_parser_spark.html.dom import Tag, TextNode, find_body, parse_html

# elements that break the inline flow: a maximal run of inline content
# between them is one text block (boilerpipe's block segmentation unit)
_BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li",
    "main", "nav", "noscript", "ol", "p", "pre", "section", "table",
    "td", "th", "tr", "ul",
}

# subtrees that are boilerplate by construction (structural prior;
# trafilatura's discard list) — density cannot rescue them
_DISCARD_TAGS = {"nav", "aside", "footer", "form", "noscript"}

# subtrees that never contribute visible text
_INVISIBLE_TAGS = {"script", "style", "template", "head", "title", "iframe"}

_WS = re.compile(r"\s+")

# boilerpipe wraps text at 80 columns to estimate line counts for
# text density (words per wrapped line)
_WRAP_COLS = 80


@dataclass
class Block:
    """One inline-flow text block with its shallow features."""

    text: str
    n_words: int
    n_chars: int
    link_chars: int
    heading: bool = False
    discarded: bool = False  # inside a structural-prior subtree
    content: bool = field(default=False)  # filled by classify_blocks

    @property
    def link_density(self) -> float:
        return self.link_chars / self.n_chars if self.n_chars else 0.0

    @property
    def text_density(self) -> float:
        """Words per 80-column wrapped line (boilerpipe §4.2)."""
        lines = max(1, -(-self.n_chars // _WRAP_COLS))
        return self.n_words / lines


def _norm(s: str) -> str:
    return _WS.sub(" ", s).strip()


def segment_blocks(root: Tag) -> list[Block]:
    """DOM → flat list of inline-flow text blocks with features."""
    blocks: list[Block] = []
    run_text: list[str] = []
    run_link: list[int] = [0]
    run_heading: list[bool] = [False]

    def flush(discarded: bool) -> None:
        text = _norm("".join(run_text))
        if text:
            blocks.append(
                Block(
                    text=text,
                    n_words=len(text.split()),
                    n_chars=len(text),
                    link_chars=min(run_link[0], len(text)),
                    heading=run_heading[0],
                    discarded=discarded,
                )
            )
        run_text.clear()
        run_link[0] = 0
        run_heading[0] = False

    def walk(tag: Tag, in_link: bool, discarded: bool, in_heading: bool) -> None:
        for child in tag.children:
            if isinstance(child, TextNode):
                if child.is_text and child.data:
                    run_text.append(child.data)
                    if in_link:
                        run_link[0] += len(_norm(child.data))
                    if in_heading:
                        run_heading[0] = True
                continue
            name = child.name
            if name in _INVISIBLE_TAGS:
                continue
            if name in _BLOCK_TAGS:
                flush(discarded)
                walk(
                    child,
                    in_link,
                    discarded or name in _DISCARD_TAGS,
                    in_heading or name in ("h1", "h2", "h3", "h4", "h5", "h6"),
                )
                flush(discarded or name in _DISCARD_TAGS)
            else:
                walk(
                    child,
                    in_link or name == "a",
                    discarded,
                    in_heading,
                )

    walk(root, False, False, False)
    flush(False)
    return blocks


def classify_blocks(blocks: list[Block]) -> list[Block]:
    """Content/boilerplate labels via the published NumWordsRules tree
    over (prev, curr, next) word counts and link densities, with the
    structural-prior override; headings are kept iff the following
    classified block is content (boilerpipe's heading policy)."""
    n = len(blocks)

    def words(i: int) -> int:
        return blocks[i].n_words if 0 <= i < n else 0

    def ld(i: int) -> float:
        return blocks[i].link_density if 0 <= i < n else 0.0

    for i, b in enumerate(blocks):
        if b.discarded:
            b.content = False
            continue
        # NumWordsRulesClassifier (WSDM 2010 §6 / boilerpipe source)
        if ld(i) > 0.333333:
            b.content = False
        elif ld(i - 1) <= 0.555556:
            if words(i) <= 16 and words(i + 1) <= 15 and words(i - 1) <= 4:
                b.content = False
            else:
                b.content = True
        else:
            b.content = words(i) > 40 or words(i + 1) > 17
    # heading rescue pass: a short heading rides the verdict of the next
    # non-heading block
    for i, b in enumerate(blocks):
        if b.heading and not b.discarded:
            j = i + 1
            while j < n and blocks[j].heading:
                j += 1
            if j < n:
                b.content = blocks[j].content
    return blocks


def extract_main_text(data: bytes) -> str:
    """HTML bytes → density-classified main-content text (blocks joined
    with blank lines, document order)."""
    root = parse_html(data)
    body = find_body(root)
    blocks = classify_blocks(segment_blocks(body))
    return "\n\n".join(b.text for b in blocks if b.content)


def block_features(data: bytes) -> list[dict]:
    """HTML bytes → per-block shallow-feature records (the signal table a
    learned boilerplate model trains/serves on)."""
    root = parse_html(data)
    body = find_body(root)
    out = []
    for i, b in enumerate(classify_blocks(segment_blocks(body))):
        out.append(
            {
                "block_id": i,
                "text": b.text,
                "n_words": b.n_words,
                "n_chars": b.n_chars,
                "link_density": b.link_density,
                "text_density": b.text_density,
                "heading": b.heading,
                "discarded": b.discarded,
                "content": b.content,
            }
        )
    return out
