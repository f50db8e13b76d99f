"""schema.org microdata extraction (WHATWG HTML §5: itemscope /
itemtype / itemprop) — the structured-data channel WebDataCommons mines
from Common Crawl at billions-of-triples scale, complementing the
JSON-LD pass in ``operators/extract.py:extract_page_meta`` (the two are
the dominant embedded-structured-data syntaxes in crawl data).

Subset disclosed: ``itemref`` (cross-tree property grafting) and
``itemid`` are not walked — WebDataCommons' own extractor statistics
show they appear on well under 1 % of items; elements carrying them
still contribute their in-tree properties.

Value extraction follows the WHATWG property-value algorithm:
``meta`` → ``content``, ``a/area/link`` → ``href``, ``img/audio/video/
embed/iframe/source/track`` → ``src``, ``time`` → ``datetime`` (falling
back to text), ``data`` → ``value``, anything else → whitespace-
normalized descendant text. URL-valued properties stay as written
(resolution against the page URL is the caller's join —
``extract_image_refs`` shows the resolver pattern).
"""

from __future__ import annotations

from typing import Optional

from .dom import Tag, parse_html

_HREF_TAGS = {"a", "area", "link"}
_SRC_TAGS = {"img", "audio", "video", "embed", "iframe", "source", "track"}


def _prop_value(tag: Tag) -> str:
    if tag.name == "meta":
        return (tag.get("content") or "").strip()
    if tag.name in _HREF_TAGS:
        return (tag.get("href") or "").strip()
    if tag.name in _SRC_TAGS:
        return (tag.get("src") or "").strip()
    if tag.name == "time":
        dt = (tag.get("datetime") or "").strip()
        if dt:
            return dt
    if tag.name == "data":
        return (tag.get("value") or "").strip()
    return " ".join(tag.text.split())


def microdata_rows(data: bytes) -> list[dict]:
    """HTML bytes → one dict per (item, property), plus one ``prop=''``
    marker row for property-less items so every item surfaces.

    Items are numbered in document order of their ``itemscope``
    elements; ``item_type`` is the first itemtype token (items may
    carry several — the first is the WebDataCommons class key);
    ``parent_item`` is the enclosing item a nested item is a property
    of (None for top-level items) and rides on every row of that item.
    A property whose element is itself an itemscope emits ``value=''``
    with ``ref_item`` = the nested item's number (the WHATWG "item
    value is an item" case); plain properties have ``ref_item`` None.
    Multi-token ``itemprop`` emits one row per token, wire order.
    Orphan ``itemprop`` outside any itemscope is ignored per spec.
    """
    root = parse_html(data)
    item_types: list[str] = []
    item_parent: list[Optional[int]] = []
    props: list[tuple[int, str, str, Optional[int]]] = []

    def walk(tag: Tag, ctx: Optional[int]) -> None:
        for child in tag.children:
            if not isinstance(child, Tag):
                continue
            child_ctx = ctx
            this_item: Optional[int] = None
            if "itemscope" in child.attrs:
                this_item = len(item_types)
                itype = (child.get("itemtype") or "").split()
                item_types.append(itype[0] if itype else "")
                item_parent.append(ctx)
                child_ctx = this_item
            names = (child.get("itemprop") or "").split()
            if names and ctx is not None:
                value = "" if this_item is not None else _prop_value(child)
                for p in names:
                    props.append((ctx, p, value, this_item))
            walk(child, child_ctx)

    walk(root, None)
    rows = [
        {
            "item_no": item,
            "item_type": item_types[item],
            "parent_item": item_parent[item],
            "prop": p,
            "value": value,
            "ref_item": ref,
        }
        for item, p, value, ref in props
    ]
    with_props = {r["item_no"] for r in rows}
    for i, itype in enumerate(item_types):
        if i not in with_props:
            rows.append(
                {
                    "item_no": i,
                    "item_type": itype,
                    "parent_item": item_parent[i],
                    "prop": "",
                    "value": "",
                    "ref_item": None,
                }
            )
    return rows
