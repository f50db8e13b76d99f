"""EPUB (2 and 3) e-book backend.

No reference counterpart (the reference never sees raw crawl payloads,
and docling routes unknown zips nowhere); first-class here because web
crawls regularly fetch ``.epub`` files — an EPUB is an OCF zip container
of XHTML chapters, so every chapter can ride the byte-parity HTML
extractor unchanged and the backend only has to do container plumbing:

* ``META-INF/container.xml``  -> locate the OPF package document
* OPF ``<metadata><dc:title>`` -> document TITLE
* OPF ``<manifest>``          -> id -> href (resolved against the OPF dir)
* OPF ``<spine>``             -> reading order of XHTML chapters

Each spine chapter is parsed with :func:`extract_html` and its body is
grafted under a ``chapter`` group (the same group PPTX uses per slide);
``page_no`` is the 1-based spine position so chunk provenance points at
the chapter. Non-XHTML spine entries (images-as-pages, SVG) become
PICTURE placeholders.

All zip member reads go through :class:`BoundedZipFile` (declared-size
bomb gate shared with the OOXML backends).
"""

from __future__ import annotations

import io
import posixpath
import re
import xml.etree.ElementTree as ET

from doc_parser_spark.core import model
from doc_parser_spark.core.limits import BoundedZipFile
from doc_parser_spark.core.model import Document

_CONTAINER_NS = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF_NS = "{http://www.idpf.org/2007/opf}"
_DC_NS = "{http://purl.org/dc/elements/1.1/}"

_XHTML_TYPES = {"application/xhtml+xml", "text/html", "application/x-dtbook+xml"}
_IMAGE_TYPES_RE = re.compile(r"^image/")


class EpubError(ValueError):
    """Structurally broken EPUB container (missing container.xml/OPF)."""


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _opf_path(zf: BoundedZipFile) -> str:
    try:
        container = zf.read("META-INF/container.xml")
    except KeyError as exc:
        raise EpubError("no META-INF/container.xml") from exc
    try:
        root = ET.fromstring(container)
    except ET.ParseError as exc:
        raise EpubError(f"bad container.xml: {exc}") from exc
    for rf in root.iter():
        if _localname(rf.tag) == "rootfile":
            path = rf.get("full-path")
            if path:
                return path
    raise EpubError("container.xml has no rootfile")


def _graft(dst: Document, src: Document, parent: model.Node, page_no: int) -> None:
    """Copy ``src``'s tree (minus its root) under ``dst``'s ``parent``.

    Preserves every node field the sinks/chunker read; remaps
    ``caption_ref`` through the old->new index map; rewrites ``page_no``
    to the chapter ordinal so chunk provenance is chapter-addressed.
    """
    index_map: dict[int, int] = {src.root.index: parent.index}
    stack = list(reversed(src.root.children))
    order: list[model.Node] = []
    while stack:
        idx = stack.pop()
        node = src.nodes[idx]
        order.append(node)
        stack.extend(reversed(node.children))
    for node in order:
        new_parent_idx = index_map.get(node.parent, parent.index)
        new_parent = dst.nodes[new_parent_idx]
        if node.is_group:
            bucket = "groups"
        elif node.label == model.TABLE:
            bucket = "tables"
        elif node.label == model.PICTURE:
            bucket = "pictures"
        else:
            bucket = "texts"
        new = dst._new_node(node.label, new_parent, bucket)
        index_map[node.index] = new.index
        for attr in ("text", "level", "marker", "enumerated", "content_layer",
                     "name", "table", "bbox", "bold", "italic", "hyperlink",
                     "underline", "strikethrough", "script", "has_formatting",
                     "orig", "charspan", "coord_origin", "image_meta"):
            setattr(new, attr, getattr(node, attr))
        new.page_no = page_no
        if node.caption_ref is not None:
            new.caption_ref = index_map.get(node.caption_ref)


def extract_epub(payload: bytes) -> Document:
    """EPUB container -> single Document (chapters in spine order)."""
    from doc_parser_spark.html.extractor import extract_html

    zf = BoundedZipFile(io.BytesIO(payload))
    opf_name = _opf_path(zf)
    try:
        opf = ET.fromstring(zf.read(opf_name))
    except (KeyError, ET.ParseError) as exc:
        raise EpubError(f"bad OPF package: {exc}") from exc
    opf_dir = posixpath.dirname(opf_name)

    doc = Document(name="epub")

    # metadata: dc:title (first one wins, as reading systems do)
    title = ""
    for el in opf.iter(f"{_DC_NS}title"):
        title = " ".join((el.text or "").split())
        if title:
            break
    if title:
        doc.add_text(title, label=model.TITLE)

    manifest: dict[str, tuple[str, str]] = {}
    for item in opf.iter(f"{_OPF_NS}item"):
        iid, href = item.get("id"), item.get("href")
        if iid and href:
            manifest[iid] = (href, item.get("media-type", ""))

    names = set(zf.namelist())
    chapter_no = 0
    for itemref in opf.iter(f"{_OPF_NS}itemref"):
        idref = itemref.get("idref", "")
        href, media = manifest.get(idref, ("", ""))
        if not href:
            continue
        member = posixpath.normpath(posixpath.join(opf_dir, href)) if opf_dir \
            else posixpath.normpath(href)
        if member not in names:
            continue
        chapter_no += 1
        group = doc.add_group(name=f"chapter {chapter_no}",
                              label=model.GROUP_CHAPTER)
        if media in _XHTML_TYPES or member.lower().endswith(
                (".xhtml", ".html", ".htm")):
            chapter = extract_html(zf.read(member))
            _graft(doc, chapter, group, chapter_no)
        elif _IMAGE_TYPES_RE.match(media) or media == "image/svg+xml":
            # image-as-page spine entries (fixed-layout picture books)
            doc.add_picture(parent=group, page_no=chapter_no)
    if chapter_no == 0:
        raise EpubError("spine resolves to no readable chapters")
    return doc
