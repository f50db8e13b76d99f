"""JATS (Journal Article Tag Suite) XML backend.

From-scratch reimplementation of the reference's JATS backend semantics
(``docling/backend/xml/jats_backend.py``, 707 LoC, lxml-based) on stdlib
ElementTree, validated byte-exact against the committed groundtruth
(``tests/data/groundtruth/docling_v2/{bmj_sample,elife-56337,pnas_sample,
pntd.0008301,pone.0234687}.xml.{md,itxt}``).

Behavioural contract (reference file:line):

* metadata: title from title-group children (article-title/subtitle/
  title/label direct text, " "-joined, titles "-"-joined) ..... :267-288
* authors paragraph + de-duplicated affiliations paragraph ..... :219-265, 316-340
* abstracts: one heading (label or "Abstract") + joined <p> text  :200-217, 299-314
* body/back walk: sec/ack headings (level 1, nested by parent),
  lists, figures (label+caption → caption ref), table-wrap via the
  HTML table grid parser, ref-list → "References" heading + list,
  element/mixed citations (flattened with the reference's exact
  punctuation), tex-math $$…$$ formulas ........................ :609-707
* <p> text accumulation with tail backpropagation and flush-tags  :609-707
"""

from __future__ import annotations

from typing import Optional
from xml.etree import ElementTree as ET

from doc_parser_spark.core import model
from doc_parser_spark.core.model import Document

DEFAULT_HEADER_ACKNOWLEDGMENTS = "Acknowledgments"
DEFAULT_HEADER_ABSTRACT = "Abstract"
DEFAULT_HEADER_REFERENCES = "References"
DEFAULT_TEXT_ETAL = "et al."

_SKIP_TEXT_TAGS = ("term", "disp-formula", "inline-formula")
_FLUSH_TAGS = ("ack", "sec", "list", "boxed-text", "disp-formula", "fig")


def _nl(s: Optional[str]) -> str:
    return s.replace("\n", " ") if s else ""


def _get_text(node: ET.Element, sep: Optional[str] = None) -> str:
    """Reference ``_get_text`` (jats_backend.py:172-187): recursive text
    with tails, skipping term/formula subtrees."""
    text = _nl(node.text) if node.tag not in _SKIP_TEXT_TAGS else ""
    for child in list(node):
        if child.tag not in _SKIP_TEXT_TAGS:
            text += _get_text(child, sep)
        if sep:
            text = text.rstrip(sep) + sep
        text += _nl(child.tail)
    return text


def _first(node: ET.Element, *tags: str) -> Optional[ET.Element]:
    """First DIRECT child whose tag is in ``tags`` (document order —
    the reference's ``xpath("title|label")[0]``)."""
    for child in list(node):
        if child.tag in tags:
            return child
    return None


class _JatsParser:
    def __init__(self, root: ET.Element) -> None:
        self.tree = root
        self.doc = Document()
        self.root_item: Optional[model.Node] = None
        self.parent_map = {c: p for p in root.iter() for c in p}

    # -- metadata -----------------------------------------------------------

    def _find_metadata(self) -> Optional[ET.Element]:
        for name in ("article-meta", "book-part-meta"):
            node = self.tree.find(f".//{name}")
            if node is not None:
                return node
        return None

    def _parse_title(self) -> str:
        meta_names = ("article-meta", "collection-meta", "book-meta", "book-part-meta")
        title_names = ("article-title", "subtitle", "title", "label")
        titles = []
        for meta in meta_names:
            for title_node in self.tree.findall(f".//{meta}/title-group"):
                titles.append(
                    " ".join(
                        _nl(elem.text).strip()
                        for elem in list(title_node)
                        if elem.tag in title_names
                    ).strip()
                )
        return " - ".join(titles)

    def _parse_abstracts(self) -> list[dict]:
        out = []
        for abs_node in self.tree.findall(".//abstract"):
            texts = [
                _get_text(p).strip() for p in abs_node.findall("p")
            ]
            label = ""
            label_node = _first(abs_node, "title", "label")
            if label_node is not None and label_node.text:
                label = label_node.text.strip()
            out.append({"label": label, "content": " ".join(texts)})
        return out

    def _parse_authors(self) -> list[dict]:
        authors: list[dict] = []
        meta = self._find_metadata()
        if meta is None:
            return authors
        aff_names = {}
        for aff in meta.findall(".//aff[@id]"):
            name = ", ".join(t for t in aff.itertext() if t.strip())
            name = name.replace("\n", " ")
            label = aff.find("label")
            if label is not None and label.text:
                prefix = f"{label.text}, "
                if name.startswith(prefix):
                    name = name[len(prefix):]
            aff_names[aff.get("id")] = name
        for contrib in meta.findall(".//contrib-group/contrib"):
            if contrib.get("contrib-type") != "author":
                continue
            affs = []
            for xref in contrib.findall("xref"):
                if xref.get("ref-type") == "aff" and xref.get("rid") in aff_names:
                    affs.append(aff_names[xref.get("rid")])
            name = contrib.find("name")
            if name is None:
                continue
            given = name.find("given-names")
            surname = name.find("surname")
            if given is None or surname is None:
                continue
            authors.append(
                {"name": f"{given.text} {surname.text}", "affiliation_names": affs}
            )
        return authors

    def add_metadata(self) -> None:
        doc = self.doc
        self.root_item = doc.add_text(text=self._parse_title(), label=model.TITLE)
        authors = self._parse_authors()
        authors_str = ", ".join(a["name"] for a in authors)
        affiliations = [n for a in authors for n in a["affiliation_names"]]
        affiliations_str = "; ".join(dict.fromkeys(affiliations))
        if authors_str:
            doc.add_text(
                text=authors_str, label=model.PARAGRAPH, parent=self.root_item
            )
        if affiliations_str:
            doc.add_text(
                text=affiliations_str, label=model.PARAGRAPH, parent=self.root_item
            )
        for abstract in self._parse_abstracts():
            if not abstract["content"]:
                continue
            parent = doc.add_heading(
                text=abstract["label"] or DEFAULT_HEADER_ABSTRACT,
                level=1,
                parent=self.root_item,
            )
            doc.add_text(text=abstract["content"], label=model.TEXT, parent=parent)

    # -- citations (jats_backend.py:350-474) ---------------------------------

    def _parse_element_citation(self, node: ET.Element) -> str:
        c = {
            "author_names": "", "title": "", "source": "", "year": "",
            "volume": "", "page": "", "pub_id": "",
            "publisher_name": "", "publisher_loc": "",
        }
        names = []
        for name_node in node.findall(".//name"):
            surname = name_node.find("surname")
            given = name_node.find("given-names")
            if surname is None or given is None:
                continue
            names.append(
                _nl(surname.text).strip() + " " + _nl(given.text).strip()
            )
        etal = node.find(".//etal")
        if etal is not None:
            names.append(etal.text or DEFAULT_TEXT_ETAL)
        c["author_names"] = ", ".join(names)

        title_node = None
        for name in (
            "article-title", "chapter-title", "data-title",
            "issue-title", "part-title", "trans-title",
        ):
            title_node = node.find(name)
            if title_node is not None:
                break
        c["title"] = (
            _get_text(title_node)
            if title_node is not None
            else _nl(node.text).strip()
        )

        for item in ("source", "year", "publisher-name", "publisher-loc", "volume"):
            item_node = node.find(item)
            if item_node is not None and item_node.text:
                c[item.replace("-", "_")] = _nl(item_node.text).strip()

        pub_ids = []
        for id_node in node.findall("pub-id"):
            id_type = id_node.get("assigning-authority") or id_node.get("pub-id-type")
            if id_type and id_node.text:
                pub_ids.append(
                    _nl(id_type).strip().upper() + ": " + _nl(id_node.text).strip()
                )
        if pub_ids:
            c["pub_id"] = ", ".join(pub_ids)

        eloc = node.find("elocation-id")
        fpage = node.find("fpage")
        if eloc is not None and eloc.text:
            c["page"] = _nl(eloc.text).strip()
        elif fpage is not None and fpage.text:
            c["page"] = _nl(fpage.text).strip()
            lpage = node.find("lpage")
            if lpage is not None and lpage.text:
                c["page"] += "–" + _nl(lpage.text).strip()

        text = ""
        if c["author_names"]:
            text += c["author_names"].rstrip(".") + ". "
        if c["title"]:
            text += c["title"] + ". "
        if c["source"]:
            text += c["source"] + ". "
        if c["publisher_name"]:
            if c["publisher_loc"]:
                text += f"{c['publisher_loc']}: "
            text += c["publisher_name"] + ". "
        if c["volume"]:
            text = text.rstrip(". ")
            text += f" {c['volume']}. "
        if c["page"]:
            text = text.rstrip(". ")
            if c["volume"]:
                text += ":"
            text += c["page"] + ". "
        if c["year"]:
            text = text.rstrip(". ")
            text += f" ({c['year']})."
        if c["pub_id"]:
            text = text.rstrip(".") + ". "
            text += c["pub_id"]
        return text

    def _add_citation(self, parent: Optional[model.Node], text: str) -> None:
        if parent is not None and parent.is_group and parent.label == model.GROUP_LIST:
            self.doc.add_list_item(text=text, enumerated=False, parent=parent)
        else:
            self.doc.add_text(text=text, label=model.TEXT, parent=parent)

    # -- figures / tables / equations ----------------------------------------

    def _caption_paragraphs(self, node: ET.Element) -> Optional[str]:
        caption_node = node.find("caption")
        if caption_node is None:
            return None
        caption = ""
        for par in list(caption_node):
            if par.find(".//supplementary-material") is not None:
                continue
            caption += _get_text(par).strip() + " "
        return caption.strip()

    def _add_figure(self, parent: Optional[model.Node], node: ET.Element) -> None:
        label_node = node.find("label")
        label = _get_text(label_node).strip() if label_node is not None else ""
        caption = self._caption_paragraphs(node)
        fig_text = f"{label}{' ' if label and caption else ''}{caption or ''}"
        fig_caption = (
            self.doc.add_text(label=model.CAPTION, text=fig_text)
            if fig_text
            else None
        )
        self.doc.add_picture(parent=parent, caption=fig_caption)

    def _add_table_wrap(self, parent: Optional[model.Node], node: ET.Element) -> None:
        from doc_parser_spark.html.dom import parse_html
        from doc_parser_spark.html.extractor import parse_table_data

        table_el = node.find("table")
        if table_el is None:
            table_el = node.find("alternatives/table")
        content = (
            ET.tostring(table_el, encoding="unicode") if table_el is not None else ""
        )
        caption = self._caption_paragraphs(node) or ""
        label_node = node.find("label")
        label = label_node.text if (label_node is not None and label_node.text) else ""
        table_text = f"{label}{' ' if label and caption else ''}{caption}"
        table_caption = (
            self.doc.add_text(label=model.CAPTION, text=table_text)
            if table_text
            else None
        )
        try:
            dom = parse_html(content)
            table_tag = dom.find("table")
            if table_tag is None:
                return
            data = parse_table_data(table_tag)
            if data is not None:
                # JATS-path table markdown renders HTML-escaped AFTER
                # column padding (groundtruth: '&lt;15' cells overflow
                # their column) while HTML-path cells stay raw
                # (example_04: 'Row 1 & 2') — flag the table; the model
                # keeps unescaped text
                data.escape_cells = True
                self.doc.add_table(data=data, parent=parent, caption=table_caption)
        except Exception:
            pass  # reference: "Skipping unsupported table"

    def _add_equation(self, parent: Optional[model.Node], node: ET.Element) -> None:
        math_parts = (node.text or "").split("$$")
        if len(math_parts) == 3:
            self.doc.add_text(
                label=model.FORMULA, text=math_parts[1], parent=parent
            )

    # -- linear walk (jats_backend.py:609-707) --------------------------------

    def walk_linear(
        self, parent: Optional[model.Node], node: ET.Element
    ) -> str:
        doc = self.doc
        new_parent = parent
        node_text = _nl(node.text) if node.tag not in ("term",) else ""

        for child in list(node):
            stop_walk = False

            if node.tag == "p" and node_text.strip() and child.tag in _FLUSH_TAGS:
                doc.add_text(
                    label=model.TEXT, text=node_text.strip(), parent=parent
                )
                node_text = ""

            if child.tag in ("sec", "ack"):
                header = _first(child, "title", "label")
                text: Optional[str] = None
                if header is not None:
                    text = _get_text(header)
                elif child.tag == "ack":
                    text = DEFAULT_HEADER_ACKNOWLEDGMENTS
                if text:
                    new_parent = doc.add_heading(text=text, level=1, parent=parent)
            elif child.tag == "list":
                new_parent = doc.add_group(
                    label=model.GROUP_LIST, name="list", parent=parent
                )
            elif child.tag == "list-item":
                text = _get_text(child).strip()
                new_parent = doc.add_list_item(text=text, parent=parent)
                stop_walk = True
            elif child.tag == "fig":
                self._add_figure(parent, child)
                stop_walk = True
            elif child.tag == "table-wrap":
                self._add_table_wrap(parent, child)
                stop_walk = True
            elif child.tag == "suplementary-material":
                stop_walk = True  # (sic — the reference's typo is contract)
            elif child.tag == "fn-group":
                stop_walk = True
            elif child.tag == "ref-list" and node.tag != "ref-list":
                header = _first(child, "title", "label")
                text = (
                    _get_text(header)
                    if header is not None
                    else DEFAULT_HEADER_REFERENCES
                )
                new_parent = doc.add_heading(text=text, level=1, parent=parent)
                new_parent = doc.add_group(
                    label=model.GROUP_LIST, name="list", parent=new_parent
                )
            elif child.tag == "element-citation":
                text = self._parse_element_citation(child)
                self._add_citation(parent, text)
                stop_walk = True
            elif child.tag == "mixed-citation":
                text = _get_text(child).strip()
                self._add_citation(parent, text)
                stop_walk = True
            elif child.tag == "tex-math":
                self._add_equation(parent, child)
                stop_walk = True
            elif child.tag == "inline-formula":
                stop_walk = True

            if not stop_walk:
                new_text = self.walk_linear(new_parent, child)
                grandparent = self.parent_map.get(node)
                if not (
                    grandparent is not None
                    and grandparent.tag == "p"
                    and node.tag in _FLUSH_TAGS
                ):
                    node_text += new_text
            node_text += _nl(child.tail)

        if node.tag == "p" and node_text.strip():
            doc.add_text(label=model.TEXT, text=node_text.strip(), parent=parent)
            return ""
        return node_text


def extract_jats(data: bytes) -> Document:
    """JATS article XML → structured Document (title/authors/abstract/
    sections/figures/tables/formulas/references). Partial-document-on-error
    like the reference's convert() (jats_backend.py:141-169)."""
    try:
        root = ET.fromstring(data.decode("utf-8", errors="replace"))
    except ET.ParseError:
        return Document()
    parser = _JatsParser(root)
    try:
        parser.add_metadata()
        body = root.find(".//body")
        if parser.root_item is not None and body is not None:
            parser.walk_linear(parser.root_item, body)
        back = root.find(".//back")
        if parser.root_item is not None and back is not None:
            parser.walk_linear(parser.root_item, back)
    except Exception:
        pass
    return parser.doc


def looks_like_jats(data: bytes) -> bool:
    """Cheap sniff: JATS doctypes/root tags (reference registers JATS for
    article/book dtds — docling/datamodel/document.py XML routing)."""
    head = data[:4096].decode("utf-8", errors="replace").lower()
    return "<article" in head and ("jats" in head or "article-meta" in head)
