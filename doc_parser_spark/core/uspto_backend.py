"""USPTO patent backend: 4 dialects, stdlib ``xml.sax``.

From-scratch reimplementation of the reference's USPTO backend semantics
(``docling/backend/xml/uspto_backend.py``, 1905 LoC), validated byte-exact
against the committed groundtruth (``tests/data/groundtruth/docling_v2/
{pftaps057006474,pa20010031492,ipa*,pg06442728}.{md,itxt}``).

Dialects (reference file:line):

* Grant APS text (1976-2001), ``PATN`` key-value lines ........ :848-1061
* Grant v2.5 SGML-ish (``PATDOC``/``PDAT``) ................... :503-846
* Application v1.x (``patent-application-publication``) ....... :1063-1410
* ICE v4.x applications + grants (``us-patent-*``) ............ :167-501
* OASIS exchange-model tables (tgroup/colspec offsets) ........ :1412-1695
* super/sub-script + ISO-8879 Greek entity styling ............ :1697-1905

USPTO itxt groundtruth uses the UNTRUNCATED ``_export_to_indented_text()``.
"""

from __future__ import annotations

import html
import io
import re
import xml.sax
import xml.sax.handler
from typing import Optional

from doc_parser_spark.core import model
from doc_parser_spark.core.model import Document

ABSTRACT_HEADING = ("ABSTRACT", 2)
CLAIMS_HEADING = ("CLAIMS", 2)

_XML_DECLARATION = '<?xml version="1.0" encoding="UTF-8"?>'


# ---------------------------------------------------------------------------
# styled-character entities (reference HtmlEntity, :1697-1905)
# ---------------------------------------------------------------------------

_SUPERSCRIPT = str.maketrans({
    "1": "&sup1;", "2": "&sup2;", "3": "&sup3;", "4": "&#8308;",
    "5": "&#8309;", "6": "&#8310;", "7": "&#8311;", "8": "&#8312;",
    "9": "&#8313;", "0": "&#8304;", "+": "&#8314;", "-": "&#8315;",
    "−": "&#8315;", "=": "&#8316;", "(": "&#8317;", ")": "&#8318;",
    "a": "&#170;", "o": "&#186;", "i": "&#8305;", "n": "&#8319;",
})
_SUBSCRIPT = str.maketrans({
    "1": "&#8321;", "2": "&#8322;", "3": "&#8323;", "4": "&#8324;",
    "5": "&#8325;", "6": "&#8326;", "7": "&#8327;", "8": "&#8328;",
    "9": "&#8329;", "0": "&#8320;", "+": "&#8330;", "-": "&#8331;",
    "−": "&#8331;", "=": "&#8332;", "(": "&#8333;", ")": "&#8334;",
    "a": "&#8336;", "e": "&#8337;", "o": "&#8338;", "x": "&#8339;",
})
_MATH_ITALIC = str.maketrans({
    c: f"&#{119860 + i};" for i, c in enumerate("ABCDEFGHIJKLMNOPQRSTUVW")
} | {"Y": "&#119884;", "Z": "&#119885;"} | {
    c: f"&#{119886 + i};" for i, c in enumerate("abcdefghijklmnopqrstuvwxyz")
})
_ISO8879_GREEK = {
    "&Agr;": "&Alpha;", "&Bgr;": "&Beta;", "&Ggr;": "&Gamma;",
    "&Dgr;": "&Delta;", "&Egr;": "&Epsilon;", "&Zgr;": "&Zeta;",
    "&EEgr;": "&Eta;", "&THgr;": "&Theta;", "&Igr;": "&Iota;",
    "&Kgr;": "&Kappa;", "&Lgr;": "&Lambda;", "&Mgr;": "&Mu;",
    "&Ngr;": "&Nu;", "&Xgr;": "&Xi;", "&Ogr;": "&Omicron;",
    "&Pgr;": "&Pi;", "&Rgr;": "&Rho;", "&Sgr;": "&Sigma;",
    "&Tgr;": "&Tau;", "&Ugr;": "&Upsilon;", "&PHgr;": "&Phi;",
    "&KHgr;": "&Chi;", "&PSgr;": "&Psi;", "&OHgr;": "&Omega;",
    "&agr;": "&alpha;", "&bgr;": "&beta;", "&ggr;": "&gamma;",
    "&dgr;": "&delta;", "&egr;": "&epsilon;", "&zgr;": "&zeta;",
    "&eegr;": "&eta;", "&thgr;": "&theta;", "&igr;": "&iota;",
    "&kgr;": "&kappa;", "&lgr;": "&lambda;", "&mgr;": "&mu;",
    "&ngr;": "&nu;", "&xgr;": "&xi;", "&ogr;": "&omicron;",
    "&pgr;": "&pi;", "&rgr;": "&rho;", "&sgr;": "&sigmaf;",
    "&tgr;": "&tau;", "&ugr;": "&upsilon;", "&phgr;": "&phi;",
    "&khgr;": "&chi;", "&psgr;": "&psi;", "&ohgr;": "&omega;",
}


def _superscript(text: str) -> str:
    return html.unescape(text.translate(_SUPERSCRIPT))


def _subscript(text: str) -> str:
    return html.unescape(text.translate(_SUBSCRIPT))


def _math_italic(text: str) -> str:
    return html.unescape(text.translate(_MATH_ITALIC))


def _greek_from_iso8879(entity: str) -> str:
    return _ISO8879_GREEK.get(entity, entity)


# ---------------------------------------------------------------------------
# shared SAX machinery for the three XML dialects
# ---------------------------------------------------------------------------


class _BaseHandler(xml.sax.handler.ContentHandler):
    """Common state: property stack, text accumulation, styling, entity
    handling (the reference repeats this block per dialect)."""

    # subclass contract
    DOC_ELEMENTS: tuple = ()
    TEXT_TAGS: frozenset = frozenset()
    ALL_TAGS: frozenset = frozenset()
    SUP_TAG = ""
    SUB_TAG = ""
    ITALIC_TAG = ""

    def __init__(self) -> None:
        super().__init__()
        self.doc: Optional[Document] = None
        self.level = 1
        self.parents: dict[int, Optional[model.Node]] = {1: None}
        self.property: list[str] = []
        self.claim = ""
        self.claims: list[str] = []
        self.abstract = ""
        self.text = ""

    def _is_text(self, tag: str) -> bool:
        return tag in self.TEXT_TAGS

    def _apply_style(self, text: str, style_tag: str) -> str:
        if style_tag == self.SUP_TAG:
            return _superscript(text)
        if style_tag == self.SUB_TAG:
            return _subscript(text)
        if style_tag and style_tag == self.ITALIC_TAG:
            return _math_italic(text)
        return text

    def _absorb(self, content: str) -> None:
        if not self.property:
            return
        top = self.property[-1]
        if not self._is_text(top):
            return
        if top in (self.SUP_TAG, self.SUB_TAG):
            if len(self.property) < 2:
                return
            if self._is_text(self.property[-2]):
                self.text += self._apply_style(content, top)
        else:
            self.text += content

    def characters(self, content):
        self._absorb(content)

    def skippedEntity(self, name):
        escaped = _greek_from_iso8879(f"&{name};")
        unescaped = html.unescape(escaped)
        if unescaped == escaped:
            return
        self._absorb(unescaped)

    def _add_abstract_section(self, abstract: str) -> None:
        heading_level = (
            ABSTRACT_HEADING[1] if ABSTRACT_HEADING[1] in self.parents else 1
        )
        item = self.doc.add_heading(
            ABSTRACT_HEADING[0], level=heading_level,
            parent=self.parents[heading_level],
        )
        self.doc.add_text(label=model.PARAGRAPH, text=abstract, parent=item)

    def _add_claims_section(self) -> None:
        heading_level = (
            CLAIMS_HEADING[1] if CLAIMS_HEADING[1] in self.parents else 1
        )
        item = self.doc.add_heading(
            CLAIMS_HEADING[0], level=heading_level,
            parent=self.parents[heading_level],
        )
        for text in self.claims:
            self.doc.add_text(label=model.PARAGRAPH, text=text, parent=item)

    def _add_placeholder_table(self) -> None:
        self.doc.add_table(
            data=model.TableData(num_rows=0, num_cols=0),
            parent=self.parents[self.level],
        )


class _IceHandler(_BaseHandler):
    """ICE v4.x applications + grants (reference :167-501)."""

    DOC_ELEMENTS = ("us-patent-application", "us-patent-grant")
    TEXT_TAGS = frozenset(
        ("abstract", "invention-title", "claim-text", "p", "heading",
         "description-of-drawings", "sup", "sub")
    )
    ALL_TAGS = TEXT_TAGS | frozenset(
        ("claims", "claim", "description", "table", "maths")
    )
    SUP_TAG, SUB_TAG = "sup", "sub"

    def startElement(self, tag, attributes):
        if tag in self.DOC_ELEMENTS:
            self.doc = Document()
            self.text = ""
        if tag in self.ALL_TAGS:
            if (
                tag == "claim-text"
                and self.property
                and self.property[-1] == tag
                and self.text.strip()
            ):
                self.claim += " " + self.text.strip()
                self.text = ""
            elif tag == "heading":
                level_attr = attributes.get("level", "")
                new_level = int(level_attr) if level_attr.isdecimal() else 1
                max_level = min(self.parents.keys())
                self.level = (
                    new_level + 1 if (new_level + 1) in self.parents else max_level
                )
            self.property.append(tag)

    def endElement(self, tag):
        if tag in self.DOC_ELEMENTS:
            self.property = []
            self.claim = ""
            self.claims = []
            self.abstract = ""
        if tag in self.ALL_TAGS and self.property:
            current = self.property.pop()
            self._add_property(current, self.text.strip())

    def _add_property(self, name: str, text: str) -> None:
        if not name or self.doc is None:
            return
        if name == "invention-title":
            if text:
                self.parents[self.level + 1] = self.doc.add_text(
                    label=model.TITLE, parent=self.parents[self.level], text=text
                )
                self.level += 1
            self.text = ""
        elif name == "abstract":
            if self.abstract:
                self._add_abstract_section(self.abstract)
        elif name == "claim-text":
            text = re.sub(r"\s+", " ", text).strip()
            if text:
                self.claim += " " + text
            self.text = ""
        elif name == "claim" and self.claim:
            self.claims.append(self.claim.strip())
            self.claim = ""
        elif name == "claims" and self.claims:
            self._add_claims_section()
        elif name == "p" and text:
            text = re.sub(r"\s+", " ", text)
            if "abstract" in self.property:
                self.abstract = (
                    (self.abstract + " " + text) if self.abstract else text
                )
            else:
                self.doc.add_text(
                    label=model.PARAGRAPH, text=text,
                    parent=self.parents[self.level],
                )
            self.text = ""
        elif name == "heading" and text:
            self.parents[self.level + 1] = self.doc.add_heading(
                text=text, level=self.level, parent=self.parents[self.level]
            )
            self.level += 1
            self.text = ""
        elif name == "table":
            self._add_placeholder_table()


class _GrantV2Handler(_BaseHandler):
    """Grant v2.5 (PATDOC/PDAT; reference :503-846)."""

    DOC_ELEMENTS = ("PATDOC",)
    TEXT_TAGS = frozenset(("PDAT", "PARA", "H"))
    ALL_TAGS = TEXT_TAGS | frozenset(
        ("SDOAB", "SDOCL", "B540", "CL", "CLM", "DRWDESC", "SP", "SB",
         "ITALIC", "CWU", "table")
    )
    SUP_TAG, SUB_TAG, ITALIC_TAG = "SP", "SB", "ITALIC"

    def __init__(self) -> None:
        super().__init__()
        self.paragraph = ""

    def _is_text(self, tag: str) -> bool:
        return tag == "PDAT"

    def startElement(self, tag, attributes):
        if tag in self.DOC_ELEMENTS:
            self.doc = Document()
            self.text = ""
        if tag in self.ALL_TAGS:
            if tag == "H" and "SDOCL" not in self.property:
                level_attr = attributes.get("LVL", "")
                new_level = int(level_attr) if level_attr.isdecimal() else 1
                max_level = min(self.parents.keys())
                self.level = (
                    new_level + 1 if (new_level + 1) in self.parents else max_level
                )
            self.property.append(tag)

    def endElement(self, tag):
        if tag in self.DOC_ELEMENTS:
            self.text = ""
            self.property = []
            self.claim = ""
            self.claims = []
            self.paragraph = ""
            self.abstract = ""
        if tag in self.ALL_TAGS and self.property:
            current = self.property.pop()
            self._add_property(current, self.text)

    def _add_property(self, name: str, text: str) -> None:
        if not name or self.doc is None:
            return
        if name == "PDAT" and text:
            if not self.property:
                self.text = ""
                return
            wrapper = self.property[-1]
            text = self._apply_style(text, wrapper)
            if "B540" in self.property and text.strip():
                self.parents[self.level + 1] = self.doc.add_text(
                    label=model.TITLE, parent=self.parents[self.level],
                    text=text.strip(),
                )
                self.level += 1
            elif "SDOAB" in self.property:
                self.abstract += text
            elif "CLM" in self.property:
                self.claim += text
            elif (
                "PARA" in self.property
                and "CLM" not in self.property
                and "SDOAB" not in self.property
            ):
                self.paragraph += text
            elif (
                "H" in self.property
                and "SDOCL" not in self.property
                and text.strip()
            ):
                self.parents[self.level + 1] = self.doc.add_heading(
                    text=text.strip(), level=self.level,
                    parent=self.parents[self.level],
                )
                self.level += 1
            self.text = ""
        elif name == "CLM" and self.claim.strip():
            self.claims.append(self.claim.strip())
            self.claim = ""
        elif name == "CL" and self.claims:
            self._add_claims_section()
        elif name == "SDOAB" and self.abstract.strip():
            self._add_abstract_section(self.abstract.strip())
        elif name == "PARA":
            paragraph = self.paragraph.strip()
            if paragraph and "CLM" not in self.property:
                self.doc.add_text(
                    label=model.PARAGRAPH, text=paragraph,
                    parent=self.parents[self.level],
                )
            elif "CLM" in self.property:
                self.claim += " "
            self.paragraph = ""
        elif name == "table":
            self._add_placeholder_table()


class _AppV1Handler(_BaseHandler):
    """Application v1.x (reference :1063-1410)."""

    DOC_ELEMENTS = ("patent-application-publication",)
    TEXT_TAGS = frozenset(
        ("title-of-invention", "claim-text", "paragraph", "heading",
         "superscript", "subscript")
    )
    ALL_TAGS = TEXT_TAGS | frozenset(
        ("brief-description-of-drawings", "subdoc-abstract", "subdoc-claims",
         "claim", "number", "table", "math-cwu")
    )
    SUP_TAG, SUB_TAG = "superscript", "subscript"

    def _apply_style(self, text: str, style_tag: str) -> str:
        formatted = html.unescape(text)
        if style_tag == self.SUP_TAG:
            return _superscript(formatted)
        if style_tag == self.SUB_TAG:
            return _subscript(formatted)
        return formatted

    def startElement(self, tag, attributes):
        if tag in self.DOC_ELEMENTS:
            self.doc = Document()
            self.text = ""
        if tag in self.ALL_TAGS:
            if (
                tag == "claim-text"
                and self.property
                and self.property[-1] == tag
                and self.text.strip()
            ):
                self.claim += " " + self.text.strip("\n")
                self.text = ""
            elif tag == "heading":
                level_attr = attributes.get("lvl", "")
                new_level = int(level_attr) if level_attr.isdecimal() else 1
                max_level = min(self.parents.keys())
                self.level = (
                    new_level + 1 if (new_level + 1) in self.parents else max_level
                )
            self.property.append(tag)

    def endElement(self, tag):
        if tag in self.DOC_ELEMENTS:
            self.property = []
            self.abstract = ""
            self.claim = ""
            self.claims = []
            self.text = ""
        if tag in self.ALL_TAGS and self.property:
            current = self.property.pop()
            self._add_property(current, self.text)

    def _add_property(self, name: str, text: str) -> None:
        if not name or self.doc is None:
            return
        if name == "title-of-invention":
            title = text.strip()
            if title:
                self.parents[self.level + 1] = self.doc.add_text(
                    parent=self.parents[self.level], label=model.TITLE, text=title
                )
                self.level += 1
            self.text = ""
        elif name == "subdoc-abstract":
            abstract = self.abstract.strip()
            if abstract:
                heading_level = (
                    ABSTRACT_HEADING[1]
                    if ABSTRACT_HEADING[1] in self.parents
                    else 1
                )
                item = self.doc.add_heading(
                    ABSTRACT_HEADING[0], level=heading_level,
                    parent=self.parents[heading_level],
                )
                # the reference adds the UNstripped accumulated abstract
                self.doc.add_text(
                    label=model.PARAGRAPH, text=self.abstract, parent=item
                )
                self.abstract = ""
            self.text = ""
        elif name == "claim-text":
            if text:
                self.claim += self.text.strip("\n")
            self.text = ""
        elif name == "claim":
            claim = self.claim.strip()
            if claim:
                self.claims.append(claim)
            self.claim = ""
        elif name == "subdoc-claims" and self.claims:
            self._add_claims_section()
        elif name in ("paragraph", "heading"):
            if text and "subdoc-abstract" in self.property:
                self.abstract = (self.abstract + text) if self.abstract else text
            elif text.strip():
                text = re.sub(r"\s+", " ", text).strip()
                if name == "heading":
                    self.parents[self.level + 1] = self.doc.add_heading(
                        text=text, level=self.level,
                        parent=self.parents[self.level],
                    )
                    self.level += 1
                else:
                    self.doc.add_text(
                        label=model.PARAGRAPH, text=text,
                        parent=self.parents[self.level],
                    )
            self.text = ""
        elif name == "table":
            self._add_placeholder_table()


# ---------------------------------------------------------------------------
# APS text grants (reference :848-1061)
# ---------------------------------------------------------------------------

_APS_SECTIONS_PARA = ("BSUM", "DETD", "DRWD")
_APS_PARA_FIELDS = ("PAR", "PA1", "PA2", "PA3")
_APS_FIELDS = frozenset(
    ("WKU", "TTL", "PAR", "PA1", "PA2", "PA3", "PAL", "PAC", "NUM", "NAM",
     "ICL", "ISD", "APD", "PNO", "APN", "APT", "CNT")
)


class _ApsParser:
    def __init__(self) -> None:
        self.doc = Document()
        self.level = 1
        self.parents: dict[int, Optional[model.Node]] = {1: None}

    def _last_text_item(self) -> Optional[model.Node]:
        parent = self.parents[self.level]
        children = parent.children if parent is not None else []
        texts = [
            self.doc.nodes[i]
            for i in children
            if not self.doc.nodes[i].is_group
            and self.doc.nodes[i].label
            in (model.TITLE, model.SECTION_HEADER, model.PARAGRAPH, model.TEXT)
        ]
        return texts[-1] if texts else None

    def store_section(self, section: str) -> None:
        if section == "ABST":
            heading = ABSTRACT_HEADING
        elif section == "CLMS":
            heading = CLAIMS_HEADING
        else:
            return
        self.level = heading[1] if heading[1] in self.parents else 1
        self.parents[self.level + 1] = self.doc.add_heading(
            heading[0], level=self.level, parent=self.parents[self.level]
        )
        self.level += 1

    def store_content(self, section: str, field: str, value: str) -> None:
        if not field or field not in _APS_FIELDS:
            return
        if field == "TTL":
            self.parents[self.level + 1] = self.doc.add_text(
                label=model.TITLE, parent=self.parents[self.level], text=value
            )
            self.level += 1
        elif field == "PAL" and section == "ABST":
            item = self._last_text_item()
            if item is not None:
                item.text += " " + value
            else:
                self.doc.add_text(
                    label=model.PARAGRAPH, text=value,
                    parent=self.parents[self.level],
                )
        elif field == "NUM" and section == "CLMS":
            self.doc.add_text(
                label=model.PARAGRAPH, text="", parent=self.parents[self.level]
            )
        elif field in _APS_PARA_FIELDS and section == "CLMS":
            last_claim = self._last_text_item()
            if last_claim is None:
                last_claim = self.doc.add_text(
                    label=model.PARAGRAPH, text="",
                    parent=self.parents[self.level],
                )
            last_claim.text += (
                f" {value.strip()}" if last_claim.text else value.strip()
            )
        elif field == "PAC" and section in _APS_SECTIONS_PARA:
            self.level = (
                ABSTRACT_HEADING[1] if ABSTRACT_HEADING[1] in self.parents else 1
            )
            self.parents[self.level + 1] = self.doc.add_heading(
                value, level=self.level, parent=self.parents[self.level]
            )
            self.level += 1
        elif field in _APS_PARA_FIELDS and section in _APS_SECTIONS_PARA:
            self.doc.add_text(
                label=model.PARAGRAPH, text=value, parent=self.parents[self.level]
            )

    def parse(self, content: str) -> Document:
        section = key = value = ""
        for line in content.splitlines():
            cols = re.split(r"\s{2,}", line, maxsplit=1)
            if key and value and (len(cols) == 1 or (len(cols) == 2 and cols[0])):
                self.store_content(section, key, value)
                key = value = ""
            if len(cols) == 1:
                section = cols[0]
                self.store_section(section)
            elif len(cols) == 2:
                if cols[0]:
                    key, value = cols
                elif not re.match(r"^##STR\d+##$", cols[1]):
                    value += " " + cols[1]
        if key and value:
            self.store_content(section, key, value)
        return self.doc


# ---------------------------------------------------------------------------
# OASIS exchange-model tables (reference XmlTable, :1412-1695)
# ---------------------------------------------------------------------------


class _TableDom(xml.sax.handler.ContentHandler):
    """Tiny DOM for the extracted <table> snippets: undefined entities are
    dropped (the reference parses them with lxml-xml, which discards
    unresolvable entities)."""

    class Node:
        __slots__ = ("tag", "attrs", "children", "parent", "texts")

        def __init__(self, tag, attrs, parent):
            self.tag = tag
            self.attrs = dict(attrs)
            self.children = []
            self.parent = parent
            self.texts = []

        def iter(self, tag=None):
            for c in self.children:
                if tag is None or c.tag == tag:
                    yield c
                yield from c.iter(tag)

        def get_text(self):
            out = []

            def walk(n):
                for piece in n.texts:
                    if isinstance(piece, str):
                        out.append(piece)
                    else:
                        walk(piece)

            walk(self)
            return "".join(out)

    def __init__(self) -> None:
        super().__init__()
        self.root: Optional[_TableDom.Node] = None
        self.stack: list[_TableDom.Node] = []

    def startElement(self, tag, attributes):
        node = self.Node(tag, attributes, self.stack[-1] if self.stack else None)
        if self.stack:
            self.stack[-1].children.append(node)
            self.stack[-1].texts.append(node)
        else:
            self.root = node
        self.stack.append(node)

    def endElement(self, tag):
        if self.stack:
            self.stack.pop()

    def characters(self, content):
        if self.stack:
            self.stack[-1].texts.append(content)


def _parse_xml_table(table_xml: str) -> Optional[model.TableData]:
    handler = _TableDom()
    # the reference parses snippets with lxml-xml in recovery mode, which
    # DROPS undefined entity references (gt: 'ZEOCIN&thinsp;&trade;' →
    # 'ZEOCIN') — strip them before the strict SAX parse
    table_xml = re.sub(
        r"&(?!amp;|lt;|gt;|quot;|apos;|#)[A-Za-z][A-Za-z0-9]*;", "", table_xml
    )
    try:
        xml.sax.parseString(
            (_XML_DECLARATION + "\n" + table_xml).encode("utf-8"), handler
        )
    except xml.sax.SAXParseException:
        return None
    table = handler.root
    if table is None or table.tag != "table":
        return None

    tgroups = [n for n in table.iter("tgroup")]
    colinfo: dict[int, dict] = {}
    for itg, tg in enumerate(tgroups):
        info = {"offset": [], "colwidth": [], "cell_range": [], "cell_offst": [0]}
        offst = 0
        for cs in tg.iter("colspec"):
            cw = cs.attrs.get("colwidth", "")
            cw = re.sub("pt", "", cw, flags=re.I)
            cw = re.sub("mm", "", cw, flags=re.I)
            try:
                cw = int(cw)
            except Exception:
                try:
                    cw = float(cw)
                except Exception:
                    cw = 0
            info["colwidth"].append(cw)
            info["offset"].append(offst)
            offst += cw
        info["offset"].append(offst)
        colinfo[itg] = info
    if not colinfo:
        return model.TableData(num_rows=0, num_cols=0)

    min_offset = colinfo[0]["offset"]
    offset_w0 = []
    for col in colinfo.values():
        for ic, cw in enumerate(col["colwidth"]):
            if cw == 0:
                offset_w0.append(col["offset"][ic])
        min_offset = sorted(set(col["offset"] + min_offset))
    min_offset = sorted(min_offset + list(set(offset_w0)))
    min_colwidth = [
        min_offset[i + 1] - min_offset[i] for i in range(len(min_offset) - 1)
    ]

    for col in colinfo.values():
        i = 1
        range_ = 1
        for min_i in range(1, len(min_offset)):
            min_offst = min_offset[min_i]
            offst = col["offset"][i]
            if min_offst == offst:
                if len(col["offset"]) == i + 1 and len(min_offset) > min_i + 1:
                    range_ += 1
                else:
                    col["cell_range"].append(range_)
                    col["cell_offst"].append(col["cell_offst"][-1] + range_)
                    range_ = 1
                    i += 1
            elif min_offst < offst:
                range_ += 1
            else:
                return model.TableData(num_rows=0, num_cols=0)

    # reference _get_max_ncols: widest ORIGINAL tgroup colspec list — NOT
    # the unified offset count (a zero-width col can widen the latter)
    ncols_max = max(len(col["colwidth"]) for col in colinfo.values())
    del min_colwidth

    data = model.TableData(num_rows=0, num_cols=ncols_max)
    grid_rows: list[list[Optional[str]]] = []
    i_row_global = 0
    for itg, tg in enumerate(tgroups):
        tg_range = colinfo[itg]
        rows = [n for n in tg.iter() if n.tag in ("row", "tr")]
        for row in rows:
            entries = [n for n in row.iter() if n.tag in ("entry", "td")]
            is_header = row.parent is not None and row.parent.tag == "thead"
            ncols = 0
            local_row: list[model.TableCellData] = []
            local_grid: list[Optional[str]] = [None] * ncols_max
            is_row_empty = True
            wrong_nbr_cols = False
            for ientry, entry in enumerate(entries):
                text = entry.get_text().strip()
                namest = entry.attrs.get("namest")
                nameend = entry.attrs.get("nameend")
                start = (
                    int(namest)
                    if isinstance(namest, str) and namest.isdecimal()
                    else ientry + 1
                )
                if isinstance(nameend, str) and nameend.isdecimal():
                    end = int(nameend)
                    shift = 0
                else:
                    end = ientry + 2
                    shift = 1
                if end > len(tg_range["cell_offst"]):
                    wrong_nbr_cols = True
                    break
                cell_range = [
                    tg_range["cell_offst"][start - 1],
                    tg_range["cell_offst"][end - 1] - shift,
                ]
                if text:
                    is_row_empty = False
                # the reference appends the SAME spanning cell once per
                # covered column (uspto_backend.py:1635-1650 irep loop), so
                # spans appear duplicated in table_cells — kept for JSON
                # groundtruth parity
                for _ in range(cell_range[0], cell_range[1] + 1):
                    ncols += 1
                    local_row.append(
                        model.TableCellData(
                            column_header=is_header, text=text,
                            start_row=i_row_global, end_row=i_row_global + 1,
                            row_span=1,
                            start_col=cell_range[0], end_col=cell_range[1] + 1,
                            col_span=cell_range[1] - cell_range[0] + 1,
                        )
                    )
                for cc in range(cell_range[0], min(cell_range[1] + 1, ncols_max)):
                    local_grid[cc] = text
            if wrong_nbr_cols:
                local_row = []
                local_grid = [None] * ncols_max
                ncols = 0
            for irep in range(ncols, ncols_max):
                local_row.append(
                    model.TableCellData(
                        column_header=is_header, text="",
                        start_row=i_row_global, end_row=i_row_global + 1,
                        row_span=1, start_col=irep, end_col=irep + 1, col_span=1,
                    )
                )
                local_grid[irep] = ""
            if not is_row_empty:
                data.cells.extend(local_row)
                grid_rows.append(local_grid)
                i_row_global += 1

    data.num_rows = i_row_global
    data.grid = grid_rows
    return data


_TABLE_PATTERN = re.compile(r"^(<table .*?</table>)", re.MULTILINE | re.DOTALL)


def _attach_tables(doc: Document, content: str) -> None:
    raw_tables = re.findall(_TABLE_PATTERN, content)
    parsed = []
    for t in raw_tables:
        try:
            td = _parse_xml_table(t)
            if td is not None:
                parsed.append(td)
        except Exception:
            pass
    placeholders = doc.tables()
    if len(parsed) == len(placeholders):
        for node, td in zip(placeholders, parsed):
            node.table = td


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------


def uspto_dialect(data: bytes) -> Optional[str]:
    """aps | ice | grant_v2 | app_v1 | None (reference _set_parser :87-104)."""
    head = data[:4096].decode("utf-8", errors="replace")
    for line in head.splitlines():
        # the reference reads in text mode (universal newlines) and matches
        # the exact line "PATN\n" — \r\n-terminated files included
        if line == "PATN":
            return "aps"
        if line.startswith("<!DOCTYPE"):
            low = line.lower()
            if "us-patent-application-v4" in low or "us-patent-grant-v4" in low:
                return "ice"
            if "us-grant-025" in low:
                return "grant_v2"
            if "patent-application-publication" in low and "pap-v1" in low:
                return "app_v1"
    return None


def extract_uspto(data: bytes) -> Document:
    """USPTO patent bytes → Document; dialect-dispatched."""
    dialect = uspto_dialect(data)
    content = data.decode("utf-8", errors="replace")
    if dialect == "aps":
        return _ApsParser().parse(content)
    handler: Optional[_BaseHandler] = {
        "ice": _IceHandler,
        "grant_v2": _GrantV2Handler,
        "app_v1": _AppV1Handler,
    }.get(dialect, lambda: None)()
    if handler is None:
        return Document()
    try:
        xml.sax.parseString(content.encode("utf-8"), handler)
    except xml.sax.SAXParseException:
        return Document()
    doc = handler.doc if handler.doc is not None else Document()
    _attach_tables(doc, content)
    return doc
