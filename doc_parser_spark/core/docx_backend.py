"""DOCX backend, python-docx-equivalent semantics on stdlib zip + ElementTree.

From-scratch reimplementation of the reference's Word backend
(``docling/backend/msword_backend.py``, 1163 LoC), validated byte-exact
against the committed groundtruth (``tests/data/groundtruth/docling_v2/
*.docx.{md,itxt}``). Behavioural contract (reference file:line):

* body walk: textboxes → tables → inline images → sdt → paragraphs .. :168-280
* style → label/level: style id/name/basedOn chains, "Heading N" split  :281-334
* runs grouped by (bold, italic, underline) formatting; hyperlinks
  split immediately; empty paragraphs preserved .................... :367-437
* Title/Heading routing with synthetic section groups, numbered-header
  counters (MSWord "no empty sublevels" convention) ................ :755-922
* list state machine keyed on numPr numId/ilvl history ............. :924-1060
* tables via the python-docx grid model (gridSpan, vMerge row spans,
  1x1 tables unwrapped into the body) .............................. :1061-1124
* one picture per element containing a DrawingML blip .............. :1125-1163
* OMML equations spliced into text as <eq>…</eq>, standalone or
  inline-group rendering ........................................... :634-683
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Optional
from xml.etree import ElementTree as ET

from doc_parser_spark.core import model
from doc_parser_spark.core.limits import BoundedZipFile
from doc_parser_spark.core.model import Document
from doc_parser_spark.core.omml import M_NS, omath_to_latex

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_V = "{urn:schemas-microsoft-com:vml}"
_R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_EQ_BOOKENDS = ("<eq>", "</eq>")


def _collapse_url(url: str) -> str:
    """The reference stores hyperlink addresses through ``pathlib.Path``,
    which collapses ``//`` — groundtruth shows ``https:/github.com/...``."""
    from pathlib import PurePosixPath

    return str(PurePosixPath(url)) if url else url


class _Style:
    __slots__ = ("style_id", "name", "based_on", "numbered")

    def __init__(self, style_id: str, name: str, based_on: Optional[str],
                 numbered: bool):
        self.style_id = style_id
        self.name = name
        self.based_on = based_on
        self.numbered = numbered  # style element contains <w:numPr>


def _parse_styles(zf: zipfile.ZipFile) -> dict[str, _Style]:
    styles: dict[str, _Style] = {}
    try:
        root = ET.fromstring(zf.read("word/styles.xml"))
    except (KeyError, ET.ParseError):
        return styles
    for st in root.findall(f"{_W}style"):
        sid = st.get(f"{_W}styleId") or ""
        name_el = st.find(f"{_W}name")
        name = name_el.get(f"{_W}val") if name_el is not None else sid
        based = st.find(f"{_W}basedOn")
        based_id = based.get(f"{_W}val") if based is not None else None
        numbered = st.find(f".//{_W}numPr") is not None
        styles[sid] = _Style(sid, name or sid, based_id, numbered)
    return styles


def _run_text(r: ET.Element) -> str:
    parts = []
    for child in r:
        if child.tag == f"{_W}t":
            parts.append(child.text or "")
        elif child.tag == f"{_W}tab":
            parts.append("\t")
        elif child.tag in (f"{_W}br", f"{_W}cr"):
            parts.append("\n")
    return "".join(parts)


def _run_format(r: ET.Element) -> tuple[bool, bool, bool]:
    """(bold, italic, underline) from the run's rPr (python-docx .bold
    semantics: explicit val 0/false → False, present → True, absent →
    None→False per the reference's ``or False``)."""
    rpr = r.find(f"{_W}rPr")
    if rpr is None:
        return (False, False, False)

    def flag(tag: str) -> bool:
        el = rpr.find(f"{_W}{tag}")
        if el is None:
            return False
        val = el.get(f"{_W}val")
        return val not in ("0", "false", "none")

    return (flag("b"), flag("i"), flag("u"))


def _para_text(p: ET.Element) -> str:
    """python-docx Paragraph.text: runs + hyperlink runs in order."""
    parts = []
    for child in p:
        if child.tag == f"{_W}r":
            parts.append(_run_text(child))
        elif child.tag == f"{_W}hyperlink":
            for r in child.findall(f"{_W}r"):
                parts.append(_run_text(r))
    return "".join(parts)


class DocxConverter:
    def __init__(self, zf: zipfile.ZipFile):
        self.zf = zf
        self.styles = _parse_styles(zf)
        self.rels = self._parse_rels()
        self.doc = Document()
        self.max_levels = 10
        self.parents: dict[int, Optional[model.Node]] = {
            i: None for i in range(-1, self.max_levels)
        }
        self.level = 0
        self.listIter = 0
        self.level_at_new_list: Optional[int] = None
        self.numbered_headers: dict[int, int] = {}
        self.history: dict = {
            "names": [None], "levels": [None], "numids": [None], "indents": [None],
        }
        self.processed_textbox_elements: list[int] = []
        self.parent_map: dict = {}

    def _parse_rels(self) -> dict[str, str]:
        rels = {}
        try:
            root = ET.fromstring(self.zf.read("word/_rels/document.xml.rels"))
        except (KeyError, ET.ParseError):
            return rels
        for rel in root.iter(f"{_REL_NS}Relationship"):
            rels[rel.get("Id", "")] = rel.get("Target", "")
        return rels

    # -- history ----------------------------------------------------------

    def _update_history(self, name, level, numid, ilevel) -> None:
        self.history["names"].append(name)
        self.history["levels"].append(level)
        self.history["numids"].append(numid)
        self.history["indents"].append(ilevel)

    def _prev_numid(self):
        return self.history["numids"][-1]

    def _prev_indent(self):
        return self.history["indents"][-1]

    def _get_level(self) -> int:
        for k in sorted(self.parents):
            if k >= 0 and self.parents[k] is None:
                return k
        return 0

    # -- style → label/level ------------------------------------------------

    @staticmethod
    def _str_to_int(s: Optional[str], default: Optional[int] = 0) -> Optional[int]:
        if s is None:
            return None
        try:
            return int(s)
        except ValueError:
            return default

    @staticmethod
    def _split_text_and_number(s: str) -> list[str]:
        m = re.match(r"(\D+)(\d+)$|^(\d+)(\D+)", s)
        if m:
            return [p for p in m.groups() if p]
        return [s]

    def _get_heading_and_level(self, style_label: str) -> tuple[str, Optional[int]]:
        parts = self._split_text_and_number(style_label)
        if len(parts) == 2:
            parts.sort()
            label_str, label_level = "", 0
            if parts[0].strip().lower() == "heading":
                label_str = "Heading"
                label_level = self._str_to_int(parts[1], None)
            if parts[1].strip().lower() == "heading":
                label_str = "Heading"
                label_level = self._str_to_int(parts[0], None)
            return label_str, label_level
        return style_label, None

    def _style_of(self, p: ET.Element) -> Optional[_Style]:
        ppr = p.find(f"{_W}pPr")
        if ppr is None:
            return None
        pstyle = ppr.find(f"{_W}pStyle")
        if pstyle is None:
            return None
        sid = pstyle.get(f"{_W}val") or ""
        # styles.xml-less containers: fall back to the raw style id
        return self.styles.get(sid) or _Style(sid, sid, None, False)

    def _get_label_and_level(self, p: ET.Element) -> tuple[str, Optional[int]]:
        style = self._style_of(p)
        if style is None:
            return "Normal", None
        label = style.style_id
        name = style.name
        base = self.styles.get(style.based_on or "")
        if label is None:
            return "Normal", None
        if ":" in label:
            parts = label.split(":")
            if len(parts) == 2:
                return parts[0], self._str_to_int(parts[1], None)
        if "heading" in label.lower():
            return self._get_heading_and_level(label)
        if "heading" in name.lower():
            return self._get_heading_and_level(name)
        if base is not None and "heading" in base.style_id.lower():
            return self._get_heading_and_level(base.style_id)
        if base is not None and "heading" in base.name.lower():
            return self._get_heading_and_level(base.name)
        return label, None

    def _get_numid_and_ilvl(
        self, p: ET.Element
    ) -> tuple[Optional[int], Optional[int]]:
        numpr = p.find(f".//{_W}numPr")
        if numpr is None:
            return None, None
        numid_el = numpr.find(f"{_W}numId")
        ilvl_el = numpr.find(f"{_W}ilvl")
        numid = numid_el.get(f"{_W}val") if numid_el is not None else None
        ilvl = ilvl_el.get(f"{_W}val") if ilvl_el is not None else None
        return self._str_to_int(numid, None), self._str_to_int(ilvl, None)

    # -- paragraph pieces -----------------------------------------------------

    def _get_paragraph_elements(self, p: ET.Element) -> list[tuple]:
        """[(text, format, hyperlink)] — runs grouped by formatting, empty
        paragraphs preserved as a single empty piece (msword:381-437)."""
        if _para_text(p).strip() == "":
            return [("", None, None)]

        elements: list[tuple] = []
        group_text = ""
        previous_format = None
        fmt = None

        for child in p:
            if child.tag == f"{_W}hyperlink":
                runs = child.findall(f"{_W}r")
                text = "".join(_run_text(r) for r in runs)
                rid = child.get(f"{_R_NS}id")
                anchor = child.get(f"{_W}anchor")
                address = self.rels.get(rid, "") if rid else ""
                if not address and anchor:
                    address = ""
                hyperlink = _collapse_url(address)
                fmt = _run_format(runs[0]) if runs else None
            elif child.tag == f"{_W}r":
                text = _run_text(child)
                hyperlink = None
                fmt = _run_format(child)
            else:
                continue

            if (len(text.strip()) and fmt != previous_format) or hyperlink:
                if len(group_text.strip()) > 0:
                    elements.append((group_text.strip(), previous_format, None))
                group_text = ""
                if hyperlink:
                    elements.append((text.strip(), fmt, hyperlink))
                    text = ""
                else:
                    previous_format = fmt
            group_text += text

        if len(group_text.strip()) > 0:
            elements.append((group_text.strip(), fmt, None))
        return elements

    # -- equations -------------------------------------------------------------

    def _handle_equations_in_text(self, element: ET.Element, text: str):
        only_texts = []
        only_equations = []
        texts_and_equations = []
        for subt in element.iter():
            tag = subt.tag
            if tag == f"{_W}t" and M_NS not in tag:
                if isinstance(subt.text, str):
                    only_texts.append(subt.text)
                    texts_and_equations.append(subt.text)
            elif tag == f"{M_NS}oMath":
                # exclude oMathPara wrappers; oMath only
                latex = omath_to_latex(subt).strip()
                if latex:
                    wrapped = f"{_EQ_BOOKENDS[0]}{latex}{_EQ_BOOKENDS[1]}"
                    only_equations.append(wrapped)
                    texts_and_equations.append(wrapped)

        if not only_equations:
            return text, []

        if (
            re.sub(r"\s+", "", "".join(only_texts)).strip()
            != re.sub(r"\s+", "", text).strip()
        ):
            return text, []

        output_text = text[:]
        init_i = 0
        for i_substr, substr in enumerate(texts_and_equations):
            if len(substr) == 0:
                continue
            if substr in output_text[init_i:]:
                init_i += output_text[init_i:].find(substr) + len(substr)
            else:
                if i_substr > 0:
                    output_text = output_text[:init_i] + substr + output_text[init_i:]
                    init_i += len(substr)
                else:
                    output_text = substr + output_text
        return output_text, only_equations

    # -- item creation -----------------------------------------------------------

    def _make_node(self, parent, text, fmt, hyperlink, label=model.PARAGRAPH):
        node = self.doc.add_text(text=text, label=label, parent=parent)
        if fmt is not None:
            node.bold, node.italic, node.underline = fmt
            node.has_formatting = True
        if hyperlink:
            node.hyperlink = hyperlink
        return node

    def _create_or_reuse_parent(self, prev_parent, elements):
        if len(elements) > 1:
            return self.doc.add_group(
                name="group", label=model.GROUP_INLINE, parent=prev_parent
            )
        return prev_parent

    def _add_header(self, curr_level: Optional[int], text: str,
                    is_numbered_style: bool) -> None:
        doc = self.doc
        level = self._get_level()
        if isinstance(curr_level, int):
            if curr_level > level:
                for i in range(level, curr_level):
                    self.parents[i] = doc.add_group(
                        parent=self.parents[i - 1],
                        label=model.GROUP_SECTION,
                        name=f"header-{i}",
                    )
            elif curr_level < level:
                for key in range(len(self.parents)):
                    if key >= curr_level:
                        self.parents[key] = None
            current_level = curr_level
            parent_level = curr_level - 1
            add_level = curr_level
        else:
            current_level = self.level
            parent_level = self.level - 1
            add_level = 1

        if is_numbered_style:
            if add_level in self.numbered_headers:
                self.numbered_headers[add_level] += 1
            else:
                self.numbered_headers[add_level] = 1
            text = f"{self.numbered_headers[add_level]} {text}"
            next_level = add_level + 1
            while next_level in self.numbered_headers:
                self.numbered_headers[next_level] = 0
                next_level += 1
            previous_level = add_level - 1
            while previous_level in self.numbered_headers:
                if self.numbered_headers[previous_level] == 0:
                    self.numbered_headers[previous_level] += 1
                text = f"{self.numbered_headers[previous_level]}.{text}"
                previous_level -= 1

        self.parents[current_level] = doc.add_heading(
            parent=self.parents[parent_level], text=text, level=add_level
        )

    def _add_formatted_list_item(self, elements, marker, enumerated, level):
        if self.parents[level] is None or self.parents[level].label not in (
            model.GROUP_LIST, model.GROUP_ORDERED_LIST
        ):
            return
        if not elements:
            return
        doc = self.doc
        if len(elements) == 1:
            text, fmt, hyperlink = elements[0]
            if text:
                node = doc.add_list_item(
                    marker=marker, enumerated=enumerated,
                    parent=self.parents[level], text=text,
                )
                if fmt is not None:
                    node.bold, node.italic, node.underline = fmt
                    node.has_formatting = True
                if hyperlink:
                    node.hyperlink = hyperlink
        else:
            new_item = doc.add_list_item(
                marker=marker, enumerated=enumerated,
                parent=self.parents[level], text="",
            )
            new_parent = doc.add_group(
                name="group", label=model.GROUP_INLINE, parent=new_item
            )
            for text, fmt, hyperlink in elements:
                if text:
                    self._make_node(new_parent, text, fmt, hyperlink,
                                    label=model.TEXT)

    def _add_list_item(self, *, numid, ilevel, elements, is_numbered=False):
        if not elements:
            return
        doc = self.doc
        enum_marker = ""
        level = self._get_level()
        prev_indent = self._prev_indent()
        if self._prev_numid() is None:  # open new list
            self.level_at_new_list = level
            self.parents[level] = doc.add_list_group(
                name="list", parent=self.parents[level - 1]
            )
            self.listIter += 1
            if is_numbered:
                enum_marker = str(self.listIter) + "."
            self._add_formatted_list_item(elements, enum_marker, is_numbered, level)
        elif (
            self._prev_numid() == numid
            and self.level_at_new_list is not None
            and prev_indent is not None
            and prev_indent < ilevel
        ):  # open indented list
            for i in range(
                self.level_at_new_list + prev_indent + 1,
                self.level_at_new_list + ilevel + 1,
            ):
                self.listIter = 0
                self.parents[i] = doc.add_list_group(
                    name="list", parent=self.parents[i - 1]
                )
            self.listIter += 1
            if is_numbered:
                enum_marker = str(self.listIter) + "."
            self._add_formatted_list_item(
                elements, enum_marker, is_numbered,
                self.level_at_new_list + ilevel,
            )
        elif (
            self._prev_numid() == numid
            and self.level_at_new_list is not None
            and prev_indent is not None
            and ilevel < prev_indent
        ):  # close nested list
            for k in self.parents:
                if k > self.level_at_new_list + ilevel:
                    self.parents[k] = None
            self.listIter += 1
            if is_numbered:
                enum_marker = str(self.listIter) + "."
            self._add_formatted_list_item(
                elements, enum_marker, is_numbered,
                self.level_at_new_list + ilevel,
            )
            self.listIter = 0
        elif self._prev_numid() == numid or prev_indent == ilevel:
            self.listIter += 1
            if is_numbered:
                enum_marker = str(self.listIter) + "."
            self._add_formatted_list_item(
                elements, enum_marker, is_numbered, level - 1
            )

    # -- paragraph handler ---------------------------------------------------

    def _handle_text_elements(self, element: ET.Element) -> None:
        doc = self.doc
        elements = self._get_paragraph_elements(element)
        raw_text = _para_text(element)
        text, equations = self._handle_equations_in_text(element, raw_text)
        if text is None:
            return
        text = text.strip()

        is_numbered = False
        p_style_id, p_level = self._get_label_and_level(element)
        numid, ilevel = self._get_numid_and_ilvl(element)
        if numid == 0:
            numid = None

        if (
            numid is not None
            and ilevel is not None
            and p_style_id not in ["Title", "Heading"]
        ):
            self._add_list_item(
                numid=numid, ilevel=ilevel, elements=elements,
                is_numbered=is_numbered,
            )
            self._update_history(p_style_id, p_level, numid, ilevel)
            return
        elif (
            numid is None
            and self._prev_numid() is not None
            and p_style_id not in ["Title", "Heading"]
        ):  # close list
            if self.level_at_new_list:
                for key in range(len(self.parents)):
                    if key >= self.level_at_new_list:
                        self.parents[key] = None
                self.level = self.level_at_new_list - 1
                self.level_at_new_list = None
            else:
                for key in range(len(self.parents)):
                    self.parents[key] = None
                self.level = 0

        if p_style_id in ["Title"]:
            for key in range(len(self.parents)):
                self.parents[key] = None
            self.parents[0] = doc.add_text(
                parent=None, label=model.TITLE, text=text
            )
        elif "Heading" in p_style_id:
            style = self._style_of(element)
            is_numbered_style = bool(
                (style is not None and style.numbered)
                or element.find(f".//{_W}numPr") is not None
            )
            self._add_header(p_level, text, is_numbered_style)
        elif len(equations) > 0:
            if (raw_text is None or len(raw_text.strip()) == 0) and len(text) > 0:
                # standalone equation
                level = self._get_level()
                doc.add_text(
                    label=model.FORMULA,
                    parent=self.parents[level - 1],
                    text=text.replace(_EQ_BOOKENDS[0], "").replace(
                        _EQ_BOOKENDS[1], ""
                    ),
                )
            else:
                # inline equation
                level = self._get_level()
                inline_group = doc.add_group(
                    name="group", label=model.GROUP_INLINE,
                    parent=self.parents[level - 1],
                )
                text_tmp = text
                for eq in equations:
                    if len(text_tmp) == 0:
                        break
                    split_text_tmp = text_tmp.split(eq.strip(), maxsplit=1)
                    pre_eq_text = split_text_tmp[0]
                    text_tmp = "" if len(split_text_tmp) == 1 else split_text_tmp[1]
                    if len(pre_eq_text) > 0:
                        doc.add_text(
                            label=model.PARAGRAPH, parent=inline_group,
                            text=pre_eq_text,
                        )
                    doc.add_text(
                        label=model.FORMULA, parent=inline_group,
                        text=eq.replace(_EQ_BOOKENDS[0], "").replace(
                            _EQ_BOOKENDS[1], ""
                        ),
                    )
                if len(text_tmp) > 0:
                    doc.add_text(
                        label=model.PARAGRAPH, parent=inline_group,
                        text=text_tmp.strip(),
                    )
        else:
            level = self._get_level()
            parent = self._create_or_reuse_parent(
                self.parents.get(level - 1), elements
            )
            for text_piece, fmt, hyperlink in elements:
                self._make_node(parent, text_piece, fmt, hyperlink)

        self._update_history(p_style_id, p_level, numid, ilevel)

    # -- tables ----------------------------------------------------------------

    def _handle_tables(self, element: ET.Element) -> None:
        doc = self.doc
        grid_cols = element.findall(f"{_W}tblGrid/{_W}gridCol")
        num_cols = len(grid_cols)
        trs = element.findall(f"{_W}tr")
        num_rows = len(trs)
        if num_cols == 0:
            # tblGrid-less containers: widest row wins
            num_cols = max(
                (len(tr.findall(f"{_W}tc")) for tr in trs), default=0
            )

        # build the python-docx grid: one tc reference per grid position
        grid_tc: list[list[Optional[ET.Element]]] = []
        for row_i, tr in enumerate(trs):
            row_cells: list[Optional[ET.Element]] = []
            tbl_pr_ex = tr.find(f"{_W}trPr/{_W}gridBefore")
            grid_before = int(tbl_pr_ex.get(f"{_W}val", "0")) if tbl_pr_ex is not None else 0
            for _ in range(grid_before):
                row_cells.append(None)
            for tc in tr.findall(f"{_W}tc"):
                tcpr = tc.find(f"{_W}tcPr")
                span = 1
                vmerge = None
                if tcpr is not None:
                    gs = tcpr.find(f"{_W}gridSpan")
                    if gs is not None:
                        span = int(gs.get(f"{_W}val", "1") or "1")
                    vm = tcpr.find(f"{_W}vMerge")
                    if vm is not None:
                        vmerge = vm.get(f"{_W}val") or "continue"
                target = tc
                if vmerge == "continue" and grid_tc:
                    col = len(row_cells)
                    above = grid_tc[row_i - 1]
                    if col < len(above) and above[col] is not None:
                        target = above[col]
                for _ in range(span):
                    row_cells.append(target)
            grid_tc.append(row_cells)
        # pad rows to num_cols
        for row_cells in grid_tc:
            while len(row_cells) < num_cols:
                row_cells.append(None)

        if num_rows == 1 and num_cols == 1:
            cell_el = grid_tc[0][0] if grid_tc and grid_tc[0] else None
            if cell_el is not None:
                self._walk_linear(cell_el)
            return

        def cell_text(tc: ET.Element) -> str:
            return "\n".join(_para_text(p) for p in tc.findall(f"{_W}p"))

        def grid_span(tc: ET.Element) -> int:
            tcpr = tc.find(f"{_W}tcPr")
            if tcpr is not None:
                gs = tcpr.find(f"{_W}gridSpan")
                if gs is not None:
                    return int(gs.get(f"{_W}val", "1") or "1")
            return 1

        table = model.TableData(num_rows=num_rows, num_cols=num_cols)
        grid: list[list[Optional[str]]] = [
            [None] * num_cols for _ in range(num_rows)
        ]
        cell_set: set[int] = set()
        for row_idx in range(num_rows):
            col_idx = 0
            while col_idx < num_cols:
                tc = grid_tc[row_idx][col_idx]
                if tc is None:
                    col_idx += 1
                    continue
                span = grid_span(tc)
                if id(tc) in cell_set:
                    col_idx += span
                    continue
                cell_set.add(id(tc))
                spanned_idx = row_idx
                while True:
                    spanned_idx += 1
                    if spanned_idx >= num_rows:
                        break
                    if grid_tc[spanned_idx][col_idx] is not tc:
                        break
                text = cell_text(tc)
                row_span = spanned_idx - row_idx
                table.cells.append(
                    model.TableCellData(
                        text=text, row_span=row_span, col_span=span,
                        start_row=row_idx, end_row=spanned_idx,
                        start_col=col_idx, end_col=col_idx + span,
                        column_header=(row_idx == 0),
                    )
                )
                for rr in range(row_idx, min(spanned_idx, num_rows)):
                    for cc in range(col_idx, min(col_idx + span, num_cols)):
                        grid[rr][cc] = text
                col_idx += span
        table.grid = grid
        level = self._get_level()
        doc.add_table(data=table, parent=self.parents[level - 1])

    # -- textboxes ---------------------------------------------------------------

    def _get_paragraph_position(self, p: ET.Element):
        parent = self.parent_map.get(p)
        if parent is not None:
            paragraphs = [c for c in parent if c.tag == f"{_W}p"]
            try:
                return paragraphs.index(p)
            except ValueError:
                pass
        return None

    def _collect_textbox_paragraphs(self, textbox_elements: list) -> dict:
        processed: list[int] = []
        containers: dict = {}
        for element in textbox_elements:
            if id(element) in processed:
                continue
            tag = element.tag
            processed.append(id(element))
            if tag == f"{_W}p":
                container_id = None
                cur = self.parent_map.get(element)
                while cur is not None:
                    if any(k in cur.tag for k in ("textbox", "shape", "txbx")):
                        container_id = id(cur)
                        break
                    cur = self.parent_map.get(cur)
                containers.setdefault(container_id, []).append(
                    (element, self._get_paragraph_position(element))
                )
            else:
                paragraphs = element.findall(f".//{_W}p")
                bucket = containers.setdefault(id(element), [])
                for p in paragraphs:
                    if id(p) not in processed:
                        processed.append(id(p))
                        bucket.append((p, self._get_paragraph_position(p)))
        return containers

    def _handle_textbox_content(self, textbox_elements: list) -> None:
        level = self._get_level()
        textbox_group = self.doc.add_group(
            label=model.GROUP_SECTION, parent=self.parents[level - 1],
            name="textbox",
        )
        original_parent = self.parents[level]
        self.parents[level] = textbox_group

        containers = self._collect_textbox_paragraphs(textbox_elements)
        all_paragraphs = []
        for paragraphs in containers.values():
            all_paragraphs.extend(
                sorted(
                    paragraphs,
                    key=lambda x: (
                        x[1] is None, x[1] if x[1] is not None else float("inf"),
                    ),
                )
            )
        seen = set()
        for p, position in all_paragraphs:
            key = (_para_text(p), position)
            if key in seen:
                continue
            seen.add(key)
            self._handle_text_elements(p)

        self.parents[level] = original_parent

    # -- pictures -----------------------------------------------------------------

    def _handle_pictures(self, drawing_blip=None) -> None:
        level = self._get_level()
        node = self.doc.add_picture(parent=self.parents[level - 1], caption=None)
        node.image_meta = self._image_meta_from_blip(drawing_blip)

    def _image_meta_from_blip(self, drawing_blip) -> Optional[dict]:
        """Decode the blip's media part into an ImageRef-shaped dict
        (reference: msword_backend.py:1125-1163 — PIL load, dpi=72,
        add_picture without image when the codec can't read it, e.g. EMF).

        The data URI is OUR PNG encoder's byte stream: the committed
        groundtruth URIs came from a zlib-ng-accelerated Pillow whose
        deflate output stock zlib cannot reproduce, so parity on this one
        field is pixel-level, not byte-level (see
        tests_our/smoke/test_docling_json_parity.py)."""
        if not drawing_blip:
            return None
        rid = drawing_blip[0].get(f"{_R_NS}embed")
        target = self.rels.get(rid or "")
        if not target:
            return None
        path = target if target.startswith("word/") else f"word/{target.lstrip('/')}"
        try:
            blob = self.zf.read(path)
        except KeyError:
            return None
        try:
            if blob[:8] == b"\x89PNG\r\n\x1a\n":
                from .png import decode_png

                arr = decode_png(blob)
            elif blob[:2] == b"\xff\xd8":
                from .jpeg import decode_jpeg

                arr = decode_jpeg(blob)
            else:  # EMF/WMF etc. — the reference's PIL load fails the same way
                return None
        except Exception:
            return None
        import base64

        from .png import encode_png

        h, w = arr.shape[:2]
        uri = "data:image/png;base64," + base64.b64encode(encode_png(arr)).decode()
        return {
            "mimetype": "image/png",
            "dpi": 72,
            "size": {"width": float(w), "height": float(h)},
            "uri": uri,
        }

    # -- body walk ------------------------------------------------------------------

    def _walk_linear(self, body: ET.Element) -> None:
        for element in body:
            tag_name = element.tag.rsplit("}", 1)[-1]
            drawing_blip = element.findall(f".//{_A}blip")

            if id(element) not in self.processed_textbox_elements:
                textbox_elements = element.findall(f".//{_W}txbxContent")
                if not textbox_elements:
                    textbox_elements = [
                        p
                        for tb in element.findall(f".//{_V}textbox")
                        for p in tb.findall(f".//{_W}p")
                    ]
                if not textbox_elements and tag_name in ("drawing", "pict"):
                    # shape text that's not in a standard textbox
                    shape_texts = [
                        t.text
                        for t in element.findall(f".//{_A}t")
                        if t.text
                    ]
                    if shape_texts:
                        text_content = " ".join(shape_texts)
                        if text_content.strip():
                            level = self._get_level()
                            shape_group = self.doc.add_group(
                                label=model.GROUP_SECTION,
                                parent=self.parents[level - 1],
                                name="shape-text",
                            )
                            self.doc.add_text(
                                label=model.PARAGRAPH, parent=shape_group,
                                text=text_content,
                            )
                if textbox_elements:
                    self.processed_textbox_elements.append(id(element))
                    for tb in textbox_elements:
                        self.processed_textbox_elements.append(id(tb))
                    self._handle_textbox_content(textbox_elements)

            if element.tag.endswith("tbl"):
                try:
                    self._handle_tables(element)
                except Exception:
                    pass  # broken docx table
            elif drawing_blip:
                self._handle_pictures(drawing_blip)
                if tag_name == "p" and element.find(f".//{_W}t") is not None:
                    self._handle_text_elements(element)
            elif tag_name == "sdt":
                sdt_content = element.find(f".//{_W}sdtContent")
                if sdt_content is not None:
                    for p in sdt_content.findall(f".//{_W}p"):
                        self._handle_text_elements(p)
            elif tag_name == "p":
                self._handle_text_elements(element)

    def convert(self) -> Document:
        try:
            root = ET.fromstring(self.zf.read("word/document.xml"))
        except (KeyError, ET.ParseError):
            return self.doc
        self.parent_map = {c: p for p in root.iter() for c in p}
        body = root.find(f"{_W}body")
        if body is not None:
            self._walk_linear(body)
        return self.doc


def extract_docx(payload: bytes) -> Document:
    """DOCX bytes → Document (msword_backend.py-equivalent walk)."""
    zf = BoundedZipFile(io.BytesIO(payload))
    return DocxConverter(zf).convert()
