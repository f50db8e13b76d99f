"""The fork's signature HWPX Korean-document heuristics
(reference ``docling/backend/xml/hwpx_backend.py``):

* 1x1/1x2/1x3 mini-tables promote to SECTION_HEADER (:330-346)
* rect/drawText shapes promote to SECTION_HEADER (:350-369)
* tab + trailing page number = TOC entry, kept as paragraph (:95-114)
* ``N. `` numbered headers with whitespace-normalized dedup (:425-432)
* list symbols with a level stack open nested list groups (:115-163)
"""

import io
import zipfile

from doc_parser_spark.core import model
from doc_parser_spark.core.office_backends import extract_hwpx

_NS = (
    'xmlns:hs="http://www.hancom.co.kr/hwpml/2011/section" '
    'xmlns:hp="http://www.hancom.co.kr/hwpml/2011/paragraph"'
)


def _hwpx(section_body: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/hwp+zip")
        zf.writestr("Contents/content.hpf", "<package/>")
        zf.writestr(
            "Contents/section0.xml",
            f'<?xml version="1.0"?>\n<hs:sec {_NS}>{section_body}</hs:sec>',
        )
    return buf.getvalue()


def _items(doc):
    return [
        (n.label, n.text) for n, _ in doc.iterate_items(with_groups=True)
    ]


def test_mini_table_promotes_to_section_header():
    doc = extract_hwpx(_hwpx(
        '<hp:p><hp:run><hp:tbl rowCnt="1" colCnt="1"><hp:tr><hp:tc>'
        "<hp:subList><hp:p><hp:run><hp:t>제1장 개요</hp:t></hp:run></hp:p>"
        "</hp:subList></hp:tc></hp:tr></hp:tbl></hp:run></hp:p>"
        "<hp:p><hp:run><hp:t>본문 내용입니다.</hp:t></hp:run></hp:p>"
    ))
    items = _items(doc)
    assert (model.SECTION_HEADER, "제1장 개요") in items
    assert (model.PARAGRAPH, "본문 내용입니다.") in items
    assert not doc.tables()  # the mini table was consumed, not rendered
    # the paragraph nests under the promoted header
    header = next(n for n, _ in doc.iterate_items() if n.label == model.SECTION_HEADER)
    para = next(n for n, _ in doc.iterate_items() if n.label == model.PARAGRAPH)
    assert para.parent == header.index


def test_mini_table_dedup_and_size_guard():
    body = (
        '<hp:p><hp:run><hp:tbl rowCnt="1" colCnt="1"><hp:tr><hp:tc>'
        "<hp:subList><hp:p><hp:run><hp:t>중복 제목</hp:t></hp:run></hp:p>"
        "</hp:subList></hp:tc></hp:tr></hp:tbl></hp:run></hp:p>"
    )
    doc = extract_hwpx(_hwpx(body + body))  # same mini-table twice
    headers = [n for n, _ in doc.iterate_items() if n.label == model.SECTION_HEADER]
    assert len(headers) == 1  # second occurrence is NOT promoted again
    assert len(doc.tables()) == 1  # it renders as a real table instead


def test_large_table_stays_table():
    doc = extract_hwpx(_hwpx(
        '<hp:p><hp:run><hp:tbl rowCnt="2" colCnt="2">'
        "<hp:tr><hp:tc><hp:subList><hp:p><hp:run><hp:t>a</hp:t></hp:run></hp:p></hp:subList></hp:tc>"
        "<hp:tc><hp:subList><hp:p><hp:run><hp:t>b</hp:t></hp:run></hp:p></hp:subList></hp:tc></hp:tr>"
        "<hp:tr><hp:tc><hp:subList><hp:p><hp:run><hp:t>c</hp:t></hp:run></hp:p></hp:subList></hp:tc>"
        "<hp:tc><hp:subList><hp:p><hp:run><hp:t>d</hp:t></hp:run></hp:p></hp:subList></hp:tc></hp:tr>"
        "</hp:tbl></hp:run></hp:p>"
    ))
    assert not any(n.label == model.SECTION_HEADER for n, _ in doc.iterate_items())
    assert doc.tables()[0].table.grid == [["a", "b"], ["c", "d"]]


def test_rect_drawtext_promotes_to_section_header():
    doc = extract_hwpx(_hwpx(
        "<hp:p><hp:run><hp:rect><hp:drawText>"
        "<hp:p><hp:run><hp:t>상자 제목</hp:t></hp:run></hp:p>"
        "</hp:drawText></hp:rect></hp:run></hp:p>"
    ))
    assert (model.SECTION_HEADER, "상자 제목") in _items(doc)


def test_toc_entry_is_not_a_header():
    doc = extract_hwpx(_hwpx(
        "<hp:p><hp:run><hp:t>3. 제목<hp:tab/>9</hp:t></hp:run></hp:p>"
    ))
    labels = [label for label, _ in _items(doc)]
    assert model.SECTION_HEADER not in labels
    assert model.PARAGRAPH in labels


def test_numbered_header_and_dedup():
    doc = extract_hwpx(_hwpx(
        "<hp:p><hp:run><hp:t>1. 서론</hp:t></hp:run></hp:p>"
        "<hp:p><hp:run><hp:t>내용.</hp:t></hp:run></hp:p>"
    ))
    items = _items(doc)
    assert (model.SECTION_HEADER, "1. 서론") in items
    assert (model.PARAGRAPH, "내용.") in items


def test_list_symbol_stack_nesting():
    doc = extract_hwpx(_hwpx(
        "<hp:p><hp:run><hp:t>□ 상위 항목</hp:t></hp:run></hp:p>"
        "<hp:p><hp:run><hp:t>o 하위 항목</hp:t></hp:run></hp:p>"
        "<hp:p><hp:run><hp:t>- 최하위</hp:t></hp:run></hp:p>"
        "<hp:p><hp:run><hp:t>□ 다음 상위</hp:t></hp:run></hp:p>"
    ))
    groups = [
        n for n, _ in doc.iterate_items(with_groups=True)
        if n.label == model.GROUP_LIST
    ]
    assert len(groups) == 4  # one group per symbol transition
    # the 'o' group nests under the first '□' group's subtree
    sub = groups[1]
    assert doc.nodes[sub.parent].label == model.GROUP_LIST
