"""RTF reader: a group-stack tokenizer over the RTF 1.x control stream.

No reference counterpart (the reference's LibreOffice path covers RTF
implicitly); web corpora carry plenty of it, so it is first-class here.
Scope: text, paragraphs, \\cell/\\row tables, unicode escapes — the
training-data signal. Fonts/colors/styles/objects are skipped as
destinations.
"""

from __future__ import annotations

from . import model
from .model import Document


class RtfError(ValueError):
    pass


# destination groups whose content is never document text
_SKIP_DESTS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "footerl", "footerr",
    "ftnsep", "ftnsepc", "xe", "tc", "generator", "themedata",
    "datastore", "latentstyles", "listtable", "listoverridetable",
    "rsidtbl", "fldinst",
}

_CHAR_WORDS = {
    "par": "\n", "line": "\n", "tab": "\t",
    "emdash": "—", "endash": "–",
    "lquote": "‘", "rquote": "’",
    "ldblquote": "“", "rdblquote": "”",
    "bullet": "•", "emspace": " ", "enspace": " ",
}


def _tokenize(data: bytes):
    """Yield ('ctrl', word, param) / ('char', s) / ('open',) / ('close',)."""
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b == 0x7B:  # {
            yield ("open", None, None)
            i += 1
        elif b == 0x7D:  # }
            yield ("close", None, None)
            i += 1
        elif b == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            c = data[i]
            if c == 0x27:  # \'hh hex escape
                hexs = data[i + 1 : i + 3].decode("ascii", "replace")
                try:
                    yield ("char", bytes([int(hexs, 16)]).decode("cp1252"), None)
                except ValueError:
                    pass
                i += 3
            elif (0x61 <= c <= 0x7A) or (0x41 <= c <= 0x5A):
                j = i
                while j < n and (0x61 <= data[j] <= 0x7A or 0x41 <= data[j] <= 0x5A):
                    j += 1
                word = data[i:j].decode("ascii")
                param = None
                if j < n and (data[j] == 0x2D or 0x30 <= data[j] <= 0x39):
                    k = j + 1 if data[j] == 0x2D else j
                    while k < n and 0x30 <= data[k] <= 0x39:
                        k += 1
                    param = int(data[j:k])
                    j = k
                if j < n and data[j] == 0x20:  # delimiter space is eaten
                    j += 1
                yield ("ctrl", word, param)
                i = j
            else:  # escaped symbol: \\ \{ \} \~ \- \_ \*
                sym = chr(c)
                if sym in "\\{}":
                    yield ("char", sym, None)
                elif sym == "~":
                    yield ("char", " ", None)
                elif sym == "*":
                    yield ("ctrl", "*", None)
                i += 1
        elif b in (0x0D, 0x0A, 0x00):
            i += 1  # raw newlines are not text in RTF
        else:
            j = i
            while j < n and data[j] not in (0x5C, 0x7B, 0x7D, 0x0D, 0x0A, 0x00):
                j += 1
            yield ("char", data[i:j].decode("cp1252", "replace"), None)
            i = j


def extract_rtf(data: bytes) -> Document:
    if not data.lstrip()[:5].lower().startswith(b"{\\rtf"):
        raise RtfError("missing {\\rtf header")

    doc = Document()
    page_no = 1
    buf: list[str] = []
    cells: list[str] = []
    rows: list[list[str]] = []
    # group stack entries: [skipping, uc_count, saw_star]
    stack: list[list] = [[False, 1, False]]
    skip_bytes = 0  # \uN fallback bytes to swallow

    def flush_para() -> None:
        nonlocal buf
        text = "".join(buf).strip()
        buf = []
        if text:
            doc.add_text(text=text, label=model.TEXT, page_no=page_no)

    def flush_table() -> None:
        nonlocal rows
        if not rows:
            return
        ncols = max(len(r) for r in rows)
        data_t = model.TableData(num_rows=len(rows), num_cols=ncols)
        grid = []
        for ri, row in enumerate(rows):
            grid.append([row[ci] if ci < len(row) else "" for ci in range(ncols)])
            for ci in range(ncols):
                data_t.cells.append(
                    model.TableCellData(
                        text=row[ci] if ci < len(row) else "",
                        start_row=ri, end_row=ri + 1,
                        start_col=ci, end_col=ci + 1,
                    )
                )
        data_t.grid = grid
        doc.add_table(data_t, page_no=page_no)
        rows = []

    for kind, a, b in _tokenize(data):
        top = stack[-1]
        if kind == "open":
            stack.append(list(top))
            stack[-1][2] = False
        elif kind == "close":
            if len(stack) > 1:
                stack.pop()
        elif kind == "ctrl":
            if a == "*":
                top[2] = True  # next unknown destination is ignorable
            elif a in _SKIP_DESTS or (top[2] and a not in _CHAR_WORDS):
                top[0] = True
                top[2] = False
            elif top[0]:
                continue
            elif a == "uc" and b is not None:
                top[1] = b
            elif a == "u" and b is not None:
                code = b + 0x10000 if b < 0 else b
                buf.append(chr(code))
                skip_bytes = top[1]
            elif a == "cell":
                cells.append("".join(buf).strip())
                buf = []
            elif a == "row":
                if buf and "".join(buf).strip():
                    cells.append("".join(buf).strip())
                    buf = []
                rows.append(cells)
                cells = []
            elif a == "page":
                flush_table()
                flush_para()
                page_no += 1
            elif a in _CHAR_WORDS:
                if a == "par" and not cells:
                    flush_table()
                    flush_para()
                elif a == "par":
                    pass  # paragraph mark inside an open cell: soft break
                else:
                    buf.append(_CHAR_WORDS[a])
        elif kind == "char":
            if top[0]:
                continue
            s = a
            if skip_bytes:
                take = min(skip_bytes, len(s))
                s = s[take:]
                skip_bytes -= take
            if s:
                buf.append(s)
    flush_table()
    flush_para()
    return doc
