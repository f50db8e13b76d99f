"""OMML (Office Math Markup Language) → LaTeX.

Own implementation of the conversion the reference performs via its
``docling/backend/docx/latex/omml.py`` (itself adapted from the public dwml
project) — the *templates* below are the output contract, validated
byte-exact against ``tests/data/groundtruth/docling_v2/equations.docx.md``.
Runs character-by-character through a unicode→latex mapping emulating
pylatexenc's ``braces-all`` + ensuremath/text post-rules, then the OMML
structure walk (fractions, n-ary, delimiters, scripts, functions, arrays,
radicals, accents, matrices).
"""

from __future__ import annotations

from typing import Optional
from xml.etree import ElementTree as ET

M_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/math}"

_ESCAPE_CHARS = ("{", "}", "_", "^", "#", "&", "$", "%", "~")

# math-mode unicode → latex command (rendered "  \cmd  ", the shape the
# reference's ensuremath unwrapping produces)
_MATH = {
    "π": "\\pi", "α": "\\alpha", "β": "\\beta", "γ": "\\gamma",
    "δ": "\\delta", "ε": "\\epsilon", "ζ": "\\zeta", "η": "\\eta",
    "θ": "\\theta", "ι": "\\iota", "κ": "\\kappa", "λ": "\\lambda",
    "μ": "\\mu", "ν": "\\nu", "ξ": "\\xi", "ρ": "\\rho",
    "σ": "\\sigma", "τ": "\\tau", "υ": "\\upsilon", "φ": "\\phi",
    "χ": "\\chi", "ψ": "\\psi", "ω": "\\omega",
    "Γ": "\\Gamma", "Δ": "\\Delta", "Θ": "\\Theta", "Λ": "\\Lambda",
    "Ξ": "\\Xi", "Π": "\\Pi", "Σ": "\\Sigma", "Φ": "\\Phi",
    "Ψ": "\\Psi", "Ω": "\\Omega",
    "∞": "\\infty", "±": "\\pm", "∓": "\\mp", "≤": "\\leq",
    "≥": "\\geq", "≠": "\\ne", "∈": "\\in", "∉": "\\notin",
    "→": "\\to", "←": "\\leftarrow", "⋅": "\\cdot", "∂": "\\partial",
    # ascii chars pylatexenc wraps in \ensuremath{…}, which the reference's
    # unwrapping turns into space-padded plain chars (gt: " < x < ")
    "<": "<", ">": ">",
}

# text-mode unicode → latex command (rendered " \text{ \cmd } ")
_TEXTMODE = {
    "×": "\\texttimes", "…": "\\textellipsis", "–": "\\textendash",
    "—": "\\textemdash", "’": "\\textquoteright", "‘": "\\textquoteleft",
    "£": "\\textsterling", "©": "\\textcopyright", "°": "\\textdegree",
}

# italic mathematical alphanumerics normalize to plain letters
_ITALIC_UPPER = 0x1D434
_ITALIC_LOWER = 0x1D44E

_CHR_BO = {
    "∑": "\\sum", "∏": "\\prod", "∐": "\\coprod", "∫": "\\int",
    "⋀": "\\bigwedge", "⋁": "\\bigvee", "⋂": "\\bigcap", "⋃": "\\bigcup",
}

_FRACTIONS = {
    "bar": "\\frac{{{num}}}{{{den}}}",
    "skw": "^{{{num}}}/_{{{den}}}",
    "noBar": "\\genfrac{{}}{{}}{{0pt}}{{}}{{{num}}}{{{den}}}",
    "lin": "{{{num}}}/{{{den}}}",
}

_FUNCS = {
    "sin": "\\sin({fe})", "cos": "\\cos({fe})", "tan": "\\tan({fe})",
    "arcsin": "\\arcsin({fe})", "arccos": "\\arccos({fe})",
    "arctan": "\\arctan({fe})", "sinh": "\\sinh({fe})",
    "cosh": "\\cosh({fe})", "tanh": "\\tanh({fe})", "coth": "\\coth({fe})",
    "sec": "\\sec({fe})", "csc": "\\csc({fe})", "mod": "\\mod {fe}",
    "max": "\\max({fe})", "min": "\\min({fe})",
}
_FUNC_PLACE = "{fe}"

_ACCENTS = {
    "̂": "\\hat{{{0}}}", "̃": "\\tilde{{{0}}}",
    "̄": "\\bar{{{0}}}", "̇": "\\dot{{{0}}}",
    "̈": "\\ddot{{{0}}}", "⃗": "\\vec{{{0}}}",
}


def _char_to_latex(c: str) -> str:
    o = ord(c)
    if _ITALIC_UPPER <= o <= _ITALIC_UPPER + 25:
        return chr(ord("A") + o - _ITALIC_UPPER)
    if _ITALIC_LOWER <= o <= _ITALIC_LOWER + 25:
        # U+1D455 (italic h) is unassigned; the range still maps linearly
        return chr(ord("a") + o - _ITALIC_LOWER)
    if c in _MATH:
        return f"  {_MATH[c]}  "
    if c in _TEXTMODE:
        return f" \\text{{ {_TEXTMODE[c]} }} "
    return c


def _escape_latex(s: str) -> str:
    out = []
    last = None
    s = s.replace("\\\\", "\\")
    for c in s:
        if c in _ESCAPE_CHARS and last != "\\":
            out.append("\\" + c)
        else:
            out.append(c)
        last = c
    return "".join(out)


def _local(el: ET.Element) -> str:
    return el.tag.replace(M_NS, "")


class _Pr:
    """Property bag: collects val-attributes of chr/pos/begChr/endChr/type
    and passes other children's text through."""

    def __init__(self, conv: "_Omml", elm: ET.Element):
        self.vals: dict = {}
        parts = []
        for child in elm:
            tag = _local(child)
            if tag in ("chr", "pos", "begChr", "endChr", "type"):
                self.vals[tag] = child.get(f"{M_NS}val")
            elif tag == "brk":
                self.vals["brk"] = "\\\\"
                parts.append("\\\\")
            else:
                t = conv.dispatch(child)
                if isinstance(t, str):
                    parts.append(t)
        self.text = "".join(parts)

    def get(self, name: str) -> Optional[str]:
        return self.vals.get(name)


class _Omml:
    _DIRECT = ("box", "sSub", "sSup", "sSubSup", "num", "den", "deg", "e")

    def __init__(self, element: ET.Element):
        self._latex = self.children_text(element)

    def __str__(self) -> str:
        return self._latex.replace("  ", " ")

    # -- traversal ----------------------------------------------------------

    def children(self, elm: ET.Element, include=None):
        for child in elm:
            if not child.tag.startswith(M_NS):
                continue
            tag = _local(child)
            if include and tag not in include:
                continue
            t = self.dispatch(child)
            if t is None:
                continue
            yield tag, t

    def children_text(self, elm: ET.Element, include=None) -> str:
        return "".join(
            t if isinstance(t, str) else t.text
            for _, t in self.children(elm, include)
        )

    def children_dict(self, elm: ET.Element) -> dict:
        return dict(self.children(elm))

    def dispatch(self, elm: ET.Element):
        tag = _local(elm)
        fn = getattr(self, f"do_{tag.lower()}", None)
        if fn is not None:
            return fn(elm)
        if tag in self._DIRECT:
            return self.children_text(elm)
        if tag.endswith("Pr"):
            return _Pr(self, elm)
        return None

    # -- handlers -------------------------------------------------------------

    def do_r(self, elm: ET.Element) -> str:
        found = elm.findtext(f"./{M_NS}t")
        if not found:
            return ""
        base = found
        proc = _escape_latex("".join(_char_to_latex(c) for c in found))
        if "{" not in base and "\\{" in proc:
            proc = proc.replace("\\{", "{")
        if "}" not in base and "\\}" in proc:
            proc = proc.replace("\\}", "}")
        return proc

    def do_sub(self, elm: ET.Element) -> str:
        return "_{" + self.children_text(elm) + "}"

    def do_sup(self, elm: ET.Element) -> str:
        return "^{" + self.children_text(elm) + "}"

    def do_f(self, elm: ET.Element) -> str:
        d = self.children_dict(elm)
        pr = d.get("fPr")
        ftype = pr.get("type") if isinstance(pr, _Pr) else None
        tpl = _FRACTIONS.get(ftype or "", "\\frac{{{num}}}{{{den}}}")
        prefix = pr.text if isinstance(pr, _Pr) else ""
        return prefix + tpl.format(num=d.get("num"), den=d.get("den"))

    def do_d(self, elm: ET.Element) -> str:
        d = self.children_dict(elm)
        pr = d.get("dPr")
        beg = pr.get("begChr") if isinstance(pr, _Pr) else None
        end = pr.get("endChr") if isinstance(pr, _Pr) else None
        beg = "(" if beg is None else beg
        end = ")" if end is None else end
        prefix = pr.text if isinstance(pr, _Pr) else ""
        left = "." if not beg else _escape_latex(beg)
        right = "." if not end else _escape_latex(end)
        return prefix + f"\\left{left}{d.get('e')}\\right{right}"

    def do_nary(self, elm: ET.Element) -> str:
        bo = ""
        parts = []
        for tag, t in self.children(elm):
            if tag == "naryPr":
                c = t.get("chr") if isinstance(t, _Pr) else None
                bo = _CHR_BO.get(c, c or "")
            elif isinstance(t, str):
                parts.append(t)
        return bo + "".join(parts)

    def do_func(self, elm: ET.Element) -> str:
        d = self.children_dict(elm)
        name = d.get("fName") or ""
        return name.replace(_FUNC_PLACE, d.get("e") or "")

    def do_fname(self, elm: ET.Element) -> str:
        parts = []
        for tag, t in self.children(elm):
            if tag == "r" and isinstance(t, str):
                parts.append(_FUNCS.get(t, t))
            elif isinstance(t, str):
                parts.append(t)
        t = "".join(parts)
        return t if _FUNC_PLACE in t else t + _FUNC_PLACE

    # docling dispatches fName via a case-insensitive-ish table; ET tags are
    # exact, so alias the camelCase name
    do_fName = do_fname  # noqa: N815

    def do_eqarr(self, elm: ET.Element) -> str:
        return "\\\\".join(
            t for tag, t in self.children(elm, include=("e",)) if isinstance(t, str)
        )

    do_eqArr = do_eqarr  # noqa: N815

    def do_rad(self, elm: ET.Element) -> str:
        d = self.children_dict(elm)
        deg = d.get("deg")
        if deg:
            return f"\\sqrt[{deg}]{{{d.get('e')}}}"
        return f"\\sqrt{{{d.get('e')}}}"

    def do_acc(self, elm: ET.Element) -> str:
        d = self.children_dict(elm)
        pr = d.get("accPr")
        c = pr.get("chr") if isinstance(pr, _Pr) else None
        tpl = _ACCENTS.get(c or "̂", "\\hat{{{0}}}")
        return tpl.format(d.get("e"))

    def do_bar(self, elm: ET.Element) -> str:
        d = self.children_dict(elm)
        pr = d.get("barPr")
        pos = pr.get("pos") if isinstance(pr, _Pr) else None
        tpl = "\\underline{{{0}}}" if pos == "bot" else "\\overline{{{0}}}"
        prefix = pr.text if isinstance(pr, _Pr) else ""
        return prefix + tpl.format(d.get("e"))

    def do_limlow(self, elm: ET.Element) -> str:
        d = dict(self.children(elm, include=("e", "lim")))
        base = {"lim": "\\lim_{{{lim}}}", "max": "\\max_{{{lim}}}",
                "min": "\\min_{{{lim}}}"}.get(d.get("e") or "")
        if not base:
            return (d.get("e") or "") + "_{" + (d.get("lim") or "") + "}"
        return base.format(lim=d.get("lim"))

    do_limLow = do_limlow  # noqa: N815

    def do_limupp(self, elm: ET.Element) -> str:
        d = dict(self.children(elm, include=("e", "lim")))
        return f"\\overset{{{d.get('lim')}}}{{{d.get('e')}}}"

    do_limUpp = do_limupp  # noqa: N815

    def do_lim(self, elm: ET.Element) -> str:
        return self.children_text(elm).replace("\\rightarrow", "\\to")

    def do_m(self, elm: ET.Element) -> str:
        rows = [t for tag, t in self.children(elm) if tag == "mr"]
        return "\\begin{matrix}" + "\\\\".join(rows) + "\\end{matrix}"

    def do_mr(self, elm: ET.Element) -> str:
        return "&".join(
            t for _, t in self.children(elm, include=("e",)) if isinstance(t, str)
        )

    def do_groupchr(self, elm: ET.Element) -> str:
        d = self.children_dict(elm)
        pr = d.get("groupChrPr")
        c = pr.get("chr") if isinstance(pr, _Pr) else None
        prefix = pr.text if isinstance(pr, _Pr) else ""
        return prefix + (c or "") + "{" + (d.get("e") or "") + "}"

    do_groupChr = do_groupchr  # noqa: N815


def omath_to_latex(elm: ET.Element) -> str:
    """One ``m:oMath`` element → latex string (reference: ``str(oMath2Latex
    (subt))``, including the final double-space collapse)."""
    return str(_Omml(elm))
