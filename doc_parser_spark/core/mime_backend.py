"""MIME payloads: MHTML web archives and RFC-822 email (EML).

Common Crawl and enterprise corpora both carry these: MHTML is how
browsers and some crawlers snapshot a full page (multipart/related with
a base64/quoted-printable HTML root part), EML is plain mail. The
reference has no backend for either; for a web-scale extraction engine
they are first-class, and the HTML root part rides the existing HTML
extractor so all boilerplate/structure semantics stay identical.

stdlib ``email`` does the MIME heavy lifting (header folding, base64 /
quoted-printable transfer decoding, multipart walking) — no new deps.
"""

from __future__ import annotations

import email
import email.policy

from . import model
from .model import Document


class MimeError(ValueError):
    pass


def _decode_part(part) -> str:
    payload = part.get_payload(decode=True)
    if payload is None:
        return ""
    charset = part.get_content_charset() or "utf-8"
    try:
        return payload.decode(charset, errors="replace")
    except LookupError:
        return payload.decode("utf-8", errors="replace")


def extract_mime(data: bytes) -> tuple[Document, str]:
    """MIME bytes → (Document, kind) with kind 'mhtml' or 'eml'.

    The first ``text/html`` part (the MHTML root, or the HTML alternative
    of an email) is parsed by the full HTML extractor; mails without an
    HTML part fall back to their ``text/plain`` parts as paragraphs.
    The Subject becomes the title when the HTML didn't bring its own."""
    try:
        msg = email.message_from_bytes(data, policy=email.policy.default)
    except Exception as exc:  # pragma: no cover - stdlib is permissive
        raise MimeError(f"unparseable MIME: {exc}") from exc
    if not msg.keys():
        raise MimeError("no MIME headers")

    ctype = (msg.get_content_type() or "").lower()
    kind = "mhtml" if "related" in ctype or "mhtml" in ctype else "eml"
    subject = str(msg.get("Subject") or "").strip()

    html_part = None
    text_parts: list[str] = []
    for part in msg.walk():
        pt = part.get_content_type()
        if pt == "text/html" and html_part is None:
            html_part = part
        elif pt == "text/plain":
            text = _decode_part(part)
            if text.strip():
                text_parts.append(text)

    if html_part is not None:
        from doc_parser_spark.html.extractor import extract_html

        payload = html_part.get_payload(decode=True) or b""
        doc = extract_html(payload)
        if subject and doc.title_text() == "":
            doc.add_text(text=subject, label=model.TITLE)
        return doc, kind

    doc = Document()
    if subject:
        doc.add_text(text=subject, label=model.TITLE)
    for text in text_parts:
        for para in text.replace("\r\n", "\n").split("\n\n"):
            para = para.strip()
            if para:
                doc.add_text(text=para, label=model.TEXT)
    if not subject and not text_parts:
        raise MimeError("MIME message carries no textual part")
    return doc, kind
