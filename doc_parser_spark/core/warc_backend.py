"""WARC record reader — the Common-Crawl container format itself.

A page-table cell sometimes holds a raw WARC capture rather than bare
HTML (crawlers hand around per-record slices of the big .warc.gz files).
This reader walks the record chain, takes the first ``response`` /
``resource`` record, strips the HTTP envelope, and routes the body back
through the normal format dispatch — so a WARC-wrapped page produces
exactly the same Document as its bare payload would (ISO 28500 record
grammar; ALL gzip members are inflated — standard .warc.gz is one member
per record — under a cumulative DEFAULT_MAX_BYTES output cap).
"""

from __future__ import annotations

import zlib
from typing import Optional

from .limits import DEFAULT_MAX_BYTES, BombError, gunzip_members
from .model import Document


class WarcError(ValueError):
    pass


def _split_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # first line is WARC/1.x
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("ascii", "replace")
            )
    return headers


def iter_records(data: bytes):
    """Yield ``(headers, body)`` for EVERY record in a (possibly
    gzipped) WARC record chain — the shared walk behind
    :func:`warc_payload` and the ``extract_warc_records`` ingestion
    relation. Raises :class:`WarcError` on malformed framing."""
    if data[:2] == b"\x1f\x8b":  # gzipped member(s) — inflate ALL of them
        try:
            data = gunzip_members(data, DEFAULT_MAX_BYTES)
        except BombError as exc:
            raise WarcError(str(exc)) from exc
        except zlib.error as exc:
            raise WarcError(f"bad WARC gzip member: {exc}") from exc
    pos = 0
    while pos < len(data):
        if not data[pos:].startswith(b"WARC/"):
            raise WarcError("bad WARC framing: record does not start WARC/")
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise WarcError("truncated WARC header")
        headers = _split_headers(data[pos:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError as exc:
            raise WarcError("missing Content-Length") from exc
        body = data[head_end + 4 : head_end + 4 + length]
        if len(body) != length:
            raise WarcError("truncated record body")
        yield headers, body
        pos = head_end + 4 + length
        # records are separated by two CRLFs
        while data[pos : pos + 2] == b"\r\n":
            pos += 2


def strip_http_envelope(body: bytes) -> tuple[bytes, Optional[int], str]:
    """Split an HTTP response envelope off a WARC ``response`` body:
    ``(payload, status or None, content-type header or '')``."""
    if not body.startswith(b"HTTP/"):
        return body, None, ""
    http_end = body.find(b"\r\n\r\n")
    if http_end < 0:
        return body, None, ""
    head = body[:http_end]
    status: Optional[int] = None
    first = head.split(b"\r\n", 1)[0].split(b" ")
    if len(first) >= 2 and first[1].isdigit():
        status = int(first[1])
    ctype = ""
    for line in head.split(b"\r\n")[1:]:
        if line.lower().startswith(b"content-type:"):
            ctype = line.split(b":", 1)[1].strip().decode("ascii", "replace")
            break
    return body[http_end + 4 :], status, ctype


def warc_payload(data: bytes) -> tuple[bytes, str]:
    """WARC bytes → (payload bytes of the first response/resource record,
    target URI). Strips the HTTP response envelope when present."""
    for headers, body in iter_records(data):
        if headers.get("warc-type") in ("response", "resource"):
            uri = headers.get("warc-target-uri", "")
            body, _status, _ctype = strip_http_envelope(body)
            return body, uri
    raise WarcError("no response record found")


def extract_warc(data: bytes) -> tuple[Document, str]:
    """WARC bytes → (Document, 'warc:<inner format>')."""
    from doc_parser_spark.operators.extract import convert_payload

    body, _uri = warc_payload(data)
    if not body:
        raise WarcError("empty record payload")
    doc, inner, _fb = convert_payload(body)
    return doc, f"warc:{inner}"


def parse_http_headers(body: bytes):
    """HTTP response envelope → ``(status or None, ordered [(name,
    value)])`` — the full-header sibling of :func:`strip_http_envelope`
    (which surfaces only status + Content-Type for the payload path).

    Header names are lowercased ASCII (field names are ASCII by RFC
    9110 §5.1 — stray bytes degrade per-character), values decode
    latin-1 (the RFC 9110 §5.5 historical-charset rule — lossless for
    arbitrary octets) and trim OWS. Lines without a colon are skipped;
    emission order is wire order, duplicates preserved (Set-Cookie et
    al. are legitimately repeated). A body with no envelope (or a torn
    head) yields ``(None, [])`` — mirroring ``strip_http_envelope``'s
    no-envelope degrade.
    """
    if not body.startswith(b"HTTP/"):
        return None, []
    http_end = body.find(b"\r\n\r\n")
    if http_end < 0:
        return None, []
    lines = body[:http_end].split(b"\r\n")
    status = None
    first = lines[0].split(b" ")
    if len(first) >= 2 and first[1].isdigit():
        status = int(first[1])
    headers = []
    for line in lines[1:]:
        if b":" not in line:
            continue
        name, _, value = line.partition(b":")
        headers.append(
            (
                name.strip().decode("ascii", "replace").lower(),
                value.strip().decode("latin-1"),
            )
        )
    return status, headers
