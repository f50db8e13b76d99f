"""RecursiveCharacterTextSplitter-style chunking (the fork's fast path).

The reference's LangChain-style basic path splits with
``RecursiveCharacterTextSplitter(chunk_size=1000, chunk_overlap=200)``
(``doc_preprocessors/attachment_processor.py:298-1311``, SURVEY.md Op-53).
This is a from-scratch implementation of those semantics: try separators in
order (``\\n\\n``, ``\\n``, ``" "``, ``""``), split on the first that
produces pieces, greedily merge pieces up to ``chunk_size`` characters with
``chunk_overlap`` characters carried between adjacent chunks.
"""

from __future__ import annotations

SEPARATORS = ["\n\n", "\n", " ", ""]


def _split_on(text: str, sep: str) -> list[str]:
    if sep == "":
        return list(text)
    return text.split(sep)


def recursive_split(
    text: str, chunk_size: int = 1000, chunk_overlap: int = 200
) -> list[str]:
    """Split ``text`` into chunks of ≤ chunk_size chars with overlap."""
    if not text:
        return []
    if len(text) <= chunk_size:
        return [text]

    # find the first separator that actually splits
    pieces: list[str] = [text]
    used_sep = ""
    for sep in SEPARATORS:
        cand = _split_on(text, sep)
        if len(cand) > 1:
            pieces, used_sep = cand, sep
            break

    # recursively break pieces still over budget
    atomic: list[str] = []
    for piece in pieces:
        if len(piece) > chunk_size:
            atomic.extend(recursive_split(piece, chunk_size, chunk_overlap))
        elif piece:
            atomic.append(piece)

    # greedy merge with overlap
    chunks: list[str] = []
    current = ""
    for piece in atomic:
        joined = current + used_sep + piece if current else piece
        if len(joined) <= chunk_size:
            current = joined
        else:
            if current:
                chunks.append(current)
            if chunk_overlap > 0 and current:
                tail = current[-chunk_overlap:]
                sp = tail.find(" ")
                if 0 <= sp < len(tail) - 1:
                    tail = tail[sp + 1 :]
                candidate = tail + used_sep + piece if tail else piece
                current = candidate if len(candidate) <= chunk_size else piece
            else:
                current = piece
    if current:
        chunks.append(current)
    return chunks
