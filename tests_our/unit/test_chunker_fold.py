"""The incremental (O(n)) chunk-accumulation fold in split_by_tokens must be
byte-equivalent to the direct formulation that regenerates the full chunk
text per candidate item (the reference's O(n²) shape,
basic_processor.py:410-589)."""

import random

from hypothesis import given, settings, strategies as st

from doc_parser_spark.core import model
from doc_parser_spark.core.chunker import (
    CHUNK_DELIM,
    Chunk,
    _extract_used_headers,
    _feed_tokens,
    _finalize_tokens,
    _generate_text,
    _merge_small_chunks,
    count_tokens,
    split_by_tokens,
)


def _direct_split(items, infos, max_tokens):
    """The pre-refactor accumulation loop, kept verbatim as the test oracle
    (the table and oversized-single-item branches are unchanged code paths,
    exercised separately by test_chunker.py)."""
    result = []
    current_items, current_infos = [], []

    def flush():
        nonlocal current_items, current_infos
        if current_items:
            result.append(
                Chunk(
                    text=_generate_text(current_items, current_infos),
                    items=list(current_items),
                    headings=_extract_used_headers(current_infos),
                )
            )
            current_items, current_infos = [], []

    for i, item in enumerate(items):
        info = infos[i]
        test_text = _generate_text(current_items + [item], current_infos + [info])
        if count_tokens(test_text) <= max_tokens:
            current_items.append(item)
            current_infos.append(info)
        else:
            if current_items:
                flush()
                current_items, current_infos = [item], [info]
            else:
                result.append(
                    Chunk(
                        text=_generate_text([item], [info]),
                        items=[item],
                        headings=_extract_used_headers([info]),
                    )
                )
    flush()
    return _merge_small_chunks(result, max_tokens)


_WORDS = ["alpha", "beta", "gamma", "delta", "x", "verylongword" * 8]


def _mk_items(seed: int, n: int):
    rng = random.Random(seed)
    doc = model.Document(name="t")
    items, infos = [], []
    headers = {}
    for _ in range(n):
        if rng.random() < 0.25:
            headers = {1: f"H{rng.randrange(3)}"}
            if rng.random() < 0.5:
                headers[2] = f"S{rng.randrange(3)}"
        label = rng.choice(
            [model.TEXT, model.TEXT, model.TEXT, model.PICTURE, model.SECTION_HEADER]
        )
        text = " ".join(rng.choice(_WORDS) for _ in range(rng.randrange(0, 60)))
        if rng.random() < 0.15:
            text = text.replace(" ", "\n", 3)  # multi-line items
        items.append(doc.add_text(text=text, label=label, page_no=1))
        infos.append(dict(headers))
    return items, infos


@given(st.integers(0, 10_000), st.integers(1, 80))
@settings(max_examples=80, deadline=None)
def test_token_fold_matches_count_tokens_on_every_prefix(seed, n):
    rng = random.Random(seed)
    parts = []
    state = (0, "")
    for _ in range(n):
        part = " ".join(rng.choice(_WORDS) for _ in range(rng.randrange(0, 30)))
        if rng.random() < 0.3:
            part = part.replace(" ", "\n", 2)
        parts.append(part)
        state = _feed_tokens(state, part)
        assert _finalize_tokens(state) == count_tokens(CHUNK_DELIM.join(parts))


@given(st.integers(0, 10_000), st.integers(1, 60), st.sampled_from([2, 32, 128, 1024]))
@settings(max_examples=80, deadline=None)
def test_split_by_tokens_equals_direct_quadratic_loop(seed, n, max_tokens):
    items, infos = _mk_items(seed, n)
    got = split_by_tokens(items, infos, max_tokens=max_tokens)
    want = _direct_split(items, infos, max_tokens)
    assert [(c.text, c.headings) for c in got] == [
        (c.text, c.headings) for c in want
    ]
