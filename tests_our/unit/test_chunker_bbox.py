"""chunk_bboxes normalization (reference set_chunk_bboxes,
basic_processor.py:778-795): l/r divided by page width, t/b by height."""

import json


def test_chunk_bboxes_are_page_normalized():
    from doc_parser_spark.core.chunker import chunk_document, compose_vectors
    from doc_parser_spark.pdf.extractor import extract_pdf
    from doc_parser_spark.pdf.writer import PAGE_H, PAGE_W, paragraph_runs, write_pdf

    pdf = write_pdf([paragraph_runs(["Title here", "hello world " * 20])])
    res = extract_pdf(pdf)
    doc = res[0] if isinstance(res, tuple) else res
    assert doc.page_sizes[1] == (PAGE_W, PAGE_H)

    chunks = chunk_document(doc)
    vecs = compose_vectors(doc, chunks)
    payload = vecs[0]["chunk_bboxes"]
    bbs = json.loads(payload) if isinstance(payload, str) else payload
    assert bbs, "PDF chunks must carry geometry"
    raw = [n.bbox for n, _ in doc.iterate_items() if n.bbox is not None]
    for bb, (rl, rt, rr, rb) in zip(bbs, raw):
        assert abs(bb["bbox"]["l"] - rl / PAGE_W) < 1e-9
        assert abs(bb["bbox"]["t"] - rt / PAGE_H) < 1e-9
        assert abs(bb["bbox"]["r"] - rr / PAGE_W) < 1e-9
        assert abs(bb["bbox"]["b"] - rb / PAGE_H) < 1e-9
