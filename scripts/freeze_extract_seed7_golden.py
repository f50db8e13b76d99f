"""Freeze golden_extract_seed7.json (the byte-parity golden).

Runs the pure extraction kernel over the deterministic 300-page seed-7
corpus and freezes sha256(text)/sha256(markdown) + status/format/
n_chunks/title per url. Regenerate CONSCIOUSLY whenever extraction
semantics intentionally change — the git history of the golden is the
audit trail (mirrors the reference's GEN_TEST_DATA workflow,
tests/test_data_gen_flag.py).

Usage::

    python scripts/freeze_extract_seed7_golden.py
"""

from __future__ import annotations

import hashlib
import json
import sys

sys.path.insert(0, ".")

OUT = "tests_our/data/golden_extract_seed7.json"


def _sha(text) -> str:
    return hashlib.sha256((text or "").encode()).hexdigest()


def main() -> None:
    from doc_parser_spark.operators.extract import process_document
    from doc_parser_spark.sources.pages import generate_rows

    golden = {}
    for r in generate_rows(300, seed=7):
        rec = process_document(r["url"], r["html"])
        golden[r["url"]] = {
            "format": rec["format"],
            "markdown_sha256": _sha(rec["markdown"]),
            "n_chunks": rec["n_chunks"],
            "status": rec["status"],
            "text_sha256": _sha(rec["text"]),
            "title": rec["title"],
        }
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"froze {len(golden)} urls -> {OUT}")


if __name__ == "__main__":
    main()
