"""Golden byte-parity regression: the north-rule invariant, enforceable.

BASELINE.json requires "byte-identical extracted text per url". The golden
file freezes sha256(text) / sha256(markdown) per url for the deterministic
300-page seed-7 corpus (every format class); this suite re-extracts — both
through the pure kernel and through the Spark operator — and demands 100%
hash equality. Any change to extraction semantics must consciously
regenerate the goldens (see tests_our/data/golden_extract_seed7.json
provenance in git history), mirroring the reference's GEN_TEST_DATA golden
workflow (tests/test_data_gen_flag.py, verify_export byte-exact check at
tests/verify_utils.py:500-515).
"""

import hashlib
import json
import os

import pytest

GOLDEN_PATH = os.path.join(
    os.path.dirname(__file__), "..", "data", "golden_extract_seed7.json"
)

pytestmark = pytest.mark.smoke


def _load_golden() -> dict:
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def _sha(text) -> str:
    return hashlib.sha256((text or "").encode()).hexdigest()


def test_kernel_byte_parity():
    from doc_parser_spark.operators.extract import process_document
    from doc_parser_spark.sources.pages import generate_rows

    golden = _load_golden()
    rows = generate_rows(300, seed=7)
    assert len(rows) == len(golden)
    mismatches = []
    for r in rows:
        rec = process_document(r["url"], r["html"])
        g = golden[r["url"]]
        if (
            _sha(rec["text"]) != g["text_sha256"]
            or _sha(rec["markdown"]) != g["markdown_sha256"]
            or rec["status"] != g["status"]
            or rec["format"] != g["format"]
            or rec["n_chunks"] != g["n_chunks"]
            or (rec["title"] or "") != (g["title"] or "")
        ):
            mismatches.append(r["url"])
    assert not mismatches, f"{len(mismatches)} urls diverged: {mismatches[:5]}"


def test_spark_operator_byte_parity(spark):
    """The distributed path must produce the identical bytes (order-free)."""
    from pyspark.sql import functions as F

    from doc_parser_spark.operators.extract import extract_documents
    from doc_parser_spark.sources.pages import pages_df

    golden = _load_golden()
    out = (
        extract_documents(pages_df(spark, 300, seed=7), salt_partitions=8)
        .select("url", F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("h"))
        .collect()
    )
    assert len(out) == len(golden)
    bad = [r["url"] for r in out if r["h"] != golden[r["url"]]["text_sha256"]]
    assert not bad, f"{len(bad)} urls diverged in Spark path: {bad[:5]}"
