"""Spark StructTypes for the engine's tables (SURVEY.md §1.2 Spark mapping).

Two output tables:

* ``documents_out`` — one row per input page: status/metrics + main-content
  ``text`` + nested ``spans`` (structure) + nested ``chunks``
  (GenOSVectorMeta rows, reference: doc_preprocessors/basic_processor.py:707-727).
* ``chunks_out`` — ``documents_out`` with chunks exploded flat (the
  vector-DB ingestion shape, basic_processor.py:996-1057).

All per-page/per-cell intermediates stay inside the Arrow batch; these are
the only schemas that ever materialize as Spark rows.
"""

from __future__ import annotations

from pyspark.sql import types as T

BBOX_TYPE = T.StructType(
    [
        T.StructField("l", T.DoubleType()),
        T.StructField("t", T.DoubleType()),
        T.StructField("r", T.DoubleType()),
        T.StructField("b", T.DoubleType()),
    ]
)

TABLE_CELL_TYPE = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("row_span", T.IntegerType()),
        T.StructField("col_span", T.IntegerType()),
        T.StructField("start_row", T.IntegerType()),
        T.StructField("end_row", T.IntegerType()),
        T.StructField("start_col", T.IntegerType()),
        T.StructField("end_col", T.IntegerType()),
        T.StructField("column_header", T.BooleanType()),
        T.StructField("row_header", T.BooleanType()),
    ]
)

TABLE_TYPE = T.StructType(
    [
        T.StructField("num_rows", T.IntegerType()),
        T.StructField("num_cols", T.IntegerType()),
        T.StructField("cells", T.ArrayType(TABLE_CELL_TYPE)),
    ]
)

SPAN_TYPE = T.StructType(
    [
        T.StructField("self_ref", T.StringType()),
        T.StructField("parent_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("level", T.IntegerType()),
        T.StructField("marker", T.StringType()),
        T.StructField("enumerated", T.BooleanType()),
        T.StructField("content_layer", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("bbox", BBOX_TYPE),
        T.StructField("table", TABLE_TYPE),
    ]
)

# flat GenOSVectorMeta record (reference field list:
# doc_preprocessors/basic_processor.py:707-727)
CHUNK_TYPE = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("n_char", T.IntegerType()),
        T.StructField("n_word", T.IntegerType()),
        T.StructField("n_line", T.IntegerType()),
        T.StructField("i_page", T.IntegerType()),
        T.StructField("e_page", T.IntegerType()),
        T.StructField("i_chunk_on_page", T.IntegerType()),
        T.StructField("n_chunk_of_page", T.IntegerType()),
        T.StructField("i_chunk_on_doc", T.IntegerType()),
        T.StructField("n_chunk_of_doc", T.IntegerType()),
        T.StructField("n_page", T.IntegerType()),
        T.StructField("reg_date", T.StringType()),
        T.StructField("chunk_bboxes", T.StringType()),
        T.StructField("media_files", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("created_date", T.IntegerType()),
        T.StructField("authors", T.StringType()),
    ]
)

# confidence rollup (mirrors ConfidenceReport,
# docling/datamodel/base_models.py:378-458, deterministic subset)
CONFIDENCE_TYPE = T.StructType(
    [
        T.StructField("parse_score", T.DoubleType()),
        T.StructField("layout_score", T.DoubleType()),
    ]
)

DOCUMENTS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("document_hash", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("markdown", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("n_items", T.IntegerType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("n_chunks", T.IntegerType()),
        T.StructField("fallback", T.BooleanType()),
        T.StructField("confidence", CONFIDENCE_TYPE),
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
        T.StructField("chunks", T.ArrayType(CHUNK_TYPE)),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("extract_ms", T.DoubleType()),
    ]
)

# status values (mirrors ConversionStatus,
# docling/datamodel/base_models.py: SUCCESS/PARTIAL_SUCCESS/FAILURE/SKIPPED)
STATUS_SUCCESS = "success"
STATUS_PARTIAL = "partial_success"
STATUS_FAILURE = "failure"
STATUS_SKIPPED = "skipped"

# per-partition completion manifest for checkpoint/resume (north_star:
# "checkpoints per-partition completion manifests plus lineage/metrics rows")
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("run_id", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_success", T.LongType()),
        T.StructField("n_failure", T.LongType()),
        T.StructField("n_fallback", T.LongType()),
        T.StructField("min_url", T.StringType()),
        T.StructField("max_url", T.StringType()),
        T.StructField("wall_ms", T.DoubleType()),
    ]
)
