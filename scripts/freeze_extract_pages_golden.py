"""Freeze the extract_pages golden relation.

``pages_df(spark, 300, seed=7)`` is a deterministic, sf-independent
generator, so the expected output of the ``extract_pages`` query is a
constant relation. This script runs the query once and freezes it to a
single parquet file that the DuckDB oracle reads back via
``read_parquet``. Regenerate CONSCIOUSLY whenever extraction semantics
intentionally change (same policy as tests_our/data/golden_extract_seed7.json).

Usage::

    python scripts/freeze_extract_pages_golden.py
"""

from __future__ import annotations

import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")

OUT = "tests_our/data/extract_pages_golden.parquet"


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("freeze-extract-pages-golden")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    df = entry.queries()["extract_pages"](spark, "/root/testdata/sf0.01")
    rows = df.collect()
    cols = df.columns
    table = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "format": pa.array([r["format"] for r in rows], pa.string()),
            "status": pa.array([r["status"] for r in rows], pa.string()),
            "title": pa.array([r["title"] for r in rows], pa.string()),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
            "n_chunks": pa.array([r["n_chunks"] for r in rows], pa.int64()),
        }
    )
    assert set(cols) == set(table.column_names), (cols, table.column_names)
    pq.write_table(table, OUT)
    print(f"froze {table.num_rows} rows -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
