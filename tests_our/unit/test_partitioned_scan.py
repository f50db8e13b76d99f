"""Hive-layout partitioned writes: partition pruning proven from the
physical plan — a lang filter over a (lang, dt)-partitioned corpus
plans as PartitionFilters and never lists the other languages' data."""

import contextlib
import io
import os

from pyspark.sql import functions as F

from doc_parser_spark.sources.catalog import write_partitioned


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_pruning_reaches_scan(spark, tmp_path):
    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
        F.expr("element_at(array('en','de','fr'), cast(id % 3 + 1 as int))")
        .alias("lang"),
        F.expr("date_add(date'2024-01-01', cast(id % 4 as int))")
        .alias("dt"),
    )
    path = str(tmp_path / "corpus")
    write_partitioned(docs, path, ["lang", "dt"])
    # layout on disk: one directory per (lang, dt)
    assert sorted(os.listdir(path))[:1] == ["lang=de"] or any(
        d.startswith("lang=") for d in os.listdir(path)
    )
    back = spark.read.parquet(path)
    q = back.where("lang = 'en' AND dt = date'2024-01-02'").select(
        "doc_id", "text"
    )
    plan = _plan(q)
    # pruning is resolved at PLAN time, not as a data filter
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters", 1)[1][:400]
    # the pruned columns never appear as post-scan filters on data
    assert q.count() == 25  # 300/3 langs /4 days
    # and the full round trip preserves rows
    assert back.count() == 300


def test_write_partitioned_validates(spark, tmp_path):
    import pytest

    docs = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        write_partitioned(docs, str(tmp_path / "x"), [])
