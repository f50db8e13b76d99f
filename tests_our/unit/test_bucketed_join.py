"""Bucketed-table storage layout: co-located joins with zero exchanges.

The 100 TB story for repeated host-keyed joins: pay the clustering
shuffle once at write time, then every later join/groupBy on the bucket
key is exchange-free. These tests PROVE the property from the physical
plan, with broadcast joins disabled so it is structural, not
size-accidental.
"""

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from doc_parser_spark.sources.catalog import write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    hosts = spark.range(0, 2000).select(
        F.concat(F.lit("host"), (F.col("id") % 97)).alias("host"),
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 1000).alias("n_chars"),
    )
    stats = spark.range(0, 97).select(
        F.concat(F.lit("host"), F.col("id")).alias("host"),
        (F.col("id") % 5).alias("tier"),
    )
    write_bucketed(hosts, "t_pages_b", "host", 8, path=str(tmp_path / "p"))
    write_bucketed(stats, "t_stats_b", "host", 8, path=str(tmp_path / "s"))
    yield spark.table("t_pages_b"), spark.table("t_stats_b")
    spark.sql("DROP TABLE IF EXISTS t_pages_b")
    spark.sql("DROP TABLE IF EXISTS t_stats_b")


def test_bucketed_join_has_zero_exchange(spark, bucketed_pair):
    pages, stats = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = pages.join(stats, "host").groupBy("host", "tier").agg(
            F.sum("n_chars").alias("chars")
        )
        plan = _plan(j)
        # the whole join+agg rides the bucket layout: NO shuffle anywhere
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and the result is right (sanity vs a plain non-bucketed compute)
        assert j.count() == 97
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_zero_exchange(spark, bucketed_pair):
    pages, _ = bucketed_pair
    agg = pages.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 97


def test_unbucketed_join_needs_exchanges_baseline(spark, tmp_path):
    # the control: same data written flat DOES shuffle — proves the
    # bucketed plans above aren't an AQE/size accident
    hosts = spark.range(0, 2000).select(
        F.concat(F.lit("host"), (F.col("id") % 97)).alias("host"),
        F.col("id").alias("doc_id"),
    )
    stats = spark.range(0, 97).select(
        F.concat(F.lit("host"), F.col("id")).alias("host"),
        (F.col("id") % 5).alias("tier"),
    )
    hosts.write.mode("overwrite").parquet(str(tmp_path / "hp"))
    stats.write.mode("overwrite").parquet(str(tmp_path / "sp"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.read.parquet(str(tmp_path / "hp")).join(
            spark.read.parquet(str(tmp_path / "sp")), "host"
        )
        assert "Exchange" in _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
