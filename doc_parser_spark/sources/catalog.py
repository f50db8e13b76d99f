"""Logical-table IO: one seam where the storage format is chosen.

The north-star deployment reads Common-Crawl-style pages from an Iceberg
table and writes documents/chunks/metrics back to partitioned Iceberg
tables. This sandbox ships no Iceberg runtime jars, so the default mode
is ``parquet`` (partitioned directories — the exact layout
``run_extraction_job`` produces today) and ``iceberg`` mode is the
config swap for clusters that have a catalog:

    spark.sql.extensions = org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions
    spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.<name>.type = hive | hadoop | rest

Iceberg mode uses only the public DataFrameWriterV2 / ``spark.read
.table`` surface (no Iceberg-specific Python API), so this module
imports nothing beyond pyspark either way:

* read:   ``spark.read.table("cat.ns.pages")``
* append: ``df.writeTo("cat.ns.documents").append()`` — an atomic
  snapshot commit, which REPLACES the per-slice manifest as the commit
  marker only if you also fold the slice id into the snapshot's summary;
  the manifest protocol (``plans/manifests.py``) stays the resume source
  of truth in both modes precisely so the two modes behave identically.
* dynamic partition overwrite: ``df.writeTo(...).overwritePartitions()``
  — what a slice re-run needs so a retried slice replaces only its own
  day partitions.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    """Resolves logical table names to reads/writes in one of two modes.

    ``parquet`` (default): tables are partitioned directories under
    ``root`` — e.g. ``<root>/documents/slice=3``. ``iceberg``: tables are
    ``<catalog>.<namespace>.<name>`` identifiers in a configured catalog.
    """

    def __init__(
        self,
        spark: SparkSession,
        mode: str = "parquet",
        root: Optional[str] = None,
        catalog: Optional[str] = None,
        namespace: str = "doc_parser",
    ):
        if mode not in ("parquet", "iceberg"):
            raise ValueError(f"unknown TableIO mode {mode!r}")
        if mode == "parquet" and not root:
            raise ValueError("parquet mode needs a root directory")
        if mode == "iceberg" and not catalog:
            raise ValueError("iceberg mode needs a catalog name")
        self.spark = spark
        self.mode = mode
        self.root = (root or "").rstrip("/")
        self.catalog = catalog
        self.namespace = namespace

    def identifier(self, name: str) -> str:
        """Path (parquet mode) or catalog identifier (iceberg mode)."""
        if self.mode == "parquet":
            return f"{self.root}/{name}"
        return f"{self.catalog}.{self.namespace}.{name}"

    def read(self, name: str) -> DataFrame:
        if self.mode == "parquet":
            return self.spark.read.parquet(self.identifier(name))
        return self.spark.read.table(self.identifier(name))

    def overwrite_partitioned(
        self, df: DataFrame, name: str, partition_by: Sequence[str] = ()
    ) -> None:
        """Replace the named table slice's partitions with ``df``.

        Parquet mode overwrites the directory (the caller scopes the name
        per slice, e.g. ``documents/slice=3``, so only that slice is
        replaced). Iceberg mode is a dynamic partition overwrite — an
        atomic snapshot replacing exactly the partitions present in
        ``df``."""
        if self.mode == "parquet":
            _write_parquet_partitioned(
                df, self.identifier(name), partition_by, "overwrite"
            )
            return
        target = self.identifier(name)
        existing = self.spark.catalog.tableExists(target)
        w = df.writeTo(target)
        if not existing:
            from pyspark.sql import functions as F

            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.create()
        else:
            w.overwritePartitions()

    def append(
        self, df: DataFrame, name: str, partition_by: Sequence[str] = ()
    ) -> None:
        """Add rows to the named table. Parquet mode must repeat the
        table's partition columns (flat files mixed into a partitioned
        directory are invisible to partition discovery); Iceberg tables
        carry their partition spec themselves."""
        if self.mode == "parquet":
            writer = df.write.mode("append")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(self.identifier(name))
            return
        df.writeTo(self.identifier(name)).append()


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: Optional[str] = None,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a bucketed (hash-clustered) parquet table.

    Bucketing is THE storage-layout lever for repeated big-to-big joins
    at corpus scale: two tables bucketed on the same key with the same
    bucket count co-partition on disk, so every later equi-join or
    groupBy on that key reads pre-shuffled data — Catalyst plans a
    SortMergeJoin with ZERO Exchange on either side (and with ``sort``,
    zero per-task Sort too). Writing costs one shuffle ONCE; a pipeline
    that joins pages↔links↔metrics by host on every run amortizes it
    across every downstream job. At 10^12 rows the bucket count should
    target ~2-4 GB per bucket file; the catalog records the spec so
    every reader agrees.

    Uses only the public ``bucketBy`` writer surface (bucketed tables
    must be catalog-managed — ``saveAsTable``, not ``parquet(path)``;
    ``path`` keeps the files external). The Iceberg twin of this layout
    is the ``bucket(N, key)`` partition transform, which Spark 3.3+
    storage-partitioned joins exploit the same way — ``TableIO``'s
    iceberg mode composes with it unchanged.
    """
    w = df.write.mode("overwrite").format("parquet")
    if path:
        w = w.option("path", path)
    w = w.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def _write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str,
) -> None:
    """The ONE parquet partitioned-write path — shared by
    ``TableIO.overwrite_partitioned`` (parquet mode) and
    :func:`write_partitioned` so the two can never drift."""
    writer = df.write.mode(mode).format("parquet")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a Hive-layout partitioned parquet directory
    (``<path>/<col>=<value>/...``) — the OTHER storage-layout lever
    beside :func:`write_bucketed`: bucketing removes join/groupBy
    exchanges on a high-cardinality key; directory partitioning removes
    the SCAN itself for predicates on low-cardinality columns (language,
    crawl date, status).  A ``lang='en'`` filter over a corpus
    partitioned by ``(lang, dt)`` reads only the en directories —
    Catalyst resolves it at planning time as a ``PartitionFilters``
    entry, zero data touched for every other language (proven from the
    plan in ``test_partitioned_scan.py``).

    At 10^12 documents partition columns must stay low-cardinality
    (lang×day ≈ 10^5 directories is fine; URL-host is NOT — that's what
    bucketing is for) or the file listing itself becomes the bottleneck.
    The Iceberg twin is the identity/``days(ts)`` partition transform;
    ``TableIO``'s iceberg mode composes unchanged.
    """
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    _write_parquet_partitioned(df, path, partition_cols, mode)
