"""Manifest / sidecar IO that works on cluster filesystems, not just the
driver's local disk.

``run_extraction_job`` commits a per-slice manifest after each slice's
output lands. On a real deployment ``output_dir`` is ``hdfs://`` or
``s3a://`` — plain ``os.makedirs``/``os.replace`` silently write to the
driver's local filesystem instead, and a resumed run on a different
driver sees no manifests at all. This module routes manifest IO through
Hadoop's ``FileSystem`` API (via the active ``SparkContext``'s JVM), so
the same code commits manifests next to the data on whatever filesystem
the output lives on. Bare local paths take an ``os``-level fast path and
need no Spark session (unit-testable without a JVM).

Commit protocol: write ``<path>.tmp.<uuid>`` then rename.

* HDFS / local FS: rename is atomic — readers see the old or the new
  manifest, never a torn write.
* S3A: rename is copy+delete (not atomic), but a manifest is a single
  small object and S3 single-object PUTs are themselves atomic — the
  worst case for a crash between copy and delete is a leftover ``.tmp``
  object, which ``completed_slices`` ignores. This is the same
  tmp+rename shape Spark's own job committers (and Iceberg's metadata
  commits) use for marker files.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Optional

from pyspark.sql import SparkSession


def _has_scheme(path: str) -> bool:
    # "s3a://...", "hdfs://...", "file:/..." — a Windows drive letter is
    # not a concern on cluster deployments
    head, sep, _ = path.partition("://")
    return bool(sep) or path.startswith("file:/")


class ManifestStore:
    """Per-slice manifest commit + listing over local or Hadoop filesystems."""

    def __init__(self, output_dir: str, spark: Optional[SparkSession] = None):
        self.output_dir = output_dir
        self._spark = spark
        # Route through Hadoop whenever a session is available, scheme or
        # not: Spark resolves scheme-less output paths against
        # fs.defaultFS, so on an HDFS-default cluster `--output /data/out`
        # is HDFS — an os.* fast path would put manifests on the driver's
        # local disk, away from the data (the split-brain this module
        # exists to prevent). Path.getFileSystem applies the identical
        # defaultFS resolution. The os fast path remains only for
        # session-less (unit-test) use of bare local paths.
        self._use_hadoop = spark is not None or _has_scheme(output_dir)
        if _has_scheme(output_dir) and spark is None:
            raise ValueError(
                f"{output_dir!r} has a filesystem scheme; a SparkSession is "
                "required to reach it through the Hadoop FileSystem API"
            )

    # -- path helpers -------------------------------------------------------

    def manifest_dir(self) -> str:
        return f"{self.output_dir.rstrip('/')}/_manifests"

    def manifest_path(self, k: int) -> str:
        return f"{self.manifest_dir()}/slice_{k}.json"

    def _fs(self, path: str):
        jvm = self._spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        conf = self._spark._jsc.hadoopConfiguration()
        return jpath.getFileSystem(conf), jpath, jvm

    # -- operations ---------------------------------------------------------

    def write_atomic(self, k: int, payload: dict) -> None:
        path = self.manifest_path(k)
        data = json.dumps(payload).encode()
        if not self._use_hadoop:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.tmp.{uuid.uuid4().hex}"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)  # atomic on POSIX
            return
        fs, jpath, jvm = self._fs(path)
        tmp = jvm.org.apache.hadoop.fs.Path(f"{path}.tmp.{uuid.uuid4().hex}")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()
        if fs.exists(jpath):
            fs.delete(jpath, False)
        if not fs.rename(tmp, jpath):
            raise IOError(f"manifest rename failed: {tmp} -> {path}")

    def read(self, k: int) -> dict:
        path = self.manifest_path(k)
        if not self._use_hadoop:
            with open(path) as f:
                return json.load(f)
        fs, jpath, jvm = self._fs(path)
        stream = fs.open(jpath)
        try:
            # py4j passes arrays by value (no write-back), so readFully into
            # a Python bytearray would stay empty — let the JVM materialize
            # the byte[] instead (commons-io ships with hadoop-common)
            raw = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        finally:
            stream.close()
        return json.loads(bytes(raw).decode())

    def completed_slices(self) -> set[int]:
        done: set[int] = set()

        def _collect(name: str) -> None:
            if name.startswith("slice_") and name.endswith(".json"):
                try:
                    done.add(int(name[len("slice_"):-len(".json")]))
                except ValueError:
                    pass

        if not self._use_hadoop:
            mdir = self.manifest_dir()
            if os.path.isdir(mdir):
                for name in os.listdir(mdir):
                    _collect(name)
            return done
        fs, jdir, _ = self._fs(self.manifest_dir())
        if not fs.exists(jdir):
            return done
        for status in fs.listStatus(jdir):
            _collect(status.getPath().getName())
        return done

    def remove(self, k: int) -> None:
        path = self.manifest_path(k)
        if not self._use_hadoop:
            os.remove(path)
            return
        fs, jpath, _ = self._fs(path)
        fs.delete(jpath, False)
