"""Path-backed table store with transactional-enough commits for the
merge engine.

The reference targets Delta tables and drives every upsert through
``MERGE INTO`` (writers/writer.py:177-692). On a lakehouse deployment
our SCD/merge operators (operators/scd.py) would commit the same plans
through Delta/Iceberg ``MERGE``; in this environment (no delta-spark on
the classpath) the store commits a *full new table state* computed as a
DataFrame, using a write-to-staging + atomic-directory-swap protocol so
a failed job never leaves a half-written table.

Scale note: rewrite-on-merge is O(table) per commit, which is exactly
what Delta MERGE does to touched files anyway; the operators are written
so the *computation* (join/dedup/close-out) is identical under either
commit strategy, and `partition_by` limits rewrites to touched
partitions when callers overwrite partition-wise.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class ParquetTable:
    """A parquet-directory table with create/append/overwrite/read.

    Mirrors the reference's create-if-absent + write dispatch
    (writers/batch_writers.py:8-56, writers/writer.py:122-155) without a
    metastore dependency: the table is addressed by filesystem path.
    """

    def __init__(self, spark: SparkSession, path: str, partition_by: list[str] | None = None):
        self.spark = spark
        self.path = path
        self.partition_by = partition_by or []

    # -- reads ---------------------------------------------------------------
    def exists(self) -> bool:
        if not os.path.isdir(self.path):
            return False
        for root, _dirs, files in os.walk(self.path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    # -- writes --------------------------------------------------------------
    def _writer(self, df: DataFrame, mode: str):
        w = df.write.mode(mode)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        return w

    def create_empty(self, schema) -> None:
        """writers/writer.py:142-155 ``_create_table_by_scd_type``."""
        if not self.exists():
            df = self.spark.createDataFrame([], schema)
            self._writer(df, "overwrite").parquet(self.path)

    def append(self, df: DataFrame) -> None:
        """writers/batch_writers.py:29-41 ``append_write`` /
        writers/writer.py:941-949 ``simple_append_write_to_delta``."""
        self._writer(df, "append").parquet(self.path)

    def overwrite(self, df: DataFrame) -> None:
        """Safe even when ``df`` was derived from ``self.read()``: the
        new state is materialized into a staging directory first, then
        swapped in with directory renames (the local stand-in for a
        Delta transaction commit)."""
        staging = f"{self.path}.__staging__{uuid.uuid4().hex[:8]}"
        backup = f"{self.path}.__old__{uuid.uuid4().hex[:8]}"
        w = df.write.mode("overwrite")
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(staging)
        try:
            if os.path.isdir(self.path):
                os.rename(self.path, backup)
            os.rename(staging, self.path)
        finally:
            shutil.rmtree(backup, ignore_errors=True)
            shutil.rmtree(staging, ignore_errors=True)

    def overwrite_partitions(self, df: DataFrame) -> None:
        """Dynamic-partition overwrite: replaces only the partitions
        present in ``df`` (the scale path for partition-scoped SCD1
        ``INSERT OVERWRITE``, writers/writer.py:209-216)."""
        if not self.partition_by:
            raise ValueError("overwrite_partitions requires partition_by")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        self._writer(df, "overwrite").parquet(self.path)

    def compact(self, target_files: int | None = None) -> None:
        """Small-file compaction — the engine's ``OPTIMIZE`` parity
        (writers/writer.py:276-281 runs ``OPTIMIZE`` every 101st
        micro-batch; Delta OSS bin-packs the same way). Rewrites the
        table into ``target_files`` files (default: current shuffle
        parallelism) via coalesce — no shuffle, pure file merge."""
        if not self.exists():
            return
        n = target_files or int(
            self.spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        self.overwrite(self.read().coalesce(n))

    def file_count(self) -> int:
        count = 0
        for _root, _dirs, files in os.walk(self.path):
            count += sum(1 for f in files if f.endswith(".parquet"))
        return count

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)
