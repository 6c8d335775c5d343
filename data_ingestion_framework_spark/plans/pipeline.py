"""Pipeline orchestration: read → transform queue → DQ → write(s).

Reference parity: ``PipelineBuilder`` (builder/engine.py:19-226) and its
``run_medallion()`` = ``_run_bronze()`` + ``_run_silver()`` flow
(builder/engine.py:162-221, SURVEY §3.1):

- bronze: raw (streaming or batch) ingest appended to the bronze table,
  stamped with control columns; the run's ``row_creation_time`` cursor
  is remembered;
- silver: re-read bronze *incrementally* (only this run's rows via the
  cursor — readers/batch_readers.py:76-77), run the transformation
  queue, evaluate DQ rules, and SCD-merge into the silver target(s).

Known reference defects intentionally fixed here (SURVEY §4): sql
transform executes via ``spark.sql`` (not ``df.sql``), the batch read
path returns a real cursor, and user functions resolve from an explicit
registry rather than ``globals()``.
"""

from __future__ import annotations

import datetime as dt
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_framework_spark.config import (
    PipelineConfig,
    WriteConfig,
    ensure_registered,
)
from data_ingestion_framework_spark.operators import dq as dq_mod
from data_ingestion_framework_spark.operators.transforms import (
    apply_transformations,
    cast_columns,
)
from data_ingestion_framework_spark.sinks.audit import AuditLogger
from data_ingestion_framework_spark.sinks.writers import batch_write
from data_ingestion_framework_spark.sources.batch import read_batch, add_control_columns
from data_ingestion_framework_spark.sources.tablestore import ParquetTable
from data_ingestion_framework_spark.streaming import (
    foreach_batch_scd_merge,
    read_file_stream,
    stream_append,
)


class PipelineBuilder:
    """Config-driven pipeline (builder/engine.py:19-47): one instance
    per source table; ``fncs`` is the explicit user-function registry
    (engine.py:114-119 minus the ``globals()`` hazard)."""

    def __init__(
        self,
        spark: SparkSession,
        config: PipelineConfig,
        fncs: dict[str, Callable] | None = None,
        dq_related: dict[str, DataFrame] | None = None,
    ):
        config.validate()
        self.spark = spark
        self.config = config
        self.fncs = fncs or {}
        self.dq_related = dq_related or {}
        self.audit = (
            AuditLogger(
                spark,
                config.audit_table_path,
                jdbc_url=config.audit_jdbc_url,
                jdbc_table=config.audit_jdbc_table,
                jdbc_options=config.audit_jdbc_options,
            )
            if config.audit_write
            and (config.audit_table_path or config.audit_jdbc_url)
            else None
        )
        #: bronze cursor (builder/engine.py:166-167)
        self.bronze_row_creation_time: dt.datetime | None = None
        #: per-table commit-seq cursors set by _run_bronze ("fresh" = new table)
        self._bronze_cursors: dict[str, int | str] = {}

    # -- stages --------------------------------------------------------------
    def read(self) -> DataFrame:
        """Reader dispatch (readers/reader.py:17-68): streaming file
        source vs batch file read, both stamped with control columns."""
        c = self.config
        if c.streaming:
            return read_file_stream(
                self.spark,
                c.source_filepath,
                c.source_data_type,
                options=c.source_reader_options,
                control_columns=True,
                run_start_time=self.bronze_row_creation_time,
                path_glob_filter=c.path_glob_filter,
            )
        df = read_batch(
            self.spark,
            c.source_filepath,
            c.source_data_type,
            c.source_reader_options,
            control_columns=True,
        )
        return df

    def transform(self, df: DataFrame) -> DataFrame:
        """Cast layer (builder/engine.py:50-66) + transformation queue
        (builder/engine.py:103-141)."""
        c = self.config
        if c.cast_column:
            df = cast_columns(df, c.cast_column)
        if c.transformations:
            df = apply_transformations(df, c.transformations, self.fncs)
        return df

    def run_dq(self, df: DataFrame) -> DataFrame:
        """Compile + evaluate DQ rules (engine.py:208-211 → dq/dq.py)."""
        c = self.config
        if not c.run_dq_rules or not c.dq_rules:
            return df
        rules = [dq_mod.DQRule(**r) for r in c.dq_rules]
        return dq_mod.apply_rules(df, rules, related=self.dq_related)

    def write(self, df: DataFrame, write: WriteConfig) -> None:
        c = self.config
        path = write.resolve_path(self.spark)
        table = ParquetTable(self.spark, path, write.partition_by or None)
        batch_write(
            df,
            table,
            mode=write.mode,
            key_cols=c.pkeys,
            order_col=c.source_orderby_column,
            scd_type=write.scd_type,
            full_extract=(c.source_extraction_type == "FE" and write.mode == "merge"),
            except_columns=write.except_column_list,
        )
        name = write.target_name()
        if write.register_in_metastore and name:
            ensure_registered(self.spark, name, path)
        if self.audit:
            self.audit.log(name or path, write.mode, {"layer": write.table_medallion_layer})

    # -- orchestration -------------------------------------------------------
    def run_medallion(self) -> None:
        """builder/engine.py:224-226: bronze ingest then silver merge."""
        self._run_bronze()
        self._run_silver()

    def _run_bronze(self) -> None:
        """Raw append to bronze (engine.py:162-181)."""
        c = self.config
        # Cursor comes from Spark's own clock: collect() renders the
        # timestamp in the session timezone and F.lit() re-interprets it
        # in the same timezone, so the bronze slice in _run_silver stays
        # correct even after set_session_timezone — a driver-side
        # datetime.now(utc) would be offset by the TZ delta and could
        # silently select zero rows.
        self.bronze_row_creation_time = self.spark.sql(
            "SELECT current_timestamp() AS t"
        ).collect()[0]["t"]
        bronze_writes = c.writes_for_layer("bronze")
        if not bronze_writes:
            return
        df = self.read()
        for w in bronze_writes:
            path = w.resolve_path(self.spark)
            if c.streaming:
                stream_append(
                    df.drop("_metadata"),
                    path,
                    w.checkpoint_location or f"{path}__ckpt",
                    trigger=c.trigger,
                )
            else:
                t = ParquetTable(self.spark, path, w.partition_by or None)
                # remember the pre-append commit so silver can read
                # exactly this run's files (commit cursor); "fresh"
                # means the table didn't exist yet — everything is new.
                # Keyed by table path: with multiple bronze writes a
                # single scalar would record the LAST table's seq and
                # then be applied to the FIRST table's commit log.
                hist = t.history()
                self._bronze_cursors[path] = hist[-1]["seq"] if hist else "fresh"
                t.append(df)
            if self.audit:
                self.audit.log(w.target_name() or path, "append", {"layer": "bronze"})

    def _run_silver(self) -> None:
        """Incremental bronze→silver merge (engine.py:183-221): only
        rows ingested by this run. Primary cursor is the bronze COMMIT
        (``read_since`` — scans exactly the files this run appended,
        O(new data)); the ``row_creation_time`` filter is the fallback
        when no commit cursor exists (streaming bronze, foreign tables)
        — that one scans bronze and prunes only if partitioned on the
        cursor column."""
        c = self.config
        silver_writes = c.writes_for_layer("silver")
        if not silver_writes:
            return
        bronze_writes = c.writes_for_layer("bronze")
        if bronze_writes:
            bpath = bronze_writes[0].resolve_path(self.spark)
            t = ParquetTable(self.spark, bpath)
            cursor = self._bronze_cursors.get(bpath)
            if cursor == "fresh":
                df = t.read()  # table born this run: everything is new
            elif cursor is not None:
                df = t.read_since(cursor)
            else:
                df = t.read()
                if self.bronze_row_creation_time is not None:
                    df = df.where(
                        F.col("row_creation_time")
                        >= F.lit(self.bronze_row_creation_time)
                    )
        else:
            df = self.read()  # no bronze layer: direct source → silver
        df = self.transform(df)
        df = self.run_dq(df)
        for w in silver_writes:
            self.write(df, w)

    def run_streaming_merge(self, write: WriteConfig) -> None:
        """Source stream → foreachBatch SCD merge into the target
        (writers/writer.py:695-758), with the transformation queue and
        DQ applied inside each micro-batch."""
        c = self.config
        stream = read_file_stream(
            self.spark,
            c.source_filepath,
            c.source_data_type,
            options=c.source_reader_options,
            control_columns=True,
        )
        path = write.resolve_path(self.spark)
        table = ParquetTable(self.spark, path, write.partition_by or None)
        foreach_batch_scd_merge(
            stream,
            table,
            c.pkeys,
            c.source_orderby_column,
            write.checkpoint_location or f"{path}__ckpt",
            scd_type=write.scd_type,
            transform=lambda d: self.run_dq(self.transform(d)),
        )
        if self.audit:
            self.audit.log(
                write.target_name() or path,
                "streaming_merge",
                {"scd_type": write.scd_type},
            )
