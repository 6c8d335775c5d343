"""Streaming file-source readers — the OSS Auto Loader substitute.

Reference parity: readers/streaming_readers.py:4-70
(``create_streaming_reader``: Databricks ``cloudFiles`` stream with a
schema snapshotted from a batch read, control columns, column-name
sanitization) and the landing autoloader scan
(reference/di_landing_to_raw_generic_v2.py:294-314).

OSS substitution (SURVEY §4): Structured Streaming's file source gives
the same incremental-file discovery with exactly-once tracking via the
checkpoint's file log. Schema is snapshotted with ``limit(0)`` batch
read (streaming_readers.py:44-51) — at 100 TB pass an explicit schema
(or a schema-registry lookup) instead so the snapshot read touches only
footers of one directory listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators.transforms import normalize_column_names


def snapshot_schema(spark: SparkSession, path: str, fmt: str, options: dict | None = None):
    """Schema snapshot from a zero-row batch read of the same path
    (streaming_readers.py:44-51).

    Parquet snapshots force ``mergeSchema``: default parquet inference
    reads ONE footer picked arbitrarily, so a landing directory whose
    newest files widened the schema would (non-deterministically) miss
    the new columns. Footer-merge cost is proportional to the landing
    directory's file count — at very large scale pass an explicit
    ``schema`` (or use ``schema_location``'s registry) instead."""
    options = dict(options or {})
    if fmt == "parquet":
        options.setdefault("mergeSchema", "true")
    return (
        spark.read.options(**options).format(fmt).load(path).limit(0).schema
    )


def read_file_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    options: dict[str, str] | None = None,
    control_columns: bool = True,
    run_start_time=None,
    max_files_per_trigger: int | None = None,
    sanitize_columns: bool = True,
    schema_location: str | None = None,
    path_glob_filter: str | None = None,
) -> DataFrame:
    """Incremental file stream over a landing directory.

    Control columns follow the streaming contract
    (streaming_readers.py:59-65): ``row_creation_time`` is the *run
    start* literal (constant within a run), file metadata comes from
    ``_metadata``. ``max_files_per_trigger`` maps Auto Loader's batch
    sizing onto the OSS file source.

    ``schema_location`` persists the inferred schema across runs
    (Auto Loader ``cloudFiles.schemaLocation`` parity,
    db_config_current_schema.py:93): run 1 infers and registers, later
    runs EVOLVE the registered schema — new columns append, known
    columns keep their registered type — instead of silently
    re-inferring (see ``SchemaRegistry``).
    """
    options = dict(options or {})
    if max_files_per_trigger is not None:
        options["maxFilesPerTrigger"] = str(max_files_per_trigger)
    if path_glob_filter is not None:
        # landing-dir isolation: only files matching the glob are
        # discovered/ingested — the autoloader's pathGlobFilter
        # (reference/di_landing_to_raw_generic_v2.py:294-314). Applies
        # to the schema snapshot too, so a non-matching file with a
        # different schema can't pollute inference.
        options["pathGlobFilter"] = path_glob_filter
    if schema is None:
        schema = snapshot_schema(spark, path, fmt, options)
        if schema_location is not None:
            from data_ingestion_framework_spark.streaming.schema_registry import (
                SchemaRegistry,
            )

            schema = SchemaRegistry(schema_location).evolve(schema)
    df = (
        spark.readStream.format(fmt)
        .schema(schema)
        .options(**options)
        .load(path)
    )
    if sanitize_columns:
        df = normalize_column_names(df)
    if control_columns:
        ts = (
            F.lit(run_start_time).cast("timestamp")
            if run_start_time is not None
            else F.current_timestamp()
        )
        df = (
            df.withColumn("row_creation_time", ts)
            .withColumn(
                "file_modification_time", F.col("_metadata.file_modification_time")
            )
            .withColumn("file_path", F.col("_metadata.file_path"))
            .withColumn("start_time", F.lit(None).cast("timestamp"))
            .withColumn("end_time", F.lit(None).cast("timestamp"))
            .withColumn("is_current", F.lit(1))
            .withColumn("delete_time", F.lit(None).cast("timestamp"))
        )
    return df
