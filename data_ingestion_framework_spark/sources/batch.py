"""Batch readers: file formats + catalog tables, with the engine's
control-column contract.

Reference parity: readers/batch_readers.py:5-86 (parquet/csv/json/orc/
hms/uc/delta-path readers that append 7 control columns and expose
``_metadata`` file info). Differences by design:

- We do NOT globally sort by ``file_modification_time`` at read time
  (the reference does: batch_readers.py:19,32). A global sort is a full
  shuffle + single-direction range exchange that is pure overhead at
  100 TB; every downstream consumer that needs per-key ordering uses a
  window over ``(key ORDER BY order_col)`` instead, which shuffles by
  key — the same cost as the merge join it precedes.
- ``_rescued_data`` handling (batch_readers.py:77) maps to Spark's
  permissive-mode corrupt-record column, dropped on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The 7-column control contract stamped on every ingested row
#: (reference writers/writer.py:19, populated readers/batch_readers.py:12-18).
CONTROL_COLUMNS = [
    "row_creation_time",
    "file_modification_time",
    "file_path",
    "start_time",
    "end_time",
    "is_current",
    "delete_time",
]

_FILE_FORMATS = {"parquet", "csv", "json", "orc", "text"}


def add_control_columns(df: DataFrame, with_file_metadata: bool = True) -> DataFrame:
    """Append the SCD control columns (readers/batch_readers.py:12-18).

    ``_metadata`` is the OSS Spark (>=3.3) hidden file-source struct; it
    is only resolvable on a file-source scan, so ``with_file_metadata``
    must be False for table reads.
    """
    if with_file_metadata:
        df = df.withColumn(
            "file_modification_time", F.col("_metadata.file_modification_time")
        ).withColumn("file_path", F.col("_metadata.file_path"))
    else:
        df = df.withColumn(
            "file_modification_time", F.lit(None).cast("timestamp")
        ).withColumn("file_path", F.lit(None).cast("string"))
    return (
        df.withColumn("row_creation_time", F.current_timestamp())
        .withColumn("start_time", F.lit(None).cast("timestamp"))
        .withColumn("end_time", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(1))
        .withColumn("delete_time", F.lit(None).cast("timestamp"))
    )


def read_batch(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    options: dict[str, str] | None = None,
    control_columns: bool = False,
    schema=None,
) -> DataFrame:
    """Generic batch file read (readers/batch_readers.py:5-54).

    Filters/projections applied by callers push down to the scan —
    callers must not force materialization before filtering.
    """
    fmt = fmt.lower()
    if fmt == "delta":
        return read_delta_path(spark, path, options)
    if fmt not in _FILE_FORMATS:
        raise ValueError(f"unsupported batch format: {fmt}")
    reader = spark.read.options(**(options or {}))
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.format(fmt).load(path)
    if control_columns:
        df = add_control_columns(df)
    return df


def read_parquet(spark, path, options=None, control_columns=True):
    """readers/batch_readers.py:5-33 (sans the global mtime sort; see module doc)."""
    return read_batch(spark, path, "parquet", options, control_columns)


def read_csv(spark, path, options=None, control_columns=False, schema=None):
    """readers/batch_readers.py:36-40."""
    return read_batch(spark, path, "csv", options, control_columns, schema)


def read_json(spark, path, options=None, control_columns=False, schema=None):
    """readers/batch_readers.py:43-47."""
    return read_batch(spark, path, "json", options, control_columns, schema)


def read_orc(spark, path, options=None, control_columns=False):
    """readers/batch_readers.py:50-54."""
    return read_batch(spark, path, "orc", options, control_columns)


def read_text(
    spark,
    path,
    options=None,
    control_columns=True,
    whole_file: bool = False,
):
    """Raw-text corpus reader — the missing format for LLM training
    data that arrives as plain ``.txt`` shards (jsonl goes through
    ``read_json``). Line mode yields one row per line (``value``
    string); ``whole_file=True`` (Spark's ``wholetext``) yields one
    row per FILE — the per-document shape. Control columns stamp
    ``file_path`` etc. so a downstream doc id can derive from the
    source file, the same provenance contract as the other readers."""
    opts = dict(options or {})
    if whole_file:
        opts["wholetext"] = "true"
    return read_batch(spark, path, "text", opts, control_columns)


def read_delta_path(spark, path, options=None, version=None):
    """readers/batch_readers.py:82-86 (+ ``VERSION AS OF`` when
    ``version`` is given). Resolution order: the real delta data source
    if it is on the classpath; else the built-in transaction-log reader
    (sources/delta_log.py — correctly skips remove-tombstoned files,
    which a naive parquet read would resurrect); else plain parquet for
    directories that aren't Delta tables at all."""
    try:
        r = spark.read.format("delta").options(**(options or {}))
        if version is not None:
            r = r.option("versionAsOf", str(version))
        return r.load(path)
    except Exception:
        from data_ingestion_framework_spark.sources.delta_log import (
            is_delta_table,
            read_delta_log,
        )

        if is_delta_table(path):
            return read_delta_log(spark, path, version, options)
        return spark.read.options(**(options or {})).parquet(path)


def read_table(
    spark: SparkSession,
    name: str,
    incremental_column: str | None = None,
    incremental_from=None,
    drop_rescued: bool = True,
) -> DataFrame:
    """Catalog table read with optional incremental slice
    (readers/batch_readers.py:57-79: ``read_hms_table``/``read_uc_table``).

    ``incremental_column >= incremental_from`` is the reference's
    bronze→silver cursor (batch_readers.py:76-77); expressed as a plain
    filter it partition-prunes when the table is partitioned on the
    cursor column.
    """
    df = spark.read.table(name)
    if incremental_column is not None and incremental_from is not None:
        df = df.where(F.col(incremental_column) >= F.lit(incremental_from))
    if drop_rescued and "_rescued_data" in df.columns:
        df = df.drop("_rescued_data")
    return df


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC scan (reference/material_external_dim.py:41-44,
    reference/di_landing_to_raw_generic_v2.py:80-89). ``table`` may be a
    pushdown subquery ``(SELECT ...) q`` — the database executes it."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    options: dict[str, str] | None = None,
) -> None:
    """JDBC append/overwrite (audit rows to an external DB —
    audit/utils.py:7-29 ``sql_server_write`` and the ~12 inline JDBC
    appends in reference/di_landing_to_raw_generic_v2.py:115-127).
    Control-plane sized writes; for bulk exports prefer parquet + a
    native bulk loader."""
    writer = (
        df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()


def config_scalar_lookup(
    spark: SparkSession,
    table: str,
    col: str,
    key_col: str,
    key,
) -> object:
    """Config-table scalar lookup (utils/config_handler.py:26-53).

    Composite keys: pass ``key_col='a,b'`` and ``key='x,y'``. This is a
    control-plane read (a handful of rows) — the one sanctioned use of
    ``collect`` in the engine.
    """
    df = spark.read.table(table) if "/" not in table else spark.read.parquet(table)
    key_cols = [c.strip() for c in key_col.split(",")]
    keys = [k.strip() for k in str(key).split(",")] if len(key_cols) > 1 else [key]
    for c, k in zip(key_cols, keys):
        df = df.where(F.col(c) == F.lit(k))
    rows = df.select(col).limit(1).collect()
    return rows[0][0] if rows else None
