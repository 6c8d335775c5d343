"""Batch write dispatch: append / overwrite / merge to path-backed
tables.

Reference parity: ``_batch_write``/``overwrite_write``/``append_write``
(writers/batch_writers.py:8-56), ``merge_write`` dispatch
(writers/batch_writers.py:59-162) and the ``Writer.write`` mode routing
(writers/writer.py:866-933). The SCD computation itself lives in
operators/scd.py; this module is the thin commit layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators import scd
from data_ingestion_framework_spark.sources.tablestore import ParquetTable


def ordered_base_paths(df: DataFrame, depth: int = -1) -> list[str]:
    """Distinct source directories ordered by their newest file's
    modification time — the per-source-directory replay order
    (writers/writer.py:158-174 ``get_base_file_path_list_from_table``).
    Computed entirely in Spark (the reference round-trips via pandas);
    the result is a directory list, so collecting it is control-plane
    sized. ``depth=-1`` (default) strips the filename; a positive depth
    keeps the first N path segments (the reference's substring_index
    form, writers/writer.py:161)."""
    if depth == -1:
        base = F.regexp_replace(F.col("file_path"), r"/[^/]+$", "")
    else:
        base = F.substring_index(F.col("file_path"), "/", depth)
    ordered = (
        df.select(base.alias("base_path"), F.col("file_modification_time"))
        .groupBy("base_path")
        .agg(F.max("file_modification_time").alias("max_mtime"))
        .orderBy("max_mtime", "base_path")
    )
    return [r["base_path"] for r in ordered.collect()]


def replay_merge_by_source_dir(
    df: DataFrame,
    table: ParquetTable,
    key_cols: list[str],
    order_col: str = "file_modification_time",
    scd_type: int = 2,
    full_extract: bool = False,
    depth: int = -1,
) -> None:
    """Ordered per-source-directory merge replay
    (writers/writer.py:177-281 ``_upsert_to_delta_batch_fe``): process
    each base directory's rows as one merge batch, in mtime order.
    Correctness shape for out-of-order landings; within a batch the
    merge is fully parallel. Prefer a single merge (batch_write) when
    directory order provably doesn't matter (SURVEY §7.4 #4)."""
    for path in ordered_base_paths(df, depth):
        batch = df.where(F.col("file_path").startswith(path))
        batch_write(
            batch,
            table,
            mode="merge",
            key_cols=key_cols,
            order_col=order_col,
            scd_type=scd_type,
            full_extract=full_extract,
        )


def ie_dual_target_merge(
    current_table: ParquetTable,
    history_table: ParquetTable,
    source: DataFrame,
    key_cols: list[str],
    order_col: str = "file_modification_time",
    delete_feed: DataFrame | None = None,
    deleted_at=None,
) -> None:
    """Incremental-extract upsert into two targets
    (writers/writer.py:284-420 ``_upsert_to_delta_batch_ie``):

    - ``current``  (SCD1): latest row per key, hard-deleted from the
      delete feed (``MERGE ... WHEN NOT MATCHED BY SOURCE THEN DELETE``);
    - ``history``  (SCD2): full version history, soft-deleted
      (close-out + ``delete_time``) for keys in the delete feed.

    The delete feed is the reference's ``delete_source_filepath``
    (FIXTURES.md F2). Both merges share the same key partitioning; the
    feed joins as a broadcast when small.
    """
    cur = current_table.read() if current_table.exists() else None
    new_cur = scd.scd1_apply(cur, source, key_cols, order_col)
    hist = history_table.read() if history_table.exists() else None
    new_hist = scd.scd2_apply(hist, source, key_cols, order_col)

    if delete_feed is not None:
        del_keys = delete_feed.select(*key_cols).distinct()
        new_cur = new_cur.join(del_keys, on=key_cols, how="left_anti")
        ts = (
            F.lit(deleted_at).cast("timestamp")
            if deleted_at is not None
            else F.current_timestamp()
        )
        live_deleted = (
            (F.col("is_current") == 1) & F.col("delete_time").isNull()
        )
        new_hist = (
            new_hist.join(del_keys.withColumn("__del", F.lit(1)), on=key_cols, how="left")
            .withColumns(
                {
                    "delete_time": F.when(
                        (F.col("__del") == 1) & live_deleted, ts
                    ).otherwise(F.col("delete_time")),
                    "end_time": F.when(
                        (F.col("__del") == 1) & live_deleted, ts
                    ).otherwise(F.col("end_time")),
                    "is_current": F.when(
                        (F.col("__del") == 1) & live_deleted, F.lit(0)
                    ).otherwise(F.col("is_current")),
                }
            )
            .drop("__del")
        )

    current_table.overwrite(new_cur)
    history_table.overwrite(new_hist)


def batch_write(
    df: DataFrame,
    table: ParquetTable,
    mode: str = "append",
    key_cols: list[str] | None = None,
    order_col: str = "file_modification_time",
    scd_type: int = 1,
    full_extract: bool = False,
    except_columns: list[str] | None = None,
) -> None:
    """Route a batch write (writers/writer.py:866-933 dispatch):

    - ``append``     → plain append
    - ``overwrite``  → snapshot replace (window-deduped when keys given,
      the intended ``_overwrite_delta`` semantics, writers/writer.py:34-60)
    - ``merge``      → SCD1/SCD2 upsert via operators/scd.py
    """
    if except_columns:
        df = df.drop(*except_columns)  # SELECT * EXCEPT(...) OSS form
    if mode == "append":
        table.append(df)
        return
    if mode == "overwrite":
        if key_cols:
            df = scd.dedupe_latest(df, key_cols, order_col)
        table.overwrite(df)
        return
    if mode == "merge":
        if not key_cols:
            raise ValueError("merge requires key_cols")
        target = table.read() if table.exists() else None
        apply = scd.scd1_apply if scd_type == 1 else scd.scd2_apply
        new_state = apply(
            target, df, key_cols, order_col, full_extract=full_extract
        )
        table.overwrite(new_state)
        return
    raise ValueError(f"unknown write mode: {mode}")
