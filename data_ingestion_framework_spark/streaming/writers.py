"""Streaming writers: availableNow append + foreachBatch SCD merge.

Reference parity:
- ``streaming_write_table_append`` (writers/streaming_writers.py:3-39):
  append stream with mergeSchema + availableNow + awaitTermination.
- ``streaming_merge_writer`` / ``_upsert_to_delta_streaming_*``
  (writers/writer.py:695-758,427-660): ``foreachBatch`` micro-batch
  upsert — the core streaming-merge pattern. Our batch callback reuses
  the exact batch SCD operators (operators/scd.py), so streaming and
  batch merges are identical semantics by construction (SURVEY §7.2
  step 8).

Exactly-once: the file-source checkpoint makes each input file appear
in exactly one micro-batch; the SCD apply is idempotent under replay
(same batch twice → same state), which covers the
failure-after-commit-before-checkpoint window.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from data_ingestion_framework_spark.operators import scd
from data_ingestion_framework_spark.sources.tablestore import ParquetTable


def stream_append(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    query_name: str | None = None,
    await_termination: bool = True,
):
    """Append the stream to a path-backed table with an availableNow
    trigger (writers/streaming_writers.py:3-39). Drops the ``_metadata``
    struct implicitly (it is not part of the projected columns)."""
    writer = (
        df.writeStream.format(fmt)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
    )
    if query_name:
        writer = writer.queryName(query_name)
    q = writer.start(path)
    if await_termination:
        q.awaitTermination()
    return q


def foreach_batch_scd_merge(
    df: DataFrame,
    table: ParquetTable,
    key_cols: list[str],
    order_col: str,
    checkpoint: str,
    scd_type: int = 1,
    full_extract: bool = False,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    query_name: str | None = None,
    await_termination: bool = True,
):
    """Micro-batch SCD merge via ``foreachBatch``
    (writers/writer.py:695-758): each micro-batch runs the *batch* SCD
    operator against the current table state and commits the new state.

    ``transform`` runs inside the callback (per-micro-batch projection,
    e.g. the silver transformation queue).
    """

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch_df = transform(batch_df)
        batch_df = batch_df.drop("_metadata")
        target = table.read() if table.exists() else None
        apply = scd.scd1_apply if scd_type == 1 else scd.scd2_apply
        new_state = apply(
            target, batch_df, key_cols, order_col, full_extract=full_extract
        )
        # Materialized commit: staging write + directory swap (the
        # Delta MERGE stand-in; see sources/tablestore.py docstring).
        table.overwrite(new_state)

    writer = (
        df.writeStream.foreachBatch(_upsert)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
    )
    if query_name:
        writer = writer.queryName(query_name)
    q = writer.start()
    if await_termination:
        q.awaitTermination()
    return q
