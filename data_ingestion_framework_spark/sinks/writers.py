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

from data_ingestion_framework_spark.operators import scd
from data_ingestion_framework_spark.sources.tablestore import ParquetTable


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
