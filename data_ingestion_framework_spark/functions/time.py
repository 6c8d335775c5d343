"""Event-time type tolerance: TIMESTAMP vs TIMESTAMP_NTZ.

Parquet timestamps without a timezone annotation (``isAdjustedToUTC =
false``) are read by Spark (``spark.sql.parquet.inferTimestampNTZ``,
default on) as ``TIMESTAMP_NTZ`` — and several time primitives reject
that type outright: ``F.unix_micros`` throws ``DATATYPE_MISMATCH`` and
``withWatermark`` throws ``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE``. The
reference's config surface explicitly lists ``TIMESTAMP_NTZ`` as a
supported cast target (framework/src/template/sap_cdc_ingestion/config/
data_conversion_test.py:19), so every time-based operator here accepts
both type classes through these helpers.

The NTZ→TIMESTAMP cast interprets the naive wall time in the session
timezone; collecting the result yields the same wall time back, so the
round-trip is value-identical for any fixed-offset session zone (we pin
UTC in session.py). Casting an already-``TIMESTAMP`` column is a no-op
Catalyst removes, so the helpers cost nothing on the common path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def event_time(col: Column | str) -> Column:
    """The column as ``TIMESTAMP`` (no-op if it already is)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def epoch_micros(col: Column | str) -> Column:
    """``unix_micros`` that tolerates ``TIMESTAMP_NTZ`` input."""
    return F.unix_micros(event_time(col))


def ensure_event_time(df: DataFrame, *ts_cols: str) -> DataFrame:
    """Rewrite any ``TIMESTAMP_NTZ`` columns to ``TIMESTAMP`` in place.

    Required before ``withWatermark`` (which demands the LTZ type) and
    used to normalize driver tables at load. Columns already typed
    ``TIMESTAMP`` pass through untouched — no projection is added.
    """
    for name in ts_cols:
        if isinstance(df.schema[name].dataType, TimestampNTZType):
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df
