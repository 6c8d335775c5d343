"""Event-time session windows and watermark-bounded streaming dedup.

Reference parity: the reference's stream pipelines dedup landing batches
inside each merge (dedup-in-merge, writers/writer.py:203-219) and have
no session operator at all; these are the two Structured-Streaming
surfaces a training-data event pipeline needs beyond tumbling windows:

* ``session_window_agg`` — gap-based session aggregation via the
  built-in ``F.session_window`` (state-store backed in streaming,
  plain groupBy in batch — same expression both ways).
* ``dedup_within_watermark`` — ``dropDuplicatesWithinWatermark``:
  cross-micro-batch dedup whose state is bounded by the watermark
  delay, unlike ``dropDuplicates`` on a stream which retains every key
  forever. This is the ONLY safe streaming-dedup default at 100 TB:
  state size is O(keys arriving within the delay), not O(all keys).

Scale notes: both operators shuffle once on their keys and keep state
partitioned by the same hash — session state per key is one (start,
end, aggs) tuple, dedup state one flag per in-horizon key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_ingestion_framework_spark.functions.time import (
    ensure_event_time,
    epoch_micros,
)


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap: str = "30 minutes",
    aggs: list[Column] | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Group events into gap-based sessions and aggregate.

    A session covers ``[first_ts, last_ts + gap)``: an event whose
    timestamp is >= the current session's end starts a new session
    (equivalently: consecutive-event gaps strictly below ``gap``
    merge). Works identically on batch and streaming frames; for
    streams pass ``watermark_delay`` so closed sessions are emitted
    and their state dropped.

    Output: key columns + ``session_start`` / ``session_end`` +
    ``n_events`` + any ``aggs``.
    """
    df = ensure_event_time(df, ts_col)
    if watermark_delay is not None:
        df = df.withWatermark(ts_col, watermark_delay)
    agg_list = [F.count(F.lit(1)).alias("n_events")] + list(aggs or [])
    grouped = df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("session_window"), *key_cols
    ).agg(*agg_list)
    return grouped.select(
        *key_cols,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *[c for c in grouped.columns if c not in {"session_window", *key_cols}],
    )


def dedup_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    delay: str = "1 hour",
) -> DataFrame:
    """First-seen-wins dedup across micro-batches with watermark-bounded
    state (``dropDuplicatesWithinWatermark``).

    Two records with equal ``key_cols`` arriving within ``delay`` of
    each other collapse to the first; a re-arrival after the watermark
    has passed the first's event time is treated as new (its state was
    dropped). That trade — bounded state for a bounded dedup horizon —
    is what makes streaming dedup viable on unbounded key domains.
    """
    stream = ensure_event_time(stream, ts_col)
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    keys: list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a stream against a static dimension frame — the
    stream-static join Structured Streaming supports natively (the
    static side is re-evaluated per micro-batch, so a dim table read
    via ``spark.read`` picks up new files between batches).

    The dim is broadcast by default: stream-static joins cannot
    shuffle the streaming side into a stateful join, and a broadcast
    keeps the stream's partitioning intact — the right shape for a
    dimension of ordinary size. Pass ``broadcast_dim=False`` for a
    genuinely huge static side and let the planner decide.

    Stateless (no watermark required); inner and left-outer are the
    supported modes for a streaming left side.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"stream-static joins support 'inner' or 'left' for a streaming "
            f"left side, got {how!r}"
        )
    right = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(right, keys, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    left_delay: str = "1 hour",
    right_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: pairs on ``keys`` where
    ``left_ts <= right_ts < left_ts + window``.

    Both sides carry watermarks and the join condition bounds event
    time in BOTH directions — that pair is what lets Spark expire
    buffered rows: a left row older than
    ``watermark(right) - window`` can never match again and its state
    drops. Without the interval bound the state store grows without
    limit; this wrapper makes the bounded form the only one callable.

    Outer variants emit their null-padded rows only once the watermark
    passes the row's horizon — at ``availableNow`` end-of-stream the
    trailing rows may be withheld until a later trigger (Structured
    Streaming semantics, not a bug here).

    Batch frames join identically (watermarks are a no-op in batch),
    so batch parity tests pin the pairing logic.
    """
    lw = ensure_event_time(left, left_ts).withWatermark(left_ts, left_delay)
    rw = ensure_event_time(right, right_ts).withWatermark(right_ts, right_delay)
    cond = None
    for k in keys:
        c = lw[k] == rw[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (rw[right_ts] >= lw[left_ts])
        & (
            epoch_micros(rw[right_ts])
            < epoch_micros(lw[left_ts]) + window_seconds * 1_000_000
        )
    )
    return lw.join(rw, cond, how)


def stream_mg_heavy_hitters(
    stream: DataFrame,
    state_table,
    checkpoint: str,
    value_col: str,
    shard_key_col: str,
    n_shards: int = 8,
    m: int = 16,
):
    """Streaming heavy hitters: fold one MG summary per micro-batch
    into a persistent state table via ``sketches.mg_merge`` — the
    mergeable-summaries law applied as stream state. The state stays
    ≤ n_shards rows of m-element arrays regardless of stream volume;
    finalize any time with ``sketches.mg_finalize(state_table.read())``.

    Replay safety: foreachBatch is at-least-once, and a summary fold is
    NOT idempotent, so the state row carries the last folded batch id —
    a replayed batch (id ≤ last) is skipped instead of double-counted.
    """
    from data_ingestion_framework_spark.operators.sketches import (
        mg_merge,
        mg_summary,
    )

    def fold(batch: DataFrame, batch_id: int) -> None:
        summary = mg_summary(batch, value_col, shard_key_col, n_shards, m)
        # explicit existence check — a bare try/except around read()
        # would turn a transient IO error into silent state loss
        # (overwriting the accumulated sketch with one batch's summary)
        if state_table.exists():
            prev = state_table.read()
            last = prev.agg(F.max("__last_batch")).first()[0]
            if last is not None:
                if batch_id == last:
                    return  # at-least-once replay of the last batch
                if batch_id < last:
                    # foreachBatch only ever replays the MOST RECENT
                    # batch; a lower id means the checkpoint was reset
                    # against live state — skipping would silently drop
                    # every new batch, so fail loudly instead
                    raise RuntimeError(
                        f"batch id {batch_id} < folded state id {last}: "
                        "checkpoint/state mismatch (fresh checkpoint "
                        "against an existing state table?)"
                    )
            merged = mg_merge(prev, summary, value_col, m)
        else:
            merged = summary
        state_table.overwrite(
            merged.withColumn("__last_batch", F.lit(batch_id).cast("bigint"))
        )

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
