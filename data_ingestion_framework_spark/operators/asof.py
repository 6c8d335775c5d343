"""As-of (nearest-preceding) joins and bounded range joins.

Neither exists as a Spark join type, and the naive formulations are
scale-killers: an as-of expressed as `l.ts >= r.ts` + latest-wins is an
inequality join (BroadcastNestedLoopJoin — O(|L|·|R|) per key), and a
raw interval join is the same. The reference engine has no counterpart
either (its joins are all equi/anti, writers/writer.py merges); these
are the time-series surfaces a training-data event pipeline needs.

Scale designs:

* ``asof_join`` — union-marker + window: tag right rows 0 / left rows
  1, union, and take ``last(right_value, ignorenulls=True)`` over
  (keys) ordered by (ts, marker, tiebreak). ONE shuffle on the keys,
  no join node at all; each output row costs O(1) window state. The
  marker sorts a right row at the same timestamp *before* the left
  row, making the match inclusive (ts_r <= ts_l).
* ``range_join_binned`` — bucket both sides by a bin the width of the
  interval: a right row lands in exactly one bin, a left interval
  spans at most two, so the equi-join on (keys, bin) bounds fan-out to
  2 candidate bins per left row, then the exact range predicate
  filters. Co-locates by (keys, bin) — skew is bounded by bin
  population, never |L|·|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from data_ingestion_framework_spark.functions.time import epoch_micros, event_time


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the matching right row on the same
    keys — pandas ``merge_asof`` direction parity:

    - ``backward`` (default): greatest ``right_ts <= left_ts``;
    - ``forward``: smallest ``right_ts >= left_ts``;
    - ``nearest``: whichever of the two is closer in time (ties —
      equidistant candidates on both sides — go BACKWARD; both
      boundary candidates ride ONE shuffle: two window passes over the
      same partitioning).

    Right ``value_cols`` come back prefixed ``asof_`` plus an
    ``asof_ts`` column; unmatched left rows keep them NULL.
    ``tiebreak`` orders right rows sharing a timestamp (last wins);
    ``tolerance_seconds`` nulls out matches farther than the tolerance
    (in the direction's sense; absolute distance for ``nearest``).

    Both timestamp columns may be ``TIMESTAMP`` or ``TIMESTAMP_NTZ``
    (even mixed across the two sides): the internal ``_ts`` ordering
    column and the returned ``asof_ts`` are normalized to ``TIMESTAMP``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward, forward or nearest")
    carried = [f"asof_{c}" for c in value_cols]
    lhs = left.select(
        *keys,
        event_time(left_ts).alias("_ts"),
        F.lit(1).alias("_m"),
        F.lit(None).cast("long").alias("_tb"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(a) for c, a in zip(value_cols, carried)],
        F.lit(None).cast("timestamp").alias("_asof_ts"),
        F.struct(*left.columns).alias("_row"),
    )
    rhs = right.select(
        *keys,
        event_time(right_ts).alias("_ts"),
        F.lit(0).alias("_m"),
        # Without an explicit tiebreak, order right rows sharing
        # (keys, ts) by a hash of the carried values — deterministic
        # across re-runs, where a constant would let F.last pick an
        # arbitrary (partition-order-dependent) row.
        (
            F.col(tiebreak).cast("long")
            if tiebreak
            else F.xxhash64(*[F.col(c) for c in value_cols])
        ).alias("_tb"),
        *[F.col(c).alias(a) for c, a in zip(value_cols, carried)],
        event_time(right_ts).alias("_asof_ts"),
        F.lit(None).cast(lhs.schema["_row"].dataType).alias("_row"),
    )
    frame = (W.unboundedPreceding, W.currentRow)
    w_back = (
        W.partitionBy(*keys).orderBy("_ts", "_m", "_tb").rowsBetween(*frame)
    )
    w_fwd = (
        W.partitionBy(*keys)
        .orderBy(F.desc("_ts"), "_m", "_tb")
        .rowsBetween(*frame)
    )
    union = lhs.unionByName(rhs)
    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        filled = union.select(
            "_m",
            "_row",
            F.last("_asof_ts", ignorenulls=True).over(w).alias("asof_ts"),
            *[F.last(a, ignorenulls=True).over(w).alias(a) for a in carried],
        )
    else:
        # nearest: both boundary candidates from the SAME partitioning
        # (two sorts, one shuffle), then pick per row by time distance
        # — equidistant ties go backward
        both = union.select(
            "_m",
            "_row",
            F.last("_asof_ts", ignorenulls=True).over(w_back).alias("_b_ts"),
            *[F.last(a, ignorenulls=True).over(w_back).alias(f"_b_{a}") for a in carried],
            F.last("_asof_ts", ignorenulls=True).over(w_fwd).alias("_f_ts"),
            *[F.last(a, ignorenulls=True).over(w_fwd).alias(f"_f_{a}") for a in carried],
        )
        lts = epoch_micros(F.col("_row")[left_ts])
        use_back = F.col("_f_ts").isNull() | (
            F.col("_b_ts").isNotNull()
            & ((lts - epoch_micros(F.col("_b_ts"))) <= (epoch_micros(F.col("_f_ts")) - lts))
        )
        filled = both.select(
            "_m",
            "_row",
            F.when(use_back, F.col("_b_ts")).otherwise(F.col("_f_ts")).alias("asof_ts"),
            *[
                F.when(use_back, F.col(f"_b_{a}")).otherwise(F.col(f"_f_{a}")).alias(a)
                for a in carried
            ],
        )
    out = filled.where(F.col("_m") == 1)
    if tolerance_seconds is not None:
        lts = epoch_micros(F.col("_row")[left_ts])
        rts = epoch_micros(F.col("asof_ts"))
        if direction == "backward":
            dist = lts - rts
        elif direction == "forward":
            dist = rts - lts
        else:
            dist = F.abs(rts - lts)
        stale = dist > tolerance_seconds * 1_000_000
        out = out.select(
            "_m",
            "_row",
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c) for c in ["asof_ts", *carried]],
        )
    return out.select(*[F.col("_row")[c].alias(c) for c in left.columns], "asof_ts", *carried)


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Inner-join pairs where ``left_ts <= right_ts < left_ts + window``
    on the same keys, without a nested-loop join.

    Bin width == window width, so each left interval spans at most two
    bins (its own and the next) and each right row sits in exactly one
    — the (keys, bin) equi-join enumerates every candidate exactly
    once. Columns from both sides survive with ``l_`` / ``r_``
    prefixes on collisions.
    """
    w_us = window_seconds * 1_000_000
    lbin = (epoch_micros(left_ts) / w_us).cast("long")
    rbin = (epoch_micros(right_ts) / w_us).cast("long")

    overlap = set(left.columns) & set(right.columns)
    jk = [f"_k_{k}" for k in keys]
    lsel = left.select(
        *[F.col(c).alias(f"l_{c}" if c in overlap else c) for c in left.columns],
        F.explode(F.array_distinct(F.array(lbin, lbin + 1))).alias("_bin"),
        *[F.col(k).alias(a) for k, a in zip(keys, jk)],
    )
    rsel = right.select(
        *[F.col(c).alias(f"r_{c}" if c in overlap else c) for c in right.columns],
        rbin.alias("_bin"),
        *[F.col(k).alias(a) for k, a in zip(keys, jk)],
    )
    lts = f"l_{left_ts}" if left_ts in overlap else left_ts
    rts = f"r_{right_ts}" if right_ts in overlap else right_ts
    joined = lsel.join(rsel, ["_bin", *jk], "inner").where(
        (event_time(rts) >= event_time(lts))
        & (epoch_micros(rts) < epoch_micros(lts) + w_us)
    )
    return joined.drop("_bin", *jk)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int,
    max_buckets: int = 1024,
) -> DataFrame:
    """Inner-join INTERVAL pairs that overlap (half-open:
    ``l_start < r_end AND r_start < l_end``) on the same keys — the
    both-sides-are-intervals shape ``range_join_binned``
    (point-in-window) can't express, and the one engines nested-loop
    without help.

    Each interval explodes to the fixed-width buckets it covers and
    candidates meet on a ``(keys, bucket)`` equi-join. A true pair can
    meet in MANY shared buckets; instead of a distinct (a second
    shuffle over the pair set), each pair is emitted exactly once by
    keeping only the bucket containing the overlap's START
    (``greatest(l_start, r_start)``) — a pure filter on the joined
    row. Integer epoch division throughout (a float quotient can cross
    a bucket boundary). Intervals spanning more than ``max_buckets``
    buckets raise (the generator would amplify them quadratically —
    pick a wider bucket, loudly).
    """
    w_us = bucket_seconds * 1_000_000
    overlap_cols = set(left.columns) & set(right.columns)
    jk = [f"_k_{k}" for k in keys]

    def prep(df, start, end, side):
        pre = df.select(
            *[
                F.col(c).alias(f"{side}_{c}" if c in overlap_cols else c)
                for c in df.columns
            ],
            epoch_micros(start).alias(f"__{side}s"),
            epoch_micros(end).alias(f"__{side}e"),
            *[F.col(k).alias(a) for k, a in zip(keys, jk)],
        )
        b0 = F.expr(f"__{side}s div {w_us}")
        b1 = F.expr(f"__{side}e div {w_us}")
        guard = F.when(
            b1 - b0 > max_buckets,
            F.raise_error(
                F.lit(
                    f"interval_overlap_join: an interval spans more than "
                    f"{max_buckets} buckets — widen bucket_seconds"
                )
            ),
        ).otherwise(b0)
        return pre.select(
            "*", F.explode(F.sequence(guard, b1)).alias("_bin")
        )

    lsel = prep(left, l_start, l_end, "l")
    rsel = prep(right, r_start, r_end, "r")
    joined = lsel.join(rsel, ["_bin", *jk], "inner").where(
        (F.col("__ls") < F.col("__re"))
        & (F.col("__rs") < F.col("__le"))
        & (
            F.col("_bin")
            == F.expr(f"greatest(__ls, __rs) div {w_us}")
        )
    )
    return joined.drop("_bin", "__ls", "__le", "__rs", "__re", *jk)
