"""Time-series gap filling — TimescaleDB ``time_bucket_gapfill`` +
``locf()`` / ``interpolate()`` parity, and the dense-calendar spine the
reference's rollup consumers expect between observations.

The textbook Spark plan generates a dense per-key calendar, LEFT JOINs
the observations onto it, then runs ``last(value, ignorenulls=True)``
over an ordered window — a generated frame of keys × buckets rows that
must be SHUFFLED TWICE (once for the join, once for the fill window).
At 100 TB of events that join hashes billions of mostly-empty spine
rows.

This plan never materializes empty spine rows before the fill is
already known:

1. one partial-agg shuffle to ``(keys, bucket)`` picking each bucket's
   LAST observation (``max_by`` over the full ``(ts, tiebreak)`` struct
   — deterministic under timestamp ties);
2. one window over ``keys`` for the next-observed-bucket horizon
   (``lead``);
3. a map-side generator (``explode(sequence(bucket, next-1, step))``)
   that EMITS the gap rows **already carrying their fill value** —
   LOCF is the carried value itself; linear interpolation derives from
   the segment endpoints the row already holds.

Gap rows are born filled, so there is no second shuffle and no join.
Output volume is the same dense frame either way; the saving is the
join hash + extra exchange, and partial aggregation upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def m4_downsample(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    n_buckets: int = 100,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014): per key, split the
    series' time span into ``n_buckets`` equal-width buckets and keep
    each bucket's four extreme points — first, last, value-min,
    value-max — the error-free set for min/max line visualization and
    the standard dashboard downsample. Unlike LTTB, bucket picks are
    independent, so the whole reduction is one partial-aggregable pass
    (LTTB's chosen point feeds the NEXT bucket's triangle — a
    sequential chain that cannot fan out).

    Plan: per-key span via an unordered window (one shuffle on key),
    integer bucket assignment on epoch micros (exact, no float
    boundaries), then four ``row_number`` roles sharing one
    ``(key, bucket)`` exchange; a row survives if it wins ANY role, so
    multi-role points emit once with no explode/dedup. Output:
    ``(*keys, bucket, ts, value)``, ≤ 4·n_buckets rows per key.
    """
    from data_ingestion_framework_spark.functions.time import epoch_micros

    eu = epoch_micros(F.col(ts_col))
    wk = Window.partitionBy(*key_cols)
    spanned = df.select(
        *key_cols,
        F.col(ts_col),
        F.col(value_col),
        *[F.col(c) for c in tiebreak_cols],
        eu.alias("__eu"),
    ).select(
        "*",
        F.min("__eu").over(wk).alias("__mn"),
        F.max("__eu").over(wk).alias("__mx"),
    )
    # integer div, never float: a quotient a hair under a bucket
    # boundary must not round up (DuckDB's // is exact; match it)
    b = spanned.withColumn(
        "__b",
        F.expr(f"((__eu - __mn) * {n_buckets}) div (__mx - __mn + 1)"),
    )
    wb = Window.partitionBy(*key_cols, "__b")
    tie = [F.col(c) for c in tiebreak_cols]
    tie_d = [F.col(c).desc() for c in tiebreak_cols]
    roles = {
        "__r_first": wb.orderBy(F.col("__eu"), *tie),
        "__r_last": wb.orderBy(F.col("__eu").desc(), *tie_d),
        "__r_vmin": wb.orderBy(F.col(value_col), F.col("__eu"), *tie),
        "__r_vmax": wb.orderBy(
            F.col(value_col).desc(), F.col("__eu").desc(), *tie_d
        ),
    }
    for name, w in roles.items():
        b = b.withColumn(name, F.row_number().over(w))
    keep = (
        (F.col("__r_first") == 1)
        | (F.col("__r_last") == 1)
        | (F.col("__r_vmin") == 1)
        | (F.col("__r_vmax") == 1)
    )
    return b.where(keep).select(
        *key_cols,
        F.col("__b").alias("bucket"),
        F.col(ts_col),
        F.col(value_col),
    )


_UNIT_INTERVAL = {
    "hour": "INTERVAL 1 HOUR",
    "day": "INTERVAL 1 DAY",
    "minute": "INTERVAL 1 MINUTE",
    "week": "INTERVAL 7 DAY",
}


def gapfill(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    unit: str = "hour",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Dense per-key time series with LOCF and linear interpolation.

    Returns one row per ``(key, bucket)`` for every ``unit`` bucket
    between each key's first and last observation, with:

    - ``bucket`` — the ``date_trunc(unit)`` timestamp;
    - ``value_locf`` — last observed value carried forward;
    - ``value_interp`` — linear interpolation between the surrounding
      observed buckets (equals ``value_locf`` on observed rows and
      after the final observation, where there is no right endpoint);
    - ``observed`` — whether the bucket had a real observation.

    Reference semantics: TimescaleDB ``time_bucket_gapfill(unit, ts)``
    with ``locf(last(value))`` / ``interpolate(last(value))``; the
    bucket representative is the latest row in the bucket by
    ``(ts, *tiebreak_cols)`` (pass a unique tiebreaker for
    deterministic results under timestamp ties).
    """
    if unit not in _UNIT_INTERVAL:
        raise ValueError(f"gapfill: unsupported unit {unit!r}")
    step = F.expr(_UNIT_INTERVAL[unit])
    ord_cols = ", ".join([ts_col, *tiebreak_cols])
    buckets = (
        df.withColumn("__b", F.date_trunc(unit, F.col(ts_col)))
        .groupBy(*key_cols, "__b")
        .agg(F.expr(f"max_by({value_col}, struct({ord_cols}))").alias("__v"))
    )
    w = Window.partitionBy(*key_cols).orderBy("__b")
    seg = buckets.withColumn("__nb", F.lead("__b").over(w)).withColumn(
        "__nv", F.lead("__v").over(w)
    )
    # the generator emits every bucket of the segment [__b, __nb),
    # plus the final observed bucket of the key (no right neighbor)
    filled = seg.select(
        *key_cols,
        "__b",
        "__nb",
        "__v",
        "__nv",
        F.explode(
            F.sequence(
                F.col("__b"),
                F.coalesce(F.col("__nb") - step, F.col("__b")),
                step,
            )
        ).alias("bucket"),
    )  # date_trunc guarantees whole-unit buckets, so sequence's last
    # element is exactly __nb - step: segments tile without overlap
    i = F.expr(f"timestampdiff({unit.upper()}, __b, bucket)").cast("double")
    n = F.expr(f"timestampdiff({unit.upper()}, __b, __nb)").cast("double")
    interp = F.when(F.col("__nb").isNull(), F.col("__v")).otherwise(
        F.col("__v") + (F.col("__nv") - F.col("__v")) * i / n
    )
    return filled.select(
        *key_cols,
        "bucket",
        F.col("__v").alias("value_locf"),
        interp.alias("value_interp"),
        (F.col("bucket") == F.col("__b")).alias("observed"),
    )


def znorm_pattern(pattern: list[float]) -> list[float]:
    """Z-normalize a query pattern driver-side (population σ). The
    normalized constants inline into both the Spark plan and the DuckDB
    oracle, so the engines share exact literals."""
    n = len(pattern)
    mu = sum(pattern) / n
    var = sum((x - mu) ** 2 for x in pattern) / n
    sd = var**0.5
    if sd == 0:
        raise ValueError("pattern is constant — correlation undefined")
    return [(x - mu) / sd for x in pattern]


def pattern_topk(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    pattern: list[float],
    k: int = 10,
    tiebreak_cols: tuple[str, ...] = (),
    round_to: int = 4,
) -> DataFrame:
    """Top-k sliding-window matches of a query pattern across per-key
    series by z-normalized cross-correlation (the UCR-suite similarity
    model; z-normalization makes the match shape-based — level and
    scale shifts don't matter). Returns ``(*keys, match_ts, corr)``
    where ``match_ts`` is the window's start timestamp.

    Plan: one shuffle on the keys; each window's statistics reduce to
    three sequential folds over the collected frame (Σx, Σx², Σx·p) —
    with the pattern pre-z-normalized, ``corr = Σx·p / (n·σ)`` in
    closed form, so there is no per-window explode, no join, and no
    second pass. The global top-k is TakeOrderedAndProject. At 100 TB
    the state per row is one length-|pattern| array; |pattern| is a
    constant (8–256), so memory is bounded and the fold is codegen'd
    array arithmetic.
    """
    p = znorm_pattern(pattern)
    n = len(p)
    plit = F.array(*[F.lit(float(x)) for x in p])
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, *tiebreak_cols)
        .rowsBetween(Window.currentRow, n - 1)
    )
    seqd = df.select(
        *key_cols,
        F.col(ts_col).alias("match_ts"),
        F.collect_list(F.col(value_col).cast("double")).over(w).alias("__s"),
    ).where(F.size("__s") == n)
    acc = F.lit(0.0)
    sx = F.aggregate("__s", acc, lambda a, x: a + x)
    sxx = F.aggregate("__s", acc, lambda a, x: a + x * x)
    sxp = F.aggregate(
        F.zip_with("__s", plit, lambda x, q: x * q), acc, lambda a, v: a + v
    )
    stats = seqd.select(
        *key_cols,
        "match_ts",
        sx.alias("__sx"),
        sxx.alias("__sxx"),
        sxp.alias("__sxp"),
    )
    mu = F.col("__sx") / n
    sd = F.sqrt(F.col("__sxx") / n - mu * mu)
    corr = F.round(F.col("__sxp") / (n * sd), round_to)
    return (
        stats.where(sd > 0)
        .select(*key_cols, "match_ts", corr.alias("corr"))
        .orderBy(F.desc("corr"), *key_cols, "match_ts")
        .limit(k)
    )
