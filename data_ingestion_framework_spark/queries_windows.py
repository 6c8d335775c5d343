"""Window-composition and advanced-aggregation queries: sessionization,
cube, scalar-subquery-style filtering.

Sessionization is the canonical event-stream window composition (lag →
gap flag → cumulative session id) — the batch shape of what
``applyInPandasWithState`` would do in a live stream; at 100 TB it is
one shuffle on user_id shared by all three window steps.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from data_ingestion_framework_spark.functions.time import epoch_micros
from data_ingestion_framework_spark.registry import bench_query, load

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, in microseconds


def sessionize(df, gap_us: int = _GAP_US, user_col: str = "user_id",
               ts_col: str = "ts", tiebreak_col: str = "event_id"):
    """lag → gap flag → cumulative session id: appends ``session_id``
    per (user, gap-delimited run). The single implementation behind
    ``events_sessionize`` AND the type-parity tests — tests must drive
    this exact code path, not a copy (the round-3 'pytest green,
    driver red' failure mode came from test-local reimplementations).
    All three window steps share one shuffle on ``user_col``; the
    timestamp may be TIMESTAMP or TIMESTAMP_NTZ (epoch_micros)."""
    w = W.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(ts_col).over(w)
    new_sess = F.when(
        prev.isNull() | (epoch_micros(ts_col) - epoch_micros(prev) > gap_us),
        1,
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )


@bench_query(
    "events_sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessioned AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM sessioned GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    sessioned = sessionize(ev)
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@bench_query(
    "orders_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def orders_cube(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# Scalar-subquery-style filter: orders above their customer's average.
# Comparison is cross-multiplied in DECIMAL (price·n > sum) so no
# engine-specific decimal-division scale is involved.
# ---------------------------------------------------------------------------
@bench_query(
    "orders_above_customer_avg",
    oracle="""
    WITH stats AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS s,
             COUNT(*) AS n
      FROM orders GROUP BY o_custkey
    )
    SELECT o.o_orderkey, o.o_custkey
    FROM orders o JOIN stats t ON o.o_custkey = t.o_custkey
    WHERE CAST(o.o_totalprice AS DECIMAL(18,4)) * t.n > t.s
    """,
)
def orders_above_customer_avg(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    stats = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        orders.join(stats, "o_custkey")
        .where(F.col("o_totalprice").cast("decimal(18,4)") * F.col("n") > F.col("s"))
        .select("o_orderkey", "o_custkey")
    )


# ---------------------------------------------------------------------------
# Map explode from JSON (SURVEY §2.9 map family: the reference explodes
# Delta operationMetrics maps; here the events props JSON → map →
# explode into key/value rows).
# ---------------------------------------------------------------------------
@bench_query(
    "events_map_explode",
    oracle="""
    SELECT event_id,
           UNNEST(json_keys(props)) AS key,
           CAST(props->>('$.' || UNNEST(json_keys(props))) AS BIGINT) AS value
    FROM events
    """,
)
def events_map_explode(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.explode(F.from_json("props", "map<string,bigint>")).alias("key", "value"),
    )


# ---------------------------------------------------------------------------
# Min-per-group join-back (the TPC-H Q2 shape without partsupp):
# parts priced at their brand's minimum.
# ---------------------------------------------------------------------------
@bench_query(
    "cheapest_part_per_brand",
    oracle="""
    SELECT p.p_brand, p.p_partkey, p.p_retailprice
    FROM part p
    JOIN (SELECT p_brand, MIN(p_retailprice) AS min_price
          FROM part GROUP BY p_brand) m
      ON p.p_brand = m.p_brand AND p.p_retailprice = m.min_price
    """,
)
def cheapest_part_per_brand(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    mins = (
        part.groupBy("p_brand")
        .agg(F.min("p_retailprice").alias("min_price"))
        .withColumnRenamed("p_brand", "mb")
    )
    return (
        part.join(
            F.broadcast(mins),
            (part.p_brand == mins.mb) & (part.p_retailprice == mins.min_price),
        )
        .select("p_brand", "p_partkey", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# Built-in session windows (F.session_window): the same 30-minute-gap
# sessionization as events_sessionize, but through Spark's native
# session-window operator — the expression that runs state-store-backed
# in Structured Streaming. A session spans [first_ts, last_ts + gap);
# an event at >= the running session end opens a new session, so the
# DuckDB oracle breaks islands at gap >= 30 min and re-derives the end
# as MAX(ts) + 30 min.
# ---------------------------------------------------------------------------
@bench_query(
    "events_session_window",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {_GAP_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessioned AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessioned GROUP BY user_id, sid
    """,
)
def events_session_window(spark, sf_dir):
    from data_ingestion_framework_spark.streaming.windows import session_window_agg

    ev = load(spark, sf_dir, "events")
    return session_window_agg(ev, "ts", ["user_id"], gap="30 minutes")


# ---------------------------------------------------------------------------
# As-of join: each click gets the user's most recent purchase at or
# before it. Spark side is the union-marker + window plan (one shuffle,
# no join node — operators/asof.py); the oracle is DuckDB's native
# ASOF LEFT JOIN, an independent implementation of the same semantics.
# ---------------------------------------------------------------------------
@bench_query(
    "events_asof_purchase",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts,
           r.ts AS asof_ts, r.value AS asof_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN
         (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def events_asof_purchase(spark, sf_dir):
    from data_ingestion_framework_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        clicks,
        purchases,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
    )


# ---------------------------------------------------------------------------
# Bounded range join: clicks within 10 minutes AFTER each purchase,
# counted per purchase. Spark side bins both streams at the window
# width and equi-joins (user_id, bin) — at most 2 candidate bins per
# purchase, never a nested-loop join; the oracle is the plain
# inequality join DuckDB can afford at oracle scale.
# ---------------------------------------------------------------------------
@bench_query(
    "events_range_join_counts",
    oracle="""
    SELECT p.event_id AS purchase_id,
           CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts
     AND c.ts < p.ts + INTERVAL 10 MINUTE
    GROUP BY p.event_id
    """,
)
def events_range_join_counts(spark, sf_dir):
    from data_ingestion_framework_spark.operators.asof import range_join_binned

    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    pairs = range_join_binned(
        purchases, clicks, keys=["user_id"], left_ts="ts", right_ts="ts",
        window_seconds=600,
    )
    counts = pairs.groupBy("l_event_id").agg(
        F.count(F.lit(1)).alias("n_clicks")
    )
    return (
        purchases.join(
            counts, purchases.event_id == counts.l_event_id, "left"
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
        )
    )


# ---------------------------------------------------------------------------
# Hypertable-style continuous aggregate: hourly + daily + per-type
# totals in ONE pass via ROLLUP over (type, day, hour) time buckets —
# the multi-granularity rollup a time-series store materializes. The
# grouping-id columns disambiguate aggregation levels.
# ---------------------------------------------------------------------------
@bench_query(
    "events_time_rollup",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP (event_type, CAST(date_trunc('day', ts) AS TIMESTAMP),
                     CAST(date_trunc('hour', ts) AS TIMESTAMP))
    """,
)
def events_time_rollup(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_trunc("day", "ts"))
        .withColumn("hour", F.date_trunc("hour", "ts"))
        .rollup("event_type", "day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Time-series gap filling (TimescaleDB time_bucket_gapfill + locf +
# interpolate): dense per-user hourly series between each user's first
# and last observation, LOCF and linear-interpolated values side by
# side. The Spark plan is join-free — gap rows are EMITTED by a
# map-side generator already carrying their fill (operators/
# timeseries.py); the oracle re-derives the same frame with a
# generate_series unnest. The bucket representative is the latest row
# by (ts, event_id) — deterministic under timestamp ties.
# ---------------------------------------------------------------------------
@bench_query(
    "events_gapfill_locf",
    oracle="""
    WITH r AS (
      SELECT user_id, date_trunc('hour', ts) AS bb, value,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE user_id % 3 = 0
    ), b AS (
      SELECT user_id, bb, value AS v FROM r WHERE rn = 1
    ), s AS (
      SELECT user_id, bb, v,
             lead(bb) OVER (PARTITION BY user_id ORDER BY bb) AS nb,
             lead(v)  OVER (PARTITION BY user_id ORDER BY bb) AS nv
      FROM b
    )
    SELECT s.user_id, g.bucket,
           v AS value_locf,
           CASE WHEN nb IS NULL THEN v
                ELSE v + (nv - v) * date_diff('hour', bb, g.bucket)
                             / date_diff('hour', bb, nb) END AS value_interp,
           (g.bucket = bb) AS observed
    FROM s, UNNEST(generate_series(bb, coalesce(nb - INTERVAL 1 HOUR, bb),
                                   INTERVAL 1 HOUR)) AS g(bucket)
    """,
)
def events_gapfill_locf(spark, sf_dir):
    from data_ingestion_framework_spark.operators.timeseries import gapfill

    ev = load(spark, sf_dir, "events").where(F.col("user_id") % 3 == 0)
    dense = gapfill(
        ev, "ts", ["user_id"], "value", unit="hour", tiebreak_cols=("event_id",)
    )
    # NO rounding on either side: both engines compute the identical
    # ((nv-v)*i)/n double expression, so raw bits agree — ROUND(x,4)
    # would INTRODUCE mismatches at representation ties (49.50375
    # rounds differently under Spark's BigDecimal HALF_UP vs DuckDB's
    # scaled-multiply path).
    return dense.select("user_id", "bucket", "value_locf", "value_interp", "observed")


# ---------------------------------------------------------------------------
# M4 visual downsampling (Jugel et al., VLDB 2014): per event type,
# 100 equal-width time buckets, each contributing its first / last /
# min-value / max-value points — the error-free reduction for min-max
# line rendering. Bucket assignment is integer-exact on epoch micros;
# the four role picks share one (key, bucket) exchange and a row
# emits once however many roles it wins. The oracle replays the same
# four row_number roles.
# ---------------------------------------------------------------------------
@bench_query(
    "events_m4_downsample",
    oracle="""
    WITH sp AS (
      SELECT event_type, ts, value, event_id,
             epoch_us(ts) AS eu,
             min(epoch_us(ts)) OVER (PARTITION BY event_type) AS mn,
             max(epoch_us(ts)) OVER (PARTITION BY event_type) AS mx
      FROM events
    ), b AS (
      SELECT event_type, ts, value, event_id,
             ((eu - mn) * 100) // (mx - mn + 1) AS bucket, eu
      FROM sp
    ), r AS (
      SELECT event_type, bucket, ts, value,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY eu, event_id) AS rf,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY eu DESC, event_id DESC) AS rl,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY value, eu, event_id) AS rn,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY value DESC, eu DESC, event_id DESC) AS rx
      FROM b
    )
    SELECT event_type, bucket, ts, value
    FROM r WHERE rf = 1 OR rl = 1 OR rn = 1 OR rx = 1
    """,
)
def events_m4_downsample(spark, sf_dir):
    from data_ingestion_framework_spark.operators.timeseries import m4_downsample

    ev = load(spark, sf_dir, "events")
    return m4_downsample(
        ev, "ts", ["event_type"], "value", n_buckets=100,
        tiebreak_cols=("event_id",),
    )


# ---------------------------------------------------------------------------
# Z-normalized pattern matching (UCR-style subsequence similarity
# search; cf. "Time Series Similarity Search for Streaming Data",
# EDBT 2019): top-k sliding windows across per-user series by
# cross-correlation with a dip-shaped query pattern. The pattern
# z-normalizes DRIVER-side and the exact double literals inline into
# both engines; window statistics reduce to three sequential folds
# (Σx, Σx², Σx·p) with corr = Σx·p/(nσ) in closed form — no explode,
# no join. Both engines fold the same 8-element lists sequentially.
# ---------------------------------------------------------------------------
_PATTERN_RAW = [5.0, 4.0, 3.0, 2.0, 1.0, 2.0, 3.0, 4.0]


def _pattern_oracle() -> str:
    from data_ingestion_framework_spark.operators.timeseries import (
        znorm_pattern,
    )

    p = znorm_pattern(_PATTERN_RAW)
    plist = "[" + ", ".join(repr(x) for x in p) + "]"
    return f"""
    WITH s AS (
      SELECT user_id, ts AS match_ts,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS seq
      FROM events
    ), f AS (
      SELECT user_id, match_ts,
             list_sum(seq) AS sx,
             list_dot_product(seq, seq) AS sxx,
             list_dot_product(seq, {plist}) AS sxp
      FROM s WHERE len(seq) = 8
    ), g AS (
      SELECT user_id, match_ts,
             sqrt(sxx / 8.0 - (sx / 8.0) * (sx / 8.0)) AS sd, sxp
      FROM f
    )
    SELECT user_id, match_ts, ROUND(sxp / (8.0 * sd), 4) AS corr
    FROM g WHERE sd > 0
    ORDER BY corr DESC, user_id, match_ts
    LIMIT 20
    """


@bench_query("events_pattern_topk", oracle=_pattern_oracle())
def events_pattern_topk(spark, sf_dir):
    from data_ingestion_framework_spark.operators.timeseries import (
        pattern_topk,
    )

    ev = load(spark, sf_dir, "events")
    return pattern_topk(
        ev, "ts", ["user_id"], "value", _PATTERN_RAW, k=20,
        tiebreak_cols=("event_id",),
    )


# ---------------------------------------------------------------------------
# Seasonal anomaly detection: per (event_type, hour-of-day) baseline
# mean/std over value, then flag rows whose |z| exceeds 2.5 — the
# seasonal-naive residual monitor an events pipeline runs for
# observability. Cross-engine exactness: per-row contributions round
# to 6 dp and sum as DECIMAL (order-independent), so both engines
# derive identical baselines; z rounds to 4 dp BEFORE the threshold,
# so flag membership can't flip on a last-ulp difference. The 120-row
# baseline table broadcasts back onto the events scan.
# ---------------------------------------------------------------------------
@bench_query(
    "events_seasonal_anomalies",
    oracle="""
    WITH base AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hr,
             COUNT(*) AS n,
             SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS sv,
             SUM(CAST(ROUND(value * value, 6) AS DECIMAL(18,6))) AS svv
      FROM events GROUP BY 1, 2
    ), st AS (
      SELECT event_type, hr, n,
             CAST(sv AS DOUBLE) / n AS mu,
             sqrt(CAST(svv AS DOUBLE) / n
                  - (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n)) AS sd
      FROM base
    )
    SELECT e.event_id, e.event_type,
           CAST(EXTRACT(hour FROM e.ts) AS BIGINT) AS hr,
           e.value,
           ROUND((e.value - st.mu) / st.sd, 4) AS z
    FROM events e
    JOIN st ON st.event_type = e.event_type
           AND st.hr = EXTRACT(hour FROM e.ts)
    WHERE st.sd > 0 AND abs(ROUND((e.value - st.mu) / st.sd, 4)) > 2.5
    """,
)
def events_seasonal_anomalies(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    hr = F.hour("ts").cast("bigint")
    vd = F.round("value", 6).cast("decimal(18,6)")
    vv = F.round(F.col("value") * F.col("value"), 6).cast("decimal(18,6)")
    base = ev.groupBy("event_type", hr.alias("hr")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vd).alias("sv"),
        F.sum(vv).alias("svv"),
    )
    mu = F.col("sv").cast("double") / F.col("n")
    st = base.select(
        "event_type",
        "hr",
        mu.alias("mu"),
        F.sqrt(F.col("svv").cast("double") / F.col("n") - mu * mu).alias("sd"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4)
    return (
        ev.select("event_id", "event_type", hr.alias("hr"), "value")
        .join(F.broadcast(st), ["event_type", "hr"])
        .where((F.col("sd") > 0) & (F.abs(z) > 2.5))
        .select("event_id", "event_type", "hr", "value", z.alias("z"))
    )


# ---------------------------------------------------------------------------
# Interval-overlap join (both sides are INTERVALS — the temporal shape
# range joins and as-of joins can't express): per-user activity
# sessions overlapping a ±10-minute window around the same user's
# purchases. Each interval explodes to its covered 20-minute buckets;
# pairs meet on (user, bucket) and emit exactly once in the bucket
# holding the overlap's start — a filter, not a distinct. The oracle
# runs the same session construction and a direct theta join.
# ---------------------------------------------------------------------------
@bench_query(
    "events_session_purchase_overlap",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessioned AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    ),
    sess AS (
      SELECT user_id, session_id, MIN(ts) AS ss,
             MAX(ts) + INTERVAL 60 SECOND AS se
      FROM sessioned GROUP BY 1, 2
    ),
    pur AS (
      SELECT user_id, event_id,
             ts - INTERVAL 600 SECOND AS ps,
             ts + INTERVAL 600 SECOND AS pe
      FROM events WHERE event_type = 'purchase'
    )
    SELECT s.user_id, s.session_id, p.event_id
    FROM sess s JOIN pur p
      ON p.user_id = s.user_id AND s.ss < p.pe AND p.ps < s.se
    """,
)
def events_session_purchase_overlap(spark, sf_dir):
    from data_ingestion_framework_spark.operators.asof import (
        interval_overlap_join,
    )

    ev = load(spark, sf_dir, "events")
    sess = (
        sessionize(ev)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("ss"),
            (F.max("ts") + F.expr("INTERVAL 60 SECOND")).alias("se"),
        )
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        (F.col("ts") - F.expr("INTERVAL 600 SECOND")).alias("ps"),
        (F.col("ts") + F.expr("INTERVAL 600 SECOND")).alias("pe"),
    )
    out = interval_overlap_join(
        sess, pur, ["user_id"], "ss", "se", "ps", "pe", bucket_seconds=1200
    )
    # shared columns carry l_/r_ prefixes (range_join_binned's contract)
    return out.select(
        F.col("l_user_id").alias("user_id"), "session_id", "event_id"
    )


# ---------------------------------------------------------------------------
# NEAREST as-of (pandas merge_asof direction='nearest' parity): each
# purchase gets the user's closest click in TIME, either side;
# equidistant ties go backward, same-timestamp ties to the highest
# event id. The Spark side derives both boundary candidates from ONE
# shuffle (two window passes over the same partitioning); the oracle
# ranks every candidate globally — argmin distance is always one of
# the two boundaries, so the two formulations agree exactly.
# ---------------------------------------------------------------------------
@bench_query(
    "events_asof_nearest_click",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    ranked AS (
      SELECT p.event_id AS pid, c.ts AS cts, c.event_id AS cid,
             ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY ABS(epoch_us(c.ts) - epoch_us(p.ts)),
                        CASE WHEN c.ts <= p.ts THEN 1 ELSE 0 END DESC,
                        c.event_id DESC) AS rn
      FROM p JOIN c ON p.user_id = c.user_id
    )
    SELECT p.event_id, p.user_id, p.ts,
           r.cts AS asof_ts, r.cid AS asof_event_id
    FROM p LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
      ON r.pid = p.event_id
    """,
)
def events_asof_nearest_click(spark, sf_dir):
    from data_ingestion_framework_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts"), F.col("event_id")
    )
    return asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["event_id"],
        tiebreak="event_id",
        direction="nearest",
    )


# ---------------------------------------------------------------------------
# Cumulative distinct users by day — the running-distinct shape COUNT
# (DISTINCT) OVER cannot express directly: reduce each user to their
# FIRST day (one min-agg), count first-appearances per day, then a
# running sum over the (tiny) day spine. Three exact integer stages,
# no distinct-inside-window state. The oracle replays the same
# decomposition.
# ---------------------------------------------------------------------------
@bench_query(
    "events_cumulative_distinct_users",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS first_hour
      FROM events GROUP BY user_id
    ),
    per_hour AS (
      SELECT first_hour AS hour, COUNT(*) AS new_users
      FROM firsts GROUP BY first_hour
    )
    SELECT hour, CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (ORDER BY hour) AS BIGINT)
             AS cumulative_users
    FROM per_hour
    """,
)
def events_cumulative_distinct_users(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    firsts = (
        ev.select("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .groupBy("user_id")
        .agg(F.min("h").alias("hour"))
    )
    per_hour = firsts.groupBy("hour").agg(F.count(F.lit(1)).alias("new_users"))
    return per_hour.select(
        "hour",
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users")
        .over(W.orderBy("hour").rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint")
        .alias("cumulative_users"),
    )
