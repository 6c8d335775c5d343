"""Gap-fill semantics (operators/timeseries.py): dense spine, LOCF
carry, linear interpolation, observed flags — TimescaleDB
time_bucket_gapfill + locf/interpolate parity on a hand-computed case."""

import datetime as dt

from pyspark.sql import Row

from data_ingestion_framework_spark.operators.timeseries import gapfill


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_gapfill_locf_and_interp_hand_case(spark):
    rows = [
        # key A: observations at 00h (v=10), 03h (v=40) → gaps 01,02
        Row(k="A", ts=_ts(0, 30), v=10.0, i=1),
        Row(k="A", ts=_ts(3, 10), v=40.0, i=2),
        # key B: single observation → single row, no gaps
        Row(k="B", ts=_ts(5), v=7.0, i=3),
    ]
    out = gapfill(
        spark.createDataFrame(rows), "ts", ["k"], "v", unit="hour",
        tiebreak_cols=("i",),
    )
    got = {
        (r["k"], r["bucket"].hour): (
            r["value_locf"], round(r["value_interp"], 6), r["observed"]
        )
        for r in out.collect()
    }
    assert got == {
        ("A", 0): (10.0, 10.0, True),
        ("A", 1): (10.0, 20.0, False),  # 10 + (40-10)*1/3
        ("A", 2): (10.0, 30.0, False),  # 10 + (40-10)*2/3
        ("A", 3): (40.0, 40.0, True),
        ("B", 5): (7.0, 7.0, True),
    }


def test_gapfill_bucket_representative_is_latest_by_tiebreak(spark):
    # two rows in the SAME hour with the same timestamp: the higher
    # tiebreak wins (max_by over struct(ts, i))
    rows = [
        Row(k="A", ts=_ts(0, 15), v=1.0, i=1),
        Row(k="A", ts=_ts(0, 15), v=2.0, i=2),
        Row(k="A", ts=_ts(0, 45), v=3.0, i=0),  # later ts beats tiebreak
    ]
    out = gapfill(
        spark.createDataFrame(rows), "ts", ["k"], "v", unit="hour",
        tiebreak_cols=("i",),
    ).collect()
    assert len(out) == 1 and out[0]["value_locf"] == 3.0

    out2 = gapfill(
        spark.createDataFrame(rows[:2]), "ts", ["k"], "v", unit="hour",
        tiebreak_cols=("i",),
    ).collect()
    assert out2[0]["value_locf"] == 2.0


def test_m4_downsample_keeps_bucket_extremes_once(spark):
    from data_ingestion_framework_spark.operators.timeseries import (
        m4_downsample,
    )

    # one key, 8 points, 2 buckets: extremes known by construction
    vals = [5.0, 9.0, 1.0, 7.0, 3.0, 3.0, 8.0, 2.0]
    rows = [Row(k="a", ts=_ts(h), v=vals[h], i=h) for h in range(8)]
    out = m4_downsample(
        spark.createDataFrame(rows), "ts", ["k"], "v", n_buckets=2,
        tiebreak_cols=("i",),
    ).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], set()).add((r["ts"].hour, r["v"]))
    # bucket 0 = hours 0-3: first (0,5), last (3,7), min (2,1), max (1,9)
    assert by_bucket[0] == {(0, 5.0), (3, 7.0), (2, 1.0), (1, 9.0)}
    # bucket 1 = hours 4-7: first (4,3) also vmin by tiebreak (4 < 5),
    # last (7,2), max (6,8) — the multi-role point emits ONCE
    assert by_bucket[1] == {(4, 3.0), (7, 2.0), (6, 8.0)}
    assert len(out) == 7


def test_m4_single_point_series(spark):
    from data_ingestion_framework_spark.operators.timeseries import (
        m4_downsample,
    )

    out = m4_downsample(
        spark.createDataFrame([Row(k="a", ts=_ts(1), v=1.0, i=0)]),
        "ts", ["k"], "v", n_buckets=10, tiebreak_cols=("i",),
    ).collect()
    assert len(out) == 1 and out[0]["bucket"] == 0


def test_timeseries_plan_shapes(spark):
    """Scale-shape pins: gapfill is two exchanges (bucket agg + key
    window) with the generator AFTER the window (gap rows never
    shuffle); m4 is ONE exchange — the per-key span window's hash(key)
    partitioning satisfies the (key, bucket) role windows' clustering,
    so all five windows share it."""
    from pyspark.sql import Row

    from data_ingestion_framework_spark.operators.timeseries import (
        gapfill,
        m4_downsample,
    )

    rows = [Row(k="a", ts=_ts(h % 20, h % 3), v=float(h), i=h) for h in range(50)]
    df = spark.createDataFrame(rows)
    g = gapfill(df, "ts", ["k"], "v", unit="hour", tiebreak_cols=("i",))
    gp = g._jdf.queryExecution().executedPlan().toString()
    assert gp.count("Exchange") == 2 and gp.count("Generate") == 1
    m = m4_downsample(df, "ts", ["k"], "v", 10, tiebreak_cols=("i",))
    mp = m._jdf.queryExecution().executedPlan().toString()
    assert mp.count("Exchange") == 1


def test_pattern_topk_finds_embedded_pattern(spark):
    """A series containing the exact (shifted+scaled) query pattern
    must match it with corr == 1.0 at the right offset — z-normalized
    correlation is shape-based, so level/scale shifts don't matter."""
    from data_ingestion_framework_spark.operators.timeseries import (
        pattern_topk,
    )

    pat = [5.0, 1.0, 5.0, 1.0]
    # scaled by 3 and shifted by 100, embedded at hour 6
    series = [0.0, 1.0, 2.0, 1.0, 0.0, 2.0, 115.0, 103.0, 115.0, 103.0, 1.0]
    rows = [Row(k="a", ts=_ts(h), v=v, i=h) for h, v in enumerate(series)]
    out = pattern_topk(
        spark.createDataFrame(rows), "ts", ["k"], "v", pat, k=1,
        tiebreak_cols=("i",),
    ).collect()
    assert len(out) == 1
    assert out[0]["match_ts"].hour == 6 and out[0]["corr"] == 1.0


def test_pattern_topk_skips_constant_windows(spark):
    from data_ingestion_framework_spark.operators.timeseries import (
        pattern_topk,
    )

    rows = [Row(k="a", ts=_ts(h), v=7.0, i=h) for h in range(6)]
    out = pattern_topk(
        spark.createDataFrame(rows), "ts", ["k"], "v", [1.0, 2.0, 3.0], k=5,
        tiebreak_cols=("i",),
    ).collect()
    assert out == []  # σ=0 windows carry no shape
