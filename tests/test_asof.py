"""As-of join and binned range join semantics + plan shapes."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from data_ingestion_framework_spark.operators.asof import (
    asof_join,
    range_join_binned,
)

T = dt.datetime(2024, 1, 1)
M = dt.timedelta(minutes=1)


def _frames(spark):
    left = spark.createDataFrame(
        [
            Row(lid=1, k="a", ts=T + 10 * M),
            Row(lid=2, k="a", ts=T + 30 * M),
            Row(lid=3, k="a", ts=T + 5 * M),   # before any right row
            Row(lid=4, k="b", ts=T + 10 * M),  # key with no right rows
        ],
        "lid int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            Row(rid=10, k="a", ts=T + 10 * M, v=1.0),  # equal ts → inclusive
            Row(rid=11, k="a", ts=T + 20 * M, v=2.0),
        ],
        "rid int, k string, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_inclusive_and_unmatched(spark):
    left, right = _frames(spark)
    got = {
        r["lid"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["v"], tiebreak="rid"
        ).collect()
    }
    assert got[1] == (T + 10 * M, 1.0)   # equal timestamp matches
    assert got[2] == (T + 20 * M, 2.0)   # latest preceding wins
    assert got[3] == (None, None)        # nothing at-or-before
    assert got[4] == (None, None)        # key absent on right


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    got = {
        r["lid"]: r["asof_v"]
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["v"], tolerance_seconds=300
        ).collect()
    }
    # lid=2 at +30m: nearest purchase +20m is 10m old > 5m tolerance
    assert got[1] == 1.0 and got[2] is None


def test_asof_plan_has_no_join(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, ["k"], "ts", "ts", ["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan  # one window over a union, no join node


def test_range_join_binned_boundaries_and_spanning(spark):
    left = spark.createDataFrame(
        [Row(lid=1, k="a", ts=T + 9 * M)], "lid int, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            Row(rid=20, k="a", ts=T + 9 * M),        # == left_ts → included
            Row(rid=21, k="a", ts=T + 15 * M),       # in next bin, in range
            Row(rid=22, k="a", ts=T + 19 * M),       # == left_ts + w → excluded
            Row(rid=23, k="a", ts=T + 8 * M),        # before → excluded
            Row(rid=24, k="b", ts=T + 10 * M),       # other key → excluded
        ],
        "rid int, k string, ts timestamp",
    )
    pairs = range_join_binned(left, right, ["k"], "ts", "ts", 600)
    assert {r["rid"] for r in pairs.collect()} == {20, 21}
    # candidates come from an equi-join, never a nested loop
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# ---------------------------------------------------------------------------
# Property: asof_join (union-marker + window plan) agrees with the
# brute-force definition (latest right row at-or-before, per key) on
# arbitrary small inputs, including duplicate timestamps and keys that
# exist on only one side.
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

pairs_st = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=0, max_size=12
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=pairs_st, right=pairs_st)
def test_asof_matches_bruteforce(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, dt.datetime(2024, 1, 1) + t * dt.timedelta(minutes=1))
         for i, (k, t) in enumerate(left)],
        "lid int, k int, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, k, dt.datetime(2024, 1, 1) + t * dt.timedelta(minutes=1), float(i))
         for i, (k, t) in enumerate(right)],
        "rid int, k int, ts timestamp, v double",
    )
    got = {
        r["lid"]: r["asof_v"]
        for r in asof_join(ldf, rdf, ["k"], "ts", "ts", ["v"], tiebreak="rid").collect()
    }
    # brute force: per left row, right rows at-or-before; latest ts wins,
    # highest rid breaks timestamp ties (the operator's tiebreak order)
    for i, (k, t) in enumerate(left):
        cands = [
            (rt, ri) for ri, (rk, rt) in enumerate(right) if rk == k and rt <= t
        ]
        expect = float(max(cands)[1]) if cands else None
        assert got.get(i) == expect, (i, k, t, cands)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=pairs_st, right=pairs_st)
def test_range_join_matches_bruteforce(spark, left, right):
    """range_join_binned (bin equi-join) == the O(n·m) definition:
    pairs on the key with right_ts in [left_ts, left_ts + w)."""
    W_SEC = 180  # 3-minute window over minute-granularity data
    ldf = spark.createDataFrame(
        [(i, k, dt.datetime(2024, 1, 1) + t * dt.timedelta(minutes=1))
         for i, (k, t) in enumerate(left)],
        "lid int, k int, lts timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, k, dt.datetime(2024, 1, 1) + t * dt.timedelta(minutes=1))
         for i, (k, t) in enumerate(right)],
        "rid int, k int, rts timestamp",
    )
    got = {
        (r["lid"], r["rid"])
        for r in range_join_binned(ldf, rdf, ["k"], "lts", "rts", W_SEC).collect()
    }
    expect = {
        (li, ri)
        for li, (lk, lt) in enumerate(left)
        for ri, (rk, rt) in enumerate(right)
        if lk == rk and lt <= rt < lt + 3
    }
    assert got == expect


def test_asof_default_tiebreak_is_deterministic(spark):
    """Several right rows share (k, ts) and no tiebreak is given: the
    carried value must still be stable across partitionings/re-runs
    (default tiebreak = hash of carried values, not partition order)."""
    left = spark.createDataFrame([Row(k="a", ts=T + 10 * M)], "k string, ts timestamp")
    right = spark.createDataFrame(
        [Row(k="a", ts=T + 5 * M, v=float(i)) for i in range(20)],
        "k string, ts timestamp, v double",
    )
    picks = {
        asof_join(left, right.repartition(n), ["k"], "ts", "ts", ["v"])
        .collect()[0]["asof_v"]
        for n in (1, 3, 7)
    }
    assert len(picks) == 1


def test_funnel_strictly_after_ordering(spark):
    from data_ingestion_framework_spark.operators.funnel import (
        funnel_counts,
        funnel_stage_times,
    )

    T = dt.datetime(2026, 1, 1)

    def ev(u, t, offs):
        return Row(user_id=u, event_type=t, ts=T + dt.timedelta(minutes=offs))

    events = spark.createDataFrame(
        [
            # u1 completes in order
            ev(1, "view", 0), ev(1, "click", 5), ev(1, "purchase", 9),
            # u2: purchase BEFORE the view — must not count as converted
            ev(2, "purchase", 0), ev(2, "view", 5), ev(2, "click", 7),
            # u3: click only, never viewed — enters no stage
            ev(3, "click", 1),
            # u4: view then click, stalls before purchase
            ev(4, "view", 2), ev(4, "click", 3),
        ]
    )
    counts = {
        r["stage"]: r["users"]
        for r in funnel_counts(events, ["view", "click", "purchase"]).collect()
    }
    assert counts == {"view": 3, "click": 3, "purchase": 1}
    times = {r["user_id"]: r for r in
             funnel_stage_times(events, ["view", "click", "purchase"]).collect()}
    assert times[1]["t_2"] is not None
    assert times[2]["t_2"] is None and times[2]["t_1"] is not None
    assert 3 not in times  # never entered the funnel
    assert times[4]["t_2"] is None


def test_interval_overlap_join_exact_once_and_guard(spark):
    """Hand case: overlaps emit exactly once even when pairs share many
    buckets; half-open boundaries don't touch-match; oversized spans
    raise loudly."""
    import datetime as dt

    import pytest
    from pyspark.sql import Row

    from data_ingestion_framework_spark.operators.asof import (
        interval_overlap_join,
    )

    def T(m):
        return dt.datetime(2024, 1, 1, 0, m)

    left = spark.createDataFrame(
        [
            Row(k="u", lid=1, ls=T(0), le=T(50)),   # spans many buckets
            Row(k="u", lid=2, ls=T(55), le=T(56)),
            Row(k="v", lid=3, ls=T(0), le=T(50)),   # other key: no cross
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="u", rid=1, rs=T(10), re_=T(40)),  # inside lid=1
            Row(k="u", rid=2, rs=T(49), re_=T(57)),  # overlaps lid 1 AND 2
            Row(k="u", rid=3, rs=T(50), re_=T(51)),  # touches lid=1 end: half-open, no match
        ]
    )
    out = interval_overlap_join(
        left, right, ["k"], "ls", "le", "rs", "re_", bucket_seconds=300
    )
    pairs = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert pairs == [(1, 1), (1, 2), (2, 2)]

    wide = spark.createDataFrame(
        [Row(k="u", lid=9, ls=T(0), le=dt.datetime(2024, 3, 1))]
    )
    with pytest.raises(Exception, match="spans more than"):
        interval_overlap_join(
            wide, right, ["k"], "ls", "le", "rs", "re_",
            bucket_seconds=60, max_buckets=100,
        ).collect()


def test_asof_forward_and_nearest_directions(spark):
    """pandas merge_asof direction parity: forward picks the smallest
    right_ts >= left_ts, nearest picks the closer side with
    equidistant ties going backward; tolerance measures in the
    direction's sense."""
    import datetime as dt

    from data_ingestion_framework_spark.operators.asof import asof_join

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    left = spark.createDataFrame(
        [("u", 1, ts(10)), ("u", 2, ts(35)), ("u", 3, ts(100))],
        "k string, lid int, lts timestamp",
    )
    right = spark.createDataFrame(
        [("u", "a", ts(0)), ("u", "b", ts(30)), ("u", "c", ts(40))],
        "k string, v string, rts timestamp",
    )

    def run(**kw):
        rows = asof_join(
            left, right, ["k"], "lts", "rts", ["v"], **kw
        ).collect()
        return {r["lid"]: r["asof_v"] for r in rows}

    assert run() == {1: "a", 2: "b", 3: "c"}                      # backward
    assert run(direction="forward") == {1: "b", 2: "c", 3: None}  # forward
    # nearest: lid=2 at t+35 is equidistant to b(30) and c(40) → backward b
    assert run(direction="nearest") == {1: "a", 2: "b", 3: "c"}
    # tolerance in the direction's sense
    assert run(direction="forward", tolerance_seconds=6 * 60) == {
        1: None, 2: "c", 3: None,
    }
    assert run(direction="nearest", tolerance_seconds=11 * 60) == {
        1: "a", 2: "b", 3: None,
    }
    import pytest as _pt

    with _pt.raises(ValueError, match="direction"):
        run(direction="sideways")
