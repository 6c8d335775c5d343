"""SCD1/SCD2 merge-engine semantics on the FIXTURES.md F1 scenario:
t0 full load, t1 updates+new, t2 key-absent soft deletes; plus
idempotent-replay and as-of reconstruction properties."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators import scd

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 1, 2)
T2 = dt.datetime(2024, 1, 3)


def _batch(spark, rows):
    return spark.createDataFrame(
        [Row(pk=pk, val=val, mtime=mt) for pk, val, mt in rows],
        "pk int, val string, mtime timestamp",
    )


def test_dedupe_latest_picks_latest_with_tiebreak(spark):
    df = _batch(spark, [(1, "a", T0), (1, "b", T1), (2, "x", T0), (2, "y", T0)])
    out = scd.dedupe_latest(df, ["pk"], "mtime", tiebreak_cols=["val"])
    got = {r["pk"]: r["val"] for r in out.collect()}
    assert got == {1: "b", 2: "y"}  # tie at T0 broken by val desc


def test_scd1_initial_and_upsert(spark):
    b0 = _batch(spark, [(1, "a", T0), (2, "b", T0)])
    state = scd.scd1_apply(None, b0, ["pk"], "mtime")
    assert state.count() == 2

    b1 = _batch(spark, [(1, "a2", T1), (3, "c", T1)])
    state = scd.scd1_apply(state, b1, ["pk"], "mtime")
    got = {r["pk"]: r["val"] for r in state.collect()}
    assert got == {1: "a2", 2: "b", 3: "c"}


def test_scd1_full_extract_soft_delete(spark):
    b0 = _batch(spark, [(1, "a", T0), (2, "b", T0)]).withColumn(
        "delete_time", F.lit(None).cast("timestamp")
    )
    b1 = _batch(spark, [(1, "a", T1)]).withColumn(
        "delete_time", F.lit(None).cast("timestamp")
    )
    state = scd.scd1_apply(b0, b1, ["pk"], "mtime", full_extract=True, deleted_at=T1)
    rows = {r["pk"]: r for r in state.collect()}
    assert rows[2]["delete_time"] == T1
    assert rows[1]["delete_time"] is None


def test_scd1_full_extract_source_without_control_cols(spark):
    """A raw source batch (read_csv/read_json defaults) carries no
    delete_time; surviving target rows must keep their stamped one and
    absent keys must still get stamped — target-only columns are never
    dropped by schema alignment."""
    b0 = _batch(spark, [(1, "a", T0), (2, "b", T0), (3, "c", T0)]).withColumn(
        "delete_time", F.lit(None).cast("timestamp")
    )
    state = scd.scd1_apply(b0, _batch(spark, [(1, "a", T0)]),
                           ["pk"], "mtime", full_extract=True, deleted_at=T1)
    rows = {r["pk"]: r for r in state.collect()}
    assert rows[2]["delete_time"] == T1 and rows[3]["delete_time"] == T1
    assert rows[1]["delete_time"] is None  # matched key resurrected
    # a later batch re-sending pk=2 clears the soft delete; pk=3 keeps it
    state2 = scd.scd1_apply(state, _batch(spark, [(2, "b2", T2)]), ["pk"], "mtime")
    rows2 = {r["pk"]: r for r in state2.collect()}
    assert rows2[2]["delete_time"] is None and rows2[2]["val"] == "b2"
    assert rows2[3]["delete_time"] == T1  # survived the merge untouched


def test_scd1_target_without_delete_time_full_extract(spark):
    """Even the target may lack delete_time (first full-extract run over
    a plain table): the column is created, not crashed on."""
    b0 = _batch(spark, [(1, "a", T0), (2, "b", T0)])
    state = scd.scd1_apply(b0, _batch(spark, [(1, "a", T1)]),
                           ["pk"], "mtime", full_extract=True, deleted_at=T1)
    rows = {r["pk"]: r for r in state.collect()}
    assert rows[2]["delete_time"] == T1
    assert rows[1]["delete_time"] is None


def test_scd2_initial_stamping(spark):
    df = _batch(spark, [(1, "a", T0), (1, "b", T1), (2, "x", T0)])
    out = scd.stamp_scd2_initial(df, ["pk"], "mtime", tiebreak_cols=["val"])
    rows = sorted(out.collect(), key=lambda r: (r["pk"], r["start_time"]))
    assert [(r["pk"], r["val"], r["is_current"]) for r in rows] == [
        (1, "a", 0),
        (1, "b", 1),
        (2, "x", 1),
    ]
    assert rows[0]["end_time"] == T1 and rows[1]["end_time"] is None


def test_scd2_apply_full_lifecycle(spark):
    # t0: initial load
    b0 = _batch(spark, [(1, "a", T0), (2, "b", T0)])
    state = scd.scd2_apply(None, b0, ["pk"], "mtime")
    assert state.count() == 2

    # t1: pk1 changes, pk3 arrives, pk2 unchanged (re-sent, no new row)
    b1 = _batch(spark, [(1, "a2", T1), (2, "b", T1), (3, "c", T1)])
    state = scd.scd2_apply(state, b1, ["pk"], "mtime")
    rows = sorted(
        state.collect(), key=lambda r: (r["pk"], r["start_time"] or dt.datetime.min)
    )
    by_pk = {}
    for r in rows:
        by_pk.setdefault(r["pk"], []).append(r)
    # pk1: closed-out old version + new current
    assert [(r["val"], r["is_current"]) for r in by_pk[1]] == [("a", 0), ("a2", 1)]
    assert by_pk[1][0]["end_time"] == T1
    # pk2: unchanged → still a single current row
    assert [(r["val"], r["is_current"]) for r in by_pk[2]] == [("b", 1)]
    # pk3: fresh insert
    assert [(r["val"], r["is_current"]) for r in by_pk[3]] == [("c", 1)]

    # t2 (full extract): pk1 absent → soft delete
    b2 = _batch(spark, [(2, "b", T2), (3, "c", T2)])
    state = scd.scd2_apply(state, b2, ["pk"], "mtime", full_extract=True, deleted_at=T2)
    pk1 = sorted(
        [r for r in state.collect() if r["pk"] == 1],
        key=lambda r: r["start_time"] or dt.datetime.min,
    )
    assert pk1[-1]["delete_time"] == T2 and pk1[-1]["is_current"] == 0


def test_scd2_apply_idempotent_replay(spark):
    b0 = _batch(spark, [(1, "a", T0), (2, "b", T0)])
    state = scd.scd2_apply(None, b0, ["pk"], "mtime")
    b1 = _batch(spark, [(1, "a2", T1)])
    once = scd.scd2_apply(state, b1, ["pk"], "mtime")
    twice = scd.scd2_apply(once, b1, ["pk"], "mtime")
    cols = ["pk", "val", "start_time", "end_time", "is_current"]
    assert sorted(map(tuple, once.select(*cols).collect())) == sorted(
        map(tuple, twice.select(*cols).collect())
    )


def test_scd2_multiple_versions_in_one_batch(spark):
    # two distinct versions + one consecutive duplicate inside the batch
    b = _batch(spark, [(1, "v1", T0), (1, "v1", T1), (1, "v2", T2)])
    state = scd.scd2_apply(None, b, ["pk"], "mtime")
    rows = sorted(state.collect(), key=lambda r: r["start_time"])
    assert [(r["val"], r["is_current"]) for r in rows] == [("v1", 0), ("v2", 1)]


def test_as_of_reconstruction(spark):
    b0 = _batch(spark, [(1, "a", T0)])
    state = scd.scd2_apply(None, b0, ["pk"], "mtime")
    state = scd.scd2_apply(state, _batch(spark, [(1, "a2", T2)]), ["pk"], "mtime")
    assert [r["val"] for r in scd.as_of(state, T1).collect()] == ["a"]
    assert [r["val"] for r in scd.as_of(state, T2).collect()] == ["a2"]


def test_current_view(spark):
    b0 = _batch(spark, [(1, "a", T0), (2, "b", T0)])
    state = scd.scd2_apply(None, b0, ["pk"], "mtime")
    state = scd.scd2_apply(state, _batch(spark, [(1, "a2", T1)]), ["pk"], "mtime")
    cur = scd.current_view(state)
    assert {r["val"] for r in cur.collect()} == {"a2", "b"}


def test_empty_batch_is_noop(spark):
    """A run that picks up zero new rows (empty cursor slice) must not
    change either SCD state."""
    b0 = _batch(spark, [(1, "a", T0), (2, "b", T1)])
    s2 = scd.scd2_apply(None, b0, ["pk"], "mtime")
    empty = b0.limit(0)
    cols = ["pk", "val", "start_time", "end_time", "is_current"]
    after2 = scd.scd2_apply(s2, empty, ["pk"], "mtime")
    assert sorted(map(tuple, after2.select(*cols).collect())) == sorted(
        map(tuple, s2.select(*cols).collect())
    )
    s1 = scd.scd1_apply(None, b0, ["pk"], "mtime")
    after1 = scd.scd1_apply(s1, empty, ["pk"], "mtime")
    assert sorted(map(tuple, after1.select("pk", "val").collect())) == sorted(
        map(tuple, s1.select("pk", "val").collect())
    )
