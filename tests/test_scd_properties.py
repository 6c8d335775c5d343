"""Property-based SCD2 invariants (SURVEY §7.4 hard part #1):
under arbitrary batch sequences —

1. at most one current row per live key, and it has end_time null;
2. validity intervals per key chain without gaps or overlaps;
3. replaying the last batch is a no-op (idempotence);
4. the current view equals an SCD1 fold of the same batches.

Small bounded examples (Spark round-trips are expensive); the generator
covers in-batch duplicate versions, re-sent unchanged rows, and
multi-key interleavings.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from data_ingestion_framework_spark.operators import scd

BASE = dt.datetime(2024, 1, 1)

# a batch: list of (key, value) — mtime is assigned by batch index
batch_st = st.lists(
    st.tuples(st.integers(1, 3), st.sampled_from(["a", "b", "c"])),
    min_size=1,
    max_size=4,
)
batches_st = st.lists(batch_st, min_size=1, max_size=3)


def _df(spark, batch, i):
    rows = [
        Row(pk=pk, val=val, mtime=BASE + dt.timedelta(days=i, seconds=j))
        for j, (pk, val) in enumerate(batch)
    ]
    return spark.createDataFrame(rows, "pk int, val string, mtime timestamp")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=batches_st)
def test_scd2_invariants(spark, batches):
    state = None
    for i, batch in enumerate(batches):
        state = scd.scd2_apply(state, _df(spark, batch, i), ["pk"], "mtime")
    rows = state.collect()

    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["pk"], []).append(r)

    for pk, versions in by_key.items():
        current = [r for r in versions if r["is_current"] == 1]
        # (1) exactly one current row per key (no deletes generated here)
        assert len(current) == 1, f"pk={pk}: {len(current)} current rows"
        assert current[0]["end_time"] is None
        # (2) intervals chain: sorted by start, each end == next start
        ordered = sorted(versions, key=lambda r: r["start_time"])
        for a, b in zip(ordered, ordered[1:]):
            assert a["end_time"] == b["start_time"], f"pk={pk} gap/overlap"
        # consecutive versions differ in value (no spurious history)
        for a, b in zip(ordered, ordered[1:]):
            assert a["val"] != b["val"], f"pk={pk} duplicate version"

    # (3) idempotent replay of the final batch
    replay = scd.scd2_apply(
        state, _df(spark, batches[-1], len(batches) - 1), ["pk"], "mtime"
    )
    key = lambda r: (r["pk"], r["start_time"])
    cols = ["pk", "val", "start_time", "end_time", "is_current"]
    assert sorted(map(tuple, replay.select(*cols).collect()), key=lambda t: (t[0], t[2])) == sorted(
        map(tuple, state.select(*cols).collect()), key=lambda t: (t[0], t[2])
    )

    # (4) current view == SCD1 fold
    scd1 = None
    for i, batch in enumerate(batches):
        scd1 = scd.scd1_apply(scd1, _df(spark, batch, i), ["pk"], "mtime")
    cur = {(r["pk"], r["val"]) for r in scd.current_view(state).collect()}
    fold = {(r["pk"], r["val"]) for r in scd1.collect()}
    assert cur == fold
