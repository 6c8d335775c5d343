"""Table-as-a-streaming-source tests: commit-log replay, cursor
resume, Delta streaming-source option parity (startingVersion /
ignoreDeletes / ignoreChanges / maxFilesPerTrigger analog), crash
re-delivery with stable batch ids, and the bronze→silver
stream_table_scd_merge composite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_framework_spark.sources.tablestore import ParquetTable
from data_ingestion_framework_spark.streaming.table_stream import (
    TableChangeStream,
    stream_table_scd_merge,
)


def _mk(spark, path, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _drain(stream):
    """Collect (batch_id, sorted rows) per delivered micro-batch."""
    seen = []

    def fn(df, bid):
        seen.append((bid, sorted((r["k"], r["v"]) for r in df.collect())))

    n = stream.process_available(fn)
    return n, seen


def test_stream_replays_log_then_resumes(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, t, [(1, "a"), (2, "b")]))
    t.append(_mk(spark, t, [(3, "c")]))

    s = TableChangeStream(t, str(tmp_path / "ck"))
    n, seen = _drain(s)
    # default chunking: one batch drains the whole backlog
    assert n == 1
    assert seen[0][1] == [(1, "a"), (2, "b"), (3, "c")]
    assert s.cursor() == t.history()[-1]["seq"]

    # nothing pending → no batches, cursor unchanged
    n, seen = _drain(s)
    assert n == 0

    # a new append flows through alone
    t.append(_mk(spark, t, [(4, "d")]))
    n, seen = _drain(s)
    assert n == 1
    assert seen[0][1] == [(4, "d")]


def test_max_commits_per_batch_chunks_with_seq_batch_ids(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    for i in range(3):
        t.append(_mk(spark, t, [(i, f"v{i}")]))
    seqs = [r["seq"] for r in t.history()]

    s = TableChangeStream(t, str(tmp_path / "ck"), max_commits_per_batch=1)
    n, seen = _drain(s)
    assert n == 3
    assert [bid for bid, _ in seen] == seqs
    assert [rows for _, rows in seen] == [
        [(0, "v0")],
        [(1, "v1")],
        [(2, "v2")],
    ]


def test_starting_seq_latest_skips_backlog(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, t, [(1, "old")]))

    s = TableChangeStream(t, str(tmp_path / "ck"), starting_seq="latest")
    n, seen = _drain(s)
    assert n == 0  # backlog skipped, cursor pinned at latest

    t.append(_mk(spark, t, [(2, "new")]))
    n, seen = _drain(s)
    assert n == 1
    assert seen[0][1] == [(2, "new")]


def test_starting_seq_int_is_inclusive(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, t, [(1, "a")]))
    t.append(_mk(spark, t, [(2, "b")]))
    t.append(_mk(spark, t, [(3, "c")]))
    second = t.history()[1]["seq"]

    s = TableChangeStream(t, str(tmp_path / "ck"), starting_seq=second)
    n, seen = _drain(s)
    assert n == 1
    assert seen[0][1] == [(2, "b"), (3, "c")]


def test_delete_raises_unless_ignore_deletes(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, t, [(1, "a"), (2, "b")]))
    t.delete_where_dv(F.col("k") == 1)  # removes rows, keeps files
    t.append(_mk(spark, t, [(3, "c")]))

    s = TableChangeStream(t, str(tmp_path / "ck1"))
    with pytest.raises(ValueError, match="delete"):
        _drain(s)

    s2 = TableChangeStream(t, str(tmp_path / "ck2"), ignore_deletes=True)
    n, seen = _drain(s2)
    assert n == 1
    # the delete commit is skipped; appended rows still flow
    assert seen[0][1] == [(1, "a"), (2, "b"), (3, "c")]


def test_rewrite_raises_unless_ignore_changes(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, t, [(1, "a"), (2, "b")]))
    t.overwrite(_mk(spark, t, [(1, "a2"), (2, "b2")]))

    s = TableChangeStream(t, str(tmp_path / "ck1"))
    with pytest.raises(ValueError, match="rewrites"):
        _drain(s)

    # ignore_changes re-emits the rewrite's new files (row re-delivery,
    # Delta's documented ignoreChanges contract)
    s2 = TableChangeStream(t, str(tmp_path / "ck2"), ignore_changes=True)
    n, seen = _drain(s2)
    assert n == 1
    rows = [r for _, rs in seen for r in rs]
    assert sorted(rows) == [(1, "a"), (1, "a2"), (2, "b"), (2, "b2")]


def test_crash_redelivers_same_batch_with_same_id(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, t, [(1, "a")]))
    t.append(_mk(spark, t, [(2, "b")]))

    s = TableChangeStream(t, str(tmp_path / "ck"), max_commits_per_batch=1)
    calls = []

    def crashy(df, bid):
        calls.append((bid, sorted(r["k"] for r in df.collect())))
        if len(calls) == 2:
            raise RuntimeError("sink down")

    with pytest.raises(RuntimeError):
        s.process_available(crashy)
    # batch 1 committed (cursor advanced past it); batch 2 crashed
    # before its cursor write → re-delivered with the SAME id
    n, seen = _drain(s)
    assert n == 1
    assert seen[0][0] == calls[1][0]
    assert seen[0][1] == [(2, "b")]


def test_with_commit_seq_stamps_provenance(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, t, [(1, "a")]))
    t.append(_mk(spark, t, [(2, "b")]))
    seqs = [r["seq"] for r in t.history()]

    s = TableChangeStream(t, str(tmp_path / "ck"), with_commit_seq=True)
    got = {}

    def fn(df, bid):
        for r in df.collect():
            got[r["k"]] = r["_commit_seq"]

    s.process_available(fn)
    assert got == {1: seqs[0], 2: seqs[1]}


def test_metadata_only_commits_are_silent(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.append(_mk(spark, t, [(1, "a")]))
    t.rename_column("v", "val")  # metadata-only commit
    s = TableChangeStream(t, str(tmp_path / "ck"))
    seen = []
    n = s.process_available(lambda df, bid: seen.append(df.columns))
    assert n == 1  # one batch: the append (rename adds no files)
    assert "val" in seen[0]  # logical schema applies on read
    assert s.cursor() == t.history()[-1]["seq"]  # cursor passed the rename


def test_stream_table_scd_merge_bronze_to_silver(spark, tmp_path):
    bronze = ParquetTable(spark, str(tmp_path / "bronze"))
    silver = ParquetTable(spark, str(tmp_path / "silver"))
    ck = str(tmp_path / "ck")

    rows1 = [(1, "a", 1), (2, "b", 1)]
    rows2 = [(1, "a2", 2), (3, "c", 1)]
    mk = lambda rs: spark.createDataFrame(rs, "k int, v string, ver int")
    bronze.append(mk(rows1))
    bronze.append(mk(rows2))

    n = stream_table_scd_merge(
        bronze, silver, ["k"], "ver", ck, max_commits_per_batch=1
    )
    assert n == 2
    state = {r["k"]: (r["v"], r["ver"]) for r in silver.read().collect()}
    assert state == {1: ("a2", 2), 2: ("b", 1), 3: ("c", 1)}

    # idempotent heartbeat: nothing new → no merge commits
    before = len(silver.history())
    assert stream_table_scd_merge(bronze, silver, ["k"], "ver", ck) == 0
    assert len(silver.history()) == before

    # incremental: only the new commit merges
    bronze.append(mk([(2, "b9", 3)]))
    assert stream_table_scd_merge(bronze, silver, ["k"], "ver", ck) == 1
    state = {r["k"]: (r["v"], r["ver"]) for r in silver.read().collect()}
    assert state == {1: ("a2", 2), 2: ("b9", 3), 3: ("c", 1)}


def test_stream_table_scd_merge_cdf_replay_guard(spark, tmp_path):
    """A crash after the CDF append but before the cursor write must
    not double-append the change feed on re-delivery."""
    bronze = ParquetTable(spark, str(tmp_path / "bronze"))
    silver = ParquetTable(spark, str(tmp_path / "silver"))
    cdf = ParquetTable(spark, str(tmp_path / "cdf"))
    ck = str(tmp_path / "ck")
    mk = lambda rs: spark.createDataFrame(rs, "k int, v string, ver int")

    bronze.append(mk([(1, "a", 1)]))
    n = stream_table_scd_merge(
        bronze, silver, ["k"], "ver", ck, cdf_table=cdf
    )
    assert n == 1
    first_feed = cdf.read().count()

    # simulate re-delivery: wipe the cursor so the same batch id replays
    import os

    os.remove(os.path.join(ck, "cursor.json"))
    n = stream_table_scd_merge(
        bronze, silver, ["k"], "ver", ck, cdf_table=cdf
    )
    assert n == 1  # batch re-delivered...
    assert cdf.read().count() == first_feed  # ...but CDF not duplicated
    assert {r["k"]: r["v"] for r in silver.read().collect()} == {1: "a"}
