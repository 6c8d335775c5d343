"""Lakehouse MERGE SQL emission (sinks/merge_sql.py): pinned statement
text (the reference's generated-MERGE shapes, writers/batch_writers.py
:127-140, writers/writer.py:177-281, :454-524) plus equivalence tests
executing the state-SQL counterparts and asserting the result equals
the DataFrame engine (operators/scd.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators import scd
from data_ingestion_framework_spark.sinks.merge_sql import (
    scd1_merge_sql,
    scd1_state_sql,
    scd2_merge_sql,
    scd2_state_sql,
    scd2_streaming_merge_sql,
)

T0, T1, T2 = "2024-01-01 00:00:00", "2024-01-02 00:00:00", "2024-01-03 00:00:00"


# -- pinned statement text ---------------------------------------------------

def test_scd1_merge_sql_text():
    sql = scd1_merge_sql("cat.db.dim", ["pk1", "pk2"], order_col="mtime")
    assert "MERGE INTO cat.db.dim AS target" in sql
    assert "ON target.pk1 = source.pk1 AND target.pk2 = source.pk2" in sql
    assert "UPDATE SET *" in sql and "INSERT *" in sql
    assert "ROW_NUMBER() OVER (PARTITION BY pk1, pk2 ORDER BY mtime DESC)" in sql
    assert "NOT MATCHED BY SOURCE" not in sql

    fe = scd1_merge_sql("t", ["pk"], full_extract=True)
    assert "WHEN NOT MATCHED BY SOURCE AND target.delete_time IS NULL" in fe
    assert "UPDATE SET target.delete_time = current_timestamp()" in fe


def test_scd2_merge_sql_text():
    merge, insert = scd2_merge_sql(
        "cat.db.dim", ["pk"], ["price", "status"], full_extract=True
    )
    assert "ON target.pk = source.pk AND target.is_current = 1" in merge
    assert (
        "target.price IS DISTINCT FROM source.price"
        " OR target.status IS DISTINCT FROM source.status" in merge
    )
    assert "UPDATE SET target.is_current = 0, target.end_time" in merge
    assert "WHEN NOT MATCHED BY SOURCE AND target.is_current = 1" in merge
    assert "INSERT (pk, price, status, start_time, end_time, is_current, delete_time)" in merge
    # the companion statement re-inserts new versions for just-closed keys
    assert insert.startswith("INSERT INTO cat.db.dim")
    assert "LEFT ANTI JOIN" in insert and "is_current = 0" in insert


def test_scd2_streaming_merge_sql_text():
    sql = scd2_streaming_merge_sql("t", ["pk"], ["v"], "mtime")
    for branch in ("UpdatedRows", "DeletedRows", "SourceDataUpdated"):
        assert f"{branch} AS (" in sql
    assert sql.count("UNION ALL") == 2
    assert "ON target.pk <=> source.pk AND target.v <=> source.v" in sql
    assert "WHEN NOT MATCHED THEN\n  INSERT *" in sql


# -- executable equivalence vs the DataFrame engine --------------------------

def _collect(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_scd1_state_sql_equals_engine(spark):
    target = spark.createDataFrame(
        [Row(pk=i, v=f"t{i}", mtime=T0, delete_time=None) for i in range(6)],
        "pk int, v string, mtime string, delete_time timestamp",
    ).withColumn("mtime", F.col("mtime").cast("timestamp"))
    # two versions for pk=1 in one batch (dedup must pick mtime T2)
    source = spark.createDataFrame(
        [Row(pk=1, v="s1a", mtime=T1), Row(pk=1, v="s1b", mtime=T2),
         Row(pk=9, v="s9", mtime=T1)],
        "pk int, v string, mtime string",
    ).withColumn("mtime", F.col("mtime").cast("timestamp"))
    target.createOrReplaceTempView("__t_scd1")
    source.createOrReplaceTempView("__s_scd1")

    got = spark.sql(
        scd1_state_sql(
            "__t_scd1", "__s_scd1", ["pk"], "mtime",
            ["pk", "v", "mtime"],
            full_extract=True, now_expr=f"TIMESTAMP '{T2}'",
        )
    )
    want = scd.scd1_apply(
        target, source, ["pk"], "mtime", full_extract=True, deleted_at=T2
    )
    cols = ["pk", "v", "mtime", "delete_time"]
    assert _collect(got, cols) == _collect(want, cols)


def test_scd2_state_sql_equals_engine(spark):
    """Full lifecycle: initial load with a consecutive-unchanged
    collapse, then an incremental batch with changes, re-sends
    (replay protection) and FE deletes — SQL path == scd2_apply."""
    v0 = spark.createDataFrame(
        [  # pk=1 sends the same value twice -> collapses to one version
            Row(pk=1, price=10.0, mtime=T0), Row(pk=1, price=10.0, mtime=T1),
            Row(pk=2, price=20.0, mtime=T0),
            Row(pk=3, price=30.0, mtime=T0),
        ],
        "pk int, price double, mtime string",
    ).withColumn("mtime", F.col("mtime").cast("timestamp"))
    cols = ["pk", "price", "mtime"]
    v0.createOrReplaceTempView("__v0_scd2")

    s0_sql = spark.sql(scd2_state_sql(None, "__v0_scd2", ["pk"], "mtime", cols))
    s0_eng = scd.scd2_apply(None, v0, ["pk"], "mtime")
    out = ["pk", "price", "start_time", "end_time", "is_current", "delete_time"]
    assert _collect(s0_sql, out) == _collect(s0_eng, out)
    assert len(_collect(s0_sql, out)) == 3  # pk=1 collapsed

    # incremental: pk=1 re-sent unchanged AND older (replay no-op),
    # pk=2 changes, pk=3 absent (FE soft delete), pk=4 brand new
    v1 = spark.createDataFrame(
        [
            Row(pk=1, price=10.0, mtime=T0),
            Row(pk=2, price=25.0, mtime=T2),
            Row(pk=4, price=40.0, mtime=T2),
        ],
        "pk int, price double, mtime string",
    ).withColumn("mtime", F.col("mtime").cast("timestamp"))
    s0_sql.createOrReplaceTempView("__s0_scd2")
    v1.createOrReplaceTempView("__v1_scd2")

    s1_sql = spark.sql(
        scd2_state_sql(
            "__s0_scd2", "__v1_scd2", ["pk"], "mtime", cols,
            full_extract=True, deleted_at=T2,
        )
    )
    s1_eng = scd.scd2_apply(
        s0_eng, v1, ["pk"], "mtime", full_extract=True, deleted_at=T2
    )
    assert _collect(s1_sql, out) == _collect(s1_eng, out)
    by_pk = {}
    for row in _collect(s1_sql, out):
        by_pk.setdefault(row[0], []).append(row)
    assert len(by_pk[1]) == 1          # replay collapsed: no new version
    assert len(by_pk[2]) == 2          # close-out + new version
    assert by_pk[3][0][5] is not None  # soft-deleted
    assert by_pk[4][0][4] == 1         # inserted current
