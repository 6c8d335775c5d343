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


def test_generic_merge_sql_text():
    """Clause rendering: delete before update in both families, null-
    safe ON, conditions attached, INSERT * form."""
    from data_ingestion_framework_spark.sinks.merge_sql import (
        generic_merge_sql,
    )

    sql = generic_merge_sql(
        "cat.t",
        ["pk"],
        update_set={"v": "source.v"},
        update_condition="source.v > target.v",
        delete_condition="source.status = 'X'",
        insert_condition="status = 'open'",
        nmbs_update_set={"status": "'S'"},
        nmbs_update_condition="target.status = 'O'",
        nmbs_delete_condition="target.status = 'F'",
    )
    assert "ON target.pk <=> source.pk" in sql
    i_del = sql.index("WHEN MATCHED AND (source.status = 'X') THEN\n  DELETE")
    i_upd = sql.index("WHEN MATCHED AND (source.v > target.v) THEN")
    i_ins = sql.index("WHEN NOT MATCHED AND (status = 'open') THEN\n  INSERT *")
    i_nmd = sql.index("WHEN NOT MATCHED BY SOURCE AND (target.status = 'F') THEN\n  DELETE")
    i_nmu = sql.index("WHEN NOT MATCHED BY SOURCE AND (target.status = 'O') THEN")
    assert i_del < i_upd < i_ins < i_nmd < i_nmu
    assert "UPDATE SET target.v = source.v" in sql
    assert "UPDATE SET target.status = 'S'" in sql


def test_generic_merge_state_sql_equals_executor(spark, tmp_path):
    """The generic merge's state-equivalent SELECT computes exactly the
    table state the merge_into executor commits — all clause families
    live at once, including NULL conditions (not satisfied)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from data_ingestion_framework_spark.sinks.merge_sql import (
        generic_merge_state_sql,
    )
    from data_ingestion_framework_spark.sinks.writers import (
        merge_into,
        merge_source,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    target_rows = [
        Row(pk=1, v=10, status="open"),
        Row(pk=2, v=20, status="open"),    # matched, delete cond
        Row(pk=3, v=30, status="open"),    # matched, update cond false
        Row(pk=4, v=40, status="open"),    # NMBS update -> soft flag
        Row(pk=5, v=50, status="stale"),   # NMBS delete cond
        Row(pk=6, v=60, status="held"),    # NMBS, neither fires
    ]
    source_rows = [
        Row(pk=1, v=11, status="open"),
        Row(pk=2, v=99, status="closed"),
        Row(pk=3, v=5, status=None),       # NULL update cond -> keep
        Row(pk=7, v=70, status="open"),    # insert
        Row(pk=8, v=80, status="closed"),  # insert cond false
    ]
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame(target_rows))
    merge_into(
        t,
        spark.createDataFrame(source_rows),
        ["pk"],
        when_matched_update={"v": merge_source("v")},
        when_matched_update_condition=merge_source("v") > F.col("v"),
        when_matched_delete_condition=merge_source("status") == "closed",
        when_not_matched_insert_condition=F.col("status") == "open",
        when_not_matched_by_source_update={"status": F.lit("S")},
        when_not_matched_by_source_update_condition=F.col("status") == "open",
        when_not_matched_by_source_delete_condition=F.col("status") == "stale",
    )
    executor_state = {
        (r["pk"], r["v"], r["status"]) for r in t.read().collect()
    }

    spark.createDataFrame(target_rows).createOrReplaceTempView("gm_target")
    spark.createDataFrame(source_rows).createOrReplaceTempView("gm_source")
    sql = generic_merge_state_sql(
        "gm_target",
        "gm_source",
        ["pk"],
        ["pk", "v", "status"],
        update_set={"v": "source.v"},
        update_condition="source.v > target.v",
        delete_condition="source.status = 'closed'",
        insert_condition="status = 'open'",
        nmbs_update_set={"status": "'S'"},
        nmbs_update_condition="target.status = 'open'",
        nmbs_delete_condition="target.status = 'stale'",
    )
    sql_state = {
        (r["pk"], r["v"], r["status"]) for r in spark.sql(sql).collect()
    }
    assert sql_state == executor_state
    # sanity on the content itself
    assert (1, 11, "open") in sql_state       # conditional update
    assert (3, 30, "S") not in sql_state      # matched row: NMBS untouched
    assert (3, 30, "open") in sql_state       # NULL update cond -> kept as-is
    assert (4, 40, "S") in sql_state          # NMBS soft flag
    assert not any(p == 2 or p == 5 for p, _, _ in sql_state)  # deletes
    assert (7, 70, "open") in sql_state       # conditional insert
    assert not any(p == 8 for p, _, _ in sql_state)


def test_generic_merge_sql_schema_evolution_modifier():
    from data_ingestion_framework_spark.sinks.merge_sql import (
        generic_merge_sql,
    )

    sql = generic_merge_sql(
        "t", ["pk"], update_set={"v": "source.v"}, schema_evolution=True
    )
    assert sql.startswith("MERGE WITH SCHEMA EVOLUTION INTO t AS target")
    assert "WITH SCHEMA EVOLUTION" not in generic_merge_sql(
        "t", ["pk"], update_set={"v": "source.v"}
    )
