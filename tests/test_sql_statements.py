"""The Delta-style SQL statement surface (sources/sql_statements.py):
operational SQL runs verbatim against the path-backed store."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_ingestion_framework_spark.sources.sql_statements import (
    execute_statement,
)
from data_ingestion_framework_spark.sources.tablestore import ParquetTable


@pytest.fixture
def t(spark, tmp_path):
    tbl = ParquetTable(spark, str(tmp_path / "t"))
    tbl.overwrite(
        spark.createDataFrame(
            [Row(k=i, status="O" if i % 2 else "F", v=float(i)) for i in range(10)]
        )
    )
    return tbl


def _ks(tbl):
    return sorted(r["k"] for r in tbl.read().collect())


def test_delete_update_insert_truncate(spark, t):
    r = execute_statement(spark, "DELETE FROM t WHERE k >= 8", {"t": t})
    assert r["rows_deleted"] == 2 and _ks(t) == list(range(8))
    r = execute_statement(
        spark, "UPDATE t SET v = v * 10, status = 'U' WHERE k < 2", {"t": t}
    )
    assert r["rows_updated"] == 2
    got = {x["k"]: (x["v"], x["status"]) for x in t.read().collect()}
    assert got[0] == (0.0, "U") and got[1] == (10.0, "U") and got[2] == (2.0, "F")
    execute_statement(
        spark,
        "INSERT INTO t SELECT 99 AS k, 'N' AS status, CAST(1.0 AS DOUBLE) AS v",
        {"t": t},
    )
    assert 99 in _ks(t)
    execute_statement(spark, "TRUNCATE TABLE t", {"t": t})
    assert _ks(t) == []


def test_maintenance_statements(spark, t):
    execute_statement(spark, "OPTIMIZE t ZORDER BY (k, v)", {"t": t})
    assert t.history()[-1]["op"] in ("compact", "optimize", "zorder")
    execute_statement(spark, "DELETE FROM t WHERE k = 0", {"t": t})
    dry = execute_statement(spark, "VACUUM t RETAIN 1 COMMITS DRY RUN", {"t": t})
    assert dry["dry_run"] and isinstance(dry["candidates"], list)
    r = execute_statement(spark, "VACUUM t RETAIN 1 COMMITS", {"t": t})
    assert r["snapshots_removed"] >= 1


def test_restore_and_time_travel_select(spark, t):
    good = t.history()[-1]["seq"]
    execute_statement(spark, "DELETE FROM t WHERE k < 9", {"t": t})
    assert _ks(t) == [9]
    out = execute_statement(
        spark, f"SELECT count(*) AS n FROM t VERSION AS OF {good}", {"t": t}
    ).collect()
    assert out[0]["n"] == 10
    execute_statement(
        spark, f"RESTORE TABLE t TO VERSION AS OF {good}", {"t": t}
    )
    assert _ks(t) == list(range(10))


def test_alter_table_and_describe(spark, t):
    execute_statement(spark, "ALTER TABLE t RENAME COLUMN v TO val", {"t": t})
    assert "val" in t.read().columns
    execute_statement(
        spark, "ALTER TABLE t ADD CONSTRAINT pos CHECK (val >= 0)", {"t": t}
    )
    with pytest.raises(Exception, match="pos"):
        t.append(spark.createDataFrame([Row(k=1, status="O", val=-5.0)]))
    execute_statement(spark, "ALTER TABLE t DROP CONSTRAINT pos", {"t": t})
    execute_statement(
        spark, "ALTER TABLE t SET PARTITION SPEC (status)", {"t": t}
    )
    assert t.partition_by == ["status"]
    hist = execute_statement(spark, "DESCRIBE HISTORY t", {"t": t})
    ops = [r["operation"] for r in hist.collect()]
    assert ops[0] == "overwrite" and "set_partition_spec" in ops
    detail = execute_statement(spark, "DESCRIBE DETAIL t", {"t": t}).collect()
    assert len(detail) == 1


def test_copy_into_statement(spark, t, tmp_path):
    land = str(tmp_path / "land")
    spark.createDataFrame([Row(k=50, status="L", v=0.5)]).coalesce(1).write.parquet(
        land + "/d1"
    )
    r = execute_statement(
        spark, f"COPY INTO t FROM '{land}' PATTERN = '*.parquet'", {"t": t}
    )
    assert r["files_loaded"] == 1 and 50 in _ks(t)
    r2 = execute_statement(
        spark, f"COPY INTO t FROM '{land}' PATTERN = '*.parquet'", {"t": t}
    )
    assert r2["files_loaded"] == 0


def test_unknown_statement_raises(spark, t):
    with pytest.raises(ValueError, match="unsupported statement"):
        execute_statement(spark, "GRANT ALL ON t TO someone", {"t": t})
    with pytest.raises(ValueError, match="unknown table"):
        execute_statement(spark, "DELETE FROM nope WHERE 1=1", {})


def test_merge_into_statement(spark, t):
    src = spark.createDataFrame(
        [
            Row(k=0, status="S", v=100.0),   # matched → update
            Row(k=1, status="S", v=-1.0),    # matched + cond → delete
            Row(k=42, status="S", v=7.0),    # not matched → insert
        ]
    )
    src.createOrReplaceTempView("src")
    metrics = execute_statement(
        spark,
        """
        MERGE INTO t USING src ON target.k = source.k
        WHEN MATCHED AND source.v < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = source.v, status = source.status
        WHEN NOT MATCHED THEN INSERT *
        """,
        {"t": t},
    )
    assert metrics["rows_deleted"] == 1
    assert metrics["rows_updated"] == 1
    assert metrics["rows_inserted"] == 1
    got = {r["k"]: (r["v"], r["status"]) for r in t.read().collect()}
    assert 1 not in got
    assert got[0] == (100.0, "S") and got[42] == (7.0, "S")
    assert got[2] == (2.0, "F")  # untouched


def test_merge_not_matched_by_source_statement(spark, t):
    spark.createDataFrame([Row(k=0)]).createOrReplaceTempView("keep")
    metrics = execute_statement(
        spark,
        """
        MERGE INTO t USING keep ON target.k = source.k
        WHEN NOT MATCHED BY SOURCE AND k >= 5 THEN DELETE
        """,
        {"t": t},
    )
    assert metrics["rows_deleted"] == 5
    assert _ks(t) == [0, 1, 2, 3, 4]


def test_merge_on_must_be_key_equalities(spark, t):
    spark.createDataFrame([Row(k=0)]).createOrReplaceTempView("s2")
    with pytest.raises(ValueError, match="conjunction"):
        execute_statement(
            spark,
            "MERGE INTO t USING s2 ON target.k > source.k WHEN MATCHED THEN DELETE",
            {"t": t},
        )


def test_execute_script_runs_statements_in_order(spark, t):
    from data_ingestion_framework_spark.sources.sql_statements import (
        execute_script,
    )

    out = execute_script(
        spark,
        """
        DELETE FROM t WHERE k >= 5;
        UPDATE t SET status = ';kept;' WHERE k = 0;
        SELECT count(*) AS n FROM t
        """,
        {"t": t},
    )
    assert out[0]["rows_deleted"] == 5
    assert out[2].collect()[0]["n"] == 5
    assert t.read().where("k = 0").collect()[0]["status"] == ";kept;"


def test_analyze_and_fsck_statements(spark, t, tmp_path):
    from data_ingestion_framework_spark.sources.sql_statements import (
        execute_statement,
    )

    stats = execute_statement(
        spark, "ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS k, v", {"t": t}
    )
    assert set(stats) >= {"k", "v"} or "columns" in stats or stats  # persisted
    assert t.properties().get("stats")  # TBLPROPERTIES analogue landed
    # plant an orphan (no commit references it), then FSCK
    import glob, shutil

    live = glob.glob(str(tmp_path / "t" / "*.parquet"))[0]
    shutil.copy(live, str(tmp_path / "t" / "part-orphan.parquet"))
    dry = execute_statement(spark, "FSCK REPAIR TABLE t DRY RUN", {"t": t})
    assert any("orphan" in o for o in dry["orphans"])
    r = execute_statement(spark, "FSCK REPAIR TABLE t", {"t": t})
    assert r["orphans_removed"] >= 1


def test_create_table_as_select(spark, tmp_path):
    """CTAS on the statement surface: quoted-path target, optional
    PARTITIONED BY, refuses existing targets."""
    from data_ingestion_framework_spark.sources.sql_statements import (
        execute_statement,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    src = ParquetTable(spark, str(tmp_path / "src"))
    src.overwrite(
        spark.createDataFrame(
            [(i, "ab"[i % 2]) for i in range(10)], "k bigint, g string"
        )
    )
    dest = str(tmp_path / "dest")
    out = execute_statement(
        spark,
        f"CREATE TABLE `{dest}` AS SELECT k, g FROM s WHERE k < 6",
        tables={"s": src},
    )
    assert out["rows_written"] == 6
    t = ParquetTable(spark, dest)
    assert t.history()[0]["op"] == "create"
    assert sorted(r["k"] for r in t.read().collect()) == list(range(6))
    import pytest as _pt

    with _pt.raises(ValueError, match="already exists"):
        execute_statement(
            spark, f"CREATE TABLE `{dest}` AS SELECT * FROM s", tables={"s": src}
        )
    # partitioned CTAS lays out by the named column
    dest2 = str(tmp_path / "dest2")
    execute_statement(
        spark,
        f"CREATE TABLE `{dest2}` PARTITIONED BY (g) AS SELECT k, g FROM s",
        tables={"s": src},
    )
    t2 = ParquetTable(spark, dest2)
    assert t2.read().count() == 10
    import os as _os

    assert any("g=" in d for d in _os.listdir(dest2))


def test_parse_default_literal_quotes_and_malformed():
    """DEFAULT literals: doubled quotes unescape ('it''s' -> it's),
    unterminated strings and non-literal junk RAISE instead of
    silently mis-parsing (advice: raw[1:-1] accepted 'abc as abc)."""
    import pytest

    from data_ingestion_framework_spark.sources.sql_statements import (
        _parse_default_literal,
    )

    assert _parse_default_literal("'it''s'") == "it's"
    assert _parse_default_literal('"say ""hi"""') == 'say "hi"'
    assert _parse_default_literal("'basic'") == "basic"
    assert _parse_default_literal("TRUE") is True
    assert _parse_default_literal("null") is None
    assert _parse_default_literal("3.5") == 3.5
    assert _parse_default_literal("-7") == -7
    for bad in ("'abc", "'a'x", "'", "abc", "1.2.3"):
        with pytest.raises(ValueError, match="malformed DEFAULT"):
            _parse_default_literal(bad)
