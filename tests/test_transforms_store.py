from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_ingestion_framework_spark.functions.hashes import with_hash_keys
from data_ingestion_framework_spark.operators import transforms as tr
from data_ingestion_framework_spark.sources import ParquetTable


def _df(spark):
    return spark.createDataFrame(
        [Row(**{"A Col": 1, "b/col": "x", "C": "7"}), Row(**{"A Col": 2, "b/col": "y", "C": "8"})]
    )


def test_normalize_and_lower(spark):
    df = tr.normalize_column_names(_df(spark))
    assert df.columns == ["A_Col", "b_col", "C"]
    assert tr.columns_to_lower(df).columns == ["a_col", "b_col", "c"]


def test_transform_queue(spark):
    steps = [
        {"type": "normalize_cols"},
        {"type": "column_names_to_lower"},
        {"type": "cast", "casts": {"c": "int"}},
        {"type": "rename", "mapping": {"c": "c_int"}},
        {"type": "where", "predicate": "c_int > 7"},
        {"type": "select", "columns": ["a_col", "c_int"]},
    ]
    out = tr.apply_transformations(_df(spark), steps)
    assert out.columns == ["a_col", "c_int"]
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["c_int"] == 8


def test_sql_and_expr_transforms(spark):
    df = spark.createDataFrame([Row(x=1), Row(x=2)])
    out = tr.sql_transform(df, "SELECT x * 10 AS x10 FROM {{table_view}}")
    assert sorted(r["x10"] for r in out.collect()) == [10, 20]
    out2 = tr.with_column_expr(df, "y", "x + 1")
    assert sorted(r["y"] for r in out2.collect()) == [2, 3]


def test_py_function_registry(spark):
    df = spark.createDataFrame([Row(x=1)])

    def double_col(d, column):
        return d.withColumn(column, F.col(column) * 2)

    out = tr.apply_transformations(
        df, [{"type": "py", "fn": "double_col", "column": "x"}],
        user_functions={"double_col": double_col},
    )
    assert out.collect()[0]["x"] == 2


def test_hash_keys_stable_and_null_canon(spark):
    df = spark.createDataFrame(
        [Row(pk=1, a="x", b=1.5), Row(pk=1, a="x", b=1.5), Row(pk=2, a=None, b=None)]
    )
    out = with_hash_keys(df, ["pk"]).collect()
    assert out[0]["hdiff"] == out[1]["hdiff"]
    assert out[0]["hkey"] == out[1]["hkey"]
    assert out[2]["hkey"] != out[0]["hkey"]


def test_hash_null_shift_does_not_collide(spark):
    """concat_ws skips NULLs, so without a NULL sentinel ('a', NULL) and
    (NULL, 'a') would hash identically — a missed update in change
    detection."""
    df = spark.createDataFrame(
        [Row(pk=1, a="x", b=None), Row(pk=1, a=None, b="x")],
        "pk int, a string, b string",
    )
    out = with_hash_keys(df, ["pk"]).collect()
    assert out[0]["hdiff"] != out[1]["hdiff"]


def test_parquet_table_roundtrip(spark, tmp_table_path):
    t = ParquetTable(spark, tmp_table_path)
    assert not t.exists()
    df = spark.createDataFrame([Row(a=1), Row(a=2)])
    t.overwrite(df)
    assert t.exists() and t.read().count() == 2
    t.append(spark.createDataFrame([Row(a=3)]))
    assert t.read().count() == 3


def test_parquet_table_overwrite_from_self(spark, tmp_table_path):
    """The merge-commit pattern: new state derived from the current read."""
    t = ParquetTable(spark, tmp_table_path)
    t.overwrite(spark.createDataFrame([Row(a=i) for i in range(10)]))
    new_state = t.read().where(F.col("a") < 5)
    t.overwrite(new_state)
    assert sorted(r["a"] for r in t.read().collect()) == [0, 1, 2, 3, 4]


def test_parquet_table_create_empty(spark, tmp_table_path):
    t = ParquetTable(spark, tmp_table_path)
    t.create_empty("a int, b string")
    assert t.exists() and t.read().count() == 0
    t.create_empty("a int, b string")  # idempotent
    assert t.read().columns == ["a", "b"]


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_read_batch_formats(spark, tmp_path, fmt):
    from data_ingestion_framework_spark.sources import read_batch

    df = spark.createDataFrame([Row(a=1, b="x")])
    path = str(tmp_path / fmt)
    writer = df.write.format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)
    opts = {"header": "true", "inferSchema": "true"} if fmt == "csv" else {}
    out = read_batch(spark, path, fmt, opts)
    assert out.count() == 1


def test_control_columns(spark, tmp_path):
    from data_ingestion_framework_spark.sources import CONTROL_COLUMNS, read_parquet

    df = spark.createDataFrame([Row(a=1)])
    path = str(tmp_path / "cc")
    df.write.parquet(path)
    out = read_parquet(spark, path)
    for c in CONTROL_COLUMNS:
        assert c in out.columns
    row = out.collect()[0]
    assert row["file_path"].startswith("file:")
    assert row["is_current"] == 1 and row["delete_time"] is None


def test_read_text_line_and_whole_file_modes(spark, tmp_path):
    """Raw-text corpus reader: one row per line by default, one row
    per FILE with whole_file=True (the per-document shape), with the
    provenance control columns stamped in both modes."""
    import os

    from data_ingestion_framework_spark.sources.batch import read_text

    d = str(tmp_path / "txt")
    os.makedirs(d)
    with open(f"{d}/a.txt", "w") as f:
        f.write("first line\nsecond line\n")
    with open(f"{d}/b.txt", "w") as f:
        f.write("solo doc body\n")

    lines = read_text(spark, d)
    assert lines.count() == 3
    assert {"value", "file_path"} <= set(lines.columns)

    docs = read_text(spark, d, whole_file=True)
    rows = sorted(
        (os.path.basename(r["file_path"]), r["value"]) for r in docs.collect()
    )
    assert [b for b, _ in rows] == ["a.txt", "b.txt"]
    assert rows[0][1] == "first line\nsecond line\n"
    assert rows[1][1] == "solo doc body\n"


# -- type widening -----------------------------------------------------------


def test_append_type_widening_reads_uniformly_wide(spark, tmp_path):
    """int->long / float->double appends (Delta type widening): old
    narrow files up-cast in the reader; a plain footer read would fail
    with PARQUET_COLUMN_DATA_TYPE_MISMATCH."""
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "w"))
    t.overwrite(spark.createDataFrame([(1, 1.5)], "a int, b float"))
    wide = spark.createDataFrame([(1 << 40, 2.5)], "a long, b double")
    with pytest.raises(ValueError, match="widens"):
        t.append(wide)  # enforcement without merge_schema
    t.append(wide, merge_schema=True)
    out = t.read()
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "double"
    ]
    assert sorted(r["a"] for r in out.collect()) == [1, 1 << 40]
    # time travel up-casts the pre-widening snapshot too
    assert t.as_of(t.history()[0]["seq"]).schema == out.schema
    # file-scoped COW statements keep working on the widened table
    t.delete_where(F.col("a") == 1)
    assert [r["a"] for r in t.read().collect()] == [1 << 40]


def test_append_incompatible_type_rejected(spark, tmp_path):
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "n"))
    t.overwrite(spark.createDataFrame([(1 << 40,)], "a long"))
    # a NARROWER batch coerces up to the stored type (Delta input
    # coercion) — no merge_schema needed, and no narrow file lands
    t.append(spark.createDataFrame([(1,)], "a int"))
    assert dict(t.read().dtypes)["a"] == "bigint"
    assert sorted(r["a"] for r in t.read().collect()) == [1, 1 << 40]
    with pytest.raises(ValueError, match="not a\\s+supported widening"):
        t.append(spark.createDataFrame([("x",)], "a string"), merge_schema=True)


def test_widened_schema_grows_with_added_columns_and_clears_on_overwrite(
    spark, tmp_path
):
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "g"))
    t.overwrite(spark.createDataFrame([(1,)], "a int"))
    t.append(spark.createDataFrame([(2 << 40,)], "a long"), merge_schema=True)
    # an added column after widening must join the pinned read schema
    t.append(
        spark.createDataFrame([(3, "x")], "a long, c string"),
        merge_schema=True,
    )
    out = t.read()
    assert set(out.columns) == {"a", "c"}
    assert dict(out.dtypes)["a"] == "bigint"
    got = {r["a"]: r["c"] for r in out.collect()}
    assert got == {1: None, 2 << 40: None, 3: "x"}
    # overwrite resets the schema: the pin must not linger
    t.overwrite(spark.createDataFrame([(5,)], "a int"))
    assert dict(t.read().dtypes)["a"] == "int"


# -- Python DataSource (format "difs") ----------------------------------------


def test_difs_datasource_matches_table_read(spark, tmp_path):
    """spark.read.format('difs') — the Spark 4 Python DataSource over
    the table store: live scan parity, strict_files isolation, VERSION
    AS OF, and deletion-vector masking, all without importing the
    package's read path."""
    from data_ingestion_framework_spark.sources.pyds import (
        ParquetTableDataSource,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    spark.dataSource.register(ParquetTableDataSource)
    p = str(tmp_path / "t")
    t = ParquetTable(spark, p)
    t.overwrite(spark.createDataFrame([(i, float(i)) for i in range(20)], "k long, v double"))
    v1 = t.history()[-1]["seq"]
    t.append(spark.createDataFrame([(i, float(i)) for i in range(20, 25)], "k long, v double"))

    def difs(**opts):
        r = spark.read.format("difs").option("path", p)
        for k_, v_ in opts.items():
            r = r.option(k_, v_)
        return r.load()

    assert sorted(r["k"] for r in difs().collect()) == list(range(25))
    # VERSION AS OF resolves the old commit's file list
    assert sorted(r["k"] for r in difs(version=v1).collect()) == list(range(20))

    # deletion vectors mask rows without rewriting files
    t.delete_where_dv(F.col("k") % 4 == 0)
    got = sorted(r["k"] for r in difs().collect())
    assert got == [k for k in range(25) if k % 4 != 0]
    assert sorted(r["k"] for r in t.read().collect()) == got  # parity

    # strict_files: a stray uncommitted file is invisible
    t2 = ParquetTable(spark, str(tmp_path / "s"))
    t2.set_properties({"strict_files": True})
    t2.append(spark.createDataFrame([(1,)], "k long"))
    import shutil, glob
    live = glob.glob(str(tmp_path / "s" / "*.parquet"))[0]
    shutil.copy(live, str(tmp_path / "s" / "part-stray.parquet"))
    out = spark.read.format("difs").option("path", str(tmp_path / "s")).load()
    assert out.count() == 1


def test_difs_datasource_refuses_partitioned(spark, tmp_path):
    from data_ingestion_framework_spark.sources.pyds import (
        ParquetTableDataSource,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    spark.dataSource.register(ParquetTableDataSource)
    t = ParquetTable(spark, str(tmp_path / "pt"), partition_by=["p"])
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, p string"))
    with pytest.raises(Exception, match="partitioned|ParquetTable.read"):
        spark.read.format("difs").option("path", t.path).load().collect()


def test_difs_stream_reader_replays_appends(spark, tmp_path):
    """readStream.format('difs'): commit-log appends arrive as
    micro-batches with commit-seq offsets; a non-additive commit in
    range fails the stream loudly."""
    from data_ingestion_framework_spark.sources.pyds import (
        ParquetTableDataSource,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    spark.dataSource.register(ParquetTableDataSource)
    p = str(tmp_path / "st")
    t = ParquetTable(spark, p)
    for i in range(3):
        t.append(spark.createDataFrame([(i * 10 + j,) for j in range(4)], "k long"))
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("difs")
        .option("path", p)
        .load()
        .writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == sorted(
        i * 10 + j for i in range(3) for j in range(4)
    )
    # new appends continue from the checkpointed offset, exactly once
    t.append(spark.createDataFrame([(99,)], "k long"))
    q = (
        spark.readStream.format("difs")
        .option("path", p)
        .load()
        .writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got.count(99) == 1 and len(got) == 13


def test_difs_datasource_write_appends_through_the_log(spark, tmp_path):
    """df.write.format('difs'): executor tasks stage dot-prefixed
    in-flight files, the driver commit publishes them + ONE log record
    — readable back by both the store and the difs reader."""
    from data_ingestion_framework_spark.sources.pyds import (
        ParquetTableDataSource,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    spark.dataSource.register(ParquetTableDataSource)
    p = str(tmp_path / "w")
    t = ParquetTable(spark, p)
    t.overwrite(spark.createDataFrame([(0, "seed")], "k long, s string"))
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(1, 9)], "k long, s string"
    ).repartition(3).write.format("difs").option("path", p).mode(
        "append"
    ).save()
    assert sorted(r["k"] for r in t.read().collect()) == list(range(9))
    hist = t.history()
    assert hist[-1]["op"] == "append" and hist[-1]["rows_written"] == 8
    assert hist[-1]["metrics"]["writer"] == "difs-datasource"
    # no in-flight litter
    import os as _os

    assert not [f for f in _os.listdir(p) if f.startswith(".inflight")]
    got = (
        spark.read.format("difs").option("path", p).load().count()
    )
    assert got == 9
    # overwrite mode refused
    import pytest as _pt

    with _pt.raises(Exception, match="append.*only|ParquetTable.overwrite"):
        spark.createDataFrame([(9, "x")], "k long, s string").write.format(
            "difs"
        ).option("path", p).mode("overwrite").save()


def test_difs_writer_refuses_unsupported_tables_and_schema_drift(
    spark, tmp_path
):
    """The difs sink bypasses the store's column-mapping rewrite,
    CHECK-constraint gate, and schema evolution — each such target (and
    any batch whose schema drifts from the table's) must refuse at plan
    time, never commit silently."""
    from data_ingestion_framework_spark.sources.pyds import (
        ParquetTableDataSource,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    spark.dataSource.register(ParquetTableDataSource)

    def _write(df, path, **_):
        df.write.format("difs").option("path", path).mode("append").save()

    # CHECK constraint
    tc = ParquetTable(spark, str(tmp_path / "c"))
    tc.overwrite(spark.createDataFrame([(1,)], "k long"))
    tc.add_check_constraint("k_pos", "k > 0")
    with pytest.raises(Exception, match="constraint"):
        _write(spark.createDataFrame([(-5,)], "k long"), tc.path)
    assert tc.read().count() == 1

    # schema drift (type differs) — refused, not silently committed
    td = ParquetTable(spark, str(tmp_path / "d"))
    td.overwrite(spark.createDataFrame([(1, "a")], "k long, s string"))
    with pytest.raises(Exception, match="schema"):
        _write(spark.createDataFrame([(2, 3.0)], "k long, s double"), td.path)
    assert td.read().count() == 1 and td.history()[-1]["op"] == "overwrite"

    # schema-evolved table (mixed footers): writer AND reader refuse
    te = ParquetTable(spark, str(tmp_path / "e"))
    te.overwrite(spark.createDataFrame([(1, "a")], "k long, s string"))
    te.append(
        spark.createDataFrame([(2, "b", 1.0)], "k long, s string, x double"),
        merge_schema=True,
    )
    with pytest.raises(Exception, match="schema-evolved|ParquetTable"):
        _write(
            spark.createDataFrame([(3, "c", 2.0)], "k long, s string, x double"),
            te.path,
        )
    with pytest.raises(Exception, match="schema-evolved|ParquetTable"):
        spark.read.format("difs").option("path", te.path).load().collect()


def test_difs_writer_commit_never_launders_stray_files(spark, tmp_path):
    """The commit record's file list is previous-commit ∪ this write's
    renamed files — a crashed writer's stray part file in the directory
    must NOT enter a strict_files table's log through a difs commit."""
    import glob
    import shutil

    from data_ingestion_framework_spark.sources.pyds import (
        ParquetTableDataSource,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    spark.dataSource.register(ParquetTableDataSource)
    p = str(tmp_path / "s")
    t = ParquetTable(spark, p)
    t.set_properties({"strict_files": True})
    t.append(spark.createDataFrame([(1,)], "k long"))
    live = glob.glob(p + "/*.parquet")[0]
    shutil.copy(live, p + "/part-stray-crashed-writer.parquet")
    spark.createDataFrame([(2,)], "k long").coalesce(1).write.format(
        "difs"
    ).option("path", p).mode("append").save()
    rec = t.history()[-1]
    assert "part-stray-crashed-writer.parquet" not in rec["files"]
    assert rec["rows_written"] == 1
    # the strict read honors the log: stray row invisible
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2]


def test_difs_reader_filter_pushdown_prunes_files(spark, tmp_path):
    """Spark 4.1 Python-DataSource pushFilters: footer min/max stats
    prune whole files driver-side, Arrow masks filter batches executor-
    side, and Spark still re-applies every filter — results are
    byte-identical with and without pruning, including under DVs."""
    from data_ingestion_framework_spark.sources.pyds import (
        ParquetTableDataSource,
        ParquetTableReader,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    spark.dataSource.register(ParquetTableDataSource)
    p = str(tmp_path / "t")
    t = ParquetTable(spark, p)
    # three files with disjoint key ranges
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame(
                [(lo + i, f"v{lo + i}") for i in range(50)], "k long, s string"
            ).coalesce(1)
        )
    # deletion vectors interact with batch masks: drop every k % 10 == 0
    t.delete_where_dv(F.col("k") % 10 == 0)

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")

    def q(pred):
        return (
            spark.read.format("difs")
            .option("path", p)
            .option("pushdown", "true")
            .load()
            .where(pred)
        )

    expected = sorted(
        r["k"] for r in t.read().where("k > 220 OR k = 105").collect()
    )
    got = sorted(r["k"] for r in q("k > 220 OR k = 105").collect())
    assert got == expected and len(got) > 0

    # file pruning provable at the planner level: a reader fed the
    # filter keeps only the matching file's partition
    from pyspark.sql.datasource import GreaterThan

    from data_ingestion_framework_spark.sources.pyds import (
        ParquetTablePushdownReader,
    )

    r = ParquetTablePushdownReader({"path": p})
    assert len(r.partitions()) == 3
    leftover = list(r.pushFilters([GreaterThan(("k",), 210)]))
    assert len(leftover) == 1  # every filter handed back to Spark
    assert len(r.partitions()) == 1

    # equality + IN prune too; impossible predicates prune everything
    from pyspark.sql.datasource import EqualTo, In

    r2 = ParquetTablePushdownReader({"path": p})
    r2.pushFilters([EqualTo(("k",), 130)])
    assert len(r2.partitions()) == 1
    r3 = ParquetTablePushdownReader({"path": p})
    r3.pushFilters([In(("k",), (5, 205))])
    assert len(r3.partitions()) == 2
    r4 = ParquetTablePushdownReader({"path": p})
    r4.pushFilters([GreaterThan(("k",), 10_000)])
    assert len(r4.partitions()) == 0
    # correctness at the SQL layer for each shape (130 is DV-deleted —
    # the equality filter composes with the deletion-vector mask)
    assert q("k = 130").count() == 0
    assert {x["k"] for x in q("k = 131").collect()} == {131}
    assert {x["k"] for x in q("k in (5, 205)").collect()} == {5, 205}
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
    # without the option the default reader has NO pushFilters — a
    # vanilla session (conf off) keeps working
    plain = spark.read.format("difs").option("path", p).load().where("k = 131")
    assert {x["k"] for x in plain.collect()} == {131}


def test_difs_stream_writer_exactly_once(spark, tmp_path):
    """writeStream.format('difs'): each micro-batch appends through the
    commit log with (stream_query_id, stream_batch_id) — Delta's
    txnAppId+txnVersion discipline. A restart of the SAME query (same
    checkpoint) publishes nothing for a replayed batch id, while a
    SECOND query (fresh checkpoint, batch ids restarting at 0) writing
    to the same table appends normally instead of colliding with the
    first query's ledger and silently dropping its batches."""
    from data_ingestion_framework_spark.sources.pyds import (
        ParquetTableDataSource,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    spark.dataSource.register(ParquetTableDataSource)
    src = str(tmp_path / "in")
    spark.createDataFrame([(i,) for i in range(8)], "k long").write.parquet(src)
    dest = str(tmp_path / "t")

    def run(ck):
        q = (
            spark.readStream.schema("k long")
            .parquet(src)
            .writeStream.format("difs")
            .option("path", dest)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run("ck1")
    t = ParquetTable(spark, dest)
    assert sorted(r["k"] for r in t.read().collect()) == list(range(8))
    rec = t.history()[-1]
    assert rec["op"] == "append" and rec["metrics"]["stream_batch_id"] == 0
    qid1 = rec["metrics"]["stream_query_id"]
    # restart the SAME query (same checkpoint): no new data → no batch,
    # table unchanged
    run("ck1")
    assert t.read().count() == 8
    assert len([r for r in t.history() if r["op"] == "append"]) == 1
    # a DIFFERENT query (fresh checkpoint) re-reads the source and its
    # batch 0 must NOT be swallowed by query 1's ledger entry
    run("ck2")
    assert t.read().count() == 16
    appends = [r for r in t.history() if r["op"] == "append"]
    assert len(appends) == 2
    assert appends[-1]["metrics"]["stream_batch_id"] == 0
    assert appends[-1]["metrics"]["stream_query_id"] != qid1
    # a difs batch read sees the streamed rows through the log
    got = spark.read.format("difs").option("path", dest).load().count()
    assert got == 16
    import os as _os

    assert not [f for f in _os.listdir(dest) if f.startswith(".inflight")]


def test_difs_stream_writer_replay_same_query(spark, tmp_path):
    """Ledger unit semantics: the SAME query id replaying a batch id is
    dropped; a different query id with the same batch id publishes; a
    legacy record carrying only stream_batch_id (pre-query-id log) is
    treated as this query's — the one-query-per-table contract those
    logs were written under."""
    import json
    import os

    from data_ingestion_framework_spark.sources.pyds import (
        LOG,
        ParquetTableStreamWriter,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    p = str(tmp_path / "t")
    ParquetTable(spark, p).append(spark.createDataFrame([(1,)], "k long"))

    wa = ParquetTableStreamWriter(
        {"path": p, "checkpointlocation": str(tmp_path / "ckA")}, False
    )
    wa.commit([], 0)
    n_appends = lambda: len(
        [r for r in ParquetTable(spark, p).history() if r["op"] == "append"]
    )
    base = n_appends()
    wa.commit([], 0)  # same query, same batch → replay, no record
    assert n_appends() == base
    wb = ParquetTableStreamWriter(
        {"path": p, "checkpointlocation": str(tmp_path / "ckB")}, False
    )
    wb.commit([], 0)  # different query, same batch id → publishes
    assert n_appends() == base + 1
    # legacy record (no stream_query_id): hand-stamp one, then ANY
    # query replaying that batch id treats it as its own
    recs = sorted(os.listdir(os.path.join(p, LOG)))
    last = json.load(open(os.path.join(p, LOG, recs[-1])))
    seq = last["seq"] + 1
    legacy = dict(last, seq=seq, metrics={"stream_batch_id": 77})
    with open(os.path.join(p, LOG, f"{seq:08d}.json"), "w") as f:
        json.dump(legacy, f)
    wb.commit([], 77)
    assert n_appends() == base + 2  # legacy row absorbed the replay


def test_difs_writer_refuses_column_reorder(spark, tmp_path):
    """_validate_schema is ORDERED: identical names/types in a different
    column order must fail at plan time — the difs reader pins the
    table schema from files[0]'s arrow field order, so a reordered
    commit would break later reads at executor time."""
    import pytest

    from data_ingestion_framework_spark.sources.pyds import (
        ParquetTableDataSource,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    spark.dataSource.register(ParquetTableDataSource)
    p = str(tmp_path / "t")
    ParquetTable(spark, p).append(
        spark.createDataFrame([(1, "a")], "k long, s string")
    )
    reordered = spark.createDataFrame([("b", 2)], "s string, k long")
    with pytest.raises(Exception, match="COLUMN ORDER|does not match"):
        reordered.write.format("difs").option("path", p).mode("append").save()
    # aligned order still appends
    spark.createDataFrame([(2, "b")], "k long, s string").write.format(
        "difs"
    ).option("path", p).mode("append").save()
    assert spark.read.format("difs").option("path", p).load().count() == 2


def test_difs_stream_reader_stops_on_midstream_evolution(spark, tmp_path):
    """add_column is file-neutral (passes the _ADDITIVE check), but a
    table evolved AFTER the stream starts must stop with the plan-time
    refusal at the next trigger, not an executor-side arrow mismatch."""
    import pytest

    from data_ingestion_framework_spark.sources.pyds import (
        ParquetTableStreamReader,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    p = str(tmp_path / "t")
    t = ParquetTable(spark, p)
    t.append(spark.createDataFrame([(1,)], "k long"))
    r = ParquetTableStreamReader({"path": p})
    assert r.latestOffset()["seq"] == 1
    t.add_column("extra", "string", default=None)
    with pytest.raises(ValueError, match="difs stream"):
        r.latestOffset()


def test_difs_pushdown_never_prunes_on_string_stats(spark, tmp_path):
    """Parquet string min/max can be truncated — string predicates must
    not prune files (batch-side filtering stays exact)."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    from data_ingestion_framework_spark.sources.pyds import (
        ParquetTablePushdownReader,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    p = str(tmp_path / "t")
    t = ParquetTable(spark, p)
    t.append(
        spark.createDataFrame(
            [(i, "z" * 200 + str(i)) for i in range(5)], "k long, s string"
        ).coalesce(1)
    )
    r = ParquetTablePushdownReader({"path": p})
    r.pushFilters([EqualTo(("s",), "zzz-not-present")])
    assert len(r.partitions()) == 1  # string filters never prune files
    r2 = ParquetTablePushdownReader({"path": p})
    r2.pushFilters([GreaterThan(("k",), 100)])
    assert len(r2.partitions()) == 0  # numeric pruning still works


def test_difs_stream_reader_max_commits_per_trigger(spark, tmp_path):
    """Rate limiting: latestOffset advances at most maxCommitsPerTrigger
    commits past the reader's frontier, so a backlogged table drains in
    bounded micro-batches; without the option one trigger swallows the
    whole backlog. Driven unit-style (the engine calls exactly this
    initialOffset -> latestOffset -> partitions sequence per trigger)."""
    from data_ingestion_framework_spark.sources.pyds import (
        ParquetTableStreamReader,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    p = str(tmp_path / "t")
    t = ParquetTable(spark, p)
    for i in range(5):
        t.append(spark.createDataFrame([(i,)], "k long").coalesce(1))
    r = ParquetTableStreamReader({"path": p, "maxcommitspertrigger": "2"})
    assert r.initialOffset() == {"seq": 0}
    o1 = r.latestOffset()
    assert o1 == {"seq": 2}
    assert len(r.partitions({"seq": 0}, o1)) == 2  # one file per commit
    o2 = r.latestOffset()
    assert o2 == {"seq": 4}
    o3 = r.latestOffset()
    assert o3 == {"seq": 5}  # backlog drained: clamps to the true head
    assert r.latestOffset() == {"seq": 5}  # idle: no phantom advance
    # restart replaying a recovered batch: partitions() before any
    # latestOffset seeds the frontier, and the next trigger caps from it
    r2 = ParquetTableStreamReader({"path": p, "maxcommitspertrigger": "1"})
    t.append(spark.createDataFrame([(9,)], "k long").coalesce(1))
    t.append(spark.createDataFrame([(10,)], "k long").coalesce(1))
    r2.partitions({"seq": 3}, {"seq": 5})  # recovered batch
    assert r2.latestOffset() == {"seq": 6}
    assert r2.latestOffset() == {"seq": 7}
    # uncapped reader still jumps straight to the head
    r3 = ParquetTableStreamReader({"path": p})
    assert r3.initialOffset() == {"seq": 0}
    assert r3.latestOffset() == {"seq": 7}
    import pytest

    with pytest.raises(ValueError, match="maxCommitsPerTrigger"):
        ParquetTableStreamReader({"path": p, "maxcommitspertrigger": "0"})
