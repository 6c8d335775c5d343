"""Writer-layer tests: mode dispatch, ordered source-dir replay, and
the IE dual-target (current + history) merge with a delete feed
(FIXTURES.md F2)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_ingestion_framework_spark.sinks.writers import (
    batch_write,
    ie_dual_target_merge,
    ordered_base_paths,
)
from data_ingestion_framework_spark.sources.tablestore import ParquetTable

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 1, 2)
T2 = dt.datetime(2024, 1, 3)


def _df(spark, rows):
    return spark.createDataFrame(rows, "pk int, val string, mtime timestamp")


def test_batch_write_modes(spark, tmp_table_path):
    t = ParquetTable(spark, tmp_table_path)
    batch_write(_df(spark, [Row(pk=1, val="a", mtime=T0)]), t, mode="append")
    batch_write(_df(spark, [Row(pk=1, val="a", mtime=T0)]), t, mode="append")
    assert t.read().count() == 2
    batch_write(
        _df(spark, [Row(pk=1, val="x", mtime=T0), Row(pk=1, val="y", mtime=T1)]),
        t, mode="overwrite", key_cols=["pk"], order_col="mtime",
    )
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["val"] == "y"  # window-deduped overwrite
    batch_write(
        _df(spark, [Row(pk=2, val="b", mtime=T2)]),
        t, mode="merge", key_cols=["pk"], order_col="mtime",
    )
    assert {r["pk"] for r in t.read().collect()} == {1, 2}


def test_ordered_base_paths(spark, tmp_path):
    for i, (d, ts) in enumerate([("b", T1), ("a", T0), ("c", T2)]):
        spark.createDataFrame(
            [Row(pk=i, val=d, mtime=ts)], "pk int, val string, mtime timestamp"
        ).write.mode("overwrite").parquet(f"{tmp_path}/land/{d}")
    df = spark.read.parquet(f"{tmp_path}/land/*").select(
        "*",
        F.col("_metadata.file_path").alias("file_path"),
        F.col("mtime").alias("file_modification_time"),
    )
    paths = ordered_base_paths(df)
    assert [p.rsplit("/", 1)[-1] for p in paths] == ["a", "b", "c"]


def test_ie_dual_target_merge_with_delete_feed(spark, tmp_path):
    cur = ParquetTable(spark, f"{tmp_path}/cur")
    hist = ParquetTable(spark, f"{tmp_path}/hist")

    # day 1: initial load
    ie_dual_target_merge(cur, hist, _df(spark, [
        Row(pk=1, val="a", mtime=T0), Row(pk=2, val="b", mtime=T0),
    ]), ["pk"], "mtime")
    assert {r["pk"] for r in cur.read().collect()} == {1, 2}

    # day 2: pk1 updated; pk2 deleted via feed
    ie_dual_target_merge(
        cur, hist,
        _df(spark, [Row(pk=1, val="a2", mtime=T1)]),
        ["pk"], "mtime",
        delete_feed=_df(spark, [Row(pk=2, val="b", mtime=T1)]),
        deleted_at=T1,
    )
    # current: pk2 hard-deleted, pk1 latest
    got = {r["pk"]: r["val"] for r in cur.read().collect()}
    assert got == {1: "a2"}
    # history: pk1 two versions; pk2 soft-deleted with delete_time
    h = hist.read().collect()
    pk1 = sorted([r for r in h if r["pk"] == 1], key=lambda r: r["start_time"])
    assert [(r["val"], r["is_current"]) for r in pk1] == [("a", 0), ("a2", 1)]
    pk2 = [r for r in h if r["pk"] == 2]
    assert len(pk2) == 1 and pk2[0]["delete_time"] == T1 and pk2[0]["is_current"] == 0

    # day 3: pk2 resurrected
    ie_dual_target_merge(cur, hist, _df(spark, [
        Row(pk=2, val="b2", mtime=T2),
    ]), ["pk"], "mtime")
    assert {r["pk"]: r["val"] for r in cur.read().collect()} == {1: "a2", 2: "b2"}
    pk2 = sorted(
        [r for r in hist.read().collect() if r["pk"] == 2],
        key=lambda r: r["start_time"],
    )
    assert pk2[-1]["val"] == "b2" and pk2[-1]["is_current"] == 1
