from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators import cdc


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(pk=pk, a=a, b=b) for pk, a, b in rows], "pk int, a string, b int"
    )


def test_find_delta_classification(spark):
    old = _df(spark, [(1, "x", 1), (2, "y", 2), (3, "z", 3)])
    new = _df(spark, [(2, "y", 2), (3, "z9", 3), (4, "w", 4)])
    out = {r["pk"]: r["change_type"] for r in cdc.find_delta(old, new, ["pk"]).collect()}
    assert out == {1: "delete", 2: "unchanged", 3: "update", 4: "insert"}


def test_brute_force_diff_flags(spark):
    old = _df(spark, [(1, "x", 1), (2, "y", 2)])
    new = _df(spark, [(1, "x", 9), (2, "y", 2)])
    rows = cdc.brute_force_diff(old, new, ["pk"]).collect()
    assert len(rows) == 1 and rows[0]["pk"] == 1
    assert rows[0]["a_diff"] == 0 and rows[0]["b_diff"] == 1


def test_brute_force_diff_null_safe(spark):
    old = spark.createDataFrame([Row(pk=1, a=None)], "pk int, a string")
    new = spark.createDataFrame([Row(pk=1, a=None)], "pk int, a string")
    assert cdc.brute_force_diff(old, new, ["pk"]).count() == 0


def test_cdc_transactions_splits(spark):
    df = spark.createDataFrame(
        [Row(pk=1, _op="insert"), Row(pk=2, _op="update"), Row(pk=3, _op="delete")]
    )
    tx = cdc.CDCTransactions(df, ["pk"])
    assert [r["pk"] for r in tx.get_inserts().collect()] == [1]
    assert [r["pk"] for r in tx.get_updates().collect()] == [2]
    assert [r["pk"] for r in tx.get_deletes().collect()] == [3]
    assert {r["pk"] for r in tx.get_upserts().collect()} == {1, 2}


def test_primary_key_validation(spark):
    ok = _df(spark, [(1, "a", 1), (2, "b", 2)])
    dup = _df(spark, [(1, "a", 1), (1, "b", 2)])
    withnull = spark.createDataFrame(
        [Row(pk=None, a="a", b=1)], "pk int, a string, b int"
    )
    assert cdc.is_valid_primary_key(ok, ["pk"])
    assert not cdc.is_valid_primary_key(dup, ["pk"])
    assert not cdc.is_valid_primary_key(withnull, ["pk"])


def test_out_of_order_deletes(spark):
    target = _df(spark, [(1, "a", 1), (2, "b", 2)])
    deletes = _df(spark, [(2, "b", 2)])
    left = cdc.handle_out_of_order_deletes(target, deletes, ["pk"])
    assert [r["pk"] for r in left.collect()] == [1]


def test_change_data_feed_classifies(spark):
    target = _df(spark, [(1, "a", 1), (2, "b", 2), (3, "c", 3)])
    source = _df(spark, [(2, "b", 2), (3, "C", 3), (4, "d", 4)])
    feed = cdc.change_data_feed(target, source, ["pk"], full_extract=True)
    by_type = {}
    for r in feed.collect():
        by_type.setdefault(r["_change_type"], []).append(r)
    # pk=2 unchanged -> silent; pk=3 changed -> pre+post; 4 insert; 1 delete
    assert [r["pk"] for r in by_type["insert"]] == [4]
    assert [r["pk"] for r in by_type["delete"]] == [1]
    assert [(r["pk"], r["a"]) for r in by_type["update_preimage"]] == [(3, "c")]
    assert [(r["pk"], r["a"]) for r in by_type["update_postimage"]] == [(3, "C")]
    assert "unchanged" not in by_type


def test_change_data_feed_no_deletes_without_full_extract(spark):
    target = _df(spark, [(1, "a", 1)])
    source = _df(spark, [(2, "b", 2)])
    feed = cdc.change_data_feed(target, source, ["pk"], full_extract=False)
    assert {r["_change_type"] for r in feed.collect()} == {"insert"}


def test_change_data_feed_replays_to_merge_state(spark):
    """Applying the CDF to the target must reproduce scd1_apply's new
    state — the invariant Delta CDF consumers rely on."""
    from data_ingestion_framework_spark.operators import scd

    target = _df(spark, [(1, "a", 1), (2, "b", 2), (3, "c", 3)])
    source = _df(spark, [(2, "B", 2), (4, "d", 4)])
    feed = cdc.change_data_feed(target, source, ["pk"])
    upserts = feed.where(
        F.col("_change_type").isin("insert", "update_postimage")
    ).drop("_change_type")
    replayed = target.join(
        upserts.select("pk"), "pk", "left_anti"
    ).unionByName(upserts)
    merged = scd.scd1_apply(target, source.withColumn("__o", F.lit(1)), ["pk"], "__o").drop("__o")
    assert sorted(map(tuple, replayed.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_change_data_feed_commit_version_stamp(spark):
    target = _df(spark, [(1, "a", 1)])
    source = _df(spark, [(1, "a", 9)])
    feed = cdc.change_data_feed(target, source, ["pk"], commit_version=7)
    rows = feed.collect()
    assert rows and all(r["_commit_version"] == 7 for r in rows)


def test_read_changes_bounded_by_version(spark, tmp_path):
    from data_ingestion_framework_spark.operators.cdc import read_changes
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "t"))
    feed = ParquetTable(spark, str(tmp_path / "feed"))
    t.overwrite(spark.range(10).selectExpr("id"))
    t.delete_where("id >= 8", cdf_table=feed)       # version = delete seq
    t.update_where({"id": F.col("id") + 100}, "id = 0", cdf_table=feed)
    v1 = feed.read().agg(F.min("_commit_version")).first()[0]
    v2 = feed.read().agg(F.max("_commit_version")).first()[0]
    assert v2 > v1
    only_delete = read_changes(feed, end_version=v1)
    assert {r["_change_type"] for r in only_delete.collect()} == {"delete"}
    only_update = read_changes(feed, start_version=v2)
    assert {r["_change_type"] for r in only_update.collect()} == {
        "update_preimage", "update_postimage",
    }
    assert read_changes(feed).count() == feed.read().count()
    import pytest as _pt

    with _pt.raises(ValueError, match="not a change feed"):
        read_changes(t)
