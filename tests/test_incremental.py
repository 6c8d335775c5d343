"""Incremental aggregate refresh: delta-only folding equals the full
recompute, cursor makes re-runs no-ops, non-additive bases refuse."""

import pytest
from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators.incremental import (
    refresh_aggregate,
)
from data_ingestion_framework_spark.sources.tablestore import ParquetTable

MEASURES = {
    "n": ("count", "v"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _state(agg):
    return {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in agg.read().collect()
    }


def _expected(base):
    return {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in base.read()
        .groupBy("k")
        .agg(
            F.count("v").cast("bigint").alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }


def test_refresh_matches_full_recompute_across_appends(spark, tmp_path):
    base = ParquetTable(spark, str(tmp_path / "base"))
    agg = ParquetTable(spark, str(tmp_path / "agg"))
    batches = [
        [("a", 1), ("b", 10)],
        [("a", 5), ("c", 7)],
        [("b", -3), ("a", 2), ("c", 7)],
    ]
    writer = base.overwrite
    for batch in batches:
        df = spark.createDataFrame(batch, "k string, v bigint")
        writer(df)
        writer = base.append
        folded = refresh_aggregate(base, agg, ["k"], MEASURES)
        assert folded >= 1
        assert _state(agg) == _expected(base)
    # already current -> no-op, state untouched
    before = _state(agg)
    assert refresh_aggregate(base, agg, ["k"], MEASURES) == 0
    assert _state(agg) == before


def test_refresh_refuses_rewritten_base(spark, tmp_path):
    base = ParquetTable(spark, str(tmp_path / "base"))
    agg = ParquetTable(spark, str(tmp_path / "agg"))
    base.overwrite(spark.createDataFrame([("a", 1)], "k string, v bigint"))
    refresh_aggregate(base, agg, ["k"], MEASURES)
    base.overwrite(spark.createDataFrame([("a", 99)], "k string, v bigint"))
    with pytest.raises(ValueError, match="not file-additive"):
        refresh_aggregate(base, agg, ["k"], MEASURES)


def test_refresh_rejects_unmergeable_measure(spark, tmp_path):
    base = ParquetTable(spark, str(tmp_path / "base"))
    agg = ParquetTable(spark, str(tmp_path / "agg"))
    base.overwrite(spark.createDataFrame([("a", 1)], "k string, v bigint"))
    with pytest.raises(ValueError, match="not mergeable"):
        refresh_aggregate(base, agg, ["k"], {"m": ("avg", "v")})


def test_refresh_repairs_cursor_from_commit_metrics(spark, tmp_path):
    """Simulated crash between the state overwrite and the properties
    write: the next refresh must repair the cursor from the refresh
    commit's metrics instead of double-folding the delta."""
    from data_ingestion_framework_spark.operators.incremental import (
        CURSOR_PROP,
    )

    base = ParquetTable(spark, str(tmp_path / "base"))
    agg = ParquetTable(spark, str(tmp_path / "agg"))
    base.overwrite(spark.createDataFrame([("a", 1)], "k string, v bigint"))
    refresh_aggregate(base, agg, ["k"], MEASURES)
    base.append(spark.createDataFrame([("a", 2)], "k string, v bigint"))
    refresh_aggregate(base, agg, ["k"], MEASURES)
    good = _state(agg)

    # wind the PROPERTIES cursor back one commit (what a crash after
    # overwrite+record but before set_properties leaves behind)
    props = agg.properties()
    props[CURSOR_PROP] = str(int(props[CURSOR_PROP]) - 1)
    agg.set_properties(props)

    assert refresh_aggregate(base, agg, ["k"], MEASURES) == 0  # repaired, no refold
    assert _state(agg) == good


def test_refresh_partition_scoped_after_partition_merge(spark, tmp_path):
    """A partition-scoped merge (non-file-additive) no longer forces a
    reset when partition_by ⊆ group_cols: only the touched partitions
    are re-read and their group rows spliced in. The untouched
    partition's files are hidden during the refresh to PROVE no
    full-table read happens."""
    import os
    import shutil

    base = ParquetTable(spark, str(tmp_path / "base"), partition_by=["k"])
    agg = ParquetTable(spark, str(tmp_path / "agg"))
    base.overwrite(
        spark.createDataFrame(
            [("a", 1), ("a", 5), ("b", 10), ("c", 7)], "k string, v bigint"
        )
    )
    refresh_aggregate(base, agg, ["k"], MEASURES)

    # partition-scoped merge: rewrite ONLY k=a (drops the 5, adds 100)
    base.overwrite_partitions(
        spark.createDataFrame([("a", 1), ("a", 100)], "k string, v bigint")
    )
    expected = _expected(base)

    # hide an untouched partition: a full recompute would now fail
    hidden = str(tmp_path / "hidden_b")
    os.rename(os.path.join(base.path, "k=b"), hidden)
    try:
        folded = refresh_aggregate(base, agg, ["k"], MEASURES)
    finally:
        os.rename(hidden, os.path.join(base.path, "k=b"))
    assert folded == 1
    assert _state(agg) == expected
    # min/max RETRACTION is exact: the 5 dropped from k=a is gone
    assert _state(agg)["a"] == (2, 101, 1, 100)
    # cursor advanced: re-run is a no-op
    assert refresh_aggregate(base, agg, ["k"], MEASURES) == 0


def test_refresh_partition_scoped_emptied_partition_drops_rows(spark, tmp_path):
    """A merge that empties a partition (delete feed) must remove its
    aggregate rows — the emptied partition leaves only its dir name in
    the commit metrics, no data to recompute from."""
    base = ParquetTable(spark, str(tmp_path / "base"), partition_by=["k"])
    agg = ParquetTable(spark, str(tmp_path / "agg"))
    base.overwrite(
        spark.createDataFrame([("a", 1), ("b", 10)], "k string, v bigint")
    )
    refresh_aggregate(base, agg, ["k"], MEASURES)
    assert set(_state(agg)) == {"a", "b"}

    # delete everything in k=b: no rows for it, extra_touched flags it
    base.overwrite_partitions(
        spark.createDataFrame([], "k string, v bigint"),
        extra_touched=["k=b"],
    )
    refresh_aggregate(base, agg, ["k"], MEASURES)
    assert _state(agg) == _expected(base) == {"a": (1, 1, 1, 1)}


def test_refresh_partition_scoped_null_key_partition(spark, tmp_path):
    """A touched NULL-key partition (__HIVE_DEFAULT_PARTITION__ on
    disk) must REPLACE its stale aggregate row. A plain equality
    anti-join never matches NULL keys, which would leave the old NULL
    group row alongside the recomputed one — the splice is null-safe
    per partition column."""
    base = ParquetTable(spark, str(tmp_path / "base"), partition_by=["k"])
    agg = ParquetTable(spark, str(tmp_path / "agg"))
    base.overwrite(
        spark.createDataFrame(
            [(None, 1), (None, 5), ("a", 10)], "k string, v bigint"
        )
    )
    refresh_aggregate(base, agg, ["k"], MEASURES)
    assert _state(agg) == _expected(base)

    # partition-scoped rewrite of ONLY the NULL-key partition
    base.overwrite_partitions(
        spark.createDataFrame([(None, 100)], "k string, v bigint")
    )
    refresh_aggregate(base, agg, ["k"], MEASURES)
    rows = agg.read().collect()
    assert len(rows) == 2  # exactly one row per group — no stale twin
    assert _state(agg) == _expected(base)
    assert _state(agg)[None] == (1, 100, 100, 100)


def test_refresh_unpartitioned_rewritten_base_still_refuses(spark, tmp_path):
    """The fallback only applies when the layout supports it — group
    keys not covering the partition columns (or no partitioning at
    all) still raise on a rewritten base."""
    base = ParquetTable(spark, str(tmp_path / "base"), partition_by=["k"])
    agg = ParquetTable(spark, str(tmp_path / "agg"))
    base.overwrite(spark.createDataFrame([("a", 1)], "k string, v bigint"))
    # group by a non-partition column: one group spans partitions
    refresh_aggregate(base, agg, ["v"], {"n": ("count", "v")})
    base.overwrite_partitions(
        spark.createDataFrame([("a", 2)], "k string, v bigint")
    )
    with pytest.raises(ValueError, match="not file-additive"):
        refresh_aggregate(base, agg, ["v"], {"n": ("count", "v")})


# -- join IVM ----------------------------------------------------------------


def test_refresh_join_incremental_matches_full(spark, tmp_path):
    from pyspark.sql import Row, functions as F

    from data_ingestion_framework_spark.operators.incremental import (
        refresh_join,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    lt = ParquetTable(spark, str(tmp_path / "l"))
    rt = ParquetTable(spark, str(tmp_path / "r"))
    tgt = ParquetTable(spark, str(tmp_path / "t"))
    lt.overwrite(spark.createDataFrame([Row(k=i, lv=i * 10) for i in range(4)]))
    rt.overwrite(spark.createDataFrame([Row(k=i, rv=i * 100) for i in (0, 1)]))
    assert refresh_join(lt, rt, tgt, ["k"])["mode"] == "full"
    assert refresh_join(lt, rt, tgt, ["k"])["mode"] == "noop"
    # both sides grow, including keys whose match arrives LATER
    lt.append(spark.createDataFrame([Row(k=i, lv=i * 10) for i in (4, 5)]))
    assert refresh_join(lt, rt, tgt, ["k"])["mode"] == "incremental"
    rt.append(spark.createDataFrame([Row(k=i, rv=i * 100) for i in (2, 4)]))
    refresh_join(lt, rt, tgt, ["k"])
    got = sorted((r["k"], r["lv"], r["rv"]) for r in tgt.read().collect())
    full = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in lt.read().join(rt.read(), "k").collect()
    )
    assert got == full and len(got) == 4  # k in {0,1,2,4}
    # a non-additive commit on a base poisons the increment loudly
    lt.delete_where(F.col("k") == 0)
    with pytest.raises(ValueError, match="read_since|not file-additive"):
        refresh_join(lt, rt, tgt, ["k"])


def test_refresh_left_join_retracts_null_padding(spark, tmp_path):
    """A left row whose dimension match arrives LATER must upgrade its
    null-padded target row in place — the retraction case inner-join
    IVM never faces."""
    from pyspark.sql import Row

    from data_ingestion_framework_spark.operators.incremental import (
        refresh_left_join,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    lt = ParquetTable(spark, str(tmp_path / "l"))
    rt = ParquetTable(spark, str(tmp_path / "r"))
    tgt = ParquetTable(spark, str(tmp_path / "t"))
    lt.overwrite(spark.createDataFrame([Row(k=i, lv=i * 10) for i in range(4)]))
    rt.overwrite(spark.createDataFrame([Row(k=0, rv="a")]))
    assert refresh_left_join(lt, rt, tgt, ["k"])["mode"] == "full"
    # late-arriving dimension rows + new left rows in one cycle
    lt.append(spark.createDataFrame([Row(k=9, lv=90)]))
    rt.append(spark.createDataFrame([Row(k=1, rv="b"), Row(k=9, rv="z")]))
    refresh_left_join(lt, rt, tgt, ["k"])
    got = {r["k"]: (r["lv"], r["rv"]) for r in tgt.read().collect()}
    full = {
        r["k"]: (r["lv"], r["rv"])
        for r in lt.read().join(rt.read(), "k", "left").collect()
    }
    assert got == full
    assert got[1] == (10, "b") and got[9] == (90, "z")  # retracted pads
    assert got[2] == (20, None)  # still padded, exactly once
    assert len(tgt.read().collect()) == 5


def test_read_since_tolerates_file_neutral_commits(spark, tmp_path):
    """set_partition_spec and fsck_remove_orphans change no live data
    file — read_since must treat them as additive (in lockstep with the
    difs stream reader) instead of forcing incremental consumers into a
    spurious full-rebuild refusal."""
    import shutil

    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], "k long, p string"))
    seq = t.history()[-1]["seq"]
    # metadata-only spec change, then an append under the new spec
    t.evolve_partition_spec(["p"])
    t.append(spark.createDataFrame([(2, "b")], "k long, p string"))
    # orphan repair (file-list-neutral: removes only unreferenced files)
    import glob, os as _os

    live = glob.glob(t.path + "/*.parquet")[0]
    shutil.copy(live, t.path + "/part-orphan.parquet")
    _os.utime(t.path + "/part-orphan.parquet", (0, 0))
    assert t.remove_orphan_files(grace_seconds=0) == 1
    got = t.read_since(seq)
    assert [(r["k"], r["p"]) for r in got.collect()] == [(2, "b")]
