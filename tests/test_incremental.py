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
