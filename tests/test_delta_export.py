"""Delta transaction-log export (sinks/delta_export.py): after export,
the SAME directory reads as a Delta table — verified by replaying the
exported log through the package's own public-protocol Delta reader
(the reader and writer check each other)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_ingestion_framework_spark.sinks.delta_export import export_delta_log
from data_ingestion_framework_spark.sources import delta_log
from data_ingestion_framework_spark.sources.tablestore import ParquetTable


def test_export_then_delta_read_round_trip(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([Row(k=i, v=float(i)) for i in range(20)]))
    v = export_delta_log(t)
    assert v == 0 and delta_log.is_delta_table(t.path)
    got = delta_log.read_delta_log(spark, t.path)
    assert sorted(r["k"] for r in got.collect()) == list(range(20))
    # idempotent: same snapshot, no new version
    assert export_delta_log(t) == 0

    # a COW delete produces a remove/add diff version; Delta-side time
    # travel sees both states
    t.delete_where(F.col("k") % 4 == 0)
    assert export_delta_log(t) == 1
    latest = delta_log.read_delta_log(spark, t.path)
    assert sorted(r["k"] for r in latest.collect()) == [
        k for k in range(20) if k % 4
    ]
    # Delta-side time travel to the pre-rewrite version is out of
    # scope: the store MOVED those files into _history (its own as_of
    # resolves them there) — to a Delta reader that's a vacuumed
    # version. The log itself still lists them:
    v0_files = delta_log.snapshot_files(t.path, version=0)[1]
    assert len(v0_files) > 0
    assert sorted(r["k"] for r in t.as_of(1).collect()) == list(range(20))


def test_export_partitioned_carries_partition_values(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "p"), partition_by=["s"])
    t.overwrite(
        spark.createDataFrame(
            [Row(k=i, s="a" if i % 2 else "b", v=float(i)) for i in range(10)]
        )
    )
    export_delta_log(t)
    import json, os

    log = os.path.join(t.path, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(l) for l in open(log)]
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert meta["partitionColumns"] == ["s"]
    schema_fields = {f["name"] for f in json.loads(meta["schemaString"])["fields"]}
    assert "s" in schema_fields  # full schema incl. partition cols
    adds = [a["add"] for a in actions if "add" in a]
    assert all(a["partitionValues"].get("s") in ("a", "b") for a in adds)
    got = delta_log.read_delta_log(spark, t.path)
    assert sorted((r["k"], r["s"]) for r in got.collect()) == [
        (i, "a" if i % 2 else "b") for i in range(10)
    ]


def test_export_refusals(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "r"), partition_by=["days(ts)"])
    import datetime as dt

    t.overwrite(
        spark.createDataFrame(
            [Row(k=1, ts=dt.datetime(2024, 1, 1), v=1.0)]
        )
    )
    with pytest.raises(ValueError, match="transform"):
        export_delta_log(t)
    t2 = ParquetTable(spark, str(tmp_path / "dv"))
    t2.overwrite(spark.createDataFrame([Row(k=i) for i in range(10)]))
    t2.delete_where_dv(F.col("k") < 2)
    with pytest.raises(ValueError, match="deletion vectors"):
        export_delta_log(t2)
