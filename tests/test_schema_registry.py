"""Streaming schema registry: run 2 with a widened source EVOLVES the
registered schema (instead of re-inferring from scratch), old columns
keep their registered types, and unknown JSON keys are rescued into
``_rescued_data`` — Auto Loader schemaLocation/_rescued_data parity."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import types as T

from data_ingestion_framework_spark.streaming import (
    SchemaRegistry,
    read_file_stream,
    read_json_stream_with_rescue,
    stream_append,
)


def test_registry_versioned_evolution(tmp_path):
    reg = SchemaRegistry(str(tmp_path / "loc"))
    v0 = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    assert reg.latest() is None
    assert reg.evolve(v0) == v0
    assert reg.versions() == [0]

    # same schema again: no new version
    assert reg.evolve(v0) == v0
    assert reg.versions() == [0]

    # new column appends nullable; registered type wins for known cols
    v1 = T.StructType(
        [
            T.StructField("a", T.StringType()),  # type flip attempt
            T.StructField("b", T.StringType()),
            T.StructField("c", T.DoubleType()),
        ]
    )
    merged = reg.evolve(v1)
    assert [f.name for f in merged.fields] == ["a", "b", "c"]
    assert merged["a"].dataType == T.LongType()  # no silent type flip
    assert merged["c"].nullable
    assert reg.versions() == [0, 1]


def test_file_stream_evolves_instead_of_reinfer(spark, tmp_path):
    landing = str(tmp_path / "landing")
    loc = str(tmp_path / "schemas")
    spark.createDataFrame([Row(pk=1, val="a")]).coalesce(1).write.mode(
        "append"
    ).parquet(landing)

    # run 1: infer + register
    s1 = read_file_stream(
        spark, landing, "parquet", control_columns=False, schema_location=loc
    )
    assert {"pk", "val"} <= set(s1.schema.names)

    # landing widens between runs
    spark.createDataFrame(
        [Row(pk=2, val="b", extra=1.5)]
    ).coalesce(1).write.mode("append").parquet(landing)

    # run 2: evolves (old columns first, new appended) and persists v1
    s2 = read_file_stream(
        spark, landing, "parquet", control_columns=False, schema_location=loc
    )
    assert s2.schema.names[: len(s1.schema.names)] == s1.schema.names
    assert "extra" in s2.schema.names
    assert SchemaRegistry(loc).versions() == [0, 1]

    # the evolved stream actually reads both generations of files
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_append(s2, out, ckpt)
    got = {r["pk"]: r["extra"] for r in spark.read.parquet(out).collect()}
    assert got == {1: None, 2: 1.5}


def test_json_rescue_captures_unknown_keys(spark, tmp_path):
    landing = tmp_path / "landing_json"
    landing.mkdir()
    lines = [
        {"pk": 1, "val": "a"},
        {"pk": 2, "val": "b", "surprise": "x", "n": 7},
    ]
    (landing / "f1.json").write_text("\n".join(json.dumps(x) for x in lines))

    schema = T.StructType(
        [T.StructField("pk", T.LongType()), T.StructField("val", T.StringType())]
    )
    stream = read_json_stream_with_rescue(spark, str(landing), schema)
    out, ckpt = str(tmp_path / "outj"), str(tmp_path / "ckptj")
    stream_append(stream, out, ckpt)
    rows = {r["pk"]: r for r in spark.read.parquet(out).collect()}
    assert rows[1]["_rescued_data"] is None
    rescued = json.loads(rows[2]["_rescued_data"])
    assert rescued == {"surprise": "x", "n": "7"}
    assert rows[2]["val"] == "b"
