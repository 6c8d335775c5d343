"""F7 column-map fixture tests + schema-drift handling."""

from __future__ import annotations

from pyspark.sql import Row

from data_ingestion_framework_spark.operators.colmap import (
    apply_column_map,
    compile_column_map,
    headerless_csv_names,
)
from data_ingestion_framework_spark.sources import read_csv, read_json

COL_MAP = [
    {"source_col_name": "_c0", "target_col_name": "n_nationkey",
     "target_col_expression": "CAST(_c0 AS INT)", "target_col_order": 1,
     "target_key_col_order": 1},
    {"source_col_name": "_c1", "target_col_name": "n_name",
     "target_col_expression": None, "target_col_order": 2,
     "target_key_col_order": None},
    {"source_col_name": "_c2", "target_col_name": "n_regionkey",
     "target_col_expression": "CAST(_c2 AS INT)", "target_col_order": 3,
     "target_key_col_order": None},
]


def test_compile_column_map_orders_and_keys():
    exprs, keys = compile_column_map(COL_MAP)
    assert exprs == [
        "CAST(_c0 AS INT) AS n_nationkey",
        "_c1 AS n_name",
        "CAST(_c2 AS INT) AS n_regionkey",
    ]
    assert keys == ["n_nationkey"]


def test_headerless_csv_through_column_map(spark, tmp_path):
    """FIXTURES.md F7: headerless CSV of nation + col_map supplying
    names, casts and key order."""
    path = str(tmp_path / "nation_csv")
    with open(f"{tmp_path}/raw.csv", "w") as f:
        f.write("0,ALGERIA,0\n1,ARGENTINA,1\n")
    import shutil, os

    os.makedirs(path, exist_ok=True)
    shutil.move(f"{tmp_path}/raw.csv", f"{path}/part-000.csv")

    df = read_csv(spark, path, options={"header": "false"})
    assert df.columns == ["_c0", "_c1", "_c2"]
    out = apply_column_map(df, COL_MAP)
    assert out.columns == ["n_nationkey", "n_name", "n_regionkey"]
    rows = {r["n_nationkey"]: r["n_name"] for r in out.collect()}
    assert rows == {0: "ALGERIA", 1: "ARGENTINA"}
    assert headerless_csv_names(COL_MAP) == ["_c0", "_c1", "_c2"]


def test_json_schema_drift_rescue(spark, tmp_path):
    """Rescue-mode stand-in (SURVEY §1.3 schema-drift row): permissive
    JSON read routes malformed records into the corrupt-record column
    instead of failing the scan."""
    path = str(tmp_path / "drift")
    import os

    os.makedirs(path)
    with open(f"{path}/a.json", "w") as f:
        f.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\nnot-json-at-all\n')
    df = read_json(
        spark,
        path,
        options={"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_rescued_data"},
        schema="a bigint, b string, _rescued_data string",
    )
    rows = df.collect()
    good = [r for r in rows if r["_rescued_data"] is None]
    bad = [r for r in rows if r["_rescued_data"] is not None]
    assert len(good) == 2 and len(bad) == 1
    assert bad[0]["_rescued_data"].startswith("not-json")


def test_parquet_schema_evolution_union(spark, tmp_path):
    """mergeSchema read across batches with added columns
    (writers/streaming_writers.py:29 mergeSchema semantics)."""
    p = str(tmp_path / "evo")
    spark.createDataFrame([Row(a=1)]).write.mode("append").parquet(p)
    spark.createDataFrame([Row(a=2, b="new")]).write.mode("append").parquet(p)
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"a", "b"}
    rows = {r["a"]: r["b"] for r in df.collect()}
    assert rows == {1: None, 2: "new"}
