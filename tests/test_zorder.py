"""Z-order layout: Morton-code exactness and the data-skipping payoff
(per-file min/max stats tighten on EVERY clustered column)."""

import glob
import os
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators.zorder import (
    int_bucket,
    morton_code,
    zorder_code,
    zorder_layout,
)
from data_ingestion_framework_spark.sources.tablestore import ParquetTable

SF_DIR = "/root/testdata/sf0.001"


def _py_bucket(x, vmin, vmax, bits):
    n = 1 << bits
    b = ((x - vmin) * n) // (vmax - vmin + 1)
    return max(0, min(n - 1, b))


def _py_morton(bx, by, bits):
    z = 0
    for b in range(bits):
        z |= ((bx >> b) & 1) << (2 * b)
        z |= ((by >> b) & 1) << (2 * b + 1)
    return z


def test_int_bucket_exact_against_python(spark):
    vals = [0, 1, 7, 13, 50, 99, 100]
    df = spark.createDataFrame([(v,) for v in vals], "x bigint")
    got = {
        r["x"]: r["b"]
        for r in df.select(
            "x", int_bucket(F.col("x"), 0, 100, 4).alias("b")
        ).collect()
    }
    for v in vals:
        assert got[v] == _py_bucket(v, 0, 100, 4)


def test_int_bucket_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-5,), (200,)], "x bigint")
    got = [
        r["b"]
        for r in df.select(int_bucket(F.col("x"), 0, 100, 4).alias("b"))
        .orderBy("x")
        .collect()
    ]
    assert got == [0, 15]


def test_int_bucket_rejects_wide_range():
    with pytest.raises(ValueError, match="too wide"):
        int_bucket(F.lit(0), 0, 1 << 50, 16)


def test_morton_code_matches_python(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "bx bigint, by bigint")
    got = df.select(
        "bx", "by", morton_code([F.col("bx"), F.col("by")], 3).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _py_morton(r["bx"], r["by"], 3)
    # the 8x8 grid maps onto a bijection of [0, 64)
    assert sorted(r["z"] for r in got) == list(range(64))


def test_morton_rejects_overflow():
    with pytest.raises(ValueError, match="64-bit"):
        morton_code([F.lit(0), F.lit(0)], 32)


def _file_spans(path, col):
    spans = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                c = row_group.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            spans.append(hi - lo)
    return spans


def test_zorder_layout_tightens_file_stats(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey",
        F.col("o_custkey").cast("bigint").alias("x"),
        F.datediff("o_orderdate", F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("y"),
    )
    n_files = 8
    with tempfile.TemporaryDirectory() as tmp:
        naive, zdir = f"{tmp}/naive", f"{tmp}/z"
        # naive: hash-partitioned on the row key — every file spans the
        # whole domain of both columns
        orders.repartition(n_files, "o_orderkey").write.parquet(naive)
        zorder_layout(orders, ["x", "y"], n_files).write.parquet(zdir)

        assert (
            spark.read.parquet(zdir).count()
            == spark.read.parquet(naive).count()
            == orders.count()
        )
        for col in ("x", "y"):
            naive_spans = _file_spans(naive, col)
            z_spans = _file_spans(zdir, col)
            assert len(z_spans) >= 2
            # clustered files cover a strictly tighter slice of BOTH
            # dimensions — this is what footer-stats pruning skips on
            assert sum(z_spans) / len(z_spans) < 0.7 * (
                sum(naive_spans) / len(naive_spans)
            ), col


def test_compact_zorder_roundtrip(spark):
    with tempfile.TemporaryDirectory() as tmp:
        t = ParquetTable(spark, f"{tmp}/t")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_orderkey",
            F.col("o_custkey").cast("bigint").alias("x"),
            F.col("o_orderkey").cast("bigint").alias("y"),
        )
        t.overwrite(orders)
        before = t.read().count()
        t.compact(target_files=4, zorder_by=["x", "y"])
        assert t.read().count() == before
        assert any(h["op"] == "zorder" for h in t.history())


def test_zorder_code_all_null_raises(spark):
    df = spark.createDataFrame([(None,), (None,)], "x bigint")
    with pytest.raises(ValueError, match="all-NULL"):
        zorder_code(df, ["x"], bits=4)


# -- per-file Bloom index (the equality complement of z-order) -----------


def test_bloom_index_point_lookup_prunes_files(spark):
    with tempfile.TemporaryDirectory() as tmp:
        t = ParquetTable(spark, f"{tmp}/t")
        # 8 files, each holding a disjoint key range
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_orderkey", "o_custkey"
        )
        t.overwrite(orders.repartitionByRange(8, "o_orderkey"))
        t.build_bloom_index("o_orderkey")

        keys = [r["o_orderkey"] for r in orders.limit(5).collect()]
        total_files = t.file_count()
        for key in keys:
            cand = t.lookup_files("o_orderkey", key)
            # range-partitioned: the key lives in one file; bloom fps
            # may admit a couple more, never most of the table
            assert 1 <= len(cand) <= max(2, total_files // 2)
            got = t.point_lookup("o_orderkey", key).collect()
            want = orders.where(F.col("o_orderkey") == key).collect()
            assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_bloom_index_no_false_negatives(spark):
    with tempfile.TemporaryDirectory() as tmp:
        t = ParquetTable(spark, f"{tmp}/t")
        df = spark.range(0, 2000).selectExpr("id", "id % 7 AS grp")
        t.overwrite(df.repartition(6, "id"))
        t.build_bloom_index("id")
        # every present key must be found through the index
        for key in (0, 1, 999, 1999):
            got = t.point_lookup("id", key).collect()
            assert [r["id"] for r in got] == [key]
        # absent key: exact residue filter returns nothing
        assert t.point_lookup("id", 123456).count() == 0


def test_bloom_index_staleness_guard(spark):
    import pytest as _pytest

    with tempfile.TemporaryDirectory() as tmp:
        t = ParquetTable(spark, f"{tmp}/t")
        t.overwrite(spark.range(10).selectExpr("id"))
        t.build_bloom_index("id")
        t.append(spark.range(10, 20).selectExpr("id"))
        with pytest.raises(ValueError, match="stale"):
            t.lookup_files("id", 5)
        with _pytest.raises(ValueError, match="no bloom index"):
            t.lookup_files("nope", 5)


def test_bloom_index_numeric_format_parity(spark):
    """The probe must hash Spark's cast-to-string of the value, not
    Python's str() — doubles like 1e20 format differently ('1.0E20'
    vs '1e+20') and a str()-based probe would prune every file."""
    with tempfile.TemporaryDirectory() as tmp:
        t = ParquetTable(spark, f"{tmp}/t")
        t.overwrite(
            spark.createDataFrame(
                [(1, 1e20), (2, 2.5), (3, 0.1)], "id int, v double"
            ).repartition(3, "id")
        )
        t.build_bloom_index("v")
        got = t.point_lookup("v", 1e20).collect()
        assert [r["id"] for r in got] == [1]


def test_bloom_index_empty_table(spark):
    import pytest as _pytest

    with tempfile.TemporaryDirectory() as tmp:
        t = ParquetTable(spark, f"{tmp}/t")
        t.overwrite(spark.range(5).where("id > 99").selectExpr("id"))
        t.build_bloom_index("id")
        assert t.lookup_files("id", 1) == []          # still empty: sound
        t.append(spark.range(3).selectExpr("id"))     # rows appeared
        with _pytest.raises(ValueError, match="empty table"):
            t.lookup_files("id", 1)


def test_optimize_composite_maintenance(spark):
    """compact(zorder) -> bloom rebuild -> vacuum in one call: the
    rewrite invalidates the sidecar mid-flight, so the fixed ordering
    is what keeps point lookups working right after maintenance."""
    with tempfile.TemporaryDirectory() as tmp:
        t = ParquetTable(spark, f"{tmp}/t")
        for i in range(6):
            t.append(
                spark.range(i * 100, (i + 1) * 100).selectExpr(
                    "id", "id % 37 AS x", "id % 11 AS y"
                )
            )
        t.build_bloom_index("id")
        t.optimize(target_files=4, zorder_by=["x", "y"], bloom_columns=("id",), vacuum=True)
        assert t.file_count() <= 4
        ops = [h["op"] for h in t.history()]
        assert "zorder" in ops
        got = t.point_lookup("id", 123).collect()
        assert [r["id"] for r in got] == [123]
        # vacuum dropped the retained pre-rewrite states
        import os
        hist_dir = os.path.join(f"{tmp}/t", "_history")
        assert not os.path.isdir(hist_dir) or not os.listdir(hist_dir)


def test_int_bucket_null_lands_in_bucket_zero(spark):
    """NULLs bucket explicitly to 0 (NULLS FIRST layout contract) —
    without the guard least/greatest skip NULLs and the rows would
    silently cluster with the MAX bucket."""
    df = spark.createDataFrame([(None,), (0,), (100,)], "x bigint")
    got = [
        r["b"]
        for r in df.select(int_bucket(F.col("x"), 0, 100, 4).alias("b"))
        .orderBy(F.col("x").asc_nulls_first())
        .collect()
    ]
    assert got == [0, 0, 15]


def test_optimize_on_missing_table_is_noop(spark):
    """optimize() on a not-yet-created table matches compact()'s
    early-return contract instead of raising from build_bloom_index."""
    with tempfile.TemporaryDirectory() as tmp:
        t = ParquetTable(spark, f"{tmp}/never_created")
        t.optimize(target_files=4, bloom_columns=("id",), vacuum=True)  # no raise
        assert not t.exists()


def test_point_lookup_partitioned_table_recovers_partition_columns(spark):
    """On a partitioned table the candidate leaf files are read with
    basePath so partition columns survive — the lookup schema matches
    read(), and a bloom index ON the partition column works."""
    with tempfile.TemporaryDirectory() as tmp:
        t = ParquetTable(spark, f"{tmp}/t", partition_by=["bucket"])
        t.overwrite(
            spark.range(200).selectExpr("id", "id % 4 AS bucket", "id * 2 AS v")
        )
        t.build_bloom_index("id")
        got = t.point_lookup("id", 7)
        assert set(got.columns) == set(t.read().columns)
        rows = got.collect()
        assert len(rows) == 1 and rows[0]["bucket"] == 3 and rows[0]["v"] == 14

        # bloom index on the PARTITION column itself
        t.build_bloom_index("bucket")
        part = t.point_lookup("bucket", 2)
        assert part.count() == 50
        assert set(r["bucket"] for r in part.select("bucket").distinct().collect()) == {2}


def test_lookup_files_nonstrict_degrades_to_full_list(spark):
    """strict=False turns a stale index into a full-file-list warning
    instead of an error — sound (no skipping), just unpruned."""
    import warnings

    with tempfile.TemporaryDirectory() as tmp:
        t = ParquetTable(spark, f"{tmp}/t")
        t.overwrite(spark.range(100).selectExpr("id"))
        t.build_bloom_index("id")
        t.append(spark.range(100, 110).selectExpr("id"))  # index now stale
        with pytest.raises(ValueError, match="stale"):
            t.lookup_files("id", 5)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            files = t.lookup_files("id", 5, strict=False)
        assert any("stale" in str(x.message) for x in w)
        assert sorted(files) == sorted(
            os.path.join(f"{tmp}/t", f) for f in t._data_files()
        )


def _py_hilbert(x, y, bits):
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_code_matches_python_and_is_bijective(spark):
    from data_ingestion_framework_spark.operators.zorder import hilbert_code

    bits = 4
    pts = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    got = {
        (r["x"], r["y"]): r["d"]
        for r in df.select("x", "y", hilbert_code(F.col("x"), F.col("y"), bits).alias("d")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _py_hilbert(x, y, bits)
    # bijection over the full grid
    assert sorted(got.values()) == list(range(256))
    # unit-step locality: consecutive curve positions are grid neighbors
    inv = {d: p for p, d in got.items()}
    for d in range(255):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_layout_tightens_ranges_vs_morton(spark):
    """On a uniform 2-D grid split into the same number of range
    partitions, the Hilbert curve's per-chunk bounding boxes are never
    worse than Morton's in total area — the locality claim, measured."""
    from data_ingestion_framework_spark.operators.zorder import (
        hilbert_zorder_code,
        zorder_code,
    )

    n = 64
    df = spark.createDataFrame(
        [(i, i % n, i // n) for i in range(n * n)], "id bigint, x bigint, y bigint"
    )
    def chunk_area(code_col, chunks=16):
        rows = (
            df.withColumn("__c", code_col)
            .selectExpr("x", "y", f"ntile({chunks}) OVER (ORDER BY __c) AS ck")
            .groupBy("ck")
            .agg(
                (F.max("x") - F.min("x") + 1) * (F.max("y") - F.min("y") + 1)
            )
            .collect()
        )
        return sum(r[1] for r in rows)

    hc, _ = hilbert_zorder_code(df, ["x", "y"], bits=6)
    mc, _ = zorder_code(df, ["x", "y"], bits=6)
    assert chunk_area(hc) <= chunk_area(mc)


def test_compact_hilbert_curve_roundtrip(spark):
    """compact(curve='hilbert') lays files out along the Hilbert curve
    — same rows, bounded files, logged as a zorder commit."""
    with tempfile.TemporaryDirectory() as tmp:
        t = ParquetTable(spark, f"{tmp}/t")
        t.overwrite(
            spark.range(2000).selectExpr("id", "id % 37 AS x", "id % 11 AS y")
            .repartition(8)
        )
        t.compact(target_files=4, zorder_by=["x", "y"], curve="hilbert")
        assert t.file_count() <= 4
        assert t.read().count() == 2000
        assert t.history()[-1]["op"] == "zorder"


def _py_hilbert_nd(coords, bits):
    """Skilling's AxesToTranspose + untranspose, plain Python — the
    independent reference the Spark expression must reproduce."""
    X = list(coords)
    n = len(X)
    M = 1 << (bits - 1)
    Q = M
    while Q > 1:
        P = Q - 1
        for i in range(n):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = 0
    Q = M
    while Q > 1:
        if X[n - 1] & Q:
            t ^= Q - 1
        Q >>= 1
    for i in range(n):
        X[i] ^= t
    d = 0
    for q in range(bits - 1, -1, -1):
        for i in range(n):
            d = (d << 1) | ((X[i] >> q) & 1)
    return d


def test_hilbert_nd_matches_python_bijective_unit_steps(spark):
    """3-D Hilbert (Gray-code generalization): matches the Skilling
    reference value-for-value, is a bijection onto [0, 8^bits), and
    consecutive curve positions are unit-Manhattan grid neighbors —
    the defining Hilbert property, which Morton lacks."""
    from data_ingestion_framework_spark.operators.zorder import hilbert_code_nd

    bits, n = 2, 3
    pts = [(x, y, z) for x in range(4) for y in range(4) for z in range(4)]
    df = spark.createDataFrame(pts, "x bigint, y bigint, z bigint")
    code = hilbert_code_nd([F.col("x"), F.col("y"), F.col("z")], bits)
    got = {
        (r["x"], r["y"], r["z"]): r["d"]
        for r in df.select("x", "y", "z", code.alias("d")).collect()
    }
    for p in pts:
        assert got[p] == _py_hilbert_nd(p, bits), p
    assert sorted(got.values()) == list(range(64))
    inv = {d: p for p, d in got.items()}
    for d in range(63):
        a, b = inv[d], inv[d + 1]
        assert sum(abs(u - v) for u, v in zip(a, b)) == 1, (d, a, b)


def test_hilbert_nd_four_dims_and_layout(spark):
    """4-D: bijective with unit steps at bits=1 (the 16-cell
    hypercube), and hilbert_zorder_code / compact(curve='hilbert')
    accept > 2 columns like Morton."""
    from data_ingestion_framework_spark.operators.zorder import (
        hilbert_code_nd,
        hilbert_zorder_code,
    )

    pts = [
        (a, b, c, e)
        for a in range(2) for b in range(2)
        for c in range(2) for e in range(2)
    ]
    df = spark.createDataFrame(pts, "a bigint, b bigint, c bigint, e bigint")
    code = hilbert_code_nd([F.col(c) for c in ("a", "b", "c", "e")], 1)
    got = {
        (r["a"], r["b"], r["c"], r["e"]): r["d"]
        for r in df.select("a", "b", "c", "e", code.alias("d")).collect()
    }
    for p in pts:
        assert got[p] == _py_hilbert_nd(p, 1), p
    assert sorted(got.values()) == list(range(16))
    inv = {d: p for p, d in got.items()}
    for d in range(15):
        assert sum(abs(u - v) for u, v in zip(inv[d], inv[d + 1])) == 1

    with tempfile.TemporaryDirectory() as tmp:
        t = ParquetTable(spark, f"{tmp}/t")
        t.overwrite(
            spark.range(2000).selectExpr(
                "id", "id % 37 AS x", "id % 11 AS y", "id % 5 AS z"
            ).repartition(8)
        )
        t.compact(target_files=4, zorder_by=["x", "y", "z"], curve="hilbert")
        assert t.file_count() <= 4
        assert t.read().count() == 2000
        assert t.history()[-1]["op"] == "zorder"
