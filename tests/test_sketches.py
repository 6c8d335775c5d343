"""KMV sketch: estimate accuracy, exact small-group branch, and
shard-merge associativity (the property rollup tables rely on)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators.sketches import (
    kmv_distinct,
    kmv_estimate,
    kmv_rows,
)


def test_kmv_exact_below_k(spark):
    df = spark.range(40).select(
        F.lit("g").alias("g"), (F.col("id") % 10).alias("v")
    )
    row = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert row["sketch_size"] == 10 and row["approx_distinct"] == 10


def test_kmv_estimator_accuracy(spark):
    n = 20_000
    df = spark.range(n).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    est = kmv_distinct(df, ["g"], "v", k=256).collect()[0]["approx_distinct"]
    # std err ≈ n/sqrt(k) = 6.25%; 4σ bound keeps the test deterministic-safe
    assert abs(est - n) / n < 0.25


def test_kmv_merge_equals_whole(spark):
    """Sketching two shards, unioning the row sketches, and re-taking
    top-k gives byte-identical estimates to sketching everything."""
    a = spark.range(0, 5000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    b = spark.range(2500, 7500).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    whole = kmv_distinct(a.unionByName(b), ["g"], "v", k=128).collect()[0]
    # merge at the ROW level: union the sketch rows + re-take top-k
    # (re-calling kmv_rows would hash the hashes)
    from pyspark.sql.window import Window as W

    u = kmv_rows(a, ["g"], "v", k=128).unionByName(kmv_rows(b, ["g"], "v", k=128)).distinct()
    w = W.partitionBy("g").orderBy("__h")
    topk = u.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 128).drop("rn")
    merged = kmv_estimate(topk, ["g"], k=128).collect()[0]
    assert merged["approx_distinct"] == whole["approx_distinct"]
    assert merged["sketch_size"] == whole["sketch_size"]


def test_quantile_sketch_accuracy_and_exact_small_groups(spark):
    from data_ingestion_framework_spark.operators.sketches import quantile_sketch

    # big group: uniform 0..9999 → q50≈5000, q90≈9000 within O(1/√k)
    big = spark.range(10_000).select(
        F.lit("big").alias("g"), F.col("id").alias("v"), F.col("id").alias("rid")
    )
    # small group (< k): sketch must be EXACT nearest-rank quantiles
    small = spark.createDataFrame(
        [("small", v, 100 + v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]],
        "g string, v long, rid long",
    )
    out = {
        r["g"]: r
        for r in quantile_sketch(
            big.unionByName(small), ["g"], "v", "rid", probs=[0.5, 0.9], k=256
        ).collect()
    }
    assert abs(out["big"]["q0_5"] - 5000) < 1500   # 4σ-ish for k=256
    assert abs(out["big"]["q0_9"] - 9000) < 1200
    assert out["small"]["q0_5"] == 5 and out["small"]["q0_9"] == 9


def test_mg_heavy_hitters_bounds_and_recall(spark):
    """The mergeable-summaries guarantee on a zipf-ish stream: for
    every emitted candidate est <= exact <= upper_bound, and every
    value whose true count dominates the summed shard error appears
    among the candidates."""
    from data_ingestion_framework_spark.operators.sketches import mg_heavy_hitters

    # value v appears ceil(2000/v) times: classic heavy head, long tail
    rows = []
    rid = 0
    for v in range(1, 200):
        for _ in range(-(-2000 // v)):
            rows.append((rid, f"u{v:03d}"))
            rid += 1
    df = spark.createDataFrame(rows, "rid long, val string")
    exact = {r["val"]: r["n"] for r in df.groupBy("val").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = mg_heavy_hitters(df, "val", "rid", n_shards=8, m=16, k=10).collect()
    assert len(got) == 10
    for r in got:
        assert r["est_count"] <= exact[r["val"]] <= r["upper_bound"], r
    # the true top value must be found, and the output order is by est
    assert got[0]["val"] == "u001"
    ests = [r["est_count"] for r in got]
    assert ests == sorted(ests, reverse=True)
    # determinism: same input -> same summary
    again = mg_heavy_hitters(df, "val", "rid", n_shards=8, m=16, k=10).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in got]


def test_mg_summary_merge_law(spark):
    """Split a stream in two, summarize each half, merge — the merged
    sketch's bounds must hold against the WHOLE stream's exact counts,
    and its candidate set must still surface the heavy head. This is
    the micro-batch fold a streaming ingest applies per batch."""
    from data_ingestion_framework_spark.operators.sketches import (
        mg_finalize,
        mg_merge,
        mg_summary,
    )

    rows = []
    rid = 0
    for v in range(1, 120):
        for _ in range(-(-1500 // v)):
            rows.append((rid, f"u{v:03d}"))
            rid += 1
    df = spark.createDataFrame(rows, "rid long, val string")
    exact = {
        r["val"]: r["n"]
        for r in df.groupBy("val").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    half_a = df.where(F.col("rid") % 2 == 0)
    half_b = df.where(F.col("rid") % 2 == 1)
    merged = mg_merge(
        mg_summary(half_a, "val", "rid", n_shards=4, m=12),
        mg_summary(half_b, "val", "rid", n_shards=4, m=12),
        "val",
        m=12,
    )
    got = mg_finalize(merged, "val", k=8).collect()
    assert len(got) == 8
    for r in got:
        assert r["est_count"] <= exact[r["val"]] <= r["upper_bound"], r
    assert got[0]["val"] == "u001"


def test_kmv_set_overlap_exact_when_small(spark):
    """Below-k union sketches see every distinct value: jaccard, union
    and intersection are exact; identical sets give jaccard 1.0;
    disjoint sets 0.0."""
    from pyspark.sql import Row

    from data_ingestion_framework_spark.operators import sketches

    rows = (
        [Row(g="a", v=i) for i in range(10)]
        + [Row(g="b", v=i) for i in range(5, 15)]   # |a∩b|=5, |a∪b|=15
        + [Row(g="c", v=i) for i in range(100, 110)]  # disjoint
        + [Row(g="d", v=i) for i in range(10)]      # identical to a
    )
    df = spark.createDataFrame(rows)
    out = {
        (r["group_a"], r["group_b"]): r
        for r in sketches.kmv_set_overlap(df, "g", "v", k=64).collect()
    }
    ab = out[("a", "b")]
    assert ab["kmv_jaccard"] == round(5 / 15, 4)
    assert ab["approx_union"] == 15 and ab["approx_intersection"] == 5
    ad = out[("a", "d")]
    assert ad["kmv_jaccard"] == 1.0 and ad["approx_intersection"] == 10
    ac = out[("a", "c")]
    assert ac["kmv_jaccard"] == 0.0 and ac["approx_intersection"] == 0
    assert len(out) == 6  # all unordered pairs of 4 groups


# -- HyperLogLog -----------------------------------------------------------


def test_hll_register_merge_law(spark):
    """Union-then-max over register frames == registers of the union:
    the associative fold streaming micro-batches rely on."""
    from pyspark.sql import Row, functions as F

    from data_ingestion_framework_spark.operators.sketches import (
        hll_estimate,
        hll_register_rows,
    )

    a = spark.createDataFrame([Row(g="x", v=i) for i in range(0, 300)])
    b = spark.createDataFrame([Row(g="x", v=i) for i in range(200, 600)])
    direct = hll_register_rows(a.union(b), ["g"], "v")
    merged = (
        hll_register_rows(a, ["g"], "v")
        .unionByName(hll_register_rows(b, ["g"], "v"))
        .groupBy("g", "__idx")
        .agg(F.max("__rank").cast("int").alias("__rank"))
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )
    e1 = hll_estimate(direct, ["g"]).collect()[0]
    e2 = hll_estimate(merged, ["g"]).collect()[0]
    assert e1 == e2


def test_hll_estimate_within_published_bound_both_paths(spark):
    """Small cardinality exercises the linear-counting correction; a
    5000-distinct input exercises the raw harmonic path. Both must sit
    within the 3-sigma bound 3*1.04/sqrt(256) = 0.195."""
    from pyspark.sql import Row

    from data_ingestion_framework_spark.operators.sketches import hll_distinct

    for n in (150, 5000):
        df = spark.createDataFrame([Row(g="x", v=i) for i in range(n)])
        est = hll_distinct(df, ["g"], "v").collect()[0]["hll_est"]
        assert abs(est / n - 1.0) <= 0.195, (n, est)


# -- count-min ---------------------------------------------------------------


def test_cm_sketch_merge_law_and_no_undercount(spark):
    from pyspark.sql import Row, functions as F

    from data_ingestion_framework_spark.operators.sketches import (
        cm_estimate,
        cm_sketch_rows,
    )

    a = spark.createDataFrame([Row(v=i % 7) for i in range(200)])
    b = spark.createDataFrame([Row(v=i % 5) for i in range(100)])
    direct = cm_sketch_rows(a.union(b), "v")
    merged = (
        cm_sketch_rows(a, "v")
        .unionByName(cm_sketch_rows(b, "v"))
        .groupBy("__i", "__b")
        .agg(F.sum("__c").alias("__c"))
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )
    keys = spark.createDataFrame([Row(v=i) for i in range(7)])
    est = {r["v"]: r["cm_est"] for r in cm_estimate(direct, keys, "v").collect()}
    exact = {i: 200 // 7 + (1 if i < 200 % 7 else 0) + (20 if i < 5 else 0)
             for i in range(7)}
    for k_, e in exact.items():
        assert est[k_] >= e  # the published no-undercount guarantee
        assert est[k_] <= e + 300 * 2.72 / 512 + 1  # epsilon*N slack


def test_cm_estimate_absent_key_small(spark):
    from pyspark.sql import Row

    from data_ingestion_framework_spark.operators.sketches import (
        cm_estimate,
        cm_sketch_rows,
    )

    df = spark.createDataFrame([Row(v=1)] * 50)
    cm = cm_sketch_rows(df, "v")
    est = cm_estimate(cm, spark.createDataFrame([Row(v=999)]), "v").collect()
    # an absent key can only collide into 50-count buckets or empties
    assert est[0]["cm_est"] in (0, 50)
