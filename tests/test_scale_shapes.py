"""Physical-plan shape tests — the scale contract, asserted:
pushdown + pruning reach the scans, small dims broadcast, bucketed
(co-partitioned) joins skip the exchange, compaction bounds file
counts. These are the properties that keep the engine viable at 100 TB,
pinned so a refactor can't silently regress them."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_ingestion_framework_spark.sources.tablestore import ParquetTable


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark, tmp_path):
    spark.createDataFrame(
        [Row(a=i, b=str(i), c=float(i)) for i in range(100)]
    ).write.parquet(f"{tmp_path}/t")
    df = (
        spark.read.parquet(f"{tmp_path}/t")
        .where(F.col("a") > 50)
        .select("a", "b")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(a), GreaterThan(a,50)]" in plan
    assert "ReadSchema: struct<a:bigint,b:string>" in plan  # c pruned


def test_small_dim_broadcasts(spark, tmp_path):
    spark.createDataFrame([Row(k=i, v=i) for i in range(1000)]).write.parquet(
        f"{tmp_path}/fact"
    )
    spark.createDataFrame([Row(k=i, name=str(i)) for i in range(10)]).write.parquet(
        f"{tmp_path}/dim"
    )
    fact = spark.read.parquet(f"{tmp_path}/fact")
    dim = spark.read.parquet(f"{tmp_path}/dim")
    plan = _plan(fact.join(dim, "k"))
    assert "BroadcastHashJoin" in plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key co-locates partitions —
    the SortMergeJoin runs without an Exchange (SURVEY §2.4: join
    co-location via bucketing)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.createDataFrame([Row(k=i, v=i * 2) for i in range(1000)])
        df.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("tb_left")
        df.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("tb_right")
        joined = spark.table("tb_left").join(spark.table("tb_right"), "k")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS tb_left")
        spark.sql("DROP TABLE IF EXISTS tb_right")


def test_window_and_join_share_partitioning(spark, tmp_path):
    """dedupe_latest window followed by a key join must not re-shuffle:
    the window's hash partitioning on the key is reused by SMJ."""
    from data_ingestion_framework_spark.operators import scd

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.createDataFrame(
            [Row(pk=i % 50, mtime=i, v=i) for i in range(500)]
        )
        right = spark.createDataFrame([Row(pk=i, name=str(i)) for i in range(50)])
        latest = scd.dedupe_latest(left, ["pk"], "mtime")
        plan = _plan(latest.join(right, "pk"))
        # one exchange per input for the initial partitioning, but no
        # *extra* exchange between the window and the join on the left
        assert plan.count("Exchange hashpartitioning(pk") <= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_compaction_bounds_file_count(spark, tmp_path):
    t = ParquetTable(spark, f"{tmp_path}/frag")
    for i in range(12):
        t.append(spark.createDataFrame([Row(a=i)]))
    assert t.file_count() >= 12
    t.compact(target_files=2)
    assert t.file_count() <= 2
    assert t.read().count() == 12


def test_aqe_enabled_defaults(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_partition_pruning(spark, tmp_path):
    """Partitioned table + partition filter → scan lists only matching
    partitions (PartitionFilters in the scan node)."""
    df = spark.createDataFrame(
        [Row(day=f"2024-01-0{d}", v=i) for d in (1, 2, 3) for i in range(10)]
    )
    df.write.partitionBy("day").parquet(f"{tmp_path}/pt")
    scan = spark.read.parquet(f"{tmp_path}/pt").where(F.col("day") == "2024-01-02")
    plan = _plan(scan)
    assert "PartitionFilters" in plan and "2024-01-02" in plan
    assert scan.count() == 10


def test_salted_join_correctness(spark):
    from data_ingestion_framework_spark.operators.skew import (
        salted_count_per_key,
        salted_join,
    )

    # one hot key (90% of rows) + a long tail
    big = spark.createDataFrame(
        [Row(k=0 if i % 10 else i, v=i) for i in range(1000)]
    )
    small = spark.createDataFrame([Row(k=i, name=f"n{i}") for i in range(200)])
    plain = big.join(small, "k").count()
    salted = salted_join(big, small, ["k"], buckets=4).count()
    assert salted == plain

    counts = {r["k"]: r["n"] for r in salted_count_per_key(big, ["k"], 4).collect()}
    assert counts[0] == 901  # 900 from i%10!=0 plus i=0 itself


def test_winnowing_is_shuffle_free(spark):
    """winnowing_fingerprints claims one narrow projection — no
    Exchange may appear anywhere in its plan."""
    from data_ingestion_framework_spark.operators.text import winnowing_fingerprints

    docs = spark.createDataFrame([Row(doc_id=1, text="abcdefghij" * 5)])
    plan = _plan(winnowing_fingerprints(docs, k=8, window=10))
    assert "Exchange" not in plan


def test_minhash_signatures_narrow_exchanges(spark):
    """Neither fold engine may shuffle per-shingle rows (the
    explode->groupBy shape both replaced shuffled a k-column partial
    aggregate per shingle). expr: the two id-keyed repartitions
    collapse to ONE exchange. arrow: the mapInPandas node pins both —
    the (id, normalized-text) spread feeding the Python fold and the
    (id, sig) barrier after it — still O(docs) narrow rows each,
    never per-shingle."""
    from data_ingestion_framework_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame([Row(doc_id=1, text="abcdefghij" * 5)])
    expr_plan = _plan(minhash_signatures(docs, engine="expr"))
    assert expr_plan.count("Exchange") == 1
    assert "HashAggregate" not in expr_plan

    arrow_plan = _plan(minhash_signatures(docs, engine="arrow"))
    assert arrow_plan.count("Exchange") == 2
    assert "HashAggregate" not in arrow_plan
    assert "Generate" not in arrow_plan  # no shingle explode into rows


def test_fact_fact_joins_are_aqe_decided(spark):
    """shipping_priority / region_revenue must not force-broadcast the
    sf-proportional tables (orders, customer): a forced build side is
    an executor OOM at 100x scale. Hints are allowed only on the true
    dims (region/nation/supplier)."""
    from data_ingestion_framework_spark import queries_analytics as qa

    sf = "/root/testdata/sf0.001"
    sp = qa.shipping_priority(spark, sf)
    assert "ResolvedHint" not in sp._jdf.queryExecution().analyzed().toString()

    rr = qa.region_revenue(spark, sf)
    analyzed = rr._jdf.queryExecution().analyzed().toString()
    # exactly the three true-dim hints; orders/customer joins AQE-decided
    assert analyzed.count("ResolvedHint") == 3


def test_asof_join_has_no_join_node(spark):
    """asof_join's scale claim (operators/asof.py): union-marker +
    window — ONE hash exchange on the keys and NO join operator of any
    kind (the naive formulation is a BroadcastNestedLoopJoin)."""
    import datetime as dt

    from data_ingestion_framework_spark.operators.asof import asof_join

    t = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [Row(k="a", ts=t)], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [Row(k="a", ts=t, v=1.0)], "k string, ts timestamp, v double"
    )
    plan = _plan(asof_join(left, right, ["k"], "ts", "ts", ["v"]))
    for join_node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                      "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_node not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_is_equi_not_nested_loop(spark):
    """range_join_binned's scale claim: the interval predicate rides an
    EQUI-join on (keys, bin) — never a nested-loop/cartesian plan."""
    import datetime as dt

    from data_ingestion_framework_spark.operators.asof import range_join_binned

    t = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [Row(lid=1, k="a", ts=t)], "lid int, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [Row(rid=1, k="a", ts=t)], "rid int, k string, ts timestamp"
    )
    plan = _plan(range_join_binned(left, right, ["k"], "ts", "ts", 600))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert any(j in plan for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"))


def test_semantic_dedup_joins_on_cell_no_cartesian(spark):
    """SemDeDup's pair scoring must be a cell equi-join (the bounded
    n²/k term), never a cartesian product, and the hoisted per-row
    norm must ride the exchange instead of recomputing per pair."""
    from data_ingestion_framework_spark.operators.similarity import semantic_dedup

    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 7), 1.0, 0.0]) for i in range(100)]
    )
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    plan = _plan(semantic_dedup(emb, cents, threshold=0.9))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "__cell" in plan  # the equi-join key

def test_split_and_mix_are_scan_side(spark):
    """Split assignment is a pure projection and temperature mixing a
    pure filter: neither may introduce an exchange or a join."""
    from data_ingestion_framework_spark.operators.sampling import (
        split_assign,
        temperature_mix,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s" + str(i % 3)) for i in range(300)]
    )
    p1 = _plan(split_assign(docs, {"train": 0.9, "val": 0.1}))
    assert "Exchange" not in p1 and "Join" not in p1
    p2 = _plan(temperature_mix(docs, temperature=2.0, target_fraction=0.5))
    assert "Exchange" not in p2 and "Join" not in p2

def test_shuffle_rank_avoids_global_single_partition_sort(spark):
    """The global ordering must come from per-bucket windows, not a
    single-partition window over the whole corpus."""
    from data_ingestion_framework_spark.operators.sampling import shuffle_rank

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(1000)])
    plan = _plan(shuffle_rank(docs))
    # the rank window partitions by the hash-prefix bucket; a global
    # row_number would show an empty partition spec + SinglePartition
    assert "windowspecdefinition(__b" in plan
    assert "Exchange SinglePartition" not in plan

def test_bloom_decontaminate_broadcasts_bitmap_not_grams(spark):
    """The bloom bitmap (1 row) must broadcast; the gram stream must be
    filtered scan-side before the exact verify join."""
    from data_ingestion_framework_spark.operators.cleaning import decontaminate_bloom

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=("w%d " % i) * 30) for i in range(50)]
    )
    bench = docs.where(F.col("doc_id") % 5 == 0)
    plan = _plan(decontaminate_bloom(docs, bench, n=13, m_bits=1 << 12, k=3))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_zorder_layout_is_one_range_exchange(spark):
    """The clustering write costs exactly one shuffle — a range
    exchange on the Morton code (sampled bounds, so raw-column skew
    doesn't skew files) — plus the in-partition sort."""
    from data_ingestion_framework_spark.operators.zorder import zorder_layout

    df = spark.createDataFrame(
        [Row(id=i, x=i % 50, y=(i * 7) % 50) for i in range(200)]
    )
    plan = _plan(zorder_layout(df, ["x", "y"], 4, bits=8))
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" in plan.lower()
    assert "Sort" in plan


def test_change_data_feed_is_single_join_no_rescan(spark):
    """The CDF derives from ONE full-outer join + explode — not a
    UNION of four per-branch scans (which would read both inputs four
    times at 100 TB)."""
    from data_ingestion_framework_spark.operators.cdc import change_data_feed

    t = spark.createDataFrame([Row(pk=1, v="a")])
    s = spark.createDataFrame([Row(pk=1, v="b")])
    plan = _plan(change_data_feed(t, s, ["pk"], full_extract=True))
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") + plan.count(
        "ShuffledHashJoin"
    ) == 1
    assert "Union" not in plan
    assert "Generate" in plan  # the explode of 0-2 change structs


def test_edit_distance_pairs_equi_join_not_cartesian(spark):
    """Fuzzy matching must candidate-generate through the (block,
    band) equi-join — never a cartesian/nested-loop over the corpus."""
    from data_ingestion_framework_spark.operators.dedup import edit_distance_pairs

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"name {i}") for i in range(50)]
    )
    plan = _plan(edit_distance_pairs(docs, max_distance=1))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_spread_for_compute_estimate_and_fallback(spark, tmp_path):
    """The at-scale skip decision comes from file metadata (no RDD
    probe); a small single-file scan still round-robins to cluster
    parallelism via the exact fallback."""
    from data_ingestion_framework_spark.operators.skew import (
        _estimated_scan_partitions,
        spread_for_compute,
    )

    n = spark.sparkContext.defaultParallelism
    p = str(tmp_path / "one")
    spark.range(1000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    est = _estimated_scan_partitions(df)
    assert est == 1  # one tiny file -> one split
    assert spread_for_compute(df).rdd.getNumPartitions() == n
    # non-file plans return None (fallback path, no crash)
    assert _estimated_scan_partitions(spark.range(10)) is None


def test_containment_pairs_plan_shape(spark, tmp_path):
    """Containment is an inverted-index EQUI-join on the gram key —
    never a cartesian product — and the stop-gram cap's oversize set
    joins as a broadcast anti-join."""
    from data_ingestion_framework_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta gamma delta {i} epsilon zeta")
         for i in range(50)]
    )
    plan = _plan(containment_pairs(docs, n=5, threshold=0.5, max_gram_docs=10))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan  # the cap's oversize-gram removal


def test_contamination_fraction_broadcasts_bench_grams(spark):
    """The benchmark gram set is broadcast (eval sets are KBs against
    a 100 TB corpus) — the corpus side joins map-side, no corpus-wide
    exchange on the gram key."""
    from data_ingestion_framework_spark.operators.cleaning import (
        contamination_fraction,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(f"w{j+i}" for j in range(30)))
         for i in range(50)]
    )
    bench = docs.where(F.col("doc_id") == 0)
    plan = _plan(contamination_fraction(docs, bench, n=13))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pq_topk_is_scan_side_plus_one_window(spark):
    """ADC scoring is scan-side expressions over the encoded corpus ×
    broadcast query rows; the only shuffle is the per-query top-k
    window. Codebook lookups are literals in the plan, not joins."""
    from data_ingestion_framework_spark.operators.similarity import (
        pq_adc_topk,
        pq_train_codebooks,
    )

    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float((i * 7 + j) % 13) for j in range(8)])
         for i in range(40)]
    )
    books = pq_train_codebooks(emb, m=2, k=4, iters=1)
    plan = _plan(pq_adc_topk(emb, emb.where(F.col("vec_id") < 2), books, k=5))
    # the query side is an explicit broadcast nested-loop (tiny × corpus)
    assert "BroadcastNestedLoopJoin" in plan
    # exactly one Window NODE (the per-query top-k); the name also
    # appears inside windowspecdefinition expression text
    assert plan.count("- Window ") == 1
    assert "SortMergeJoin" not in plan


def test_pagerank_iterations_are_equi_joins(spark):
    """Every power-iteration step must be an equi-join + hash agg —
    never a cartesian/nested-loop — and the rank vector flows through
    a bounded number of exchanges per iteration."""
    from data_ingestion_framework_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [Row(src=f"n{i}", dst=f"n{(i * 3 + 1) % 20}") for i in range(60)]
    )
    plan = _plan(pagerank(edges, iterations=2, checkpoint_every=0))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # integer DIV contributions evaluate scan-side (projections), not
    # through any extra join
    assert "contrib" not in plan or "Join" in plan  # joins are equi only


def test_rrf_fuse_is_union_agg_topk(spark):
    """RRF = union (no shuffle) + one groupBy + the final top-k window;
    no joins at all — absence contributes zero by construction."""
    from data_ingestion_framework_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame([Row(id=i, rank=i + 1) for i in range(30)])
    b = spark.createDataFrame([Row(id=i * 2, rank=i + 1) for i in range(30)])
    plan = _plan(rrf_fuse([a, b], id_col="id", k=5))
    assert "Join" not in plan
    assert "Union" in plan
    assert plan.count("- Window ") == 1


def test_bpe_pair_counts_are_vocab_sized(spark):
    """The BPE trainer's per-round pair count aggregates the DISTINCT
    word table (map-side partial agg), and the re-segmentation fold is
    a projection — no join anywhere in the training loop."""
    from data_ingestion_framework_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame(
        [Row(text="aa bb aa cc dd " * 3)] * 5
    )
    # run one merge and inspect the FINAL words frame via the vocab
    merges, vocab = bpe_train_merges(df, n_merges=1, return_vocab=True)
    plan = _plan(vocab)
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
