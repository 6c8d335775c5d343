"""Property-based checks of the deterministic-sampling algebra: split
completeness/disjointness for arbitrary weights, quality-weighted
monotonicity in both weight and base fraction, and per-group cap
invariants — the contracts that make hash-threshold sampling safe to
re-run on a growing 100 TB corpus."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators.sampling import (
    cap_per_group,
    quality_weighted_sample,
    split_assign,
)

weights_st = st.lists(
    st.floats(0.05, 1.0, allow_nan=False), min_size=2, max_size=4
).map(lambda ws: {f"s{i}": w / sum(ws) for i, w in enumerate(ws)})


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(weights=weights_st)
def test_split_assign_partitions_every_row_exactly_once(spark, weights):
    df = spark.range(500).selectExpr("id AS doc_id")
    out = split_assign(df, weights)
    rows = out.collect()
    assert len(rows) == 500                       # complete: no row lost
    assert all(r["split"] in weights for r in rows)  # no phantom splits
    # deterministic: identical on re-run
    again = {(r["doc_id"], r["split"]) for r in split_assign(df, weights).collect()}
    assert {(r["doc_id"], r["split"]) for r in rows} == again


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    w_lo=st.floats(0.0, 1.0, allow_nan=False),
    w_hi=st.floats(0.0, 1.0, allow_nan=False),
    base=st.floats(0.1, 1.0, allow_nan=False),
)
def test_quality_weighted_sample_monotone_in_weight(spark, w_lo, w_hi, base):
    if w_lo > w_hi:
        w_lo, w_hi = w_hi, w_lo
    df = spark.range(400).selectExpr("id AS doc_id")
    lo = {
        r["doc_id"]
        for r in quality_weighted_sample(
            df.withColumn("w", F.lit(w_lo)), "w", base, salt="p"
        ).collect()
    }
    hi = {
        r["doc_id"]
        for r in quality_weighted_sample(
            df.withColumn("w", F.lit(w_hi)), "w", base, salt="p"
        ).collect()
    }
    assert lo <= hi  # raising the weight never evicts a kept row


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cap=st.integers(1, 30), n_groups=st.integers(1, 5))
def test_cap_per_group_bounds_and_determinism(spark, cap, n_groups):
    df = spark.range(300).selectExpr(
        "id AS doc_id", f"CAST(id % {n_groups} AS STRING) AS source"
    )
    out = cap_per_group(df, cap, group_col="source", id_col="doc_id")
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert all(n <= cap for n in counts.values())
    # groups smaller than the cap keep everything
    per_group = 300 // n_groups
    if per_group <= cap:
        assert all(n == per_group for n in counts.values())
    # deterministic draw
    a = {r["doc_id"] for r in out.collect()}
    b = {
        r["doc_id"]
        for r in cap_per_group(df, cap, group_col="source", id_col="doc_id").collect()
    }
    assert a == b


def test_token_budget_per_group_prefix_semantics(spark):
    """The kept set is the hash-ordered prefix: preceding total under
    budget, crossing doc kept, everything after dropped; a group whose
    first doc alone exceeds the budget still keeps that one doc."""
    from pyspark.sql import Row

    from data_ingestion_framework_spark.operators.sampling import (
        hash_bucket_hex,
        token_budget_per_group,
    )

    rows = [Row(doc_id=i, source="s" if i < 8 else "big",
                n_tok=50 if i < 8 else 1000) for i in range(10)]
    df = spark.createDataFrame(rows)
    kept = token_budget_per_group(df, 120, "source", "n_tok").collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # source s: docs in md5-hash order, cumulative 50/100/150... —
    # prefix with before < 120 keeps exactly 3 docs (0,50,100)
    order = [
        r["doc_id"]
        for r in df.where("source = 's'")
        .select("doc_id", hash_bucket_hex("doc_id").alias("h"))
        .orderBy("h", "doc_id")
        .collect()
    ]
    assert sorted(by_src["s"]) == sorted(order[:3])
    # oversized first doc still kept (budget < its token count)
    assert len(by_src["big"]) == 1


def test_leakage_safe_split_coassigns_exact_duplicates(spark):
    """Round-12: rows with identical normalized text must land in the
    SAME split regardless of their ids (the leakage mode row-id
    splitting permits), while distinct texts still spread across
    splits; a custom group expression (parent id for chunks) co-assigns
    by that key instead."""
    from data_ingestion_framework_spark.operators.sampling import (
        leakage_safe_split,
    )

    rows = [(i, f"unique text number {i}", i // 3) for i in range(60)]
    # make ids 100..104 exact (whitespace/case) variants of doc 0's text
    rows += [
        (100, "unique TEXT number 0", 0),
        (101, "  unique   text number 0 ", 0),
        (102, "Unique Text Number 0", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, parent long")
    out = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(
            df, {"train": 8, "val": 1, "test": 1}
        ).collect()
    }
    assert len({out[i] for i in (0, 100, 101, 102)}) == 1
    assert len(set(out.values())) > 1  # distinct texts do spread

    from pyspark.sql import functions as F

    by_parent = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(
            df, {"train": 8, "val": 1, "test": 1}, group=F.col("parent")
        ).collect()
    }
    groups: dict[int, set] = {}
    for (i, _, parent) in rows:
        groups.setdefault(parent, set()).add(by_parent[i])
    assert all(len(s) == 1 for s in groups.values())


def test_leakage_safe_split_with_near_dup_clusters(spark):
    """Fuzzy-leakage composition: near-dup EDGES -> connected-component
    cluster ids -> cluster-keyed split (singletons fall back to their
    own id via coalesce). Every cluster must land whole in one split —
    the group-key contract under a COMPUTED group expression."""
    from pyspark.sql import functions as F

    from data_ingestion_framework_spark.operators import dedup
    from data_ingestion_framework_spark.operators.sampling import (
        leakage_safe_split,
    )

    topics = [
        "the quick brown fox jumps over the lazy dog near the river",
        "machine learning pipelines shuffle data across many executors",
        "volcanic eruptions reshape coastlines over geological epochs",
        "the orchestra rehearsed the symphony in the old concert hall",
        "quarterly revenue exceeded projections in the northern region",
        "migrating birds navigate using magnetic fields and starlight",
        "the recipe calls for saffron cardamom and slow roasted garlic",
        "submarine cables carry almost all intercontinental traffic",
    ]
    rows = []
    for c, base in enumerate(topics):  # 8 clusters of 3 near-dup docs
        for v in range(3):
            rows.append((c * 10 + v, base + (" indeed" * v)))
    for i in range(200, 220):  # singletons
        rows.append((i, f"completely unrelated document number {i} " * 3))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    edges = dedup.ngram_jaccard_pairs(
        df, threshold=0.5, max_block_size=2000
    ).select("id_a", "id_b")
    clusters = dedup.dup_clusters(edges)  # (doc_id, cluster_id)
    grouped = df.join(clusters, "doc_id", "left")
    out = leakage_safe_split(
        grouped,
        {"train": 8, "val": 1, "test": 1},
        group=F.coalesce(F.col("cluster_id"), F.col("doc_id")),
    )
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    members = {}
    for r in clusters.collect():
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    assert len(members) >= 8
    for cid, docs in members.items():
        assert len({split_of[d] for d in docs}) == 1, (cid, docs)
    assert len(set(split_of.values())) > 1

def test_domain_reweight_by_quality_witness(spark):
    """domain_reweight_by_quality: membership must match a Python
    witness replaying the micro-unit weights, per-source sums, the
    arbitrary-precision threshold arithmetic and the salted-md5 draw
    — including a NULL source group, a zero-mass source (keeps
    nothing), the clip at f_s = 1, and the all-zero corpus."""
    import hashlib

    from data_ingestion_framework_spark.operators.sampling import (
        domain_reweight_by_quality,
    )

    rows = []
    weights = {"a": 0.9, "b": 0.2, "c": 0.0, None: 0.5}
    for i in range(200):
        src = [None, "a", "b", "c"][i % 4]
        rows.append((i, src, weights[src] + (0.05 if i % 8 == 0 else 0.0)))
    df = spark.createDataFrame(rows, "doc_id bigint, source string, w double")
    got = {
        r["doc_id"]
        for r in domain_reweight_by_quality(
            df, "w", target_fraction=0.5, salt="t"
        ).collect()
    }
    # witness
    stats: dict = {}
    for i, src, w in rows:
        w6 = int(min(max(w, 0.0), 1.0) * 1_000_000 + 0.5)
        n, spu = stats.get(src, (0, 0))
        stats[src] = (n + 1, spu + w6)
    n_total = sum(n for n, _ in stats.values())
    s_total = sum(s for _, s in stats.values())
    thr = {}
    for src, (ns, spu) in stats.items():
        f4 = (500_000 * n_total * spu * 10**4) // (10**6 * ns * s_total)
        thr[src] = min(f4 * 16**8 // 10**4, 16**8)
    want = {
        i
        for i, src, w in rows
        if int(hashlib.md5(("t" + str(i)).encode()).hexdigest()[:8], 16)
        < thr[src]
    }
    assert got == want
    assert any(src == "a" for i, src, _ in rows if i in got)
    assert not any(src == "c" for i, src, _ in rows if i in got)
    # clip at 1: a tiny all-quality domain under a high target keeps
    # EVERY row (threshold saturates the hex space)
    clip = spark.createDataFrame(
        [(1, "hi", 1.0), (2, "hi", 1.0)]
        + [(10 + i, "lo", 0.01) for i in range(50)],
        "doc_id bigint, source string, w double",
    )
    kept_hi = {
        r["doc_id"]
        for r in domain_reweight_by_quality(
            clip, "w", target_fraction=0.9, salt="t"
        ).collect()
        if r["source"] == "hi"
    }
    assert kept_hi == {1, 2}
    # zero total quality mass keeps nothing
    zero = spark.createDataFrame(
        [(1, "a", 0.0), (2, "b", 0.0)], "doc_id bigint, source string, w double"
    )
    assert (
        domain_reweight_by_quality(zero, "w", target_fraction=0.5).count() == 0
    )
    # a group whose weights are ALL NULL is zero-mass (keeps nothing),
    # not a driver crash; the non-NULL group still samples
    part_null = spark.createDataFrame(
        [(1, "a", None), (2, "a", None)]
        + [(10 + i, "b", 1.0) for i in range(20)],
        "doc_id bigint, source string, w double",
    )
    kept = {
        r["doc_id"]
        for r in domain_reweight_by_quality(
            part_null, "w", target_fraction=0.5, salt="t"
        ).collect()
    }
    assert kept and all(i >= 10 for i in kept)
    # empty input keeps nothing (and does not raise)
    empty = spark.createDataFrame([], "doc_id bigint, source string, w double")
    assert domain_reweight_by_quality(empty, "w").count() == 0


def test_domain_upsample_by_quality_witness(spark):
    """domain_upsample_by_quality: the full output MULTISET — which
    rows repeat, how many whole copies, which rows win the fractional
    epoch — must match a Python witness replaying the integer rate
    arithmetic and the salted-md5 draw; plus the skew guard, the
    zero-mass corpus and the empty frame."""
    import hashlib

    from data_ingestion_framework_spark.operators.sampling import (
        domain_upsample_by_quality,
    )

    rows = []
    weights = {"hi": 0.95, "mid": 0.5, None: 0.25}
    for i in range(120):
        src = ["hi", "mid", None][i % 3]
        rows.append((i, src, weights[src] + (0.03 if i % 7 == 0 else 0.0)))
    # a NULL-id row (review r15): it cannot enter the fractional
    # lottery (its md5 bucket is NULL) but must keep its WHOLE copies
    rows.append((None, "hi", 0.95))
    df = spark.createDataFrame(rows, "doc_id bigint, source string, w double")
    out = domain_upsample_by_quality(
        df, "w", target_factor=1.5, salt="u"
    ).collect()
    got = sorted(
        (r["doc_id"], r["copy"]) for r in out if r["doc_id"] is not None
    )
    null_copies = sorted(r["copy"] for r in out if r["doc_id"] is None)
    # witness
    stats: dict = {}
    for i, src, w in rows:
        w6 = int(min(max(w, 0.0), 1.0) * 1_000_000 + 0.5)
        n, spu = stats.get(src, (0, 0))
        stats[src] = (n + 1, spu + w6)
    n_total = sum(n for n, _ in stats.values())
    s_total = sum(s for _, s in stats.values())
    want = []
    null_want = None
    for i, src, w in rows:
        ns, spu = stats[src]
        r4 = (1_500_000 * n_total * spu * 10**4) // (10**6 * ns * s_total)
        copies = r4 // 10**4
        thr = ((r4 % 10**4) * 16**8) // 10**4
        if i is None:
            # NULL id: whole copies only — no fractional draw
            null_want = list(range(1, copies + 1))
            continue
        if int(hashlib.md5(("u" + str(i)).encode()).hexdigest()[:8], 16) < thr:
            copies += 1
        want.extend((i, c) for c in range(1, copies + 1))
    assert got == sorted(want)
    assert null_copies == null_want and null_want  # hi rate > 1: kept
    # the high-quality domain must actually cross rate 1 (whole-copy
    # repetition graded, not only the fractional draw)
    per_doc = {}
    for i, c in got:
        per_doc[i] = max(per_doc.get(i, 0), c)
    assert any(v >= 2 for i, v in per_doc.items() if i % 3 == 0)
    # skew guard: a tiny all-quality domain under a big target raises
    skew = spark.createDataFrame(
        [(1, "tiny", 1.0)] + [(10 + i, "big", 0.001) for i in range(400)],
        "doc_id bigint, source string, w double",
    )
    try:
        domain_upsample_by_quality(skew, "w", target_factor=1.0)
        raise AssertionError("expected max_rate ValueError")
    except ValueError as e:
        assert "max_rate" in str(e)
    # zero total mass emits nothing; empty frame emits nothing
    zero = spark.createDataFrame(
        [(1, "a", 0.0)], "doc_id bigint, source string, w double"
    )
    assert domain_upsample_by_quality(zero, "w").count() == 0
    empty = spark.createDataFrame([], "doc_id bigint, source string, w double")
    e = domain_upsample_by_quality(empty, "w")
    assert e.count() == 0 and "copy" in e.columns
    # negative target refuses
    try:
        domain_upsample_by_quality(df, "w", target_factor=-0.1)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# -- pure-integer arithmetic invariants of the domain samplers --------------
# (no Spark: these pin the driver-side threshold/rate math the Spark
# witnesses above deploy — arbitrary group multisets via hypothesis,
# the r14 calibrated-cut-property precedent)

groups_st = st.lists(
    st.tuples(st.integers(1, 10_000), st.integers(0, 1_000)),
    min_size=1,
    max_size=8,
).map(
    # (n_s, mean-quality in milli-units) -> (n_s, spu_s) with
    # spu_s <= n_s * 1e6 (weights clamp to [0, 1])
    lambda gs: [(n, n * q * 1000) for n, q in gs]
)


@settings(max_examples=200, deadline=None)
@given(groups=groups_st, tf6=st.integers(0, 10**6))
def test_domain_reweight_threshold_arithmetic_invariants(groups, tf6):
    """The reweighter's exact keep fractions: (1) the expected kept
    total never exceeds the target (floor only loses); (2) the
    per-group rounding deficit is bounded by one 1e-4 unit per group;
    (3) fractions are monotone in mean quality; (4) thresholds clip
    into the hex space."""
    n_total = sum(n for n, _ in groups)
    s_total = sum(spu for _, spu in groups)
    if s_total == 0:
        return
    f4s = [
        (n, spu, (tf6 * n_total * spu * 10**4) // (10**6 * n * s_total))
        for n, spu in groups
    ]
    kept4 = sum(n * f4 for n, _, f4 in f4s)
    target4 = tf6 * n_total // 100  # tf6/1e6 * N * 1e4
    assert kept4 <= target4
    assert kept4 > target4 - sum(n for n, _, _ in f4s) - 10**4
    # monotone: a group with a higher mean has a >= keep fraction
    means = sorted((spu / n, f4) for n, spu, f4 in f4s)
    for (m1, f1), (m2, f2) in zip(means, means[1:]):
        if m1 < m2:
            assert f1 <= f2
    for n, spu, f4 in f4s:
        thr = min((f4 * 16**8) // 10**4, 16**8)
        assert 0 <= thr <= 16**8


@settings(max_examples=200, deadline=None)
@given(groups=groups_st, tf6=st.integers(0, 4 * 10**6))
def test_domain_upsample_rate_arithmetic_invariants(groups, tf6):
    """The upsampler's exact rates: (1) expected OUTPUT size (whole
    copies + fractional-draw expectation) never exceeds target·N and
    loses at most one 1e-4 unit per group; (2) rates are monotone in
    mean quality; (3) the whole/fractional split reassembles r4
    exactly."""
    n_total = sum(n for n, _ in groups)
    s_total = sum(spu for _, spu in groups)
    if s_total == 0:
        return
    r4s = [
        (n, spu, (tf6 * n_total * spu * 10**4) // (10**6 * n * s_total))
        for n, spu in groups
    ]
    out4 = sum(n * r4 for n, _, r4 in r4s)
    target4 = tf6 * n_total // 100
    assert out4 <= target4
    assert out4 > target4 - sum(n for n, _, _ in r4s) - 10**4
    means = sorted((spu / n, r4) for n, spu, r4 in r4s)
    for (m1, r1), (m2, r2) in zip(means, means[1:]):
        if m1 < m2:
            assert r1 <= r2
    for n, spu, r4 in r4s:
        base, frac4 = r4 // 10**4, r4 % 10**4
        assert base * 10**4 + frac4 == r4
        thr = (frac4 * 16**8) // 10**4
        assert 0 <= thr < 16**8  # fractional part strictly inside
