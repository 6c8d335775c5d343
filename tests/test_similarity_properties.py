"""Property-based checks of the round-7 similarity/sketch surface:
sign-bit packing agrees with a Python witness for arbitrary vectors,
Hamming distance is the true sign-disagreement count (a metric), KMV
set-overlap is EXACT below the sketch bound for arbitrary sets, and
the incremental MinHash index always detects an exact duplicate —
the contracts that keep the bandwidth-cheap paths trustworthy at
corpus scale."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators import dedup, similarity, sketches

vec_st = st.lists(
    st.floats(-2.0, 2.0, allow_nan=False, width=32), min_size=64, max_size=64
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(v=vec_st, w=vec_st)
def test_binary_signature_hamming_is_sign_disagreement_count(spark, v, w):
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=v), Row(vec_id=2, embedding=w)]
    )
    sigs = {
        r["vec_id"]: r["s"]
        for r in df.select(
            "vec_id",
            similarity.binary_signature(F.col("embedding"), 64).alias("s"),
        ).collect()
    }
    # Python witness: pack the same bit layout independently
    def pack(x):
        words = []
        for j in range(2):
            acc = 0
            for b in x[j * 32 : (j + 1) * 32]:
                acc = acc * 2 + (1 if b > 0 else 0)
            words.append(acc)
        return words

    assert sigs[1] == pack(v) and sigs[2] == pack(w)
    ham = df.agg(
        similarity.hamming_distance(
            F.first(similarity.binary_signature(F.col("embedding"), 64)),
            F.last(similarity.binary_signature(F.col("embedding"), 64)),
        ).alias("h")
    ).first()["h"]
    expected = sum(1 for a, b in zip(v, w) if (a > 0) != (b > 0))
    assert ham == expected


sets_st = st.lists(
    st.sets(st.integers(0, 400), min_size=1, max_size=40),
    min_size=2,
    max_size=3,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(groups=sets_st)
def test_kmv_set_overlap_exact_below_sketch_bound(spark, groups):
    rows = [
        Row(g=f"g{i}", v=int(x)) for i, s in enumerate(groups) for x in s
    ]
    df = spark.createDataFrame(rows)
    out = {
        (r["group_a"], r["group_b"]): r
        for r in sketches.kmv_set_overlap(df, "g", "v", k=64).collect()
    }
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            a, b = groups[i], groups[j]
            if len(a | b) >= 64:
                continue  # estimate regime — bounds, not exactness
            r = out[(f"g{i}", f"g{j}")]
            assert r["approx_union"] == len(a | b)
            assert r["approx_intersection"] == len(a & b)
            assert r["kmv_jaccard"] == round(len(a & b) / len(a | b), 4)


words_st = st.lists(
    st.text(alphabet="abcdefgh", min_size=3, max_size=8),
    min_size=8,
    max_size=20,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=words_st)
def test_incremental_minhash_always_detects_exact_duplicate(spark, words):
    text = " ".join(words)
    idx = dedup.minhash_md5_signatures(
        spark.createDataFrame([Row(doc_id=1, text=text)])
    )
    bat = dedup.minhash_md5_signatures(
        spark.createDataFrame(
            [Row(doc_id=10, text=text),            # exact dup
             Row(doc_id=11, text="zz " * 40)]      # disjoint alphabet
        )
    )
    out = {
        (r["id_new"], r["id_index"]): r["sig_agreement"]
        for r in dedup.minhash_incremental_pairs(
            bat, idx, min_agreement=0.5
        ).collect()
    }
    assert out[(10, 1)] == 1.0       # identical sigs -> all bands collide
    assert (11, 1) not in out


def test_sampled_training_local_matches_distributed(spark):
    """train_sample now runs Lloyd DRIVER-SIDE on the collected sample
    (the FAISS bounded-training model, one Spark action per build).
    Pin: identical output to the distributed iterations run over the
    same sample frame — assignment semantics (sequential-sum metrics,
    HALF_UP round-6, low-id ties) are op-for-op the scan-side
    expressions."""
    import random

    rng = random.Random(7)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows)
    sample = similarity._training_sample(
        similarity._spread(emb.select("vec_id", "embedding")), "vec_id", 32
    )
    c_dist = similarity.ivf_train_centroids(sample, n_cells=4, iters=2)
    b_dist = similarity.pq_train_codebooks(sample, m=2, k=4, iters=2)
    c_loc = similarity.ivf_train_centroids(
        emb, n_cells=4, iters=2, train_sample=32
    )
    b_loc = similarity.pq_train_codebooks(
        emb, m=2, k=4, iters=2, train_sample=32
    )

    def flat(x):
        out = []

        def rec(v):
            if isinstance(v, list):
                for e in v:
                    rec(e)
            else:
                out.append(v)

        rec(x)
        return out

    for a, b in zip(flat(c_dist), flat(c_loc)):
        assert abs(a - b) < 1e-9
    for a, b in zip(flat(b_dist), flat(b_loc)):
        assert abs(a - b) < 1e-9


def test_ivfpq_train_fused_matches_separate(spark):
    """The fused IVF+PQ build (one seed collect, one combined means job
    per iteration) returns exactly what the two standalone builds
    return — in both full-corpus and sampled modes."""
    import random

    rng = random.Random(11)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
        for i in range(50)
    ]
    emb = spark.createDataFrame(rows)
    c1 = similarity.ivf_train_centroids(emb, n_cells=4, iters=2)
    b1 = similarity.pq_train_codebooks(emb, m=2, k=4, iters=2)
    c2, b2 = similarity.ivfpq_train(emb, n_cells=4, m=2, k=4, iters=2)
    assert c1 == c2 and b1 == b2

    c3 = similarity.ivf_train_centroids(emb, n_cells=4, iters=2, train_sample=16)
    b3 = similarity.pq_train_codebooks(emb, m=2, k=4, iters=2, train_sample=16)
    c4, b4 = similarity.ivfpq_train(
        emb, n_cells=4, m=2, k=4, iters=2, train_sample=16
    )
    assert c3 == c4 and b3 == b4


def test_sampled_training_short_corpus(spark):
    """Sampled training on a corpus smaller than n_cells/k clamps to
    the available seeds (matching the distributed path's behavior)
    instead of raising IndexError."""
    rows = [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(3)]
    emb = spark.createDataFrame(rows)
    c = similarity.ivf_train_centroids(emb, n_cells=4, iters=2, train_sample=8)
    assert len(c) == 3
    b = similarity.pq_train_codebooks(emb, m=2, k=4, iters=1, train_sample=8)
    assert len(b) == 2 and all(len(book) == 3 for book in b)


def test_fused_residual_build_matches_unfused(spark):
    """ivfpq_train_residual (one seed scan) must produce bit-identical
    centroids AND residual codebooks to the unfused chain the DuckDB
    oracle re-derives (ivf_train_centroids → ivf_residuals →
    pq_train_codebooks)."""
    import random

    from pyspark.sql import Row

    from data_ingestion_framework_spark.operators.similarity import (
        ivf_residuals,
        ivf_train_centroids,
        ivfpq_train_residual,
        pq_train_codebooks,
    )

    rng = random.Random(7)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    cents_u = ivf_train_centroids(df, n_cells=4, iters=2)
    rs = ivf_residuals(df, cents_u)
    books_u = pq_train_codebooks(rs, m=2, k=6, iters=2, vec_col="__residual")
    cents_f, books_f = ivfpq_train_residual(df, n_cells=4, m=2, k=6, iters=2)
    assert cents_f == cents_u
    assert books_f == books_u


def test_ann_recall_counts_overlap_per_query(spark):
    from pyspark.sql import Row

    from data_ingestion_framework_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [Row(q_id=q, vec_id=v) for q in (1, 2) for v in range(5)]
    )
    ann = spark.createDataFrame(
        # q1 recovered 5/5, q2 recovered 2/5 (plus a non-exact extra,
        # which must not count)
        [Row(q_id=1, vec_id=v) for v in range(5)]
        + [Row(q_id=2, vec_id=0), Row(q_id=2, vec_id=3), Row(q_id=2, vec_id=99)]
    )
    got = {r["q_id"]: (r["hits"], r["recall_at_5"])
           for r in ann_recall(exact, ann, k=5).collect()}
    assert got == {1: (5, 1.0), 2: (2, 0.4)}


def test_ann_ndcg_bounds_and_perfect_ranking(spark):
    """nDCG = 1 exactly when the ANN list IS the exact list; 0 when
    disjoint; a late hit earns less than an early one."""
    from data_ingestion_framework_spark.operators.similarity import ann_ndcg

    exact = spark.createDataFrame(
        [(0, i) for i in range(1, 4)], "q_id long, vec_id long"
    )
    perfect = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3)], "q_id long, vec_id long, rank int"
    )
    assert ann_ndcg(exact, perfect, k=3).collect()[0]["ndcg_at_3"] == 1.0
    disjoint = spark.createDataFrame(
        [(0, 9, 1), (0, 8, 2), (0, 7, 3)], "q_id long, vec_id long, rank int"
    )
    assert ann_ndcg(exact, disjoint, k=3).collect()[0]["ndcg_at_3"] == 0.0
    early = spark.createDataFrame(
        [(0, 1, 1), (0, 9, 2), (0, 8, 3)], "q_id long, vec_id long, rank int"
    )
    late = spark.createDataFrame(
        [(0, 9, 1), (0, 8, 2), (0, 1, 3)], "q_id long, vec_id long, rank int"
    )
    e = ann_ndcg(exact, early, k=3).collect()[0]["ndcg_at_3"]
    l = ann_ndcg(exact, late, k=3).collect()[0]["ndcg_at_3"]
    assert 0.0 < l < e < 1.0


def test_ann_ndcg_small_exact_set_and_empty_ann(spark):
    """The normalizer is per query: a perfect ranking of the only 2
    true neighbors that exist scores 1.0 even at k=5 (idcg = first 2
    discounts, not 5); and a query whose ANN list has no rank<=k rows
    surfaces as ndcg 0 instead of vanishing from the output."""
    from data_ingestion_framework_spark.operators.similarity import ann_ndcg

    exact = spark.createDataFrame(
        [(0, 1), (0, 2), (7, 3), (7, 4)], "q_id long, vec_id long"
    )
    # q 0: perfect ranking of its 2-member exact set; q 7: absent ANN
    ann = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2)], "q_id long, vec_id long, rank int"
    )
    got = {r["q_id"]: r["ndcg_at_5"] for r in ann_ndcg(exact, ann, k=5).collect()}
    assert got == {0: 1.0, 7: 0.0}
    # a partial hit on the short exact set normalizes by the SHORT idcg:
    # hit at rank 1 over a 2-member set = 1 / (1 + 1/log2(3)) ≈ 0.613147
    partial = spark.createDataFrame(
        [(0, 1, 1), (0, 99, 2), (7, 3, 1), (7, 4, 2)],
        "q_id long, vec_id long, rank int",
    )
    got = {r["q_id"]: r["ndcg_at_5"] for r in ann_ndcg(exact, partial, k=5).collect()}
    assert got[7] == 1.0 and 0.61 < got[0] < 0.62


def test_ivf_knn_join_matches_broadcast_probe_path(spark):
    """ivf_knn_join (both-sides-large: cell-co-partitioned shuffle
    join, no query broadcast) must return EXACTLY what ivf_cosine_topk
    (broadcast-query path) returns for the same centroids/nprobe/k —
    the two plans differ only in data movement. Also pins exclude_self
    and the two-frame form (left ids disjoint from right ids)."""
    from data_ingestion_framework_spark.operators.similarity import (
        ivf_cosine_topk,
        ivf_knn_join,
        ivf_train_centroids,
    )

    vecs = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)])
        for i in range(60)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    cents = ivf_train_centroids(emb, n_cells=4, iters=2)
    queries = emb.select(F.col("vec_id").alias("q_id"), "embedding")
    got = {
        (r["q_id"], r["vec_id"], r["cos_sim"])
        for r in ivf_knn_join(
            queries, emb, cents, k=3, nprobe=2, exclude_self=True
        ).collect()
    }
    want = {
        (r["q_id"], r["vec_id"], r["cos_sim"])
        for r in ivf_cosine_topk(emb, emb, cents, k=3, nprobe=2).collect()
    }
    assert got == want and len(got) > 0
    # two-frame form: disjoint id spaces, no self-exclusion needed
    left = spark.createDataFrame(
        [(1000 + i, v) for i, v in vecs[:5]], "q_id long, embedding array<float>"
    )
    out = ivf_knn_join(left, emb, cents, k=3, nprobe=2).collect()
    assert {r["q_id"] for r in out} == {1000 + i for i in range(5)}
    per_q = {}
    for r in out:
        per_q.setdefault(r["q_id"], []).append(r["cos_sim"])
    assert all(len(v) == 3 and v == sorted(v, reverse=True) for v in per_q.values())


def test_ivf_index_refresh_incremental_and_crash_heal(spark, tmp_path):
    """The persisted IVF index folds ONLY new commits (read_since), a
    no-op refresh indexes nothing, a crash between append and the
    property write heals from the commit metrics, and the probe equals
    the from-scratch broadcast probe value-for-value with partition
    pruning on the cell directories."""
    from data_ingestion_framework_spark.operators.similarity import (
        IVF_INDEX_CURSOR_PROP,
        ivf_cosine_topk,
        ivf_index_probe_topk,
        ivf_index_refresh,
        ivf_train_centroids,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    vecs = [
        (i, [float((i * 5 + j * 3) % 13 - 6) for j in range(8)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    cents = ivf_train_centroids(emb, n_cells=4, iters=2)
    base = ParquetTable(spark, str(tmp_path / "emb"))
    base.append(emb.where(F.col("vec_id") < 25))
    idx = ParquetTable(spark, str(tmp_path / "idx"))
    m1 = ivf_index_refresh(base, idx, cents)
    assert m1["rows_indexed"] == 25
    base.append(emb.where(F.col("vec_id") >= 25))
    m2 = ivf_index_refresh(base, idx, cents)
    assert m2["rows_indexed"] == 15  # delta only, never the corpus
    assert ivf_index_refresh(base, idx, cents)["rows_indexed"] == 0
    # crash heal: property write lost, commit metrics survive
    props = idx.properties()
    del props[IVF_INDEX_CURSOR_PROP]
    idx.set_properties(props)
    assert ivf_index_refresh(base, idx, cents)["rows_indexed"] == 0
    # double-crash heal: property STALE (old cursor), not missing —
    # the recorded commit-metrics cursor must win (max discipline),
    # otherwise the delta would be appended twice
    idx.set_properties(
        {**idx.properties(), IVF_INDEX_CURSOR_PROP: str(m1["cursor_seq"])}
    )
    assert ivf_index_refresh(base, idx, cents)["rows_indexed"] == 0
    assert idx.read().count() == 40  # no duplicate (vec_id, cell) rows
    # probe == from-scratch broadcast probe, with partition pruning
    queries = emb.where(F.col("vec_id") < 3)
    got = ivf_index_probe_topk(idx, queries, cents, k=4, nprobe=2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan
    want = {
        (r["q_id"], r["vec_id"], r["cos_sim"])
        for r in ivf_cosine_topk(emb, queries, cents, k=4, nprobe=2).collect()
    }
    assert {
        (r["q_id"], r["vec_id"], r["cos_sim"]) for r in got.collect()
    } == want and len(want) > 0


def test_jl_project_matches_python_witness(spark):
    """jl_project == the plain matrix-vector product (rounded), the
    seeded Achlioptas matrix is deterministic and ~1/3 dense, and the
    projection composes with cosine_topk (scale-invariance is why the
    JL scale factor is dropped)."""
    from data_ingestion_framework_spark.operators.similarity import (
        jl_project,
        jl_random_matrix,
    )

    m = jl_random_matrix(8, 4, seed=7)
    assert m == jl_random_matrix(8, 4, seed=7)
    assert {x for row in m for x in row} <= {-1.0, 0.0, 1.0}
    nz = sum(1 for row in m for x in row if x != 0.0)
    assert 0 < nz < 32  # sparse but not empty
    v = [0.5, -1.25, 2.0, 0.0, 3.5, -0.75, 1.0, -2.0]
    df = spark.createDataFrame([(1, v)], "vec_id long, embedding array<float>")
    got = jl_project(df, m).first()["jl_vec"]
    want = [round(sum(a * b for a, b in zip(v, row)), 4) for row in m]
    assert [round(x, 4) for x in got] == want


def test_ivf_index_refresh_missing_base_raises(spark, tmp_path):
    import pytest

    from data_ingestion_framework_spark.operators.similarity import (
        ivf_index_refresh,
    )
    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    base = ParquetTable(spark, str(tmp_path / "nope"))
    idx = ParquetTable(spark, str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="does not exist"):
        ivf_index_refresh(base, idx, [[1.0, 0.0]])


def test_ivf_knn_join_pq_full_shortlist_matches_uncompressed(spark):
    """With a shortlist covering every probed candidate, the exact
    rescore sees the same pair set as the uncompressed join, so the
    PQ join must match it row-for-row — the ADC stage only decides
    the shortlist CUT, never a kept pair's score."""
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(24)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids, books = similarity.ivfpq_train(
        emb, n_cells=2, m=2, k=4, iters=1
    )
    queries = emb.select(F.col("vec_id").alias("q_id"), "embedding")
    exact = similarity.ivf_knn_join(
        queries, emb, centroids, k=3, nprobe=2, exclude_self=True
    )
    pq = similarity.ivf_knn_join_pq(
        queries, emb, centroids, books,
        k=3, nprobe=2, shortlist=100, exclude_self=True,
    )
    a = sorted(map(tuple, exact.collect()))
    b = sorted(map(tuple, pq.collect()))
    assert a == b and len(a) == 24 * 3


def test_ivf_knn_join_pq_shortlist_below_k_raises(spark):
    import pytest

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="shortlist"):
        similarity.ivf_knn_join_pq(
            emb.select(F.col("vec_id").alias("q_id"), "embedding"),
            emb,
            [[1.0, 0.0]],
            [[[1.0], [0.0]]],
            k=5,
            shortlist=2,
        )


def test_ivf_knn_join_pq_recall_measured(spark):
    """A tight shortlist still returns k rows per query and its
    recall@k vs the uncompressed join is measurable via ann_recall —
    the gauge every bounded shortlist ships with."""
    import random

    rng = random.Random(17)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids, books = similarity.ivfpq_train(
        emb, n_cells=2, m=2, k=4, iters=1
    )
    queries = emb.select(F.col("vec_id").alias("q_id"), "embedding")
    exact = similarity.ivf_knn_join(
        queries, emb, centroids, k=3, nprobe=2, exclude_self=True
    )
    pq = similarity.ivf_knn_join_pq(
        queries, emb, centroids, books,
        k=3, nprobe=2, shortlist=3, exclude_self=True,
    )
    per_q = pq.groupBy("q_id").count().collect()
    assert all(r["count"] <= 3 for r in per_q) and len(per_q) == 30
    rec = similarity.ann_recall(exact, pq, k=3).collect()
    assert len(rec) == 30
    assert all(0.0 <= r["recall_at_3"] <= 1.0 for r in rec)


# ---------------------------------------------------------------------------
# Power-iteration PCA: plain-Python witness parity — the iteration is
# integer fixed-point end to end, so the witness matches EXACTLY.
# ---------------------------------------------------------------------------
def _py_power_iteration(vecs, iters=3, scale=10**6):
    import math

    from data_ingestion_framework_spark.operators.similarity import (
        _round_units,
    )

    xi = [[_round_units(x * scale) for x in v] for v in vecs]
    dim = len(xi[0])
    v = [scale] * dim
    for _ in range(iters):
        z = [sum(a * b for a, b in zip(row, v)) for row in xi]
        s = [sum(z[d] * xi[d][j] for d in range(len(xi))) for j in range(dim)]
        acc = 0.0
        for x in s:
            acc += float(x) * float(x)
        norm = math.sqrt(acc)
        v = [_round_units(float(x) / norm * scale) for x in s]
    return xi, v


def test_power_iteration_matches_python_witness(spark):
    from data_ingestion_framework_spark.operators import similarity

    vecs = [
        [1.25, -0.5, 0.125],
        [0.75, 0.25, -1.0],
        [-0.333333, 0.666667, 0.111111],
        [2.0, 1.5, 0.0],
        [0.0, 0.0, 0.0],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    got_v = similarity.power_iteration_top_direction(df, iters=3)
    xi, exp_v = _py_power_iteration(vecs)
    assert got_v == exp_v
    projs = {
        r["vec_id"]: r["proj_units"]
        for r in similarity.principal_projections(df, got_v).collect()
    }
    for i, row in enumerate(xi):
        assert projs[i] == sum(a * b for a, b in zip(row, exp_v)), i


def test_power_iteration_deterministic_and_unit_norm(spark):
    from data_ingestion_framework_spark.operators import similarity

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v1 = similarity.power_iteration_top_direction(df, iters=2)
    v2 = similarity.power_iteration_top_direction(df, iters=2)
    assert v1 == v2
    # unit direction in 1e-6 units: sum of squares ~ scale^2
    ss = sum(u * u for u in v1)
    assert abs(ss - 10**12) < 10**8, ss


def test_power_iteration_empty_corpus_raises(spark):
    from data_ingestion_framework_spark.operators import similarity

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    try:
        similarity.power_iteration_top_direction(df)
        raise AssertionError("expected ValueError on empty corpus")
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# Greedy k-center: Python witness parity (exact integer trajectory)
# plus the farthest-first invariants.
# ---------------------------------------------------------------------------
def _py_kcenter(ids_vecs, k, scale=10**6):
    import hashlib as _h

    from data_ingestion_framework_spark.operators.similarity import (
        _round_units,
    )

    xi = {i: [_round_units(x * scale) for x in v] for i, v in ids_vecs}
    seed = min(xi, key=lambda i: (_h.md5(str(i).encode()).hexdigest(), i))
    centers = [seed]

    def sq(a, b):
        return sum((p - q) * (p - q) for p, q in zip(a, b))

    for _ in range(1, k):
        far = max(
            xi,
            key=lambda i: (min(sq(xi[i], xi[c]) for c in centers), -i),
        )
        if min(sq(xi[far], xi[c]) for c in centers) == 0:
            break
        centers.append(far)
    assign = {}
    for i in xi:
        d, r = min(
            (sq(xi[i], xi[c]), rank) for rank, c in enumerate(centers)
        )
        assign[i] = (centers[r], d)
    return centers, assign


def test_kcenter_matches_python_witness(spark):
    from data_ingestion_framework_spark.operators import similarity

    ids_vecs = [
        (1, [0.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, [0.0, 1.5]),
        (4, [10.0, 10.0]),
        (5, [10.0, 10.5]),
        (6, [-5.0, 2.0]),
        (7, [0.1, 0.1]),
    ]
    df = spark.createDataFrame(
        ids_vecs, "vec_id long, embedding array<double>"
    )
    centers = similarity.kcenter_select(df, k=3)
    exp_centers, exp_assign = _py_kcenter(ids_vecs, 3)
    assert [c[0] for c in centers] == exp_centers
    got = {
        r["vec_id"]: (r["center_id"], r["dist_units"])
        for r in similarity.kcenter_assign(df, centers).collect()
    }
    assert got == exp_assign


def test_kcenter_duplicate_corpus_stops_early(spark):
    from data_ingestion_framework_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    centers = similarity.kcenter_select(df, k=3)
    assert len(centers) == 1  # all vectors coincide: one center covers


def test_kcenter_cover_radius_shrinks_monotonically(spark):
    from data_ingestion_framework_spark.operators import similarity
    from pyspark.sql import functions as F

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    radii = []
    for k in (1, 2, 4):
        centers = similarity.kcenter_select(df, k=k)
        r = (
            similarity.kcenter_assign(df, centers)
            .agg(F.max("dist_units"))
            .first()[0]
        )
        radii.append(r)
    assert radii[0] >= radii[1] >= radii[2]
    assert radii[2] < radii[0]


# ---------------------------------------------------------------------------
# MMR: Python witness parity (exact integer greedy trajectory).
# ---------------------------------------------------------------------------
def test_mmr_select_matches_python_witness(spark):
    from data_ingestion_framework_spark.operators import similarity
    from data_ingestion_framework_spark.operators.similarity import (
        _round_units,
    )

    vecs = {
        1: [1.0, 0.0, 0.0],
        2: [0.9, 0.1, 0.0],     # relevant but redundant with 1
        3: [0.0, 1.0, 0.0],
        4: [0.5, 0.5, 0.5],
        5: [-1.0, 0.2, 0.1],
    }
    q = [1.0, 0.5, 0.0]
    df = spark.createDataFrame(
        list(vecs.items()), "vec_id long, embedding array<double>"
    )
    scale = 10**6
    qu = [_round_units(x * scale) for x in q]
    xi = {i: [_round_units(x * scale) for x in v] for i, v in vecs.items()}

    def dot(a, b):
        return sum(p * r for p, r in zip(a, b))

    # witness greedy (lambda = 1/2: score = rel - max_sim)
    rel = {i: dot(v, qu) for i, v in xi.items()}
    sel, expected = [], []
    for rank in range(1, 4):
        cands = [i for i in xi if i not in sel]
        if sel:
            scored = [
                (rel[i] - max(dot(xi[i], xi[s]) for s in sel), -i, i)
                for i in cands
            ]
        else:
            scored = [(rel[i], -i, i) for i in cands]
        _, _, best = max(scored)
        expected.append(
            (
                rank,
                best,
                rel[best],
                max(dot(xi[best], xi[s]) for s in sel) if sel else None,
            )
        )
        sel.append(best)

    picks = similarity.mmr_select(df, qu, k=3)
    got = [
        (p["rank"], p["id"], p["rel_units"], p["max_prev_sim_units"])
        for p in picks
    ]
    assert got == expected
    # first pick is the pure-relevance argmax; later picks diversify
    assert got[0][1] == max(rel, key=lambda i: (rel[i], -i))


def test_mmr_select_k_exceeding_corpus_truncates(spark):
    from data_ingestion_framework_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    picks = similarity.mmr_select(df, [10**6, 0], k=5)
    assert len(picks) == 2


def test_kcenter_assign_preserves_string_ids(spark):
    from data_ingestion_framework_spark.operators import similarity

    df = spark.createDataFrame(
        [("a", [0.0, 0.0]), ("b", [5.0, 5.0]), ("c", [0.1, 0.0])],
        "vec_id string, embedding array<double>",
    )
    centers = similarity.kcenter_select(df, k=2)
    got = {
        r["vec_id"]: r["center_id"]
        for r in similarity.kcenter_assign(df, centers).collect()
    }
    assert set(got.values()) <= {"a", "b", "c"}
    assert None not in got.values()


def test_fixed_point_operators_refuse_overflow_magnitudes(spark):
    """Silent int64 wrap is forbidden: huge-magnitude embeddings raise
    up front instead of returning a plausible wrong answer."""
    from data_ingestion_framework_spark.operators import similarity

    big = spark.createDataFrame(
        [(1, [1.0e7, 0.0]), (2, [0.0, 1.0e7]), (3, [5.0e6, 5.0e6])],
        "vec_id long, embedding array<double>",
    )
    for call in (
        lambda: similarity.power_iteration_top_direction(big, iters=1),
        lambda: similarity.kcenter_select(big, k=2),
        lambda: similarity.mmr_select(big, [10**13, 10**13], k=2),
    ):
        try:
            call()
            raise AssertionError("expected overflow-guard ValueError")
        except ValueError as e:
            assert "overflow" in str(e)


def test_power_iteration_rayleigh_quotient_is_monotone(spark):
    """von Mises invariant: each iteration's direction explains at
    least as much second-moment energy as the last (tiny slack for the
    1e-6 unit rounding) — catches any sign/indexing bug the exact
    witness parity test could share with the implementation."""
    from data_ingestion_framework_spark.operators import similarity

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    xi = [
        [float(x) for x in r["__xi"]]
        for r in similarity._fixed_point_vectors(
            df, "vec_id", "embedding", 10**6
        ).collect()
    ]

    def rayleigh(v):
        vv = sum(a * a for a in v)
        return sum(
            sum(a * b for a, b in zip(row, v)) ** 2 for row in xi
        ) / vv

    rqs = [
        rayleigh([float(u) for u in similarity.power_iteration_top_direction(df, iters=i)])
        for i in (1, 2, 3)
    ]
    assert rqs[1] >= rqs[0] * 0.999999
    assert rqs[2] >= rqs[1] * 0.999999


def test_greedy_selectors_refuse_k_above_cap(spark):
    """Round-11 verdict #5: the greedy rounds inline an O(k²·dim)
    literal tree, so k above GREEDY_SELECT_MAX_K must raise up front
    (same enforced-cap discipline as the dense feature fold)."""
    from data_ingestion_framework_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    over = similarity.GREEDY_SELECT_MAX_K + 1
    for call in (
        lambda: similarity.kcenter_select(df, k=over),
        lambda: similarity.mmr_select(df, [10**6, 0], k=over),
    ):
        try:
            call()
            raise AssertionError("expected k-cap ValueError")
        except ValueError as e:
            assert "GREEDY_SELECT_MAX_K" in str(e)


def test_fixed_point_operators_refuse_ragged_corpus(spark):
    """ADVICE r11: a ragged embedding column NULL-pads zip_with and
    the exact dot folds to NULL — rows would silently sort last or
    drop out of sums. The operators must refuse instead."""
    from data_ingestion_framework_spark.operators import similarity

    ragged = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0, 0.5]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    for call in (
        lambda: similarity.power_iteration_directions(ragged, 1, iters=1),
        lambda: similarity.kcenter_select(ragged, k=2),
        lambda: similarity.mmr_select(ragged, [10**6, 0], k=2),
    ):
        try:
            call()
            raise AssertionError("expected ragged-corpus ValueError")
        except ValueError as e:
            assert "ragged" in str(e)
    uniform = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    try:
        similarity.mmr_select(uniform, [10**6, 0, 0], k=1)
        raise AssertionError("expected query-length ValueError")
    except ValueError as e:
        assert "query vector length" in str(e)


def test_power_iteration_directions_deflated_orthogonal(spark):
    """Top-r deflation (round-11 verdict #7): the returned directions
    are pairwise orthogonal up to unit rounding (|v_a·v_b| ≤
    dim·scale), each is unit-norm in units, and the r=1 path is
    bit-identical to the single-direction entry point."""
    from data_ingestion_framework_spark.operators import similarity

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dirs = similarity.power_iteration_directions(df, 3, iters=2)
    assert len(dirs) == 3
    dim = len(dirs[0])
    scale = 10**6
    for v in dirs:
        ss = sum(u * u for u in v)
        assert abs(ss - scale**2) < 10**8, ss
    for a in range(3):
        for b in range(a + 1, 3):
            dot = sum(x * y for x, y in zip(dirs[a], dirs[b]))
            assert abs(dot) <= dim * scale, (a, b, dot)
    assert dirs[0] == similarity.power_iteration_top_direction(df, iters=2)

    projs = similarity.principal_projections_multi(df, dirs[:2]).collect()
    xi = {
        r["vec_id"]: [int(x) for x in r["__xi"]]
        for r in similarity._fixed_point_vectors(
            df, "vec_id", "embedding", scale
        ).collect()
    }
    for r in projs:
        row = xi[r["vec_id"]]
        assert r["proj1_units"] == sum(a * b for a, b in zip(row, dirs[0]))
        assert r["proj2_units"] == sum(a * b for a, b in zip(row, dirs[1]))


def test_principal_projections_refuse_ragged_and_mismatch(spark):
    """Self-review r12: the projection operators share the
    NULL-folding-dot refusal (COVERAGE's 'every fixed-point vector
    operator' claim) — ragged corpora and direction-length mismatches
    raise instead of emitting silent NULL projections."""
    from data_ingestion_framework_spark.operators import similarity

    ragged = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    uniform = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    for call, msg in (
        (lambda: similarity.principal_projections(ragged, [10**6, 0]), "ragged"),
        (
            lambda: similarity.principal_projections_multi(
                ragged, [[10**6, 0]]
            ),
            "ragged",
        ),
        (
            lambda: similarity.principal_projections(uniform, [10**6, 0, 0]),
            "direction length",
        ),
        (
            lambda: similarity.principal_projections_multi(
                uniform, [[10**6, 0, 0]]
            ),
            "direction length",
        ),
        (
            lambda: similarity.principal_projections_multi(
                uniform, [[10**6, 0], [10**6]]
            ),
            "direction lengths differ",
        ),
    ):
        try:
            call().collect()
            raise AssertionError(f"expected ValueError ({msg})")
        except ValueError as e:
            assert msg in str(e), (msg, str(e))
    # validate=False keeps the zero-extra-scan expression-only path
    assert (
        similarity.principal_projections(
            uniform, [10**6, 0], validate=False
        ).count()
        == 2
    )


def test_knn_join_pq_table_guard_inline_parity(spark):
    """r16 guard: when the ADC table (m·k doubles) would outgrow the
    query vector by more than 4x, ivf_knn_join_pq carries the vector
    through the cell exchange and scores with the inline fold instead.
    Results are identical either way (same DECIMAL terms); the guard
    only moves WHERE the per-subspace distances are computed."""
    from pyspark.sql import functions as F

    from data_ingestion_framework_spark.operators import similarity as S

    dim, m = 4, 2
    dsub = dim // m
    rows = [
        (i, [((i * 131 + j * 17) % 23) / 3.0 for j in range(dim)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from pyspark.sql import functions as _F
    qdf = df.select(_F.col("vec_id").alias("q_id"), "embedding")
    centroids = [r[1] for r in rows[:2]]

    def run(k_codes):
        books = [
            [
                [((s * 7 + c * 13 + j) % 11) / 2.0 for j in range(dsub)]
                for c in range(k_codes)
            ]
            for s in range(m)
        ]
        out = S.ivf_knn_join_pq(
            qdf, df, centroids, books, k=3, nprobe=2, exclude_self=True
        )
        return sorted(tuple(r) for r in out.collect()), books

    # k_codes=2: m*k=4 <= 4*dim=16 -> table path; k_codes=32: 64 > 16
    # -> inline path. Same codebook PREFIX would differ, so instead
    # pin parity directly: inline _adc_dist == table lookup, same frame
    small, books = run(2)
    assert small  # sanity: the join produced ranked pairs
    enc = df.select(
        "vec_id",
        F.array(
            *[S._pq_code("embedding", s, books[s], dsub) for s in range(m)]
        ).alias("codes"),
    )
    q = df.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("__qv"),
        S._adc_table(books, m, dsub, "embedding").alias("__adctab"),
    )
    both = enc.crossJoin(q).select(
        S._adc_dist(books, m, dsub, "__qv").alias("inline"),
        S._adc_dist_table(m).alias("table"),
    )
    assert both.where(F.col("inline") != F.col("table")).count() == 0
    # and the guard actually flips the plan shape
    big_books = [
        [[float(c + s + j) for j in range(dsub)] for c in range(32)]
        for s in range(m)
    ]
    plan_inline = S.ivf_knn_join_pq(
        qdf, df, centroids, big_books, k=3, nprobe=2
    )._jdf.queryExecution().analyzed().toString()
    assert "__adctab" not in plan_inline
    plan_table = S.ivf_knn_join_pq(
        qdf, df, centroids, [b[:2] for b in big_books], k=3, nprobe=2
    )._jdf.queryExecution().analyzed().toString()
    assert "__adctab" in plan_table
