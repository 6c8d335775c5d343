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
