"""In-engine linear quality classifier (operators/classify.py):
plain-Python witness parity for the hashed features, the GD training
loop and the scoring pass — every cross-engine value is either an
exact integer or an IEEE-identical double, so the witness matches
bit-for-bit, not approximately."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators import classify

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "a quick brown fox jumps over the lazy dog again and again"),
    (3, "spark makes big data small"),
    (4, "  Repeated   repeated repeated words words  "),
    (5, ""),
    (6, "one"),
]
D = 8
ITERS = 3
LR = 0.5
#: label: >= 6 tokens
THRESH = 6


def _py_tokens(s: str) -> list[str]:
    s = re.sub(r"\s+", " ", s).strip().lower()
    return [t for t in s.split(" ") if t]


def _py_hash(t: str) -> int:
    return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % D


def _py_features(s: str) -> list[int]:
    x = [0] * D
    for t in _py_tokens(s):
        x[_py_hash(t)] += 1
    return x + [1]


def _py_sig(z_units: int) -> float:
    z = z_units / 1e6
    return 0.5 + z / (2.0 * (1.0 + abs(z)))


def _py_train(rows):
    w = [0] * (D + 1)
    n = len(rows)
    for _ in range(ITERS):
        grad = [0] * (D + 1)
        for x, y in rows:
            zu = sum(a * b for a, b in zip(x, w))
            g = classify._round_half_up((_py_sig(zu) - y) * 1e6)
            for j in range(D + 1):
                grad[j] += g * x[j]
        w = [
            w[j] - classify._round_half_up(LR * grad[j] / n)
            for j in range(D + 1)
        ]
    return w


def test_hashed_features_match_python_witness(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: list(r["features"])
        for r in classify.hashed_token_features(
            df, n_features=D
        ).collect()
    }
    for doc_id, s in DOCS:
        assert got[doc_id] == _py_features(s), doc_id


def test_gd_training_and_scores_match_python_witness(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    label = (
        F.size(
            F.filter(
                F.split(classify.normalize_text("text"), " "),
                lambda t: t != F.lit(""),
            )
        )
        >= THRESH
    )
    feats = classify.hashed_token_features(df, n_features=D, label=label)
    w = classify.gd_train_linear_units(feats, iters=ITERS, lr=LR)

    rows = [
        (_py_features(s), 1 if len(_py_tokens(s)) >= THRESH else 0)
        for _, s in DOCS
    ]
    assert w == _py_train(rows)

    scored = {
        r["doc_id"]: (r["score_units"], r["prob"], r["pred"])
        for r in classify.linear_classifier_scores(feats, w).collect()
    }
    import decimal

    def round6(x: float) -> float:
        # HALF_UP like F.round, not Python's banker's round
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    for (doc_id, s), (x, y) in zip(DOCS, rows):
        zu = sum(a * b for a, b in zip(x, w))
        assert scored[doc_id][0] == zu, doc_id
        assert scored[doc_id][1] == round6(_py_sig(zu)), doc_id
        assert scored[doc_id][2] == (zu >= 0), doc_id


def test_training_is_deterministic_across_runs(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    label = F.length("text") >= 20
    feats = classify.hashed_token_features(df, n_features=D, label=label)
    w1 = classify.gd_train_linear_units(feats, iters=2, lr=LR)
    w2 = classify.gd_train_linear_units(feats, iters=2, lr=LR)
    assert w1 == w2


def test_empty_training_frame_raises(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    feats = classify.hashed_token_features(df, label=F.lit(True))
    try:
        classify.gd_train_linear_units(feats)
        raise AssertionError("expected ValueError on empty frame")
    except ValueError:
        pass


def test_feature_width_cap_enforced(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    try:
        classify.hashed_token_features(df, n_features=5000)
        raise AssertionError("expected ValueError above the dense-fold cap")
    except ValueError as e:
        assert "n_features" in str(e)
