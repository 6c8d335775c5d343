"""In-engine trained linear quality classifier (beyond-reference
surface: a fastText-style quality filter trained INSIDE the engine).

Large-scale training-data pipelines gate documents with a learned
quality model (fastText / logistic classifiers in CCNet, LLaMA and
GPT-3 data work — Joulin et al. 2016; hashing trick: Weinberger et
al. 2009). This module trains one distributedly: hashed token-count
features (md5 mod D — engine-reproducible, no RNG), full-batch
gradient descent where each step is ONE aggregation job, and a final
scoring scan. The corpus never leaves the executors; the only
driver-side data is the (D+1)-long gradient vector per step —
control-plane sized by construction, the same shape discipline as
``similarity.ivf_train_centroids``.

Cross-engine exactness (the package's integer fixed-point
discipline, cf. the Viterbi/BPE operators in ``text.py``): weights
live in integer units (scale 1e6), features are integer counts, so
every dot product and every gradient accumulates EXACTLY in BIGINT —
no float-summation-order hazard anywhere. The only float ops per
step are the link function on an integer-derived double and one
correctly-rounded division in the weight update, both bit-identical
across IEEE-754 engines. The link is the RATIONAL sigmoid surrogate
``σ(z) = 0.5 + z / (2·(1+|z|))`` — algebraic (+, |·|, /) instead of
``exp``, because libm ``exp`` is allowed to differ by ULPs across
engines while IEEE +,·,/ are not. It is monotone, maps onto (0,1),
and equals the logistic at 0 — gradient descent with ``σ(z)−y``
residuals is then plain robust-regression GD the DuckDB oracle can
replay bit-for-bit.

Scale shape at 100 TB: the feature build is a pure column expression
over the documents scan (whole-stage codegen, zero shuffles); each
GD step shuffles only (feature_index, partial_sum) pairs — map-side
combined, ≤ D+1 rows per partition; scoring is another pure
expression scan. Steps are driver round-trips exactly like the BPE
trainer's merge rounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators.skew import spread_for_compute
from data_ingestion_framework_spark.operators.text import normalize_text

#: Weight fixed-point scale: 1 unit = 1e-6 of real weight.
UNIT_SCALE = 10**6


def _tokens(text_col: str) -> Column:
    return F.filter(
        F.split(normalize_text(text_col), " "), lambda t: t != F.lit("")
    )


def hashed_token_features(
    df: DataFrame,
    text_col: str = "text",
    n_features: int = 16,
    id_col: str = "doc_id",
    label: Column | None = None,
) -> DataFrame:
    """``(id, [label,] features)`` — hashed bag-of-words counts.

    Feature ``j`` of a document counts its tokens whose
    ``md5`` 15-hex-prefix integer ≡ j (mod ``n_features``) — the
    hashing trick with an engine-reproducible hash (DuckDB replays it
    as ``('0x' || substr(md5(t),1,15))::BIGINT % D``). Index
    ``n_features`` is the intercept (constant 1). Pure column
    expression: one pass, no shuffle, O(D · tokens) work per row —
    which is why ``n_features`` is capped at 4096: a fastText-width
    feature space (millions of buckets) needs an explode → groupBy
    sparse build, not this dense fold, and silently accepting it
    would turn the scan quadratic-ish. The cap is enforced, not
    assumed.
    """
    if not 1 <= n_features <= 4096:
        raise ValueError(
            f"hashed_token_features: n_features={n_features} outside "
            "[1, 4096] — the dense per-row fold is O(D·tokens); use a "
            "sparse explode/groupBy build for wider feature spaces"
        )
    toks = _tokens(text_col)
    hs = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
        .cast("bigint")
        % n_features,
    )
    counts = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("bigint"), n_features),
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(n_features - 1)),
            lambda a, j: a
            + F.when(j.cast("bigint") == h, F.lit(1).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            ),
        ),
    )
    feats = F.concat(counts, F.array(F.lit(1).cast("bigint")))
    cols = [F.col(id_col), feats.alias("features")]
    if label is not None:
        cols.insert(1, label.cast("int").alias("label"))
    return spread_for_compute(df).select(*cols)


# The exact-BIGINT dot and the HALF_UP round twin are the package-wide
# fixed-point primitives — one definition (similarity.py) keeps the
# cross-engine exactness contract in one place.
from data_ingestion_framework_spark.operators.similarity import (  # noqa: E402
    _int_dot as _z_units,
)
from data_ingestion_framework_spark.operators.similarity import (  # noqa: E402
    _round_units as _round_half_up,
)


def _surrogate_sigmoid(z_units: Column) -> Column:
    """``0.5 + z/(2(1+|z|))`` on ``z = z_units/1e6`` — identical
    IEEE doubles on every engine (no transcendentals)."""
    z = z_units.cast("double") / F.lit(float(UNIT_SCALE))
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


def gd_train_linear_units(
    feats: DataFrame,
    iters: int = 2,
    lr: float = 0.5,
    feat_col: str = "features",
    label_col: str = "label",
) -> list[int]:
    """Full-batch GD; returns the trained weights in integer units.

    Per step (one aggregation job over the cached feature frame):
    residual units ``g = round((σ(x·w) − y)·1e6)`` per row, exact
    BIGINT gradient ``grad_j = Σ g·x_j`` via posexplode →
    groupBy(j) — map-side combined, D+1 result rows — and the
    integer update ``w_j ← w_j − round(lr·grad_j / N)`` at the
    driver. ``lr`` should be an exactly-representable binary
    fraction (0.5, 0.25) so the update is correctly rounded from
    identical inputs on every engine.
    """
    first = feats.select(F.size(feat_col)).first()
    if first is None:
        raise ValueError("gd_train_linear_units: empty training frame")
    n_features = first[0]
    feats = feats.select(
        F.col(feat_col).alias("__x"), F.col(label_col).alias("__y")
    ).localCheckpoint()
    n_rows = feats.count()
    if n_rows == 0:
        raise ValueError("gd_train_linear_units: empty training frame")
    w = [0] * n_features
    for _ in range(iters):
        g = F.round(
            (_surrogate_sigmoid(_z_units(F.col("__x"), w)) - F.col("__y").cast("double"))
            * F.lit(float(UNIT_SCALE))
        ).cast("bigint")
        # generator in its own projection (struct-lambda canonicalization,
        # same pattern as ivf_train_centroids)
        grad_rows = (
            feats.select(g.alias("__g"), "__x")
            .select("__g", F.posexplode("__x").alias("__j", "__xv"))
            .groupBy("__j")
            .agg(F.sum(F.col("__g") * F.col("__xv")).alias("__grad"))
            .collect()
        )
        grad = {r["__j"]: r["__grad"] for r in grad_rows}
        w = [
            w[j] - _round_half_up(lr * grad.get(j, 0) / n_rows)
            for j in range(n_features)
        ]
    return w


def linear_classifier_scores(
    feats: DataFrame,
    w_units: list[int],
    feat_col: str = "features",
) -> DataFrame:
    """Score a feature frame under trained unit weights: appends
    ``score_units`` (exact BIGINT logit units), ``prob`` (surrogate
    sigmoid, rounded 6) and ``pred``. Pure expression scan."""
    z = _z_units(F.col(feat_col), w_units)
    return feats.select(
        "*",
        z.alias("score_units"),
        F.round(_surrogate_sigmoid(z), 6).alias("prob"),
        (z >= 0).alias("pred"),
    )


def quality_lr_pipeline(
    df: DataFrame,
    label: Column,
    text_col: str = "text",
    n_features: int = 16,
    iters: int = 2,
    lr: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Train-and-score composite: hashed features → GD → scores.
    Returns ``(id, label, score_units, prob, pred)``."""
    feats = hashed_token_features(
        df, text_col=text_col, n_features=n_features, id_col=id_col, label=label
    )
    w = gd_train_linear_units(feats, iters=iters, lr=lr)
    return linear_classifier_scores(feats, w).select(
        id_col, "label", "score_units", "prob", "pred"
    )
