"""Deterministic corpus sampling for training-data pipelines.

Sampling at 100 TB must be reproducible (re-runs and backfills pick the
SAME rows — no RNG state, no seed-per-partition drift) and cheap (a
scan-side predicate, no shuffle). Both operators key on an md5 prefix
of the id: uniform in expectation, stable across engines (md5 hex is
engine-portable, unlike Spark's ``rand()`` or ``TABLESAMPLE``), and
composable — a row's membership never changes when the corpus grows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HEX_WIDTH = 8
_HEX_SPACE = 16 ** _HEX_WIDTH


def _threshold_hex(fraction: float) -> str:
    f = min(max(fraction, 0.0), 1.0)
    return format(int(f * _HEX_SPACE), f"0{_HEX_WIDTH}x")


def hash_bucket_hex(id_col: Column | str, salt: str = "") -> Column:
    """First 8 hex chars of ``md5(salt || id)`` — the sampling key.
    Lexicographic comparison of the zero-padded hex equals numeric
    comparison, so thresholds are plain string literals."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, _HEX_WIDTH)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id hash: pure scan-side
    filter (pushes into the source where possible), reproducible across
    runs/engines, disjoint for disjoint salts. ``salt`` gives
    independent draws (e.g. train/holdout splits)."""
    return df.where(hash_bucket_hex(id_col, salt) < F.lit(_threshold_hex(fraction)))


def cap_per_group(
    df: DataFrame,
    max_rows: int,
    group_col: str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep at most ``max_rows`` rows per group (the per-domain quota of
    crawl pipelines — no single site may dominate the training mix).

    Selection is by id-hash order, not "first K by id": hash order is a
    deterministic uniform draw within each group, so the survivors are
    an unbiased sample of the group rather than its earliest rows. One
    group-keyed shuffle for the window; skewed giant domains are exactly
    the rows this operator discards, and the rank early-outs past
    ``max_rows`` per partition after AQE skew splitting.
    """
    w = F.row_number().over(
        Window.partitionBy(group_col).orderBy(
            hash_bucket_hex(id_col, salt), F.col(id_col)
        )
    )
    return df.withColumn("__rn", w).where(F.col("__rn") <= max_rows).drop("__rn")


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (domain-mixing weights): each
    stratum keeps its own fraction, still one scan-side predicate — no
    shuffle, no per-group passes. Strata absent from ``fractions`` keep
    ``default_fraction``."""
    thr = F.lit(_threshold_hex(default_fraction))
    col = F.col(strata_col)
    for k, frac in sorted(fractions.items()):
        thr = F.when(col == k, F.lit(_threshold_hex(frac))).otherwise(thr)
    return df.where(hash_bucket_hex(id_col, salt) < thr)


def temperature_mix(
    df: DataFrame,
    temperature: float = 2.0,
    target_fraction: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual/data-mixing
    resampling of GPT-3/mT5-style pipelines, public): per-source keep
    fractions ∝ ``n_s^(1/T) / n_s``, scaled so the expected total is
    ``target_fraction`` of the corpus — T=1 keeps the natural mix, T→∞
    equalizes sources, T=2 is the common in-between. Deterministic
    md5-threshold sampling per source (same membership stability as
    ``deterministic_sample``).

    Cross-engine exactness: the only float op is ``n^(1/T)``, which is
    immediately quantized to integer micro-units
    (``floor(x·10⁶ + 0.5)``); everything after — weight sum, fraction,
    threshold — is exact integer arithmetic, so an engine re-deriving
    the thresholds (the DuckDB oracle does) reproduces them bit-for-bit
    with no float-summation order sensitivity. Fractions clip at 1.0
    (single-pass, no water-filling redistribution — documented
    contract).

    Scale shape: one per-source count aggregate whose result is
    control-plane sized (sources ≪ rows) feeds driver-side threshold
    arithmetic; the sample itself is a scan-side when-chain predicate —
    zero extra shuffles, no join.
    """
    counts = {
        r[source_col]: r["__n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n")).collect()
    }
    if not counts:
        return df.where(F.lit(False))
    n_total = sum(counts.values())
    tf6 = int(round(target_fraction * 10**6))
    w6 = {
        s: int(n ** (1.0 / temperature) * 10**6 + 0.5) for s, n in counts.items()
    }
    sw = sum(w6.values())
    thresholds = {
        # f4 = floor(target·N·w_s / (ΣW·n_s) · 10⁴) in exact ints
        s: min(
            ((tf6 * n_total * w6[s] * 10**4) // (10**6 * sw * counts[s]))
            * _HEX_SPACE
            // 10**4,
            _HEX_SPACE,
        )
        for s in counts
    }
    return _keep_by_group_thresholds(df, thresholds, source_col, id_col, salt)


def _keep_by_group_thresholds(
    df: DataFrame,
    thresholds: dict,
    source_col: str,
    id_col: str,
    salt: str,
) -> DataFrame:
    """Scan-side when-chain shared by the per-group samplers
    (:func:`temperature_mix`, :func:`domain_reweight_by_quality`):
    keep a row iff its salted-md5 bucket falls under its group's
    integer threshold in the 16⁸ hex space. A saturated threshold
    (≥ 16⁸) keeps every row — the 9-hex literal would compare wrong
    lexicographically, so it short-circuits to TRUE; a non-positive
    one to FALSE. NULL groups match via ``isNull`` (an ``==``
    predicate would silently drop them); group order is
    deterministic. Zero shuffles, zero joins — the thresholds ride
    in the plan as literals."""
    bucket = hash_bucket_hex(id_col, salt)

    def keep(thr):
        if thr >= _HEX_SPACE:
            return F.lit(True)
        if thr <= 0:
            return F.lit(False)
        return bucket < F.lit(format(thr, f"0{_HEX_WIDTH}x"))

    col = _group_when_chain(thresholds, source_col, keep)
    return df.where(col.otherwise(F.lit(False)))


def _group_when_chain(values: dict, source_col: str, build) -> Column:
    """Chained per-group CASE shared by the domain samplers: for each
    group key s (deterministic order, NULL groups matched via
    ``isNull`` — an ``==`` predicate would silently drop them), WHEN
    <row's source is s> THEN ``build(values[s])``. Returned WITHOUT an
    ``otherwise`` so each caller picks its own default. One definition
    keeps the keep-predicate and copy-count chains' group-matching
    semantics identical by construction."""
    col = None
    for s in sorted(values, key=lambda v: (v is None, str(v))):
        match = (
            F.col(source_col).isNull() if s is None else F.col(source_col) == s
        )
        expr = build(values[s])
        col = F.when(match, expr) if col is None else col.when(match, expr)
    return col


def quality_weighted_sample(
    df: DataFrame,
    weight_col: str,
    base_fraction: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Quality-weighted deterministic sampling (importance resampling
    à la DSIR/quality-classifier pipelines, public idea): each row's
    keep probability is ``base_fraction · clamp(weight, 0, 1)`` where
    ``weight`` is a per-row score column (e.g. a quality score in
    [0,1]). High-quality rows survive at the base rate, low-quality
    rows proportionally less — one scan-side predicate, no shuffle,
    reproducible across runs and engines.

    Cross-engine exactness: weight and base fraction quantize to 10⁻⁶
    integer units; the per-row threshold is the two-step exact integer
    computation ``t1 = (base6·w6) // 10⁶``, ``thr = t1·16⁸ // 10⁶``
    (each intermediate < 2⁶³), compared against the first 8 md5 hex
    chars of the salted id as an integer. An oracle re-deriving the
    same two steps reproduces membership bit-for-bit.
    """
    base6 = int(round(min(max(base_fraction, 0.0), 1.0) * 10**6))
    w = F.col(weight_col).cast("double")
    w6 = F.floor(
        F.least(F.greatest(w, F.lit(0.0)), F.lit(1.0)) * 1_000_000 + F.lit(0.5)
    ).cast("bigint")
    t1 = F.floor((F.lit(base6).cast("bigint") * w6) / 1_000_000).cast("bigint")
    thr = F.floor((t1 * F.lit(_HEX_SPACE).cast("bigint")) / 1_000_000).cast(
        "bigint"
    )
    bucket_int = F.conv(hash_bucket_hex(id_col, salt), 16, 10).cast("bigint")
    return df.where(bucket_int < thr)


def domain_reweight_by_quality(
    df: DataFrame,
    weight_col: str,
    target_fraction: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Quality-aware DOMAIN reweighting (the DoReMi-flavored mixing
    move, public idea — Xie et al. 2023 reweight domains, not rows):
    each source's keep fraction is proportional to its MEAN quality
    weight, scaled so the expected total is ``target_fraction`` of the
    corpus — a high-quality domain is sampled at a higher rate, a
    low-quality domain at a lower one, while every domain keeps a
    uniform random draw INSIDE itself (unlike
    :func:`quality_weighted_sample`, which thins per row and so skews
    each domain toward its own best rows).

    Math, all-integer and oracle-replayable: per-row weights quantize
    to micro-units ``w6 = floor(clamp(w,0,1)·1e6 + 0.5)``; per source
    ``n_s`` and ``spu_s = Σ w6``; the keep fraction solves
    ``f_s ∝ spu_s/n_s`` with ``Σ n_s·f_s = target·N``, i.e.
    ``f_s = target·N·spu_s / (n_s·S)`` with ``S = Σ_s spu_s`` — computed
    in exact arbitrary-precision integers at the driver
    (``f4 = (tf6·N·spu_s·1e4) div (1e6·n_s·S)``, threshold
    ``min(f4·16⁸ div 1e4, 16⁸)``), so an engine re-deriving them in
    128-bit integers (the DuckDB oracle) reproduces membership
    bit-for-bit. Fractions clip at 1.0 (single-pass, no water-filling
    redistribution — the :func:`temperature_mix` contract). A corpus
    whose total quality mass is ZERO keeps nothing (every f_s is 0).

    Scale shape (same as :func:`temperature_mix`): one per-source
    aggregate whose result is control-plane sized (sources ≪ rows)
    feeds driver-side threshold arithmetic; the sample itself is a
    scan-side when-chain predicate — zero extra shuffles, no join.
    NULL sources form their own group.
    """
    stats = _group_quality_stats(df, weight_col, source_col)
    if not stats:
        return df.where(F.lit(False))
    n_total = sum(n for n, _ in stats.values())
    s_total = sum(spu for _, spu in stats.values())
    tf6 = int(round(min(max(target_fraction, 0.0), 1.0) * 10**6))
    thresholds = {}
    for s, (ns, spu) in stats.items():
        if s_total == 0:
            thresholds[s] = 0
        else:
            f4 = (tf6 * n_total * spu * 10**4) // (10**6 * ns * s_total)
            thresholds[s] = min((f4 * _HEX_SPACE) // 10**4, _HEX_SPACE)
    return _keep_by_group_thresholds(df, thresholds, source_col, id_col, salt)


def _group_quality_stats(
    df: DataFrame, weight_col: str, source_col: str
) -> dict:
    """Per-group ``(count, Σ micro-unit weight)`` — the one
    control-plane aggregate behind the quality-driven domain samplers.
    Weights clamp to [0,1] and quantize to ``w6 = floor(w·1e6 + 0.5)``;
    a group whose weights are ALL NULL sums to zero mass."""
    w = F.col(weight_col).cast("double")
    w6 = F.floor(
        F.least(F.greatest(w, F.lit(0.0)), F.lit(1.0)) * 1_000_000 + F.lit(0.5)
    ).cast("bigint")
    return {
        r[source_col]: (int(r["__n"]), int(r["__spu"] or 0))
        for r in df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("__n"), F.sum(w6).alias("__spu"))
        .collect()
    }


def domain_upsample_by_quality(
    df: DataFrame,
    weight_col: str,
    target_factor: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    copy_col: str = "copy",
    max_rate: int = 16,
) -> DataFrame:
    """Multi-EPOCH domain mixing: like
    :func:`domain_reweight_by_quality` but rates do NOT clip at 1 — a
    domain whose mean quality earns it a rate above one is REPEATED
    (emitted more than once per row), the way production mixtures
    actually deploy domain weights (DoReMi's weights multiply epochs;
    Muennighoff et al. 2023 show repeating high-quality data beats
    adding low-quality data under a token budget). The expected
    output size is ``target_factor · N`` redistributed across domains
    ∝ mean quality.

    All-integer and oracle-replayable: per-source rate in 10⁻⁴ units
    ``r4 = (tf6·N·spu_s·1e4) div (1e6·n_s·S)`` (exact driver-side
    arbitrary precision, HUGEINT in the oracle); every row of source
    s gets ``r4 div 1e4`` whole copies plus one more iff its
    salted-md5 bucket falls under ``((r4 mod 1e4)·16⁸) div 1e4`` — so
    fractional epochs land on a deterministic, engine-reproducible
    subset of rows rather than a float coin flip. Output = input
    columns plus ``copy_col`` (1..copies); rows with zero copies are
    dropped. A zero-quality-mass corpus emits nothing.

    Guards: a source whose rate exceeds ``max_rate`` raises — an
    extreme skew (one tiny high-quality domain under a large target)
    would otherwise explode the output silently; raise loudly and let
    the caller cap ``target_factor`` or pre-balance.

    Scale shape: one control-plane per-source aggregate; the copies
    column is a scan-side when-chain of plan constants; the repeat is
    ``explode(sequence(1, copies))`` — per-row generation, zero
    shuffles, zero joins. Repeated rows carry distinct ``copy_col``
    values so downstream exact dedup does not silently undo the
    epochs.
    """
    if target_factor < 0:
        raise ValueError(
            f"domain_upsample_by_quality: target_factor {target_factor} < 0"
        )
    stats = _group_quality_stats(df, weight_col, source_col)
    empty = df.where(F.lit(False)).withColumn(
        copy_col, F.lit(1).cast("int")
    )
    if not stats:
        return empty
    n_total = sum(n for n, _ in stats.values())
    s_total = sum(spu for _, spu in stats.values())
    if s_total == 0:
        return empty
    tf6 = int(round(target_factor * 10**6))
    rates = {}
    for s, (ns, spu) in stats.items():
        r4 = (tf6 * n_total * spu * 10**4) // (10**6 * ns * s_total)
        if r4 > max_rate * 10**4:
            raise ValueError(
                f"domain_upsample_by_quality: source {s!r} rate "
                f"{r4 / 10**4:.2f} exceeds max_rate={max_rate} — extreme "
                "domain skew; lower target_factor or rebalance first"
            )
        rates[s] = r4
    bucket = hash_bucket_hex(id_col, salt)

    def copy_count(r4):
        base, frac4 = r4 // 10**4, r4 % 10**4
        thr = (frac4 * _HEX_SPACE) // 10**4
        copies = F.lit(base)
        if thr > 0:
            # coalesce: a NULL id can't enter the fractional lottery
            # (its md5 bucket is NULL) but must still keep its WHOLE
            # copies — without it base + NULL = NULL and the row
            # vanishes entirely, diverging from the oracle's CASE
            # (whose NULL comparison lands in ELSE 0)
            copies = copies + F.coalesce(
                (bucket < F.lit(format(thr, f"0{_HEX_WIDTH}x"))).cast("int"),
                F.lit(0),
            )
        return copies

    copies = _group_when_chain(rates, source_col, copy_count).otherwise(
        F.lit(0)
    )
    seq = F.when(copies >= 1, F.sequence(F.lit(1), copies)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(copy_col, F.explode(seq))


def shuffle_rank(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "",
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic global shuffle order for training: every row gets
    a dense 0-based ``shuffle_rank`` as if the corpus were sorted by
    ``(md5(salt||id), id)`` — reproducible epoch ordering with no RNG
    state, re-derivable by any engine.

    The scale shape is the point: a naive global ``row_number()`` puts
    100 TB through ONE partition. Here the hash's first byte pre-buckets
    rows (hex prefix order == hash order, so buckets are contiguous rank
    ranges); per-bucket COUNTS (≤ ``n_buckets`` rows — control-plane)
    turn into cumulative offsets, and the final rank is offset +
    per-bucket row_number — one bucket-keyed shuffle, 256-way parallel,
    zero global sort. Salt varies the epoch permutation.
    """
    hexw = len(format(n_buckets - 1, "x"))
    if n_buckets != 16 ** hexw:
        raise ValueError("n_buckets must be a power of 16 (hex-prefix buckets)")
    h = hash_bucket_hex(id_col, salt)
    bucketed = df.withColumn("__h", h).withColumn(
        "__b", F.substring("__h", 1, hexw)
    )
    counts = {
        r["__b"]: r["__n"]
        for r in bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("__n")).collect()
    }
    if not counts:  # empty input: no offsets to chain
        return df.withColumn("shuffle_rank", F.lit(None).cast("bigint"))
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off = None
    for b, o in offsets.items():
        off = (F.when if off is None else off.when)(F.col("__b") == b, F.lit(o))
    w = Window.partitionBy("__b").orderBy("__h", F.col(id_col).asc())
    return (
        bucketed.withColumn(
            "shuffle_rank",
            (off + F.row_number().over(w) - 1).cast("bigint"),
        )
        .drop("__h", "__b")
    )


def top_fraction_per_group(
    df: DataFrame,
    score_col: str,
    group_col: str,
    fraction: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top ``fraction`` of each group by score (the
    quality-classifier thresholding of FineWeb-style curation, public:
    score every page, keep the best X% per domain/source so no group's
    score distribution dominates another's).

    The cut is ``rank ≤ ceil(fraction · |group|)`` with the fraction
    quantized to micro-units so the threshold is exact integer
    arithmetic (engine-portable, no float boundary). Ties break on the
    id for determinism. One group-keyed shuffle (rank + count share the
    same window partitioning).
    """
    tf6 = int(round(fraction * 10**6))
    w = Window.partitionBy(group_col)
    rank = F.row_number().over(
        w.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    )
    cnt = F.count(F.lit(1)).over(w)
    return (
        df.withColumn("__rn", rank)
        .withColumn("__cnt", cnt)
        # integer ceil-division (`div`, not `/`): bigint-exact at any
        # group size — a double division would lose precision past 2^53
        .where(
            F.col("__rn")
            <= F.expr(f"(__cnt * {tf6}L + {10**6 - 1}L) div {10**6}L")
        )
        .drop("__rn", "__cnt")
    )


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, str]]:
    """Cumulative hex thresholds for :func:`split_assign` — exposed so
    oracle SQL can inline the exact same literals Spark compares
    against. The LAST split gets no threshold (it absorbs the rounding
    remainder of the hex space, so every row lands somewhere)."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    names = list(weights)
    out: list[tuple[str, str]] = []
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        out.append((name, _threshold_hex(cum)))
    return out


def split_assign(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str | Column = "doc_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split assignment.

    Every row gets exactly one split label, chosen by comparing its id
    hash against the cumulative weight thresholds: a pure scan-side
    projection — zero shuffles, no RNG state, reproducible across
    engines and runs. Because membership depends only on the row's own
    id, splits are STABLE under corpus growth (new rows never move old
    rows between splits — the property that keeps eval sets
    uncontaminated across dataset versions), and disjoint salts give
    independent re-splits.

    ``weights`` is an ordered ``{name: weight}``; weights are
    normalized, so ``{"train": 8, "val": 1, "test": 1}`` works.
    """
    names = list(weights)
    if len(names) < 2:
        raise ValueError("need at least two splits")
    b = hash_bucket_hex(id_col, salt)
    col = None
    for name, th in split_thresholds(weights):
        # a cumulative fraction of 1.0 yields a 9-hex literal that
        # compares wrong lexicographically — that split absorbs
        # everything remaining (zero-weight tail splits stay empty)
        keep = F.lit(True) if len(th) > _HEX_WIDTH else b < F.lit(th)
        col = (F.when if col is None else col.when)(keep, F.lit(name))
    return df.withColumn(split_col, col.otherwise(F.lit(names[-1])))


def leakage_safe_split(
    df: DataFrame,
    weights: dict[str, float],
    group: Column | str | None = None,
    text_col: str = "text",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Split assignment keyed by a GROUP expression instead of the row
    id: every row sharing the group value lands in the SAME split, so
    duplicated or derived content cannot straddle the train/eval
    boundary — the leakage mode row-id splitting silently permits
    (an eval document whose exact copy sits in train scores as
    memorization, not generalization).

    ``group`` defaults to the normalized-text md5 fingerprint — exact
    duplicates co-assign with ZERO extra cost: the fingerprint is
    computed row-locally, so this stays a pure scan-side projection
    (no shuffle, no RNG), with all of :func:`split_assign`'s
    stability-under-growth properties per GROUP. Pass a parent
    document id to co-assign chunks, or a near-dup cluster id (e.g.
    from the connected-components clustering) for fuzzy leakage — any
    row-available expression keeps the zero-shuffle shape; a computed
    cluster id costs whatever its join cost already was."""
    if group is None:
        from data_ingestion_framework_spark.operators.text import fingerprint

        group = fingerprint(text_col)
    return split_assign(
        df, weights, id_col=group, salt=salt, split_col=split_col
    )


def token_budget_per_group(
    df: DataFrame,
    budget_tokens: int,
    group_col: str,
    token_count_col: str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep, per group, the id-hash-ordered prefix of documents whose
    PRECEDING cumulative token count is under ``budget_tokens`` — the
    token-budget analogue of ``cap_per_group`` (training mixes are
    specified in tokens, not documents: "50 B tokens of web, 5 B of
    code"). The crossing document is kept, so every group with data
    reaches its budget; hash order makes the prefix an unbiased draw
    rather than the shortest/earliest docs.

    One group-keyed shuffle: the running sum and the rank ride the same
    window partitioning. Exact integer arithmetic end to end — the
    DuckDB oracle reproduces membership bit-for-bit.
    """
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket_hex(id_col, salt), F.col(id_col)
    )
    before = F.coalesce(
        F.sum(F.col(token_count_col)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("bigint"),
    )
    return (
        df.withColumn("__before", before)
        .where(F.col("__before") < budget_tokens)
        .drop("__before")
    )
