"""KMV (k-minimum-values) distinct-count sketches.

Spark ships HLL (``approx_count_distinct``) but its binary registers
are opaque — not comparable across engines, not inspectable, not
value-testable. KMV is the complementary sketch: keep the k smallest
values of a uniform hash per group; then with R_k = the k-th smallest
hash normalized to [0,1), distinct ≈ (k-1)/R_k. Everything is plain
rows and deterministic md5 arithmetic, so a DuckDB oracle can verify
the *values*, not just the row count — the property the rest of this
repo's sketch surface (○ events_sketches) can't offer.

Scale shape (100 TB): stage 1 is ``distinct`` on (group, hash) —
map-side partial dedup means the shuffle carries at most
|distinct values| rows, and duplicate-heavy event streams collapse
early. Stage 2 is a per-group top-k (window rank ≤ k) — state per
group is k longs, independent of input size. A sketch IS its row set
(group, h): merging shards = ``unionByName`` the row sets and re-apply
``kmv_rows``'s top-k — associative and idempotent, the same merge
Delta-style rollup tables need.

Hash: first 15 hex digits of md5 → 60-bit uniform integer. Chosen
over xxhash64 deliberately: identical expression exists in DuckDB
(``('0x'||substr(md5(v),1,15))::BIGINT``), keeping the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

#: 2^60 — the hash domain size; hashes normalize to h / DOMAIN ∈ [0,1).
DOMAIN = float(1 << 60)


def kmv_hash(col) -> "F.Column":
    """60-bit uniform hash: md5 hex prefix parsed as an integer.
    Deterministic, engine-portable (same md5 bytes in any engine)."""
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string") if isinstance(col, str) else col.cast("string")), 1, 15),
        16,
        10,
    ).cast("bigint")


def kmv_rows(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """The sketch itself: per group, the ≤k smallest distinct hash
    values of ``value_col`` as rows ``(*group_cols, __h)``.

    Merge sketches by unioning their row frames and calling this
    again on the union (idempotent: top-k of top-k's is top-k).
    """
    dist = df.select(
        *group_cols, kmv_hash(value_col).alias("__h")
    ).distinct()
    w = W.partitionBy(*group_cols).orderBy("__h")
    return (
        dist.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate(
    rows: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Finalize a ``kmv_rows`` sketch into per-group estimates.

    If a group holds fewer than k hashes the sketch saw every distinct
    value — the count is exact. Otherwise distinct ≈ (k-1)/R_k with
    R_k = max(h)/2^60. FLOOR (not ROUND) avoids the half-way tie whose
    rounding direction is engine-specific.
    """
    agg = rows.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__m"), F.max("__h").alias("__hk")
    )
    est = F.when(F.col("__m") < k, F.col("__m").cast("double")).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(DOMAIN) / F.col("__hk").cast("double")
        ).cast("double")
    )
    return agg.select(
        *group_cols,
        F.col("__m").cast("bigint").alias("sketch_size"),
        est.cast("bigint").alias("approx_distinct"),
    )


def kmv_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """``kmv_rows`` → ``kmv_estimate``: per-group approximate distinct
    counts with value-level cross-engine determinism."""
    return kmv_estimate(kmv_rows(df, group_cols, value_col, k), group_cols, k)


#: HLL geometry: p=8 → 256 registers, 52 rank bits from the 60-bit hash.
HLL_M = 256
_HLL_W_BITS = 52
_HLL_W_DOM = 1 << _HLL_W_BITS  # 4503599627370496
#: Flajolet et al. 2007 bias constant for m ≥ 128.
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)


def hll_register_rows(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """HyperLogLog register table: per group, one row per non-empty
    register ``(*group_cols, __idx, __rank)`` — the industry-standard
    mergeable distinct sketch (Flajolet et al. 2007, public), built
    from the same engine-portable 60-bit md5 hash as the KMV family.

    The top 8 hash bits pick the register, the low 52 form the rank
    word; ``rank = 53 - bit_length(w)`` (leading zeros + 1, via the
    ``bin()`` string both engines share — no float log2 at integer
    boundaries). Merge sketches by unioning register frames and
    re-taking ``max(__rank)`` per ``(group, __idx)`` — associative and
    idempotent, the same fold streaming micro-batches use. State is
    ≤ 256 rows per group regardless of input size."""
    rows = (
        df.select(*group_cols, kmv_hash(value_col).alias("__h"))
        .select(
            *group_cols,
            # integer div, NOT float division: a 60-bit hash exceeds
            # double's exact range, so h/2^52 in double could cross a
            # register boundary
            F.expr(f"__h div {_HLL_W_DOM}").alias("__idx"),
            (F.col("__h") % _HLL_W_DOM).alias("__w"),
        )
    )
    rank = F.when(F.col("__w") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.expr("bin(__w)"))
    )
    return rows.groupBy(*group_cols, "__idx").agg(
        F.max(rank).cast("int").alias("__rank")
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Finalize HLL registers into per-group estimates.

    Cross-engine determinism: the harmonic-mean denominator is summed
    as the EXACT integer ``Σ 2^(53-rank)`` (every term a power of two
    ≤ 2^52; the total fits long) — a float ``Σ 2^-rank`` would round
    differently under different addition orders. The raw estimate and
    the small-range linear-counting correction (``E ≤ 2.5m`` and empty
    registers exist → ``m·ln(m/V)``) divide/ln in DOUBLE identically
    on both engines, rounded to 4 dp."""
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - __rank)"))
        .alias("__su"),
        F.count(F.lit(1)).alias("__used"),
    )
    # EMPTY registers have rank 0 and contribute 2^-0 = 1 each to the
    # harmonic sum — in scaled units 2^53 apiece (256·2^53 = 2^61 still
    # fits long). Σ 2^-rank == __s / 2^53; E_raw = α·m² / Σ2^-rank.
    s_total = F.col("__su") + (F.lit(HLL_M) - F.col("__used")) * F.lit(
        1 << 53
    ).cast("bigint")
    e_raw = (
        F.lit(_HLL_ALPHA * HLL_M * HLL_M)
        * F.lit(9007199254740992.0)
        / s_total.cast("double")
    )
    v = F.lit(HLL_M) - F.col("__used")
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *group_cols,
        F.round(est, 4).alias("hll_est"),
        F.col("__used").cast("bigint").alias("registers_used"),
    )


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """``hll_register_rows`` → ``hll_estimate``: per-group HLL distinct
    estimates with value-level cross-engine determinism."""
    return hll_estimate(
        hll_register_rows(df, group_cols, value_col), group_cols
    )


def hash_rank_sample(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group deterministic uniform sample of up to k ROWS: rank
    rows by an md5 hash of their ID (NOT of the value — value-hashing
    would sample distinct values and erase duplicated mass, biasing
    any downstream statistic) and keep the k smallest ranks.

    The KMV idea applied to QUANTILES: the k lowest-ranked rows are a
    uniform subset of the group, so their order statistics estimate
    the group's quantiles with error O(1/√k). Merge shards by
    unioning sample rows and re-taking the k smallest ranks — the
    same associative law as ``kmv_rows``.
    """
    ranked = df.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        kmv_hash(F.concat(F.col(id_col).cast("string"), F.lit(":q"))).alias("__r"),
    )
    w = W.partitionBy(*group_cols).orderBy("__r", "__v")
    return (
        ranked.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def sampled_quantiles(
    sample: DataFrame,
    group_cols: list[str],
    probs: list[float],
) -> DataFrame:
    """Finalize a ``hash_rank_sample`` into per-group quantile
    estimates: exact nearest-rank quantiles OF THE SAMPLE (index
    ``ceil(p·m)`` into the sorted sample of size m). All integer
    indexing — no interpolation, so values are members of the input
    and engine-portable."""
    m = F.size(F.col("__vals"))
    agg = sample.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list("__v")).alias("__vals")
    )
    cols = [
        F.element_at(
            F.col("__vals"),
            F.greatest(F.ceil(F.lit(float(p)) * m), F.lit(1)).cast("int"),
        ).alias(f"q{str(p).replace('.', '_')}")
        for p in probs
    ]
    return agg.select(*group_cols, *cols)


def quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    probs: list[float],
    k: int = 256,
) -> DataFrame:
    """``hash_rank_sample`` → ``sampled_quantiles``: mergeable,
    deterministic approximate quantiles (the value-checkable
    complement of ``percentile_approx``)."""
    return sampled_quantiles(
        hash_rank_sample(df, group_cols, value_col, id_col, k), group_cols, probs
    )


def mg_heavy_hitters(
    df: DataFrame,
    value_col: str,
    shard_key_col: str,
    n_shards: int = 8,
    m: int = 16,
    k: int = 10,
) -> DataFrame:
    """Sharded Misra-Gries / SpaceSaving-style heavy hitters: top-k
    frequent values with deterministic error bounds, in bounded state.

    Occurrences are split into ``n_shards`` deterministic shards by an
    md5 hash of the ROW key (``shard_key_col`` — not the value: value
    sharding would make local counts exact and the summary unbounded).
    Each shard keeps its exact top-``m`` values (its MG summary; state
    = m counters per shard); the per-shard error bound ``err_s`` is the
    largest DROPPED count — a value absent from shard s has true shard
    count ≤ err_s, the mergeable-summaries guarantee (Agarwal et al.,
    SIGMOD'12, public). Merging the shard summaries gives, per value:
    ``est ≤ true ≤ est + Σ_{s: value absent} err_s = upper_bound``.

    Returns the top-``k`` candidates by ``est_count`` (ties on value):
    ``(value, est_count, upper_bound)``. Every value whose true count
    exceeds ``Σ_s err_s`` is guaranteed present among the candidates.

    Scale shape: stage 1 is one (shard, value)-keyed count with
    map-side combine; everything after operates on ≤ n_shards·m rows —
    control-plane sized by construction. Deterministic md5 sharding
    (not ``spark_partition_id``) keeps the result independent of file
    splits and reproducible by any engine."""
    return mg_finalize(
        mg_summary(df, value_col, shard_key_col, n_shards, m), value_col, k
    )


def _mg_truncate(counts: DataFrame, value_col: str, m: int) -> DataFrame:
    """(s, value, c, e, base_err) → one summary row per shard: top-m
    kept entries (each carrying its own undercount bound ``e`` — a
    value's true shard count lies in ``[c, c+e]``) plus the shard error
    ``err = max(base_err, max dropped (c+e))``, which bounds every
    value ABSENT from the kept list: absent-everywhere values are
    covered by ``base_err``, values dropped by this truncation by their
    own ``c+e``. ONE pass over ``counts``; the result is ≤ n_shards
    rows of m-element arrays — control-plane sized — so it's
    materialized (localCheckpoint) instead of letting downstream
    branches re-run the corpus aggregation (collect_list skips the
    NULLs the rank conditionals produce)."""
    w = W.partitionBy("__s").orderBy(F.col("__c").desc(), F.col(value_col).asc())
    ranked = counts.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.groupBy("__s")
        .agg(
            F.collect_list(
                F.when(
                    F.col("__rn") <= m,
                    F.struct(
                        F.col(value_col).alias("v"),
                        F.col("__c").alias("c"),
                        F.col("__e").alias("e"),
                    ),
                )
            ).alias("__kept"),
            F.greatest(
                F.first("__base_err"),
                F.coalesce(
                    F.max(
                        F.when(F.col("__rn") > m, F.col("__c") + F.col("__e"))
                    ),
                    F.lit(0).cast("bigint"),
                ),
            ).alias("__err"),
        )
        .localCheckpoint()
    )


def mg_summary(
    df: DataFrame,
    value_col: str,
    shard_key_col: str,
    n_shards: int = 8,
    m: int = 16,
) -> DataFrame:
    """Build the per-shard MG summary frame ``(s, kept array<(v,c)>,
    err)`` for :func:`mg_heavy_hitters` — the sketch STATE. Merge two
    summaries of disjoint data with :func:`mg_merge` (associative,
    error bounds add), finalize with :func:`mg_finalize`."""
    shard = F.pmod(kmv_hash(shard_key_col), F.lit(n_shards))
    loc = (
        df.select(shard.alias("__s"), F.col(value_col))
        .groupBy("__s", value_col)
        .agg(F.count(F.lit(1)).alias("__c"))
        # fresh counts are exact: zero per-entry uncertainty
        .withColumn("__e", F.lit(0).cast("bigint"))
        .withColumn("__base_err", F.lit(0).cast("bigint"))
    )
    return _mg_truncate(loc, value_col, m)


def mg_merge(a: DataFrame, b: DataFrame, value_col: str, m: int = 16) -> DataFrame:
    """Merge two :func:`mg_summary` frames over DISJOINT inputs: add
    counters per (shard, value), re-truncate to top-m, accumulate both
    sides' error plus the merge's own dropped-max (the mergeable-
    summaries law — a value absent from a shard summary has true count
    ≤ that summary's err). Operates on control-plane-sized frames, so
    streaming ingest can fold one summary per micro-batch."""

    def expand(s: DataFrame, side: str) -> DataFrame:
        kept = s.select(
            "__s",
            F.col("__err").alias("__serr"),
            F.explode_outer("__kept").alias("__kv"),
        )
        return kept.select(
            "__s",
            F.lit(side).alias("__side"),
            F.col("__kv.v").alias(value_col),
            F.coalesce(F.col("__kv.c"), F.lit(0)).alias("__c"),
            F.coalesce(F.col("__kv.e"), F.lit(0)).alias("__e"),
            "__serr",
        )

    both = expand(a, "a").unionByName(expand(b, "b"))
    # per (shard, side) the err is a single value — distinct before the
    # sum so the kept-entry fan-out doesn't multiply it, while two sides
    # sharing one numeric err value still BOTH contribute
    errs = (
        both.select("__s", "__side", "__serr").distinct().groupBy("__s").agg(
            F.sum("__serr").alias("__base_err")
        )
    )
    # merged entry: count = Σ present sides' counts; uncertainty = Σ
    # present sides' own entry e + the errs of the sides it was ABSENT
    # from (= base_err − Σ present sides' shard errs)
    counts = (
        both.where(F.col(value_col).isNotNull())
        .groupBy("__s", value_col)
        .agg(
            F.sum("__c").alias("__c"),
            F.sum("__e").alias("__esum"),
            F.sum("__serr").alias("__present_serr"),
        )
        .join(errs, "__s")
        .withColumn(
            "__e",
            F.col("__esum") + (F.col("__base_err") - F.col("__present_serr")),
        )
        .drop("__esum", "__present_serr")
    )
    return _mg_truncate(counts, value_col, m)


def mg_finalize(summary: DataFrame, value_col: str, k: int = 10) -> DataFrame:
    """Finalize an MG summary into ``(value, est_count, upper_bound)``
    top-k: ``est = Σ_{s: present} c`` and ``upper = Σ_{s: present}
    (c + e) + Σ_{s: absent} err_s`` — for a single-pass summary every
    entry ``e`` is 0, so the bound collapses to the classic
    ``est + absent-shard errors``."""
    total = summary.agg(
        F.coalesce(F.sum("__err"), F.lit(0)).alias("__total_err")
    )
    est = (
        summary.select(
            F.col("__err").alias("__serr"), F.explode("__kept").alias("__kv")
        )
        .groupBy(F.col("__kv.v").alias(value_col))
        .agg(
            F.sum("__kv.c").alias("__est"),
            F.sum("__kv.e").alias("__entry_err"),
            F.sum("__serr").alias("__present_err"),
        )
    )
    topw = W.orderBy(F.col("est_count").desc(), F.col(value_col).asc())
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            F.col(value_col),
            F.col("__est").cast("bigint").alias("est_count"),
            (
                F.col("__est")
                + F.col("__entry_err")
                + F.col("__total_err")
                - F.col("__present_err")
            )
            .cast("bigint")
            .alias("upper_bound"),
        )
        .withColumn("__rn", F.row_number().over(topw))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_set_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise set-overlap estimates between every pair of groups from
    their KMV sketches (Beyer et al. 2007, SIGMOD — the published KMV
    synopsis algebra): for groups (a, b), combine the two sketches,
    keep the k smallest distinct hashes L of the union, and count how
    many of L appear in BOTH sketches. Then

        jaccard ≈ |L ∩ A ∩ B| / |L|,  |A ∪ B| ≈ (k-1)/R_k,
        |A ∩ B| ≈ jaccard · |A ∪ B|

    with the exact-when-small rule: a union sketch smaller than k saw
    every distinct value, so the counts are exact. Returns
    ``(group_a, group_b, sketch_size, kmv_jaccard, approx_union,
    approx_intersection)``.

    Everything is deterministic integer/md5 arithmetic (FLOOR, not
    ROUND, at the estimate edges — no engine-specific half-way ties);
    the jaccard ratio is exact rational → ROUND(…,4). Scale shape: the
    per-group sketch is ≤ k rows (`kmv_rows`' bounded state); the pair
    table is |groups|² — control-plane for any realistic group count —
    and the overlap count rides one window over the tiny union frame.
    Sketches MERGE, so at 100 TB the group sketches arrive from
    per-partition partial sketches, never a re-scan."""
    rows = kmv_rows(df, [group_col], value_col, k)
    pairs = (
        rows.select(F.col(group_col).alias("group_a"))
        .distinct()
        .crossJoin(rows.select(F.col(group_col).alias("group_b")).distinct())
        .where(F.col("group_a") < F.col("group_b"))
    )
    both_sides = pairs.join(
        rows.withColumnRenamed(group_col, "__g"),
        (F.col("__g") == F.col("group_a"))
        | (F.col("__g") == F.col("group_b")),
    )
    marked = both_sides.groupBy("group_a", "group_b", "__h").agg(
        F.max((F.col("__g") == F.col("group_a")).cast("int")).alias("__ina"),
        F.max((F.col("__g") == F.col("group_b")).cast("int")).alias("__inb"),
    )
    w = W.partitionBy("group_a", "group_b").orderBy("__h")
    union_k = (
        marked.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
    )
    agg = union_k.groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).alias("__m"),
        F.max("__h").alias("__hk"),
        F.sum(F.col("__ina") * F.col("__inb")).alias("__both"),
    )
    union_est = F.when(
        F.col("__m") < k, F.col("__m").cast("double")
    ).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(DOMAIN) / F.col("__hk").cast("double")
        ).cast("double")
    )
    return agg.select(
        "group_a",
        "group_b",
        F.col("__m").cast("bigint").alias("sketch_size"),
        F.round(F.col("__both").cast("double") / F.col("__m"), 4).alias(
            "kmv_jaccard"
        ),
        union_est.cast("bigint").alias("approx_union"),
        F.floor(
            F.col("__both").cast("double")
            * union_est
            / F.col("__m").cast("double")
        )
        .cast("bigint")
        .alias("approx_intersection"),
    )


# -- count-min sketch --------------------------------------------------------

#: d hash rows × w buckets. ε = e/w ≈ 0.5%, δ = e^-d ≈ 2% at defaults.
CM_D = 4
CM_W = 512


def _cm_bucket(col, i: int, w: int):
    """Row-``i`` bucket of a value: 60-bit md5 of ``"i:" || value``
    mod ``w`` — deterministic, engine-portable (same string, same md5,
    same modulus in any engine)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{i}:"), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return h % w


def cm_sketch_rows(
    df: DataFrame, value_col: str, d: int = CM_D, w: int = CM_W
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a row table
    ``(__i, __b, __c)`` — ≤ d·w rows regardless of input size. Merge
    sketches by unioning row frames and summing ``__c`` per
    ``(__i, __b)`` (elementwise matrix addition — associative, the
    streaming micro-batch fold). Estimates never undercount; the
    overcount is ≤ εN with probability 1-δ (ε = e/w, δ = e^-d)."""
    arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("__i"),
                _cm_bucket(F.col(value_col), i, w).alias("__b"),
            )
            for i in range(d)
        ]
    )
    return (
        df.select(F.explode(arr).alias("a"))
        .select("a.__i", "a.__b")
        .groupBy("__i", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    value_col: str,
    d: int = CM_D,
    w: int = CM_W,
) -> DataFrame:
    """Point-frequency estimates for ``keys`` from a ``cm_sketch_rows``
    table: per key, the MIN of its d bucket counters. The sketch is
    ≤ d·w rows — broadcast, so the probe never shuffles the keys."""
    arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("__i"),
                _cm_bucket(F.col(value_col), i, w).alias("__b"),
            )
            for i in range(d)
        ]
    )
    probes = keys.select(value_col, F.explode(arr).alias("a")).select(
        value_col, "a.__i", "a.__b"
    )
    return (
        probes.join(F.broadcast(sketch), ["__i", "__b"], "left")
        .groupBy(value_col)
        .agg(
            F.min(F.coalesce(F.col("__c"), F.lit(0)))
            .cast("bigint")
            .alias("cm_est")
        )
    )
