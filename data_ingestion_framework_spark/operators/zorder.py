"""Z-order (Morton-curve) data layout for multi-column data skipping.

Lakehouse parity: the reference framework's Delta tables are maintained
with ``OPTIMIZE`` (ingest-framework/framework/src/sparkbuilder/writers/
writer.py:276-281 runs it every 101st micro-batch); Databricks extends
that with ``ZORDER BY (c1, c2)`` so parquet footer min/max stats prune
files for predicates on EITHER column. This module re-derives the same
layout from first principles on plain parquet:

1. each clustering column is quantized to a ``bits``-wide integer
   bucket with EXACT integer arithmetic (``((x - min) * 2^bits) div
   (max - min + 1)`` — no float rounding, so any engine reproduces it);
2. bucket bits are interleaved into a Morton code (bit b of column j
   lands at position ``b * n_cols + j``), the classic space-filling
   curve that keeps points close in EVERY dimension close on the curve;
3. the frame is range-partitioned and sorted by the code, so each
   output file covers a tight hyper-rectangle and a predicate on any
   clustered column skips most files on min/max stats alone.

Scale notes: the min/max pass is one partial-aggregated scan (two longs
per column reach the driver — control-plane); the layout itself is the
ONE shuffle any clustering write needs (repartitionByRange samples the
z-code distribution, so skew in the raw columns doesn't skew files).
Everything is JVM-side integer expressions — no UDFs, no HOFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def int_bucket(col: Column, vmin: int, vmax: int, bits: int) -> Column:
    """Quantize an integer column in [vmin, vmax] to [0, 2^bits).

    Pure integer math — ``((x - vmin) * 2^bits) div span`` — identical
    in any engine (the float variant disagrees at bucket edges).
    Values outside [vmin, vmax] clamp to the end buckets so late data
    beyond the observed range still lands in a file, just an edge one.
    NULL values land in bucket 0 explicitly (min/max sort orders put
    NULLs first, so the layout keeps them with the low edge) — without
    the guard, ``least``/``greatest`` skip NULLs and the rows would
    silently cluster with the MAX bucket instead.
    """
    if vmax < vmin:
        raise ValueError(f"empty bucket range [{vmin}, {vmax}]")
    if (vmax - vmin + 1) > (1 << (63 - bits)):
        # (x - vmin) * 2^bits must stay inside signed 64 bits under
        # ANSI overflow checking; pre-scale such columns (e.g. micros →
        # days) instead of silently wrapping. The bound scales with the
        # requested bucket width — span * 2^bits < 2^63.
        raise ValueError(
            f"range [{vmin}, {vmax}] too wide for exact {bits}-bit "
            "bucketing — pre-scale the column (e.g. truncate "
            "timestamps to days)"
        )
    n = 1 << bits
    span = vmax - vmin + 1
    # clamp BEFORE the multiply: an out-of-range late value lands in
    # the edge bucket (same result as clamping the bucket) without
    # (x - vmin) * n overflowing for far outliers under ANSI mode
    clamped = F.greatest(
        F.lit(vmin).cast("bigint"),
        F.least(F.lit(vmax).cast("bigint"), col.cast("bigint")),
    )
    # bigint DIV bigint — exact integer division, no float rounding
    bucket = F.call_function(
        "div", (clamped - F.lit(vmin)) * F.lit(n), F.lit(span)
    )
    return F.when(col.isNull(), F.lit(0).cast("bigint")).otherwise(bucket)


def morton_code(buckets: list[Column], bits: int) -> Column:
    """Interleave ``bits``-wide bucket ids into one Morton code.

    Bit ``b`` of ``buckets[j]`` lands at position ``b * len(buckets) +
    j``. Built as a driver-side loop of shift/AND/OR terms (``bits ×
    n_cols`` small expressions — nothing per-row is interpreted), all
    whole-stage-codegen-able integer ops.
    """
    if not buckets:
        raise ValueError("morton_code needs at least one bucket column")
    ncols = len(buckets)
    if bits * ncols > 63:
        raise ValueError(f"{bits} bits x {ncols} cols exceeds a signed 64-bit code")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for j, col in enumerate(buckets):
            bit = F.shiftright(col, b).bitwiseAND(F.lit(1).cast("bigint"))
            z = z.bitwiseOR(
                F.call_function(
                    "shiftleft", bit, F.lit(b * ncols + j).cast("int")
                ).cast("bigint")
            )
    return z


def zorder_code(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[Column, dict[str, tuple[int, int]]]:
    """Build the z-code Column for ``cols`` (integer/date-like), doing
    the one control-plane min/max scan. Returns ``(code, ranges)`` so
    callers can record the ranges (an incremental OPTIMIZE would reuse
    them to keep codes comparable across runs)."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("bigint")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("bigint")).alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    ranges = {c: (row[f"__min_{c}"], row[f"__max_{c}"]) for c in cols}
    for c, (lo, hi) in ranges.items():
        if lo is None:
            raise ValueError(f"zorder column {c} is all-NULL")
    buckets = [
        int_bucket(F.col(c), ranges[c][0], ranges[c][1], bits) for c in cols
    ]
    return morton_code(buckets, bits), ranges


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    num_files: int,
    bits: int = 16,
    curve: str = "morton",
) -> DataFrame:
    """Cluster ``df`` into ``num_files`` write partitions along a
    space-filling curve of ``cols``: range-partition on the code
    (sampled bounds — raw-column skew doesn't skew files), sort within
    each partition so row groups inside a file are tight too, and drop
    the helper column. Write the result with any parquet writer; the
    footer min/max stats of every clustered column become selective.

    ``curve``: ``"morton"`` or ``"hilbert"`` (both any column count
    >= the curve's minimum; Hilbert gives tighter per-file bounding
    boxes — see :func:`hilbert_code` / :func:`hilbert_code_nd`)."""
    if curve == "morton":
        code, _ = zorder_code(df, cols, bits)
    elif curve == "hilbert":
        code, _ = hilbert_zorder_code(df, cols, bits)
    else:
        raise ValueError(f"curve must be 'morton' or 'hilbert', got {curve!r}")
    return (
        df.withColumn("__z", code)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def hilbert_code(bx: Column, by: Column, bits: int) -> Column:
    """Hilbert-curve index of two ``bits``-wide bucket ids — the
    higher-locality alternative to :func:`morton_code` for 2-D
    clustering (a Hilbert traversal never makes Morton's long diagonal
    jumps, so file min/max ranges stay tighter on BOTH columns; the
    same reason Databricks added liquid-clustering-style curves on top
    of Z-ORDER).

    Classic xy→d algorithm (public, e.g. the Wikipedia formulation),
    unrolled driver-side into ``bits`` levels: per level s = 2^k,
    ``rx/ry`` from the bucket bits, ``d += s·s·((3·rx) XOR ry)``, then
    the conditional reflect+swap expressed with ``F.when``.

    Each level's ``(x, y, d)`` state is LET-BOUND through a
    single-element ``transform`` (the winnowing trick): the level body
    references x/y several times, so naive expression substitution
    multiplies the tree ~5× per level — 2^Θ(bits) nodes, a driver OOM
    by bits=8. With the lambda binding the state struct is one node
    per level and the tree stays linear in ``bits``."""
    if bits * 2 > 62:
        raise ValueError(f"{bits}-bit Hilbert code exceeds signed 64 bits")
    state = F.struct(
        bx.cast("bigint").alias("x"),
        by.cast("bigint").alias("y"),
        F.lit(0).cast("bigint").alias("d"),
    )
    def _level(sv: int):
        # factory, NOT a default argument: a two-parameter lambda would
        # be treated by F.transform as (element, index) and the index
        # column would silently override sv
        def step(st):
            s = F.lit(sv).cast("bigint")
            x, y, d = st["x"], st["y"], st["d"]
            rx = (
                F.when(x.bitwiseAND(s) > 0, F.lit(1))
                .otherwise(F.lit(0))
                .cast("bigint")
            )
            ry = (
                F.when(y.bitwiseAND(s) > 0, F.lit(1))
                .otherwise(F.lit(0))
                .cast("bigint")
            )
            nd = d + s * s * ((F.lit(3).cast("bigint") * rx).bitwiseXOR(ry))
            # rotate/reflect the quadrant: when ry == 0, (x, y)
            # reflect (if rx == 1) and swap
            refl_x = F.when(rx == 1, s - 1 - x).otherwise(x)
            refl_y = F.when(rx == 1, s - 1 - y).otherwise(y)
            nx = F.when(ry == 0, refl_y).otherwise(x)
            ny = F.when(ry == 0, refl_x).otherwise(y)
            return F.struct(nx.alias("x"), ny.alias("y"), nd.alias("d"))

        return step

    for k in range(bits - 1, -1, -1):
        state = F.transform(F.array(state), _level(1 << k))[0]
    return state["d"]


def hilbert_code_nd(buckets: list[Column], bits: int) -> Column:
    """Hilbert-curve index of ``n`` ``bits``-wide bucket ids — the
    n-dimensional generalization of :func:`hilbert_code`, so
    ``compact(curve="hilbert")`` accepts the same column counts as
    Morton. Classic Gray-code transpose algorithm (Skilling,
    "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 —
    public): inverse-undo the rotations level by level, Gray-encode
    across axes, fold the exchange mask ``t`` from the last axis, then
    untranspose the per-axis bit planes into one integer.

    Same expression-discipline as the 2-D form: every level's
    ``(x_0..x_{n-1})`` state is LET-BOUND through a single-element
    ``transform``, so the tree stays linear in ``bits`` (the level
    bodies reference state fields several times — naive substitution
    would go exponential). Within a level the chained ``x_0`` updates
    grow the body O(2^n), bounded by the ``bits·n <= 62`` code-width
    guard (n <= 7 at practical bit widths). All integer ops,
    whole-stage-codegen-able, no UDFs.

    Nesting-depth discipline, additionally: Spark's analyzer resolves
    ONE nested lambda level per fixed-point iteration, and its default
    iteration cap (100) must hold on a VANILLA session (the driver
    harness uses one). Skilling's trailing exchange-mask loop (``t ^=
    Q-1`` per set bit of the last axis) is therefore replaced by the
    equivalent log-step suffix-parity fold (``v ^= v >> 2^k`` shift
    doubling — bit j of t is the parity of the last axis's bits above
    j), and the Gray-encode + mask + untranspose collapse into two
    final levels: total nesting is ``bits + 1``, the same depth the
    2-D form resolves everywhere.
    """
    n = len(buckets)
    if n < 1:
        raise ValueError("hilbert_code_nd needs at least one bucket column")
    if bits * n > 62:
        raise ValueError(
            f"{bits} bits x {n} cols exceeds a signed 64-bit Hilbert code"
        )
    xs_names = [f"x{i}" for i in range(n)]
    state = F.struct(
        *[b.cast("bigint").alias(nm) for b, nm in zip(buckets, xs_names)]
    )

    def _undo(qv: int):
        def step(st):
            xs = [st[nm] for nm in xs_names]
            q = F.lit(qv).cast("bigint")
            p = F.lit(qv - 1).cast("bigint")
            x0 = xs[0]
            out = list(xs)
            for i in range(n):
                xi = out[i] if i else x0
                cond = xi.bitwiseAND(q) > 0
                if i == 0:
                    # else-branch t = (x0 ^ x0) & p = 0 → no-op
                    x0 = F.when(cond, x0.bitwiseXOR(p)).otherwise(x0)
                else:
                    t = x0.bitwiseXOR(xi).bitwiseAND(p)
                    nx0 = F.when(cond, x0.bitwiseXOR(p)).otherwise(
                        x0.bitwiseXOR(t)
                    )
                    out[i] = F.when(cond, xi).otherwise(xi.bitwiseXOR(t))
                    x0 = nx0
            out[0] = x0
            return F.struct(*[c.alias(nm) for c, nm in zip(out, xs_names)])

        return step

    for k in range(bits - 1, 0, -1):  # Q from 2^(bits-1) down to 2
        state = F.transform(F.array(state), _undo(1 << k))[0]

    def _gray_t(st):
        # X[i] ^= X[i-1] ascending, sequential (uses the updated
        # predecessor), then the exchange mask t: Skilling's per-level
        # ``if X[n-1] & Q: t ^= Q-1`` accumulates to bit j of t =
        # parity of X[n-1]'s bits ABOVE j — a suffix-parity, folded in
        # log2(bits) shift-doubling steps instead of bits nested
        # levels (each step doubles the tree, 2^ceil(log2 bits) ≈
        # bits leaf copies total — linear, no let-binding needed)
        xs = [st[nm] for nm in xs_names]
        out = [xs[0]]
        for i in range(1, n):
            out.append(xs[i].bitwiseXOR(out[i - 1]))
        t = F.shiftright(out[-1], 1)
        shift = 1
        while shift < bits:
            t = t.bitwiseXOR(F.shiftright(t, shift))
            shift <<= 1
        return F.struct(
            *[c.alias(nm) for c, nm in zip(out, xs_names)], t.alias("t")
        )

    state = F.transform(F.array(state), _gray_t)[0]

    def _final(st):
        # apply t to every axis, then untranspose: bit q of axis i
        # lands at position q*n + (n-1-i), MSB-first across axes
        d = F.lit(0).cast("bigint")
        for q in range(bits):
            for i in range(n):
                bit = (
                    F.shiftright(st[xs_names[i]].bitwiseXOR(st["t"]), q)
                    .bitwiseAND(F.lit(1).cast("bigint"))
                )
                d = d.bitwiseOR(
                    F.call_function(
                        "shiftleft", bit, F.lit(q * n + (n - 1 - i)).cast("int")
                    ).cast("bigint")
                )
        return F.struct(d.alias("d"))

    return F.transform(F.array(state), _final)[0]["d"]


def hilbert_zorder_code(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[Column, dict[str, tuple[int, int]]]:
    """:func:`zorder_code` with the Hilbert curve; same integer-exact
    bucketing and control-plane min/max scan. Two columns use the
    pinned 2-D reflect/swap form (:func:`hilbert_code` — its exact
    output is oracle-replayed by ``orders_hilbert_keys``); three or
    more use the n-dimensional Gray-code generalization
    (:func:`hilbert_code_nd`)."""
    if len(cols) < 2:
        raise ValueError("hilbert_zorder_code requires >= 2 columns")
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("bigint")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("bigint")).alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    ranges = {c: (row[f"__min_{c}"], row[f"__max_{c}"]) for c in cols}
    for c, (lo, hi) in ranges.items():
        if lo is None:
            raise ValueError(f"zorder column {c} is all-NULL")
    bs = [
        int_bucket(F.col(c), ranges[c][0], ranges[c][1], bits) for c in cols
    ]
    if len(cols) == 2:
        return hilbert_code(bs[0], bs[1], bits), ranges
    return hilbert_code_nd(bs, bits), ranges
