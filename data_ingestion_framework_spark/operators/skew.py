"""Skew mitigation: deterministic salted joins.

AQE's skew-join handling (enabled in session.py) is the first line of
defense; explicit salting remains useful when one hot key dominates a
*broadcast-ineligible* join or an aggregation. The salt here is
hash-derived (xxhash64 of the whole row), not random — results stay
deterministic and replayable.

Scale shape: the big side gains a salt in [0, S); the small side is
replicated S× (explode over a literal range). The join key becomes
(key, salt), splitting each hot key's rows across S reducers.
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _parse_bytes(v: str) -> int:
    """Parse Spark byte-string confs ('134217728b', '128m', '1g')."""
    v = v.strip().lower()
    units = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    if v and v[-1] in units:
        return int(float(v[:-1]) * units[v[-1]])
    return int(v)


def _local_input_files(df: DataFrame) -> list[str] | None:
    """The frame's input files when they are all plain local files —
    the precondition for both the metadata-only split estimate and the
    probe cache identity. None otherwise."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    for f in files:
        if urlparse(f).scheme not in ("file", ""):
            return None
    return sorted(files)


def _estimated_scan_partitions(
    df: DataFrame, files: list[str] | None = None
) -> int | None:
    """Expected input-split count of a LOCAL file-source scan, from
    Spark's own bin-packing formula (FilePartition.maxSplitBytes):
    ``maxSplit = min(maxPartitionBytes, max(openCostInBytes,
    totalCost / defaultParallelism))``, splits ≈ totalCost/maxSplit
    with per-file open cost. Returns None when the plan isn't a plain
    local file scan — caller falls back to the exact RDD probe."""
    if files is None:
        files = _local_input_files(df)
    if not files:
        return None
    sizes = []
    for f in files:
        try:
            sizes.append(os.path.getsize(unquote(urlparse(f).path)))
        except OSError:
            return None
    conf = df.sparkSession.conf
    max_part = _parse_bytes(
        conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    )
    open_cost = _parse_bytes(
        conf.get("spark.sql.files.openCostInBytes", "4194304b")
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    total_cost = sum(s + open_cost for s in sizes)
    max_split = min(max_part, max(open_cost, total_cost // max(par, 1)))
    # subtract one open-cost so a single small file estimates 1, not 2
    # — a slight under-estimate is the safe direction (the caller only
    # trusts the estimate to SKIP, and falls back to the exact probe
    # otherwise)
    return max(1, -(-(total_cost - open_cost) // max(max_split, 1)))


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Round-robin the frame to cluster parallelism when it arrives in
    fewer splits — for compute-bound downstream expressions (gram
    explodes, signature folds, array math) whose cost is per-row CPU,
    not bytes.

    At real scale the scan already has >= parallelism splits and this
    is a no-op decision; at bench scale a 5000-row parquet file is ONE
    split, which would serialize the whole expression pipeline onto a
    single core. Callers project the narrow column set first so the
    exchanged payload stays minimal.

    The at-scale no-op decision is made from file metadata alone when
    the inputs are local files with enough estimated splits
    (``_estimated_scan_partitions``) — probing ``df.rdd`` instantiates
    the physical plan's RDD lineage, needless driver work on a wide
    plan. The estimate is only trusted in the skip direction: a
    downstream shuffle can repartition regardless of scan splits, so
    a low estimate still defers to the exact probe before paying for
    a repartition.

    The exact probe's result is cached per ``(input files,
    parallelism)`` within the session: every query against the same
    small table re-derives the same scan split count, and the probe
    (~0.1-0.2 s of driver-side RDD instantiation) was the dominant
    fixed overhead of the sub-second bench lines. The cache holds a
    perf decision, not semantics — a pathological same-files frame
    with different partitioning would only mis-skip a repartition."""
    n = df.sparkSession.sparkContext.defaultParallelism
    files = _local_input_files(df)
    est = _estimated_scan_partitions(df, files)
    if est is not None and est >= n:
        return df
    key = (tuple(files), n) if files else None
    if key is not None and key in _probe_cache:
        parts = _probe_cache[key]
    else:
        parts = df.rdd.getNumPartitions()
        if key is not None:
            _probe_cache[key] = parts
    if parts < n:
        return df.repartition(n)
    return df


#: exact-probe memo for spread_for_compute: (files, parallelism) →
#: scan partition count. Bounded by distinct table file-sets touched
#: in one session (control-plane sized).
_probe_cache: dict[tuple, int] = {}


def with_salt(df: DataFrame, buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, buckets) derived from all columns."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(salt_col, F.pmod(h, F.lit(buckets)).cast("int"))


def replicate_for_salt(df: DataFrame, buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Small-side replication: one copy per salt value."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys: big side salted, small side
    replicated, join on keys + salt. Output drops the salt."""
    b = with_salt(big, buckets)
    s = replicate_for_salt(small, buckets)
    return b.join(s, on=on + ["__salt"], how=how).drop("__salt")


def salted_count_per_key(
    df: DataFrame, key_cols: list[str], buckets: int = 8
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: partial count per
    (key, salt), then final combine per key — the map-side-combine
    pattern made explicit for pathologically hot keys."""
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*key_cols, "__salt").agg(F.count(F.lit(1)).alias("__n"))
    return partial.groupBy(*key_cols).agg(F.sum("__n").alias("n"))
