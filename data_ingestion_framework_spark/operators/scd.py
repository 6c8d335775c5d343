"""SCD Type 1 / Type 2 merge engine.

Reference parity (the core of the framework):
- window-dedup + SCD1 ``MERGE ... UPDATE SET * / INSERT *`` and SCD2
  close-out + append (writers/batch_writers.py:59-162 ``merge_write``)
- full-extract upsert with ``IS DISTINCT FROM`` change detection and
  ``WHEN NOT MATCHED BY SOURCE`` soft deletes (writers/writer.py:177-281)
- initial-load validity stamping (writers/writer.py:62-107)
- the streaming 3-branch CTE (UpdatedRows / DeletedRows / rn-stamped
  source) union → MERGE (writers/writer.py:454-524)
- the curated layer's "merge_key trick" Type2+Type1 single pass
  (reference/Raw-To-Curated-Material_Dim.py:219-285)

Spark-first design: each operator is a pure DataFrame program
``(target_state, source) -> new_target_state``; the caller commits via
``ParquetTable.overwrite`` (sources/tablestore.py). For Delta/Iceberg
targets, ``sinks/merge_sql.py`` renders the equivalent ``MERGE INTO``
statements from the same inputs (equivalence pinned by
``tests/test_merge_sql.py``). All
per-key reasoning is one shuffle on the business key (window + join
share the partitioning); change detection compares md5 hashes computed
JVM-side, so the exchange carries keys + 32-byte hashes, not full rows.

Contract columns (writers/writer.py:19): ``start_time``, ``end_time``,
``is_current``, ``delete_time`` (+ passthrough ``row_creation_time``,
``file_modification_time``, ``file_path``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from data_ingestion_framework_spark.functions.hashes import hash_diff

SCD_COLS = ["start_time", "end_time", "is_current", "delete_time"]


def _data_cols(df: DataFrame, key_cols: list[str], exclude: list[str] | None = None) -> list[str]:
    """Non-key business columns used for change detection: everything
    except keys, SCD control columns and caller excludes
    (``except_column_list``, writers/batch_writers.py:83)."""
    skip = set(key_cols) | set(SCD_COLS) | {
        "row_creation_time",
        "file_modification_time",
        "file_path",
        "hkey",
        "hdiff",
        "bucket_id",  # key-hash partition bucket (sinks/writers.py) — derived, not business state
    } | set(exclude or [])
    return [c for c in df.columns if c not in skip]


def dedupe_latest(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    descending: bool = True,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Latest-record-per-key via ROW_NUMBER — the reference's most-used
    pattern (writers/writer.py:41,73,84,439,483,608; batch_writers.py:143).
    Pass ``tiebreak_cols`` (a unique column) for deterministic results
    when ``order_col`` has ties within a key."""
    direction = F.col(order_col).desc() if descending else F.col(order_col).asc()
    ties = [
        F.col(c).desc() if descending else F.col(c).asc()
        for c in (tiebreak_cols or key_cols)
    ]
    w = W.partitionBy(*key_cols).orderBy(direction, *ties)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def stamp_scd2_initial(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Initial-load SCD2 stamping (writers/writer.py:84-107): order the
    versions of each key by ``order_col``; ``start_time`` = own order
    value, ``end_time`` = next version's start (null for the latest),
    ``is_current`` = 1 only on the latest."""
    w = W.partitionBy(*key_cols).orderBy(
        F.col(order_col).asc(), *[F.col(c).asc() for c in (tiebreak_cols or key_cols)]
    )
    nxt = F.lead(F.col(order_col)).over(w)
    return (
        df.withColumn("start_time", F.col(order_col).cast("timestamp"))
        .withColumn("end_time", nxt.cast("timestamp"))
        .withColumn("is_current", F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)))
        .withColumn("delete_time", F.lit(None).cast("timestamp"))
    )


def scd1_surrogate_apply(
    target: DataFrame | None,
    source: DataFrame,
    key_cols: list[str],
    order_col: str,
    id_col: str = "row_id",
) -> DataFrame:
    """SCD1 merge that PRESERVES a surrogate-key column across updates
    — the dimensional-modeling contract ``scd1_apply`` can't express
    (its replace-on-match drops the target row including its surrogate,
    minting a new one per update): matched keys inherit the target's
    ``id_col``, unmatched source keys carry NULL, and a table with a
    BY DEFAULT identity column fills those NULLs at write time
    (``ParquetTable._fill_identity``) — so the surrogate is stable for
    a key's lifetime and fresh exactly for first-seen keys.

    Same shuffle shape as ``scd1_apply`` plus one key-join to inherit
    ids (co-partitioned with the merge's own key shuffle)."""
    latest = dedupe_latest(source.drop(id_col), key_cols, order_col)
    if target is None:
        return latest.withColumn(id_col, F.lit(None).cast("long"))
    latest = latest.join(
        target.select(*key_cols, id_col), on=key_cols, how="left"
    )
    untouched = target.join(
        latest.select(*key_cols), on=key_cols, how="left_anti"
    )
    return untouched.unionByName(latest, allowMissingColumns=True)


def scd1_apply(
    target: DataFrame | None,
    source: DataFrame,
    key_cols: list[str],
    order_col: str,
    full_extract: bool = False,
    deleted_at=None,
) -> DataFrame:
    """Compute the new SCD1 (current-only) state.

    Semantics of ``MERGE ... WHEN MATCHED UPDATE SET * WHEN NOT MATCHED
    INSERT *`` after window-dedup (writers/batch_writers.py:99-127), plus
    full-extract soft deletes: keys absent from the source get
    ``delete_time`` stamped instead of being dropped
    (writers/writer.py:251-252 ``WHEN NOT MATCHED BY SOURCE``).

    The program: latest source version per key replaces the target row;
    target rows for unmatched keys pass through (anti join). One shuffle
    on the key for the window, one for the join — co-partitioned.
    """
    latest = dedupe_latest(source, key_cols, order_col)
    if target is None:
        return latest
    keys = latest.select(*key_cols)
    untouched = target.join(keys, on=key_cols, how="left_anti")
    if full_extract:
        ts = F.lit(deleted_at).cast("timestamp") if deleted_at else F.current_timestamp()
        if "delete_time" in untouched.columns:
            untouched = untouched.withColumn(
                "delete_time",
                F.when(F.col("delete_time").isNull(), ts).otherwise(F.col("delete_time")),
            )
        else:
            untouched = untouched.withColumn("delete_time", ts)
    # union over the UNION of both schemas: target-only columns (e.g. a
    # previously stamped delete_time) survive on untouched rows as nulls
    # on the source side, and source-only columns (schema widening)
    # appear as nulls on untouched rows — never silently dropped.
    return untouched.unionByName(latest, allowMissingColumns=True)


def scd2_apply(
    target: DataFrame | None,
    source: DataFrame,
    key_cols: list[str],
    order_col: str,
    compare_cols: list[str] | None = None,
    full_extract: bool = False,
    deleted_at=None,
) -> DataFrame:
    """Compute the new SCD2 (full-history) state.

    Reproduces the reference's three merge branches
    (writers/writer.py:454-524: UpdatedRows close-out, DeletedRows,
    rn-stamped SourceDataUpdated) and the curated "merge_key trick"
    (Raw-To-Curated-Material_Dim.py:219-285) — which both exist only to
    make one ``MERGE`` statement do a close-out *and* an insert — as a
    direct computation of the new table state:

    1. Source versions are ordered per key; consecutive versions with an
       unchanged ``hdiff`` collapse (no spurious history rows), and a
       first version identical to the target's current row is dropped.
    2. Surviving versions get chained validity stamps.
    3. The target's current row is closed out at the first new version's
       start (``end_time``, ``is_current=0``).
    4. Full-extract mode soft-deletes current rows whose key is absent
       from the source (``delete_time`` + close-out), matching
       ``WHEN NOT MATCHED BY SOURCE THEN UPDATE`` (writers/writer.py:251).
    5. Historical rows pass through untouched.

    Re-applying the same source batch yields the identical state
    (idempotent replay — SURVEY §7.4 hard part #1).
    """
    src = source
    if compare_cols is None:
        # the order column is batch metadata, not business state — a
        # re-sent identical row with a newer mtime is NOT a new version
        compare_cols = [c for c in _data_cols(src, key_cols) if c != order_col]
    src = src.withColumn("__hdiff", hash_diff(src, compare_cols))

    if target is not None:
        live = target.where((F.col("is_current") == 1) & F.col("delete_time").isNull())
        closed = target.where(~((F.col("is_current") == 1) & F.col("delete_time").isNull()))
        cur_info = live.withColumn("__cur_hdiff", hash_diff(live, compare_cols)).select(
            *key_cols,
            F.col("start_time").alias("__cur_start"),
            "__cur_hdiff",
        )
    else:
        live = None
        closed = None
        cur_info = None

    # (0) replay protection: only versions strictly newer than the key's
    # current start_time apply. A replayed batch (same files, same
    # mtimes) therefore no-ops — the idempotence the reference gets from
    # MERGE matching on full-row equality (writers/writer.py:505-524).
    if cur_info is not None:
        src = src.join(cur_info, on=key_cols, how="left")
        src = src.where(
            F.col("__cur_start").isNull()
            | (F.col(order_col).cast("timestamp") > F.col("__cur_start"))
        )

    # (1) collapse consecutive unchanged versions within the batch, and
    # drop a leading version equal to the target's current image.
    w_asc = W.partitionBy(*key_cols).orderBy(F.col(order_col).asc(), *key_cols)
    src = src.withColumn("__prev_hdiff", F.lag("__hdiff").over(w_asc))
    if cur_info is not None:
        changed = (
            (F.col("__prev_hdiff").isNull() & (
                F.col("__cur_hdiff").isNull() | (F.col("__hdiff") != F.col("__cur_hdiff"))
            ))
            | (F.col("__prev_hdiff").isNotNull() & (F.col("__hdiff") != F.col("__prev_hdiff")))
        )
    else:
        changed = F.col("__prev_hdiff").isNull() | (
            F.col("__hdiff") != F.col("__prev_hdiff")
        )
    new_versions = src.where(changed).drop(
        "__prev_hdiff", "__cur_hdiff", "__cur_start", "__hdiff"
    )

    # (2) chained validity stamps for surviving versions.
    stamped = stamp_scd2_initial(new_versions, key_cols, order_col)

    if target is None:
        return stamped

    # (3) close out the current row of keys that received a new version.
    first_new = stamped.groupBy(*key_cols).agg(
        F.min("start_time").alias("__new_start")
    )
    live_joined = live.join(first_new, on=key_cols, how="left")
    closed_out = (
        live_joined.where(F.col("__new_start").isNotNull())
        .withColumn("end_time", F.col("__new_start"))
        .withColumn("is_current", F.lit(0))
        .drop("__new_start")
    )
    untouched_live = live_joined.where(F.col("__new_start").isNull()).drop("__new_start")

    # (4) full-extract soft delete for keys absent from the source.
    if full_extract:
        ts = F.lit(deleted_at).cast("timestamp") if deleted_at else F.current_timestamp()
        src_keys = source.select(*key_cols).distinct()
        gone = untouched_live.join(src_keys, on=key_cols, how="left_anti").withColumns(
            {"delete_time": ts, "end_time": ts, "is_current": F.lit(0)}
        )
        kept = untouched_live.join(src_keys, on=key_cols, how="left_semi")
        untouched_live = kept.unionByName(gone)

    # (5) assemble the new state over the union of both schemas (see
    # scd1_apply: target-only and source-only columns both survive).
    return (
        closed.unionByName(closed_out)
        .unionByName(untouched_live)
        .unionByName(stamped, allowMissingColumns=True)
    )


def late_arriving_dim_defaults(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    defaults: dict[str, object],
) -> DataFrame:
    """Default dimension rows for fact keys missing from the dimension
    — the late-arriving-dimension insert
    (reference/material_external_dim.py:1294+, SURVEY §7.2 step 10).

    left_anti on the (broadcastable) dim keyset; one distinct over the
    fact keys. The caller appends the result to the dim table; a later
    real dimension row supersedes it through the normal SCD2 merge.
    """
    missing = (
        fact.select(F.col(fact_key).alias(dim_key))
        .distinct()
        .join(dim.select(dim_key), on=dim_key, how="left_anti")
    )
    for col, val in defaults.items():
        missing = missing.withColumn(col, F.lit(val))
    return missing.withColumn("is_inferred", F.lit(1))


def current_view(scd2: DataFrame) -> DataFrame:
    """SCD1 projection of an SCD2 table (the IE dual-target 'current'
    table, writers/writer.py:284-420)."""
    return scd2.where((F.col("is_current") == 1) & F.col("delete_time").isNull())


def as_of(scd2: DataFrame, ts) -> DataFrame:
    """Point-in-time reconstruction — the engine's stand-in for Delta
    time travel (reference/di_landing_to_raw_generic_v2.py:774-779):
    rows valid at ``ts`` by the validity interval."""
    t = F.lit(ts).cast("timestamp")
    return scd2.where(
        (F.col("start_time") <= t)
        & (F.col("end_time").isNull() | (F.col("end_time") > t))
        & (F.col("delete_time").isNull() | (F.col("delete_time") > t))
    )
