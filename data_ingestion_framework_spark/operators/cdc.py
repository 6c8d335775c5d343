"""CDC / change-detection operators.

Reference parity: ``find_delta`` full-outer hash-join classification
(reference/di_landing_to_raw_generic_v2.py:498-523),
``run_brute_force_comparison`` (transformations/brute_force_comparison.py:3-25),
``CDCTransactionDataFrame`` op-typed splits (transformations/cdc/common.py:23-63),
PK validity (transformations/cdc/common.py:14-20) and out-of-order delete
protection (transformations/cdc/common.py:66-75).

Scale design: all change detection is a single shuffle-on-key full outer
join over (key, hash) projections — columns are pruned to keys + hashes
before the shuffle, so the exchange moves ~40 bytes/row regardless of
table width. Classification and per-column diffing are JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestion_framework_spark.functions.hashes import with_hash_keys

#: curr_row_flg vocabulary (di_landing_to_raw_generic_v2.py:301-314)
FLAG_CURRENT = "Y"
FLAG_SUPERSEDED = "N"
FLAG_DELETED = "D"


def find_delta(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Classify rows into insert/update/delete/unchanged.

    Reference semantics (di_landing_to_raw_generic_v2.py:498-523): full
    outer join old vs new on the business-key hash, compare the non-key
    hash. Output = new-side rows for insert/update/unchanged plus
    old-side rows for delete, with ``change_type`` in
    {'insert','update','delete','unchanged'}.
    """
    o = with_hash_keys(old, key_cols, value_cols).select(
        *key_cols, F.col("hkey").alias("_o_hkey"), F.col("hdiff").alias("_o_hdiff")
    )
    n = with_hash_keys(new, key_cols, value_cols)
    joined = n.join(o, on=key_cols, how="full_outer")
    classified = joined.withColumn(
        "change_type",
        F.when(F.col("_o_hkey").isNull(), F.lit("insert"))
        .when(F.col("hkey").isNull(), F.lit("delete"))
        .when(F.col("hdiff") != F.col("_o_hdiff"), F.lit("update"))
        .otherwise(F.lit("unchanged")),
    )
    return classified.drop("_o_hkey", "_o_hdiff")


def brute_force_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Changed-row detector with per-column diff flags
    (transformations/brute_force_comparison.py:3-25): inner join on keys,
    ``<col>_diff`` ∈ {0,1} per compared column (null-safe), rows kept
    when any column differs."""
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in key_cols and c in old.columns]
    o = old.select(
        *key_cols, *[F.col(c).alias(f"_old_{c}") for c in compare_cols]
    )
    joined = new.join(o, on=key_cols, how="inner")
    for c in compare_cols:
        joined = joined.withColumn(
            f"{c}_diff",
            F.when(F.col(c).eqNullSafe(F.col(f"_old_{c}")), F.lit(0)).otherwise(F.lit(1)),
        )
    any_diff = None
    for c in compare_cols:
        flag = F.col(f"{c}_diff") == 1
        any_diff = flag if any_diff is None else (any_diff | flag)
    return joined.where(any_diff).drop(*[f"_old_{c}" for c in compare_cols])


class CDCTransactions:
    """Operation-typed CDC frame (transformations/cdc/common.py:23-63)."""

    def __init__(
        self,
        df: DataFrame,
        id_cols: list[str],
        op_col: str = "_op",
        insert_value: str = "insert",
        update_value: str = "update",
        delete_value: str = "delete",
    ):
        self.df = df
        self.id_cols = id_cols
        self.op_col = op_col
        self._ops = {
            "insert": insert_value,
            "update": update_value,
            "delete": delete_value,
        }

    def get_inserts(self) -> DataFrame:
        return self.df.where(F.col(self.op_col) == self._ops["insert"])

    def get_updates(self) -> DataFrame:
        return self.df.where(F.col(self.op_col) == self._ops["update"])

    def get_deletes(self) -> DataFrame:
        return self.df.where(F.col(self.op_col) == self._ops["delete"])

    def get_upserts(self) -> DataFrame:
        return self.df.where(
            F.col(self.op_col).isin(self._ops["insert"], self._ops["update"])
        )


def is_valid_primary_key(df: DataFrame, key_cols: list[str]) -> bool:
    """Null + uniqueness PK check (transformations/cdc/common.py:14-20).

    Single aggregation pass: count, distinct-key count and null-key
    count in one job instead of the reference's three actions.
    """
    null_pred = None
    for c in key_cols:
        p = F.col(c).isNull()
        null_pred = p if null_pred is None else (null_pred | p)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(*[F.col(c) for c in key_cols]).alias("n_keys"),
        F.sum(F.when(null_pred, 1).otherwise(0)).alias("n_null"),
    ).collect()[0]
    return row["n_null"] == 0 and row["n"] == row["n_keys"]


def handle_out_of_order_deletes(
    target: DataFrame, deletes: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Drop keys present in the delete feed
    (transformations/cdc/common.py:66-75): a left_anti join — the caller
    commits the result."""
    return target.join(deletes.select(*key_cols).distinct(), on=key_cols, how="left_anti")


def change_data_feed(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    full_extract: bool = False,
    commit_version: int | None = None,
) -> DataFrame:
    """Emit the Delta-style Change Data Feed a MERGE of ``source`` into
    ``target`` would produce: one row per change with ``_change_type``
    in {'insert', 'update_preimage', 'update_postimage', 'delete'}
    (deletes only under ``full_extract`` — the WHEN NOT MATCHED BY
    SOURCE branch). Matched-but-unchanged rows emit nothing, exactly
    like Delta CDF.

    The reference's lakehouse targets expose this as
    ``table_changes``/``readChangeFeed`` on Delta tables; here the feed
    is derived relationally so any downstream (audit, incremental
    consumers, reverse ETL) gets the same contract on plain parquet.

    Shape: ONE key-keyed full-outer join; each joined row maps to an
    array of 0-2 change structs (pre+post for updates) which explodes
    in the same stage — no second pass, no union of per-branch scans.
    Change detection is null-safe per-column (IS DISTINCT FROM), the
    same predicate the SCD merges use. ``source`` must be key-unique
    (window-dedup upstream, as ``scd1_apply`` does).
    """
    if compare_cols is None:
        compare_cols = [
            c for c in source.columns if c not in key_cols and c in target.columns
        ]
    t = target.select(
        *key_cols, *[F.col(c).alias(f"_t_{c}") for c in compare_cols]
    ).withColumn("_in_t", F.lit(True))
    s = source.select(
        *key_cols, *[F.col(c).alias(f"_s_{c}") for c in compare_cols]
    ).withColumn("_in_s", F.lit(True))
    joined = s.join(t, on=key_cols, how="full_outer")

    def image(side: str, change_type: str):
        return F.struct(
            *[F.col(f"_{side}_{c}").alias(c) for c in compare_cols],
            F.lit(change_type).alias("_change_type"),
        )

    changed = None
    for c in compare_cols:
        p = ~F.col(f"_s_{c}").eqNullSafe(F.col(f"_t_{c}"))
        changed = p if changed is None else (changed | p)

    empty = F.array().cast(
        joined.select(F.array(image("s", "x")).alias("a")).schema["a"].dataType
    )
    changes = (
        F.when(F.col("_in_t").isNull(), F.array(image("s", "insert")))
        .when(
            F.col("_in_s").isNull(),
            F.array(image("t", "delete")) if full_extract else empty,
        )
        .when(
            changed if changed is not None else F.lit(False),
            F.array(image("t", "update_preimage"), image("s", "update_postimage")),
        )
        .otherwise(empty)
    )
    out = joined.select(*key_cols, F.explode(changes).alias("_c")).select(
        *key_cols,
        *[F.col(f"_c.{c}").alias(c) for c in compare_cols],
        F.col("_c._change_type").alias("_change_type"),
    )
    if commit_version is not None:
        out = out.withColumn("_commit_version", F.lit(commit_version).cast("bigint"))
    return out


def read_changes(
    cdf_table,
    start_version: int | None = None,
    end_version: int | None = None,
) -> "DataFrame":
    """``table_changes(...)`` / ``readChangeFeed`` consumption parity:
    the change rows of a CDF table bounded by ``_commit_version`` —
    inclusive on both ends, like Delta's startingVersion/endingVersion.
    The feed table is append-only (every producer in this engine
    appends with a version stamp), so the filter is a pure predicate
    the parquet scan pushes down; no ordering is imposed (consumers
    fold by version, as the SCD/streaming mergers do)."""
    df = cdf_table.read()
    if "_commit_version" not in df.columns:
        raise ValueError(
            f"{cdf_table.path} is not a change feed table "
            "(no _commit_version column)"
        )
    if start_version is not None:
        df = df.where(F.col("_commit_version") >= start_version)
    if end_version is not None:
        df = df.where(F.col("_commit_version") <= end_version)
    return df
