"""Hash-key generation for CDC and surrogate keys.

Reference parity: ``hash_key_gen`` — ``hkey = md5(concat_ws('', keys))``,
``hdiff = md5(concat_ws('', non-key cols))``
(reference/di_landing_to_raw_generic_v2.py:489-494); md5 surrogate keys
(reference/material_external_dim.py:283); sha2 row hash
(reference/dq_rule_builder_common.py:575).

All JVM-side built-ins — no UDFs; these stay inside whole-stage codegen.

Note on canonicalization: values are cast to string before hashing. For
cross-engine reproducibility (and stable hashes under type widening),
``_canon`` formats numeric columns via DECIMAL casts rather than relying
on engine-specific float→string formatting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SEP = "\x1f"  # unit separator: avoids 'a'+'bc' == 'ab'+'c' collisions
# NULL sentinel: concat_ws SKIPS null values, so without it ('a', NULL)
# and (NULL, 'a') would concatenate identically and collide — missed
# updates in find_delta / SCD2 change detection. Record-separator
# framing keeps it distinct from any plausible real value.
_NULL = "\x1eNULL\x1e"


def _canon(df: DataFrame, col: str) -> Column:
    dt = df.schema[col].dataType
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        s = F.col(col).cast("decimal(38,6)").cast("string")
    else:
        s = F.col(col).cast("string")
    return F.coalesce(s, F.lit(_NULL))


def hash_key(df: DataFrame, key_cols: list[str]) -> Column:
    """``hkey`` business-key hash (di_landing_to_raw_generic_v2.py:489-492)."""
    return F.md5(F.concat_ws(_SEP, *[_canon(df, c) for c in key_cols]))


def hash_diff(df: DataFrame, value_cols: list[str]) -> Column:
    """``hdiff`` change-detection hash over non-key columns
    (di_landing_to_raw_generic_v2.py:493-494)."""
    return F.md5(F.concat_ws(_SEP, *[_canon(df, c) for c in value_cols]))


def with_hash_keys(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str] | None = None,
    exclude: list[str] | None = None,
) -> DataFrame:
    """Stamp ``hkey``/``hdiff`` columns. ``value_cols`` defaults to all
    non-key, non-excluded columns (the reference excludes its control
    columns the same way)."""
    exclude = set(exclude or []) | set(key_cols) | {"hkey", "hdiff"}
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in exclude]
    return df.withColumn("hkey", hash_key(df, key_cols)).withColumn(
        "hdiff", hash_diff(df, value_cols)
    )


def surrogate_key(prefix: str, *cols: Column | str) -> Column:
    """md5 surrogate key ``md5(concat('src_', key, '_', ts))``
    (reference/material_external_dim.py:283)."""
    parts = [F.lit(prefix)] + [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    return F.md5(F.concat_ws("_", *parts))
