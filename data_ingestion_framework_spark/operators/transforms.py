"""Config-driven transformation registry.

Reference parity: transformations/common_transformations.py:4-75,
transformations/sql_transformation.py:4-32,
transformations/python_transformation.py:3-17, and the dispatch map in
builder/engine.py:36-46,103-141.

Design differences:
- Explicit registry dict instead of ``globals()`` lookup, and
  ``F.expr`` / whitelisted function application instead of ``eval``
  (the reference evals arbitrary strings:
  common_transformations.py:53-61, dq/dq.py:47).
- The SQL step runs ``spark.sql`` over a temp view (the reference's
  ``df.sql(sql)`` at sql_transformation.py:32 is a bug; intended
  semantics implemented here).

Every transform is ``DataFrame -> DataFrame`` and purely declarative,
so chains of transforms collapse into one Catalyst plan — projections
and filters written here reach the parquet scan as pushed filters and
pruned columns.
"""

from __future__ import annotations

import re
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TransformFn = Callable[..., DataFrame]


# -- primitive transforms ----------------------------------------------------

def select_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """common_transformations.py:11-20 ``run_select_clause``."""
    return df.select(*columns)


def select_expr(df: DataFrame, exprs: list[str]) -> DataFrame:
    """Column-map projection ``src AS tgt``
    (reference/di_landing_to_raw_generic_v2.py:401-424)."""
    return df.selectExpr(*exprs)


def drop_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """common_transformations.py:23-27 ``run_drop_columns``; also the
    OSS stand-in for ``SELECT * EXCEPT(cols)`` (writers/writer.py:77)."""
    return df.drop(*columns)


def where_clause(df: DataFrame, predicate: str) -> DataFrame:
    """common_transformations.py:4-8 ``run_where_clause``."""
    return df.where(predicate)


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """common_transformations.py:30-41 ``run_rename_columns``."""
    return df.withColumnsRenamed(mapping)


def cast_columns(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """builder/engine.py:50-66 ``datatype_conversion`` (config
    ``cast_column`` e.g. ``{"BRGEW": "DECIMAL(13,3)"}``)."""
    return df.withColumns({c: F.col(c).cast(t) for c, t in casts.items()})


def rename_and_cast(df: DataFrame, spec: dict[str, tuple[str, str]]) -> DataFrame:
    """common_transformations.py:44-51 — ``{old: (new, type)}``."""
    df = df.withColumns({old: F.col(old).cast(t) for old, (_new, t) in spec.items()})
    return df.withColumnsRenamed({old: new for old, (new, _t) in spec.items()})


def columns_to_lower(df: DataFrame) -> DataFrame:
    """common_transformations.py:63-67."""
    return df.toDF(*[c.lower() for c in df.columns])


_NORMALIZE_RE = re.compile(r"[ \t\n/]+")


def normalize_column_names(df: DataFrame) -> DataFrame:
    """Whitespace/slash → underscore (common_transformations.py:70-75,
    readers/streaming_readers.py:68,
    reference/di_landing_to_raw_generic_v2.py:356-359)."""
    return df.toDF(*[_NORMALIZE_RE.sub("_", c.strip()) for c in df.columns])


def with_column_expr(df: DataFrame, column: str, expr: str) -> DataFrame:
    """Safe replacement for the eval-based ``pyspark_function``
    (common_transformations.py:53-61): any Spark SQL expression, parsed
    by Catalyst rather than evaluated as Python."""
    return df.withColumn(column, F.expr(expr))


def sql_transform(df: DataFrame, sql: str, view_name: str = "__t") -> DataFrame:
    """transformations/sql_transformation.py:4-32 with the
    ``{{table_view}}`` placeholder contract; executes via ``spark.sql``."""
    df.createOrReplaceTempView(view_name)
    return df.sparkSession.sql(sql.replace("{{table_view}}", view_name))


def dedupe(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """``distinct()`` / ``dropDuplicates(keys)``
    (reference/Raw-To-Curated-Material_Dim.py:257,
    transformations/cdc/common.py:14-20)."""
    return df.dropDuplicates(keys) if keys else df.distinct()


# -- registry + queue runner -------------------------------------------------

#: Explicit registry (vs the reference's ``globals()`` resolution,
#: python_transformation.py:8-13). Keys match the reference's transform
#: ``type`` vocabulary (builder/engine.py:36-46).
TRANSFORM_REGISTRY: dict[str, TransformFn] = {
    "select": select_columns,
    "select_expr": select_expr,
    "drop": drop_columns,
    "where": where_clause,
    "rename": rename_columns,
    "cast": cast_columns,
    "rename_and_cast": rename_and_cast,
    "column_names_to_lower": lambda df, **_: columns_to_lower(df),
    "normalize_cols": lambda df, **_: normalize_column_names(df),
    "with_column": with_column_expr,
    "sql": sql_transform,
    "dedupe": dedupe,
}


def apply_transformations(
    df: DataFrame,
    steps: list[dict[str, Any]],
    user_functions: dict[str, TransformFn] | None = None,
) -> DataFrame:
    """Run the FIFO transformation queue (builder/engine.py:103-141).

    Each step is ``{"type": <registry key>, ...kwargs}`` or
    ``{"type": "py", "fn": <name>, ...kwargs}`` resolved against the
    explicit ``user_functions`` registry (builder/engine.py:114-119's
    ``fncs``, minus the ``globals()`` hazard).
    """
    user_functions = user_functions or {}
    for step in steps:
        step = dict(step)
        kind = step.pop("type")
        if kind == "py":
            fn = user_functions[step.pop("fn")]
            df = fn(df, **step)
        else:
            df = TRANSFORM_REGISTRY[kind](df, **step)
    return df
