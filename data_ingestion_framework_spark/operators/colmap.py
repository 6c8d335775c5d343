"""Column-map-driven projection (control-table renames/exprs).

Reference parity: the ``dbo.control_raw_source_to_target_col_map``
selectExpr pipeline (reference/di_landing_to_raw_generic_v2.py:401-424,
443-448) and headerless-CSV column naming from the map
(di_landing_to_raw_generic_v2.py:259-272; FIXTURES.md F7):

    col_map(schema_name, table_name, source_col_name, target_col_name,
            target_col_expression, target_col_order, target_key_col_order)

- ``target_col_expression`` (optional) overrides the source column with
  any Spark SQL expression;
- ``target_col_order`` fixes the output column order;
- non-null ``target_key_col_order`` marks merge-key membership.

The map is control-plane sized — collected once, compiled into a single
``selectExpr`` projection (zero extra shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def compile_column_map(col_map_rows: list[dict]) -> tuple[list[str], list[str]]:
    """Compile map rows → (selectExpr list, merge-key column list),
    ordered by ``target_col_order`` / ``target_key_col_order``."""
    ordered = sorted(col_map_rows, key=lambda r: r["target_col_order"])
    exprs = []
    for r in ordered:
        expr = r.get("target_col_expression") or r["source_col_name"]
        exprs.append(f"{expr} AS {r['target_col_name']}")
    keys = [
        r["target_col_name"]
        for r in sorted(
            (r for r in col_map_rows if r.get("target_key_col_order") is not None),
            key=lambda r: r["target_key_col_order"],
        )
    ]
    return exprs, keys


def apply_column_map(df: DataFrame, col_map: DataFrame | list[dict]) -> DataFrame:
    """Project ``df`` through the column map (selectExpr form,
    di_landing_to_raw_generic_v2.py:401-424)."""
    rows = (
        [r.asDict() for r in col_map.collect()]
        if isinstance(col_map, DataFrame)
        else list(col_map)
    )
    exprs, _keys = compile_column_map(rows)
    return df.selectExpr(*exprs)


def headerless_csv_names(col_map_rows: list[dict]) -> list[str]:
    """Positional column names for a headerless CSV
    (di_landing_to_raw_generic_v2.py:259-272): source order is the map's
    ``target_col_order`` over source names (``_c0`` style positions)."""
    ordered = sorted(col_map_rows, key=lambda r: r["target_col_order"])
    return [r["source_col_name"] for r in ordered]
