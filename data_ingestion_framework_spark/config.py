"""Typed pipeline configuration (the reference's config-table row).

Reference parity: the per-source-table config row with JSON-typed
columns (framework/src/template/sap_cdc_ingestion/config/
create_sap_config_table.py:172-195, FIXTURES.md F5), its parsing in
``get_user_args`` (framework/src/non_cdc_generic_notebook_foreach_
medallion.py:85-123), validation and table-indirection resolution in
``ConfigHandler`` (utils/config_handler.py:7-117).

Design: dataclasses instead of loose dicts; every JSON column of the
reference maps to a typed field; ``from_row`` accepts a config-table
row (all-string columns, JSON where nested) exactly like the
reference's control table, so existing config tables port unchanged.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from data_ingestion_framework_spark.sources.batch import config_scalar_lookup


def warehouse_dir(spark: SparkSession) -> str:
    """The session's warehouse root (``spark.sql.warehouse.dir``),
    normalized to a plain filesystem path."""
    wd = spark.conf.get("spark.sql.warehouse.dir")
    for prefix in ("file://", "file:"):
        if wd.startswith(prefix):
            return wd[len(prefix):]
    return wd


def resolve_table_path(name: str, warehouse: str) -> str:
    """Map a catalog-style table name to a warehouse path: 3-level
    ``catalog.schema.table`` and 2-level ``db.table`` both become
    nested directories under the warehouse root — the reference's UC /
    hive-metastore naming (utils/config_handler.py:101-117) without
    requiring a metastore."""
    parts = [p for p in name.split(".") if p]
    if not 2 <= len(parts) <= 3:
        raise ValueError(
            f"table name {name!r} must be db.table or catalog.schema.table"
        )
    return os.path.join(warehouse, *parts)


def ensure_registered(spark: SparkSession, name: str, path: str) -> bool:
    """Best-effort ``saveAsTable`` parity: register the path-backed
    table as an EXTERNAL table in the session metastore so
    ``spark.table('db.table')`` works. 2-level names register in the
    session catalog (database auto-created); 3-level names need a
    configured catalog plugin — returns False when the catalog can't
    host the name (path addressing still works)."""
    parts = name.split(".")
    try:
        if len(parts) == 2:
            spark.sql(f"CREATE DATABASE IF NOT EXISTS {parts[0]}")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {name} USING parquet "
            f"LOCATION '{path}'"
        )
        return True
    except Exception:
        return False


def _parse_bool(v: Any, default: bool = False) -> bool:
    if v is None:
        return default
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() in ("true", "1", "yes")


def _parse_json(v: Any, default):
    if v is None or v == "":
        return default
    if isinstance(v, (dict, list)):
        return v
    return json.loads(v)


@dataclass
class WriteConfig:
    """One entry of the ``writes`` JSON list (FIXTURES.md F5):
    medallion layer + mode + SCD type + target."""

    table_medallion_layer: str = "silver"  # bronze | silver | gold
    path: str | None = None  # target table path (OSS stand-in for catalog.schema.table)
    mode: str = "merge"  # append | merge | overwrite
    scd_type: int = 1
    checkpoint_location: str | None = None
    partition_by: list[str] = field(default_factory=list)
    except_column_list: list[str] = field(default_factory=list)
    #: catalog-style addressing (utils/config_handler.py:101-117):
    #: 3-level catalog.schema.table or 2-level database.table; resolved
    #: to a warehouse path when no explicit ``path`` is given.
    catalog: str | None = None
    table_schema: str | None = None
    database: str | None = None
    table: str | None = None
    #: register the resolved path as an external metastore table so
    #: ``spark.table(name)`` works (saveAsTable parity).
    register_in_metastore: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "WriteConfig":
        if d.get("catalog") and (d.get("target_database") or d.get("database")):
            # reference raises on the ambiguous combination
            # (utils/config_handler.py:90-94)
            raise ValueError("catalog and database cannot be specified together")
        return cls(
            table_medallion_layer=d.get("table_medallion_layer", "silver"),
            path=d.get("path") or d.get("external_location"),
            mode=d.get("mode", "merge"),
            scd_type=int(d.get("scd_type", 1)),
            checkpoint_location=d.get("checkpointLocation") or d.get("checkpoint_location"),
            partition_by=list(d.get("partition_by", [])),
            except_column_list=list(d.get("except_column_list", [])),
            catalog=d.get("catalog"),
            table_schema=d.get("schema") or d.get("table_schema"),
            database=d.get("target_database") or d.get("database"),
            table=d.get("table"),
            register_in_metastore=_parse_bool(d.get("register_in_metastore")),
        )

    def target_name(self) -> str | None:
        """Dotted catalog name (``get_target_table_name``,
        utils/config_handler.py:110-117)."""
        if self.catalog and self.table:
            return f"{self.catalog}.{self.table_schema}.{self.table}"
        if self.database and self.table:
            return f"{self.database}.{self.table}"
        return None

    def resolve_path(self, spark: SparkSession) -> str:
        """The physical target: an explicit ``path`` wins; otherwise
        the catalog name maps under the session warehouse."""
        if self.path:
            return self.path
        name = self.target_name()
        if name is None:
            raise ValueError(
                "write needs a path, catalog.schema.table, or database.table"
            )
        return resolve_table_path(name, warehouse_dir(spark))


@dataclass
class PipelineConfig:
    """The full per-table pipeline config (FIXTURES.md F5 schema)."""

    data_product_name: str = "default"
    table_name: str = ""
    pkeys: list[str] = field(default_factory=list)
    source_filepath: str = ""
    source_data_type: str = "parquet"
    source_reader_options: dict[str, str] = field(default_factory=dict)
    source_orderby_column: str = "file_modification_time"
    source_extraction_type: str = "FE"  # FE | IE
    streaming: bool = False
    cast_column: dict[str, str] = field(default_factory=dict)
    transformations: list[dict] = field(default_factory=list)
    run_dq_rules: bool = False
    dq_rules: list[dict] = field(default_factory=list)
    audit_write: bool = False
    audit_table_path: str | None = None
    audit_jdbc_url: str | None = None
    audit_jdbc_table: str = "audit_log"
    audit_jdbc_options: dict[str, str] = field(default_factory=dict)
    writes: list[WriteConfig] = field(default_factory=list)
    is_table_enabled: bool = True
    trigger: str = "availableNow"
    path_glob_filter: str | None = None
    verbose: bool = False

    @classmethod
    def from_row(cls, row: dict, spark: SparkSession | None = None) -> "PipelineConfig":
        """Build from a config-table row (all-string columns, JSON-typed
        nested fields — get_user_args semantics, non_cdc_generic_
        notebook_foreach_medallion.py:85-123). Values of the shape
        ``{"table","col","key","key_col"}`` are resolved by lookup
        (utils/config_handler.py:26-53) when ``spark`` is given."""
        row = dict(row)
        if spark is not None:
            for k, v in list(row.items()):
                resolved = _maybe_indirect(spark, v)
                if resolved is not None:
                    row[k] = resolved
        audit_cfg = _parse_json(row.get("audit_config"), {})
        dq_cfg = _parse_json(row.get("dq_config"), {})
        return cls(
            data_product_name=row.get("data_product_name", "default"),
            table_name=row.get("table_name", ""),
            pkeys=[k.strip() for k in str(row.get("pkeys", "")).split(",") if k.strip()],
            source_filepath=row.get("source_filepath", ""),
            source_data_type=row.get("source_data_type", "parquet"),
            source_reader_options=_parse_json(row.get("source_reader_options"), {}),
            source_orderby_column=row.get(
                "source_orderBy_column", row.get("source_orderby_column", "file_modification_time")
            ),
            source_extraction_type=row.get("source_extraction_type", "FE"),
            streaming=_parse_bool(row.get("streaming")),
            cast_column=_parse_json(row.get("cast_column"), {}),
            transformations=_parse_json(row.get("transformations"), []),
            run_dq_rules=_parse_bool(row.get("run_dq_rules")),
            dq_rules=_parse_json(dq_cfg.get("rules") if dq_cfg else None, []),
            audit_write=_parse_bool(row.get("audit_write")),
            audit_table_path=(audit_cfg or {}).get("audit_table_path"),
            audit_jdbc_url=(audit_cfg or {}).get("jdbc_url"),
            audit_jdbc_table=(audit_cfg or {}).get("jdbc_table", "audit_log"),
            audit_jdbc_options=(audit_cfg or {}).get("jdbc_options", {}),
            writes=[WriteConfig.from_dict(d) for d in _parse_json(row.get("writes"), [])],
            is_table_enabled=_parse_bool(row.get("is_table_enabled"), True),
            trigger=row.get("trigger", "availableNow"),
            path_glob_filter=row.get("path_glob_filter"),
            verbose=_parse_bool(row.get("verbose")),
        )

    def validate(self) -> None:
        """Mutual-exclusion / required-field checks
        (utils/config_handler.py:90-94)."""
        if not self.source_filepath:
            raise ValueError("source_filepath is required")
        for w in self.writes:
            if w.mode == "merge" and not self.pkeys:
                raise ValueError("merge writes require pkeys")
            if not w.path and not w.target_name():
                raise ValueError(
                    "every write needs a target path or a catalog table name"
                )

    def writes_for_layer(self, layer: str) -> list[WriteConfig]:
        """_medallion_config filter (builder/engine.py:143-159)."""
        return [w for w in self.writes if w.table_medallion_layer == layer]


def _maybe_indirect(spark: SparkSession, v: Any):
    """Resolve ``{"table","col","key","key_col"}`` indirection values
    (utils/config_handler.py:26-53); returns None when not applicable."""
    d = None
    if isinstance(v, str) and v.startswith("{"):
        try:
            d = json.loads(v)
        except (ValueError, TypeError):
            return None
    elif isinstance(v, dict):
        d = v
    if isinstance(d, dict) and {"table", "col", "key", "key_col"} <= set(d):
        return config_scalar_lookup(spark, d["table"], d["col"], d["key_col"], d["key"])
    return None


def mark_initial_completed(
    spark: SparkSession, config_table_path: str, table_name: str
) -> None:
    """Config write-back: flip ``is_initial_completed`` after the first
    load (framework/src/sap_cdc_generic_notebook_foreach.py:166's
    ``UPDATE config SET ...``). Without a transactional table format the
    rewrite goes through the staging-swap store."""
    from pyspark.sql import functions as F

    from data_ingestion_framework_spark.sources.tablestore import ParquetTable

    t = ParquetTable(spark, config_table_path)
    updated = t.read().withColumn(
        "is_initial_completed",
        F.when(F.col("table_name") == table_name, F.lit("True")).otherwise(
            F.col("is_initial_completed")
        ),
    )
    t.overwrite(updated)


def load_enabled_configs(
    spark: SparkSession, config_table_path: str, data_product_name: str | None = None
) -> list[PipelineConfig]:
    """Read the config table and return enabled pipelines — the fan-out
    read (jobs/Foreach_taskvalues_generic_v2.py:16-32). Control-plane
    sized: collect is sanctioned here."""
    df = spark.read.parquet(config_table_path)
    if data_product_name:
        df = df.where(df.data_product_name == data_product_name)
    rows = [r.asDict() for r in df.collect()]
    cfgs = [PipelineConfig.from_row(r, spark) for r in rows]
    return [c for c in cfgs if c.is_table_enabled]
