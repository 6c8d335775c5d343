"""Query/oracle registry backing the driver contract
(``__spark_entry__.py``: ``queries()`` / ``oracle_sql()``).

Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable
demonstrating one or more operators from SURVEY.md §2, with (where
SQL-expressible) an equivalent ANSI-SQL oracle string DuckDB runs over
the same parquet tables. Column names and types are aligned between the
two on purpose — the driver hashes values after sorting columns by name.

Cross-engine determinism rules used throughout:
- double aggregates go through DECIMAL casts (exact, order-independent
  sums) and are cast back to DOUBLE at the end;
- hashes canonicalize numerics via DECIMAL→string (see functions/hashes);
- ties in window orderings are broken by a unique key column.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def bench_query(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. The events table is written with
    nanosecond parquet timestamps, which Spark's vectorized reader
    rejects — read them as longs and floor-convert to microseconds
    (DuckDB truncates ns→µs the same way)."""
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all_queries() -> None:
    """Import every query module so registrations run."""
    from data_ingestion_framework_spark import (  # noqa: F401
        queries_analytics,
        queries_etl,
        queries_llm,
        queries_scd,
        queries_windows,
    )
