"""SCD / CDC / DQ queries with DuckDB oracles.

These exercise the merge-engine building blocks (operators/scd.py,
operators/cdc.py, operators/dq.py) as deterministic batch queries the
driver can cross-check: hash-key generation, full-outer CDC delta
classification, brute-force diff, SCD2 validity stamping, latest-per-key
dedup, and the DQ violation-count pipeline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators import cdc, dq, scd
from data_ingestion_framework_spark.functions.hashes import with_hash_keys
from data_ingestion_framework_spark.registry import bench_query, load

# Canonicalization contract shared with the oracles: numerics that are
# DOUBLE/FLOAT go through DECIMAL(38,6) before string-casting (see
# functions/hashes._canon); the concat separator is chr(31).


# ---------------------------------------------------------------------------
# hkey/hdiff hash-key generation (di_landing_to_raw_generic_v2.py:489-494).
# ---------------------------------------------------------------------------
@bench_query(
    "cdc_hash_keys",
    oracle="""
    SELECT o_orderkey,
           md5(COALESCE(CAST(o_orderkey AS VARCHAR), chr(30) || 'NULL' || chr(30))) AS hkey,
           md5(concat_ws(chr(31),
               COALESCE(CAST(o_custkey AS VARCHAR), chr(30) || 'NULL' || chr(30)),
               COALESCE(o_orderstatus, chr(30) || 'NULL' || chr(30)),
               COALESCE(CAST(CAST(o_totalprice AS DECIMAL(38,6)) AS VARCHAR), chr(30) || 'NULL' || chr(30)),
               COALESCE(CAST(o_orderdate AS VARCHAR), chr(30) || 'NULL' || chr(30)),
               COALESCE(o_orderpriority, chr(30) || 'NULL' || chr(30)))) AS hdiff
    FROM orders
    """,
)
def cdc_hash_keys(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return with_hash_keys(orders, ["o_orderkey"]).select("o_orderkey", "hkey", "hdiff")


# ---------------------------------------------------------------------------
# find_delta: full-outer CDC classification (di_landing_to_raw_generic_v2.py
# :498-523). Old/new snapshots are derived deterministically from orders.
# ---------------------------------------------------------------------------
_FD_ORACLE = """
    WITH old AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 97 < 90
    ),
    new AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
      FROM orders WHERE o_orderkey % 89 < 85
    )
    SELECT COALESCE(new.o_orderkey, old.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'insert'
                WHEN new.o_orderkey IS NULL THEN 'delete'
                WHEN new.o_totalprice IS DISTINCT FROM old.o_totalprice
                  OR new.o_custkey IS DISTINCT FROM old.o_custkey
                  OR new.o_orderstatus IS DISTINCT FROM old.o_orderstatus
                  OR new.o_orderpriority IS DISTINCT FROM old.o_orderpriority
                THEN 'update'
                ELSE 'unchanged' END AS change_type
    FROM new FULL OUTER JOIN old ON new.o_orderkey = old.o_orderkey
"""


@bench_query("cdc_find_delta", oracle=_FD_ORACLE)
def cdc_find_delta(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    old = orders.where(F.col("o_orderkey") % 97 < 90)
    new = orders.where(F.col("o_orderkey") % 89 < 85).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1000.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    return cdc.find_delta(old, new, ["o_orderkey"]).select("o_orderkey", "change_type")


# ---------------------------------------------------------------------------
# Brute-force per-column diff (transformations/brute_force_comparison.py:3-25).
# ---------------------------------------------------------------------------
@bench_query(
    "cdc_brute_force_diff",
    oracle="""
    WITH old AS (SELECT p_partkey, p_retailprice, p_size FROM part),
    new AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 11 = 0 THEN p_retailprice + 50.0 ELSE p_retailprice END AS p_retailprice,
             CASE WHEN p_partkey % 13 = 0 THEN p_size + 1 ELSE p_size END AS p_size
      FROM part
    )
    SELECT new.p_partkey,
           CASE WHEN new.p_retailprice IS NOT DISTINCT FROM old.p_retailprice THEN 0 ELSE 1 END AS p_retailprice_diff,
           CASE WHEN new.p_size IS NOT DISTINCT FROM old.p_size THEN 0 ELSE 1 END AS p_size_diff
    FROM new JOIN old ON new.p_partkey = old.p_partkey
    WHERE new.p_retailprice IS DISTINCT FROM old.p_retailprice
       OR new.p_size IS DISTINCT FROM old.p_size
    """,
)
def cdc_brute_force_diff(spark, sf_dir):
    part = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    new = part.withColumns(
        {
            "p_retailprice": F.when(
                F.col("p_partkey") % 11 == 0, F.col("p_retailprice") + 50.0
            ).otherwise(F.col("p_retailprice")),
            "p_size": F.when(F.col("p_partkey") % 13 == 0, F.col("p_size") + 1).otherwise(
                F.col("p_size")
            ),
        }
    )
    return cdc.brute_force_diff(part, new, ["p_partkey"]).select(
        "p_partkey", "p_retailprice_diff", "p_size_diff"
    )


# ---------------------------------------------------------------------------
# SCD2 initial-load validity stamping (writers/writer.py:84-107): treat each
# customer's orders as versions of the customer record.
# ---------------------------------------------------------------------------
@bench_query(
    "scd2_stamp_initial",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_orderdate AS start_time,
           LEAD(o_orderdate) OVER w AS end_time,
           CASE WHEN LEAD(o_orderdate) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def scd2_stamp_initial(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    stamped = scd.stamp_scd2_initial(
        orders, ["o_custkey"], "o_orderdate", tiebreak_cols=["o_orderkey"]
    )
    return stamped.select(
        "o_custkey", "o_orderkey", "start_time", "end_time", "is_current"
    )


# ---------------------------------------------------------------------------
# Latest-per-key dedup (the merge preamble, batch_writers.py:140-152).
# ---------------------------------------------------------------------------
@bench_query(
    "scd1_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT user_id, event_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
)
def scd1_latest_event_per_user(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return scd.dedupe_latest(
        ev, ["user_id"], "ts", tiebreak_cols=["event_id"]
    ).select("user_id", "event_id", "ts", "event_type", "value")


# ---------------------------------------------------------------------------
# SCD2 as-of reconstruction over the stamped history (Delta time-travel
# stand-in, di_landing_to_raw_generic_v2.py:774-794): customer state as of
# a cutoff date.
# ---------------------------------------------------------------------------
@bench_query(
    "scd2_as_of",
    oracle="""
    WITH hist AS (
      SELECT o_custkey, o_orderkey,
             o_orderdate AS start_time,
             LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate ASC, o_orderkey ASC) AS end_time
      FROM orders
    )
    SELECT o_custkey, o_orderkey, start_time
    FROM hist
    WHERE start_time <= TIMESTAMP '1996-06-01 00:00:00'
      AND (end_time IS NULL OR end_time > TIMESTAMP '1996-06-01 00:00:00')
    """,
)
def scd2_as_of(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    stamped = scd.stamp_scd2_initial(
        orders, ["o_custkey"], "o_orderdate", tiebreak_cols=["o_orderkey"]
    )
    return scd.as_of(stamped, "1996-06-01 00:00:00").select(
        "o_custkey", "o_orderkey", "start_time"
    )


# ---------------------------------------------------------------------------
# DQ violation counts (dq_rule_builder_common.py:228-339 +
# di_landing_to_raw_generic_v2.py:604-653): five rule families over
# customer, long-format output.
# ---------------------------------------------------------------------------
_DQ_RULES = [
    dq.DQRule("null_c_name", "null_check", column="c_name"),
    dq.DQRule(
        "range_c_acctbal",
        "range_check",
        column="c_acctbal",
        operator="between",
        threshold_low=-999.0,
        threshold_high=9999.0,
    ),
    dq.DQRule(
        "valid_mktsegment",
        "valid_values_check",
        column="c_mktsegment",
        valid_values=["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY"],
    ),
    dq.DQRule("unique_custkey", "unique_check", column="c_custkey"),
    dq.DQRule(
        "orphan_nationkey",
        "orphan_check",
        column="c_nationkey",
        related_table="nation",
        related_column="n_nationkey",
    ),
]


@bench_query(
    "dq_violation_counts",
    oracle="""
    SELECT 'null_c_name' AS rule_id,
           CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM customer
    UNION ALL
    SELECT 'range_c_acctbal',
           CAST(SUM(CASE WHEN c_acctbal IS NOT NULL
                     AND NOT (c_acctbal >= -999.0 AND c_acctbal <= 9999.0)
                    THEN 1 ELSE 0 END) AS BIGINT) FROM customer
    UNION ALL
    SELECT 'valid_mktsegment',
           CAST(SUM(CASE WHEN c_mktsegment IS NOT NULL
                     AND c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY')
                    THEN 1 ELSE 0 END) AS BIGINT) FROM customer
    UNION ALL
    SELECT 'unique_custkey',
           CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
    FROM (SELECT COUNT(*) OVER (PARTITION BY c_custkey) AS cnt FROM customer) t
    UNION ALL
    SELECT 'orphan_nationkey',
           CAST(SUM(CASE WHEN c_nationkey IS NOT NULL AND n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM customer LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
      ON c_nationkey = n_nationkey
    """,
)
def dq_violation_counts(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    flagged = dq.apply_rules(cust, _DQ_RULES, related={"nation": nation})
    return dq.violation_counts(flagged, _DQ_RULES)


# ---------------------------------------------------------------------------
# DQ row-level flags (the data_quality_valid_flag / result_array contract,
# di_landing_to_raw_generic_v2.py:301-314): per-row flag + sorted rule list.
# ---------------------------------------------------------------------------
@bench_query(
    "dq_row_flags",
    oracle="""
    SELECT c_custkey,
           (c_acctbal IS NULL OR (c_acctbal >= -999.0 AND c_acctbal <= 9999.0))
             AND (c_mktsegment IS NULL OR c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY'))
             AND c_name IS NOT NULL
           AS data_quality_valid_flag,
           concat_ws(',',
             CASE WHEN c_name IS NULL THEN 'null_c_name' END,
             CASE WHEN c_acctbal IS NOT NULL
                   AND NOT (c_acctbal >= -999.0 AND c_acctbal <= 9999.0)
                  THEN 'range_c_acctbal' END,
             CASE WHEN c_mktsegment IS NOT NULL
                   AND c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY')
                  THEN 'valid_mktsegment' END) AS violated_rules
    FROM customer
    """,
)
def dq_row_flags(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    rules = [r for r in _DQ_RULES if r.rule_type in dq.ROW_LOCAL_TYPES]
    flagged = dq.apply_rules(cust, rules)
    return flagged.select(
        "c_custkey",
        F.col(dq.VALID_FLAG).alias("data_quality_valid_flag"),
        F.array_join(F.col(dq.RESULT_ARRAY), ",").alias("violated_rules"),
    )
