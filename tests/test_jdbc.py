"""JDBC round-trip against in-process embedded Derby (already on
Spark's classpath): write audit-style rows with ``write_jdbc``, read
them back with ``read_jdbc`` — including the pushdown-subquery shape the
reference uses (material_external_dim.py:41-44) — and append-accumulate
like the reference's SQL-Server audit sink (audit/utils.py:7-29)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from data_ingestion_framework_spark.sources.batch import read_jdbc, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/auditdb;create=true"


def _opts():
    return {"driver": DRIVER}


def test_jdbc_round_trip(spark, derby_url):
    rows = [
        Row(run_id=1, table_name="customer", rows_written=100),
        Row(run_id=2, table_name="orders", rows_written=250),
    ]
    df = spark.createDataFrame(rows)
    write_jdbc(df, derby_url, "audit_log", mode="overwrite", options=_opts())

    back = read_jdbc(spark, derby_url, "audit_log", options=_opts())
    got = {(r["run_id"], r["table_name"], r["rows_written"]) for r in back.collect()}
    assert got == {(1, "customer", 100), (2, "orders", 250)}

    # append accumulates (the audit-sink write mode)
    write_jdbc(
        spark.createDataFrame([Row(run_id=3, table_name="part", rows_written=7)]),
        derby_url,
        "audit_log",
        mode="append",
        options=_opts(),
    )
    assert read_jdbc(spark, derby_url, "audit_log", options=_opts()).count() == 3


def test_jdbc_pushdown_subquery(spark, derby_url):
    df = spark.createDataFrame(
        [Row(k=i, grp="even" if i % 2 == 0 else "odd") for i in range(10)]
    )
    # without createTableColumnTypes Spark maps StringType to Derby
    # CLOB, which can't be compared to a literal in the pushed subquery
    write_jdbc(
        df,
        derby_url,
        "dim_src",
        mode="overwrite",
        options={**_opts(), "createTableColumnTypes": "grp VARCHAR(16)"},
    )

    # "(SELECT ...) q" dbtable: the database executes the filter; Spark
    # sees only the reduced result — the reference's external-dim shape.
    # Spark's JDBC writer creates quoted (case-preserved) identifiers;
    # Derby folds unquoted names to uppercase, so the raw subquery must
    # quote them.
    sub = '(SELECT "k", "grp" FROM dim_src WHERE "grp" = \'even\') q'
    back = read_jdbc(spark, derby_url, sub, options=_opts())
    ks = sorted(r["k"] for r in back.collect())
    assert ks == [0, 2, 4, 6, 8]
    # Spark-side predicates on a JDBC relation are pushed to the source
    plan = back.where("k > 4")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "JDBCRelation" in plan


def test_audit_logger_to_jdbc(spark, derby_url):
    """AuditLogger mirrors audit + DQ-violation facts to the JDBC
    target (reference audit/utils.py:7-29 sql_server_write) — Derby
    round-trip of both fact kinds, accumulating across operations."""
    from data_ingestion_framework_spark.operators import dq as dq_mod
    from data_ingestion_framework_spark.sinks.audit import AuditLogger

    logger = AuditLogger(
        spark,
        path=None,
        job_id="job-42",
        jdbc_url=derby_url,
        jdbc_table="audit_log",
        jdbc_options={
            **_opts(),
            "createTableColumnTypes": (
                "table_name VARCHAR(128), audit_operation VARCHAR(32),"
                " audit_user VARCHAR(64), audit_info VARCHAR(1024),"
                " job_id VARCHAR(64), base_file_path VARCHAR(256)"
            ),
        },
    )
    logger.log("silver.customer", "merge", {"num_inserted": 5})

    # DQ violation facts ride the same sink
    rules = [dq_mod.DQRule(rule_id="r_null", rule_type="null_check", column="v")]
    flagged = dq_mod.apply_rules(
        spark.createDataFrame([Row(v="a"), Row(v=None)]), rules
    )
    counts = {
        r["rule_id"]: r["n_violations"]
        for r in dq_mod.violation_counts(flagged, rules).collect()
    }
    logger.log("silver.customer", "dq", {"violations": counts})

    back = logger.read().collect()
    assert len(back) == 2
    ops = {r["audit_operation"] for r in back}
    assert ops == {"merge", "dq"}
    by_op = {r["audit_operation"]: r for r in back}
    assert '"num_inserted": 5' in by_op["merge"]["audit_info"]
    assert '"r_null": 1' in by_op["dq"]["audit_info"]
    assert by_op["dq"]["job_id"] == "job-42"
