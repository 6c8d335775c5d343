"""Analytics queries: aggregation, joins, windows, set ops, sorts.

These exercise the engine's projection/filter/join/aggregation/window
operator surface (SURVEY.md §2.3-§2.9) on the driver's TPC-H-ish
tables. Written with the DataFrame API so Catalyst sees a declarative
plan: filters/projections push down to the parquet scans, small dims
broadcast, aggregates get map-side partial combine.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from data_ingestion_framework_spark.registry import bench_query, load

_DEC = "decimal(18,4)"


# ---------------------------------------------------------------------------
# Q1-style pricing summary: the flagship aggregation (groupBy + many aggs;
# map-side partial aggregation, one shuffle on the two low-cardinality keys).
# Reference parity: conditional/multi-agg surface of SURVEY §2.5.
# ---------------------------------------------------------------------------
@bench_query(
    "pricing_summary",
    oracle="""
    -- final sums are cast to their TRUE scale (2dp money × 2dp rates →
    -- ≤4/6 real decimals) before DOUBLE: lossless, and the scaled
    -- integer stays < 2^53 so decimal→double is a single correctly-
    -- rounded division in both engines (DuckDB otherwise double-rounds
    -- via int128→double/10^s at scale 8).
    SELECT
      l_returnflag, l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(20,4)) AS DOUBLE) AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(20,4)) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) * (1 + CAST(l_tax AS DECIMAL(18,4))) AS DECIMAL(18,6))) AS DECIMAL(22,6)) AS DOUBLE) AS sum_charge,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(_DEC)
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_DEC)
    tax = F.col("l_tax").cast(_DEC)
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("decimal(20,4)").cast("double").alias("sum_qty"),
            F.sum(price).cast("decimal(20,2)").cast("double").alias("sum_base_price"),
            F.sum(price * (1 - disc))
            .cast("decimal(20,4)")
            .cast("double")
            .alias("sum_disc_price"),
            F.sum((price * (1 - disc) * (1 + tax)).cast("decimal(18,6)"))
            .cast("decimal(22,6)")
            .cast("double")
            .alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3-style shipping priority: selective filters on both sides of a 3-way
# join; customer is small → broadcast; agg after join.
# ---------------------------------------------------------------------------
@bench_query(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    """,
)
def shipping_priority(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    rev = F.col("l_extendedprice").cast(_DEC) * (1 - F.col("l_discount").cast(_DEC))
    return (
        # orders/customer grow with the scale factor: no forced broadcast —
        # AQE picks broadcast at small sf and falls back to shuffle-hash/SMJ
        # at 100 TB, where a forced build side would OOM the executors.
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
    )


# ---------------------------------------------------------------------------
# Q5-style local-supplier revenue: 6-way star join; all dims broadcast, the
# single shuffle is the final groupBy on n_name.
# ---------------------------------------------------------------------------
@bench_query(
    "region_revenue",
    oracle="""
    SELECT n_name,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(20,4)) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def region_revenue(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice").cast(_DEC) * (1 - F.col("l_discount").cast(_DEC))
    return (
        # Broadcast hints only on true dims (region/nation/supplier);
        # orders/customer are sf-proportional — AQE decides those joins.
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("decimal(20,4)").cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Filter + projection pushdown showcase (SURVEY §2.3): the physical scan
# must read only 4 columns with both predicates in PushedFilters.
# ---------------------------------------------------------------------------
@bench_query(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
)
def filter_project(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .where((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate")
    )


# ---------------------------------------------------------------------------
# Latest-record-per-key via ROW_NUMBER — the reference's single most-used
# pattern (writers/writer.py:41,73,84,439,483,608; SURVEY §2.6/§2.7).
# One shuffle on the partition key; no global sort.
# ---------------------------------------------------------------------------
@bench_query(
    "latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) t WHERE rn = 1
    """,
)
def latest_order_per_customer(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Window-function spread: rank + lag + running sum with a tie-broken
# ordering (SURVEY §2.6 "not present in reference but free in Spark").
# ---------------------------------------------------------------------------
@bench_query(
    "customer_order_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_rank,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
    FROM orders
    """,
)
def customer_order_running(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("order_rank"),
        F.sum(F.col("o_totalprice").cast(_DEC))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.8): UNION ALL / EXCEPT / INTERSECT composed to
# a deterministic result.
# ---------------------------------------------------------------------------
@bench_query(
    "customer_set_ops",
    oracle="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         rich     AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
         either_only AS (
           (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM rich)
           UNION ALL
           (SELECT c_custkey FROM rich EXCEPT SELECT c_custkey FROM building)
         ),
         both_segs AS (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM rich)
    SELECT 'exclusive' AS bucket, COUNT(*) AS n FROM either_only
    UNION ALL
    SELECT 'both' AS bucket, COUNT(*) AS n FROM both_segs
    """,
)
def customer_set_ops(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cust.where(F.col("c_acctbal") > 5000).select("c_custkey")
    exclusive = building.exceptAll(rich).unionAll(rich.exceptAll(building)).distinct()
    # NOTE: oracle's EXCEPT is distinct-semantics; inputs are key-unique so
    # exceptAll+distinct ≡ EXCEPT here, and it exercises both operators.
    both = building.intersect(rich)
    return exclusive.agg(
        F.lit("exclusive").alias("bucket"), F.count(F.lit(1)).alias("n")
    ).unionAll(both.agg(F.lit("both").alias("bucket"), F.count(F.lit(1)).alias("n")))


# ---------------------------------------------------------------------------
# Top-k (global sort + limit, SURVEY §2.7): top 10 revenue orders. Spark
# plans TakeOrderedAndProject — no full global sort materialization.
# ---------------------------------------------------------------------------
@bench_query(
    "top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def top_orders(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Join-family showcase (SURVEY §2.4): left_semi (EXISTS), left_anti
# (NOT EXISTS) and a left join + IS NULL — the reference's new-row
# detection idiom (Raw-To-Curated-Material_Dim.py:240-243).
# ---------------------------------------------------------------------------
@bench_query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
)
def customers_without_orders(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@bench_query(
    "suppliers_in_asia",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (
      SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA')
    """,
)
def suppliers_in_asia(spark, sf_dir):
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    return supp.join(
        F.broadcast(asia_nations), supp.s_nationkey == asia_nations.n_nationkey, "left_semi"
    ).select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# Conditional aggregation (SURVEY §2.5: sum(when(...))) + HAVING-style
# post-filter: order-priority counts per month bucket.
# ---------------------------------------------------------------------------
@bench_query(
    "order_priority_counts",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_large
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def order_priority_counts(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
        F.sum(F.when(F.col("o_totalprice") > 150000, 1).otherwise(0)).alias("n_large"),
    )


# ---------------------------------------------------------------------------
# Q12-shape shipping-priority audit: conditional TWO-BUCKET counts
# (urgent/high vs the rest) over the order join, grouped by line
# status with a pushed ship-date range — the CASE-bucketed aggregate
# mechanism on this schema's columns.
# ---------------------------------------------------------------------------
@bench_query(
    "linestatus_priority_counts",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= DATE '1996-01-01'
      AND l.l_shipdate < DATE '1997-01-01'
    GROUP BY l.l_linestatus
    """,
)
def linestatus_priority_counts(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        )
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Exact equi-depth histogram (operators/dq.py equi_depth_histogram —
# the ANALYZE histogram analogue): distinct-value cumulative ranks,
# integer bucket assignment ((hi_rank-1)·B div n, ties never split),
# per-bucket bounds/counts. The oracle replays the identical integer
# arithmetic over the same distinct-value cumsum.
# ---------------------------------------------------------------------------
@bench_query(
    "orders_custkey_histogram",
    oracle="""
    WITH vals AS (
      SELECT o_custkey AS v, COUNT(*) AS c
      FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
    ),
    tot AS (SELECT SUM(c) AS n FROM vals),
    ranked AS (
      SELECT v, c,
             SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hr
      FROM vals
    )
    SELECT CAST((r.hr - 1) * 8 // t.n AS INT) AS bucket,
           MIN(r.v) AS lo, MAX(r.v) AS hi,
           CAST(SUM(r.c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct
    FROM ranked r, tot t
    GROUP BY 1
    """,
)
def orders_custkey_histogram(spark, sf_dir):
    from data_ingestion_framework_spark.operators.dq import (
        equi_depth_histogram,
    )

    orders = load(spark, sf_dir, "orders")
    return equi_depth_histogram(orders, "o_custkey", buckets=8)


# ---------------------------------------------------------------------------
# Exact DISTRIBUTED nearest-rank percentiles (operators/dq.py
# exact_percentiles over operators/rank.py's range-partitioned prefix
# sum): the scale path where F.percentile buffers every value in one
# aggregation state and approx_percentile trades exactness away.
# Integer-exact rank selection — rank = max(1, ceil(num*n/den)) via
# (num*n + den - 1) div den — so the oracle replays the same cumsum
# and the same integer rank math, never a float quantile function.
# ---------------------------------------------------------------------------
@bench_query(
    "orders_price_exact_percentiles",
    oracle="""
    WITH vals AS (
      SELECT o_totalprice AS v, COUNT(*) AS c
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
    ),
    ranked AS (
      SELECT v, SUM(c) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
      FROM vals
    ),
    tot AS (SELECT SUM(c) AS n FROM vals),
    f(p_num, p_den) AS (VALUES (1, 4), (1, 2), (3, 4), (99, 100)),
    t AS (SELECT p_num, p_den,
                 GREATEST((p_num * tot.n + p_den - 1) // p_den, 1) AS r
          FROM f, tot)
    SELECT t.p_num, t.p_den, CAST(t.r AS BIGINT) AS rank,
           MIN(rk.v) AS value, CAST(tot.n AS BIGINT) AS n_rows
    FROM t JOIN ranked rk ON rk.hi >= t.r, tot
    GROUP BY t.p_num, t.p_den, t.r, tot.n
    """,
)
def orders_price_exact_percentiles(spark, sf_dir):
    from data_ingestion_framework_spark.operators.dq import exact_percentiles

    orders = load(spark, sf_dir, "orders")
    return exact_percentiles(
        orders, "o_totalprice", [(1, 4), (1, 2), (3, 4), (99, 100)]
    )


# ---------------------------------------------------------------------------
# Q13-shape customer distribution: LEFT OUTER join with a JOIN-SIDE
# filter (the predicate lives in the ON clause, not WHERE — a WHERE
# would turn the outer join inner and drop zero-order customers), a
# per-customer count, then a histogram of the counts — the two-level
# aggregation mechanism.
# ---------------------------------------------------------------------------
@bench_query(
    "customer_order_histogram",
    oracle="""
    WITH co AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist FROM co GROUP BY c_count
    """,
)
def customer_order_histogram(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    co = (
        cust.join(
            orders,
            (orders["o_custkey"] == cust["c_custkey"])
            & (orders["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q18-shape large-volume orders: IN over a grouped-HAVING subquery
# (orders whose lineitems sum past a quantity threshold) — planned as
# a semi join against the aggregated frame, then the detail join +
# re-aggregation. l_quantity is integer-valued, so the double sums are
# exact in any reduction order.
# ---------------------------------------------------------------------------
@bench_query(
    "large_quantity_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS total_qty
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def large_quantity_orders(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__s"))
        .where(F.col("__s") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
    )


# ---------------------------------------------------------------------------
# Q22-shape wealthy inactive customers: global scalar aggregate
# (average positive balance) consumed WITHOUT a division — the
# above-average predicate cross-multiplies (bal·n > Σbal, DECIMAL ×
# BIGINT, exact on both engines) — plus an anti join against orders
# and a final group. The decorrelated scalar-subquery mechanism.
# ---------------------------------------------------------------------------
@bench_query(
    "wealthy_inactive_customers",
    oracle="""
    WITH pos AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS s,
             COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4)))
                AS DECIMAL(38,4)) AS DOUBLE) AS totacctbal
    FROM customer c, pos
    WHERE CAST(c.c_acctbal AS DECIMAL(18,4)) * pos.n > pos.s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    GROUP BY c.c_nationkey
    """,
)
def wealthy_inactive_customers(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    pos = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(F.col("c_acctbal").cast(_DEC))
            .cast("decimal(38,4)")
            .alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    return (
        cust.crossJoin(F.broadcast(pos))
        .where(F.col("c_acctbal").cast(_DEC) * F.col("__n") > F.col("__s"))
        .join(
            orders.where(F.col("o_totalprice") > 300000),
            cust["c_custkey"] == orders["o_custkey"],
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC))
            .cast("decimal(38,4)")
            .cast("double")
            .alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Events: tumbling daily window aggregation — the batch shape of the
# streaming windowed agg (SURVEY §2.10; watermarked variant lives in
# streaming/). date_trunc keeps the oracle expressible.
# ---------------------------------------------------------------------------
@bench_query(
    "events_daily_counts",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_daily_counts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Nested aggregation: collect_list(struct) → to_json, the reference's
# attribute-array build (material_external_dim.py:304-539). JSON text must
# match the oracle, so elements are ordered inside the aggregation.
# ---------------------------------------------------------------------------
@bench_query(
    "part_brand_attributes",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_parts,
           CAST(MAX(p_retailprice) AS DOUBLE) AS max_price,
           STRING_AGG(p_type, ',' ORDER BY p_type, p_partkey) AS types_csv
    FROM part
    GROUP BY p_brand
    """,
)
def part_brand_attributes(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.max("p_retailprice").cast("double").alias("max_price"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("p_type"), F.col("p_partkey")))
                ),
                lambda s: s.p_type,
            ),
            ",",
        ).alias("types_csv"),
    )


# ---------------------------------------------------------------------------
# Spark SQL API surface: the same engine consumed as SQL over registered
# views (the sql_transform path, transformations/sql_transformation.py) —
# one query text serves both engines.
# ---------------------------------------------------------------------------
_SQL_API_TEXT = """
    SELECT n_name,
           COUNT(*) AS n_customers,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(20,2)) AS DOUBLE) AS total_balance
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 0
    GROUP BY n_name
"""


@bench_query("sql_api_balance_by_nation", oracle=_SQL_API_TEXT)
def sql_api_balance_by_nation(spark, sf_dir):
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_SQL_API_TEXT)


# ---------------------------------------------------------------------------
# Q7-style volume shipping: revenue flow between two trading nations by
# ship year. The nation dim joins TWICE (supplier side and customer
# side) — both broadcast; the single shuffle is the final group-by.
# Money through the DECIMAL staging pattern.
# ---------------------------------------------------------------------------
@bench_query(
    "volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                         * (1 - CAST(l_discount AS DECIMAL(18,4))))
                AS DECIMAL(20,4)) AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY 1, 2, 3
    """,
)
def volume_shipping(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        supp.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(rev).cast("decimal(20,4)").cast("double").alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q8-style market share: one nation's suppliers' share of a part
# type's revenue by order year — two DECIMAL-exact conditional sums,
# ONE division at the very end (deterministic: a single double op on
# exact operands).
# ---------------------------------------------------------------------------
@bench_query(
    "market_share",
    oracle="""
    WITH base AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(18,4))) AS rev,
             n_name
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN orders   ON o_orderkey = l_orderkey
      WHERE p_type = 'PROMO'
    )
    SELECT o_year,
           ROUND(CAST(CAST(SUM(CASE WHEN n_name = 'NATION_5' THEN rev
                                    ELSE 0 END) AS DECIMAL(20,4)) AS DOUBLE)
                 / CAST(CAST(SUM(rev) AS DECIMAL(20,4)) AS DOUBLE),
                 6) AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def market_share(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    base = (
        li.join(
            F.broadcast(part.where(F.col("p_type") == "PROMO")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev.alias("rev"),
            "n_name",
        )
    )
    num = F.sum(
        F.when(F.col("n_name") == "NATION_5", F.col("rev")).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    ).cast("decimal(20,4)")
    den = F.sum(F.col("rev")).cast("decimal(20,4)")
    return base.groupBy("o_year").agg(
        F.round(
            num.cast("double") / den.cast("double"), 6
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q16-style supplier diversity per part segment (adapted: the testdata
# has no partsupp table, so supplier relationships come from observed
# lineitems): distinct suppliers per (brand, type, size), one brand
# excluded.
# ---------------------------------------------------------------------------
@bench_query(
    "brand_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 2, 3, 4, 5)
    GROUP BY 1, 2, 3
    """,
)
def brand_supplier_counts(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(
                part.where(
                    (F.col("p_brand") != "Brand#1")
                    & F.col("p_size").isin(1, 2, 3, 4, 5)
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape (suppliers-who-kept-orders-waiting): for each
# multi-supplier order, blame the supplier whose line shipped late
# (> 60 days after the order date) while EVERY other supplier on the
# order shipped on time — the classic correlated EXISTS + NOT EXISTS
# pair on the same fact table. Spark plan: ONE pass computes per
# (order, supplier) the late flag, then per order the distinct-
# supplier count and the count of late suppliers ride one window —
# the two correlated subqueries collapse into window aggregates over
# a single shuffle instead of two self-joins.
# ---------------------------------------------------------------------------
@bench_query(
    "late_supplier_blame",
    oracle="""
    WITH ls AS (
      SELECT l.l_suppkey AS s, l.l_orderkey AS o,
             MAX(CASE WHEN l.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem l JOIN orders o2 ON o2.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ), per_order AS (
      SELECT s, o, late,
             COUNT(*) OVER (PARTITION BY o) AS n_supps,
             SUM(late) OVER (PARTITION BY o) AS n_late
      FROM ls
    )
    SELECT s AS l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per_order
    WHERE late = 1 AND n_supps > 1 AND n_late = 1
    GROUP BY s
    ORDER BY numwait DESC, l_suppkey
    LIMIT 20
    """,
)
def late_supplier_blame(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    ls = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("l_suppkey").alias("s"), F.col("l_orderkey").alias("o"))
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    wo = W.partitionBy("o")
    per_order = ls.select(
        "s",
        "o",
        "late",
        F.count(F.lit(1)).over(wo).alias("n_supps"),
        F.sum("late").over(wo).alias("n_late"),
    )
    return (
        per_order.where(
            (F.col("late") == 1) & (F.col("n_supps") > 1) & (F.col("n_late") == 1)
        )
        .groupBy(F.col("s").alias("l_suppkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "l_suppkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# PageRank over the customer↔supplier interaction graph (operators/
# graph.py): symmetric edges from orders⋈lineitem, 5 power iterations
# in INTEGER fixed-point (1e9 units of rank mass) so the DuckDB oracle
# — the same iterations unrolled as CTEs — hash-matches bit-for-bit.
# The graph shape the corpus pipeline needs for link-authority quality
# priors; each iteration is one edges⋈ranks join + one groupBy SUM.
# ---------------------------------------------------------------------------
def _pagerank_oracle(iterations: int = 5, scale: int = 10**9) -> str:
    tele = (15 * scale) // 100
    parts = [
        # integer node ids (2*custkey / 2*suppkey+1): the distinct, the
        # per-iteration join keys and the shuffles all stay 8-byte
        # integers instead of strings — the id-space trick any graph
        # engine uses when node keys collide across entity types
        """pr AS (
      SELECT DISTINCT 2 * o_custkey AS c, 2 * l_suppkey + 1 AS sN
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    e AS (
      SELECT c AS src, sN AS dst FROM pr
      UNION ALL
      SELECT sN AS src, c AS dst FROM pr
    )""",
        "nodes AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e)",
        "deg AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src)",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS units FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""r{i} AS (
      SELECT n.node,
             CAST({tele} + (85 * COALESCE(s.inflow, 0)) // 100 AS BIGINT) AS units
      FROM nodes n LEFT JOIN (
        SELECT e.dst, SUM(r{i-1}.units // deg.out_deg) AS inflow
        FROM e JOIN r{i-1} ON r{i-1}.node = e.src
               JOIN deg ON deg.src = e.src
        GROUP BY e.dst) s ON s.dst = n.node)"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT node, units AS rank_units FROM r{iterations}
    ORDER BY rank_units DESC, node LIMIT 50"""
    )


@bench_query("graph_pagerank_interactions", oracle=_pagerank_oracle())
def graph_pagerank_interactions(spark, sf_dir):
    from data_ingestion_framework_spark.operators.graph import pagerank

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
        # materialize ONCE: both union branches (and the out-degree agg
        # inside pagerank) reuse the distinct pair set instead of
        # re-running the orders⋈lineitem join per branch. Integer node
        # ids (2k / 2k+1 across the two entity types) keep the distinct
        # and every per-iteration shuffle on 8-byte keys.
        .localCheckpoint()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    return (
        # checkpoint_every=0: at 5 iterations the plan stays shallow
        # enough that the mid-loop lineage cut costs more than it
        # saves (r16 A/B: 5.8 -> 4.6 s; the operator default keeps the
        # cut for LONG loops, where lineage depth is the real risk)
        pagerank(edges, iterations=5, dedupe=False, checkpoint_every=0)
        .orderBy(F.desc("rank_units"), "node")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Q15-shape: top supplier(s) by a windowed revenue view — the
# aggregate-then-compare-to-global-MAX decorrelation (Catalyst plans
# the MAX as a 1-row broadcast against the same staged aggregate, not
# a re-scan). DECIMAL revenue keeps the equality comparison exact —
# a double MAX could tie-break differently across engines.
# ---------------------------------------------------------------------------
@bench_query(
    "top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(CAST(total_revenue AS DECIMAL(20,4)) AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def top_supplier_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * (F.lit(1) - F.col("l_discount").cast(_DEC))
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        rev.join(F.broadcast(mx), rev["total_revenue"] == mx["__mx"])
        .join(supp, rev["supplier_no"] == supp["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("decimal(20,4)").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q11-shape: groups whose aggregate exceeds a FRACTION OF THE GLOBAL
# total (important-stock): per-part shipped value from one nation's
# suppliers vs 0.1% of the overall total — the scalar subquery rides a
# 1-row broadcast; both sides of the > are the same DECIMAL-exact sum
# shape so the threshold comparison is deterministic cross-engine.
# ---------------------------------------------------------------------------
@bench_query(
    "important_part_values",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(l_quantity AS DECIMAL(18,4))) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(CAST(val AS DECIMAL(24,4)) AS DOUBLE) AS part_value
    FROM v
    WHERE val * 1000 > (SELECT CAST(SUM(val) AS DECIMAL(30,4)) FROM v)
    ORDER BY part_value DESC, l_partkey
    """,
)
def important_part_values(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    v = (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(
            F.broadcast(nation.where(F.col("n_name") == "NATION_7")),
            supp["s_nationkey"] == F.col("n_nationkey"),
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * F.col("l_quantity").cast(_DEC)
            ).alias("val")
        )
    )
    thresh = v.agg(F.sum("val").cast("decimal(30,4)").alias("__t"))
    return (
        v.join(
            F.broadcast(thresh),
            v["val"].cast("decimal(30,4)") * 1000 > thresh["__t"],
        )
        .select(
            "l_partkey",
            F.col("val").cast("decimal(24,4)").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Label-propagation communities (operators/graph.py label_propagation)
# over the same integer-id interaction graph: synchronous LPA with
# most-frequent-neighbor-label votes, min-label tiebreaks, fixed 3
# rounds — every step is counts + argmax, so the unrolled oracle
# matches exactly. Output: the 20 largest communities.
# ---------------------------------------------------------------------------
def _lpa_oracle(iterations: int = 3) -> str:
    parts = [
        """pr AS (
      SELECT DISTINCT 2 * o_custkey AS c, 2 * l_suppkey + 1 AS sN
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    )""",
        """e AS (
      SELECT c AS src, sN AS dst FROM pr
      UNION ALL
      SELECT sN AS src, c AS dst FROM pr
    )""",
        "nodes AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e)",
        "l0 AS (SELECT node, node AS label FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""v{i} AS (
      SELECT e.dst, l.label, COUNT(*) AS cnt
      FROM e JOIN l{i-1} l ON l.node = e.src GROUP BY 1, 2)"""
        )
        parts.append(
            f"""w{i} AS (
      SELECT dst, label AS new FROM (
        SELECT dst, label,
               ROW_NUMBER() OVER (PARTITION BY dst
                                  ORDER BY cnt DESC, label ASC) AS rn
        FROM v{i}) WHERE rn = 1)"""
        )
        parts.append(
            f"""l{i} AS (
      SELECT l.node, COALESCE(w.new, l.label) AS label
      FROM l{i-1} l LEFT JOIN w{i} w ON w.dst = l.node)"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT label AS community, COUNT(*) AS n_members
    FROM l{iterations} GROUP BY label
    ORDER BY n_members DESC, community LIMIT 20"""
    )


@bench_query("graph_lpa_communities", oracle=_lpa_oracle(3))
def graph_lpa_communities(spark, sf_dir):
    from data_ingestion_framework_spark.operators.graph import label_propagation

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
        .localCheckpoint()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    labels = label_propagation(edges, iterations=3, dedupe=False)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TrustRank (operators/graph.py pagerank(seeds=)): personalized
# PageRank whose teleport mass lands only on a trusted seed set —
# suppliers from one nation — so rank measures proximity to the seeds
# through the interaction graph (the web-corpus trust-propagation
# quality prior, Gyöngyi et al. 2004). Same integer fixed-point math;
# the oracle adds the seed CASE to the unrolled iterations.
# ---------------------------------------------------------------------------
def _trustrank_oracle(iterations: int = 4, scale: int = 10**9) -> str:
    tele = (15 * scale) // 100
    parts = [
        """pr AS (
      SELECT DISTINCT 2 * o_custkey AS c, 2 * l_suppkey + 1 AS sN
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    )""",
        """e AS (
      SELECT c AS src, sN AS dst FROM pr
      UNION ALL
      SELECT sN AS src, c AS dst FROM pr
    )""",
        """seeds AS (
      SELECT 2 * s_suppkey + 1 AS node
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
    )""",
        """nodes AS (
      SELECT n.node,
             CASE WHEN s.node IS NOT NULL THEN {tele} ELSE 0 END AS tele,
             CASE WHEN s.node IS NOT NULL THEN {scale} ELSE 0 END AS init
      FROM (SELECT DISTINCT src AS node FROM e
            UNION SELECT DISTINCT dst FROM e) n
      LEFT JOIN seeds s ON s.node = n.node
    )""".replace("{tele}", str(tele)).replace("{scale}", str(scale)),
        "deg AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src)",
        "r0 AS (SELECT node, CAST(init AS BIGINT) AS units FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""r{i} AS (
      SELECT n.node,
             CAST(n.tele + (85 * COALESCE(s.inflow, 0)) // 100 AS BIGINT) AS units
      FROM nodes n LEFT JOIN (
        SELECT e.dst, SUM(r{i-1}.units // deg.out_deg) AS inflow
        FROM e JOIN r{i-1} ON r{i-1}.node = e.src
               JOIN deg ON deg.src = e.src
        GROUP BY e.dst) s ON s.dst = n.node)"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT node, units AS rank_units FROM r{iterations}
    WHERE units > 0
    ORDER BY rank_units DESC, node LIMIT 50"""
    )


@bench_query("graph_trustrank_seeded", oracle=_trustrank_oracle())
def graph_trustrank_seeded(spark, sf_dir):
    from data_ingestion_framework_spark.operators.graph import pagerank

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
        .localCheckpoint()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    seeds = (
        supp.join(
            F.broadcast(nation.where(F.col("n_name") == "NATION_3")),
            supp["s_nationkey"] == F.col("n_nationkey"),
        )
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
    )
    return (
        pagerank(edges, iterations=4, dedupe=False, seeds=seeds)
        .where(F.col("rank_units") > 0)
        .orderBy(F.desc("rank_units"), "node")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Triangle counting over the supplier co-purchase graph: suppliers
# sharing a customer are linked (operators/graph.py project_bipartite);
# triangles counted under DEGREE ORIENTATION (graph.py triangle_count —
# wedges enumerate from each node's out-neighborhood, bounded by
# arboricity, so a hub supplier never owns a quadratic join key). The
# oracle counts id-ordered 3-cliques — the count is orientation-
# invariant, so it certifies the degree-ordered plan too. Integer
# output.
# ---------------------------------------------------------------------------
@bench_query(
    "graph_supplier_triangles",
    oracle="""
    WITH cs AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    e AS (
      SELECT DISTINCT a.s AS u, b.s AS v
      FROM cs a JOIN cs b ON a.c = b.c AND a.s < b.s
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
      SELECT 1
      FROM e ab
      JOIN e bc ON ab.v = bc.u
      JOIN e ac ON ac.u = ab.u AND ac.v = bc.v
    )
    """,
)
def graph_supplier_triangles(spark, sf_dir):
    from data_ingestion_framework_spark.operators.graph import (
        project_bipartite,
        triangle_count,
    )

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cs = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
    )
    # uncapped projection: the oracle certifies the EXACT count (pass
    # max_per_key= to bound hub-customer fan-out, with oversize_keys()
    # as the drop report — the observable-cap contract)
    e = project_bipartite(cs, "c", "s").localCheckpoint()
    return triangle_count(e, "u", "v", dedupe=False)


# ---------------------------------------------------------------------------
# Local clustering coefficients (Watts-Strogatz) over the supplier
# co-purchase graph: per-node triangle membership over degree-oriented
# enumeration (graph.py clustering_coefficients — hub-safe like
# triangle_count), coefficient = 2·tri/(deg·(deg-1)). The corner
# multiset of the triangle set is orientation-invariant, so the oracle
# enumerates id-ordered 3-cliques and unnests the three corners.
# ---------------------------------------------------------------------------
@bench_query(
    "graph_clustering_coefficients",
    oracle="""
    WITH cs AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    e AS (
      SELECT DISTINCT a.s AS u, b.s AS v
      FROM cs a JOIN cs b ON a.c = b.c AND a.s < b.s
    ),
    deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) GROUP BY node
    ),
    tri AS (
      SELECT ab.u AS a, ab.v AS b, bc.v AS c
      FROM e ab
      JOIN e bc ON ab.v = bc.u
      JOIN e ac ON ac.u = ab.u AND ac.v = bc.v
    ),
    corners AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b AS node FROM tri
        UNION ALL SELECT c AS node FROM tri
      ) GROUP BY node
    )
    SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
           COALESCE(t.n_triangles, 0) AS n_triangles,
           CASE WHEN d.deg >= 2
                THEN ROUND(2.0 * COALESCE(t.n_triangles, 0)
                           / (d.deg * (d.deg - 1)), 4)
                ELSE 0.0 END AS clustering_coeff
    FROM deg d LEFT JOIN corners t ON t.node = d.node
    """,
)
def graph_clustering_coefficients(spark, sf_dir):
    from data_ingestion_framework_spark.operators.graph import (
        clustering_coefficients,
        project_bipartite,
    )

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cs = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
    )
    e = project_bipartite(cs, "c", "s").localCheckpoint()
    return clustering_coefficients(e, "u", "v", dedupe=False)


# ---------------------------------------------------------------------------
# Q6-shape forecast revenue: pure filter + one global agg — the
# pushdown showcase (every predicate reaches the scan; no join, no
# groupBy shuffle, one partial+final agg).
# ---------------------------------------------------------------------------
@bench_query(
    "forecast_revenue_change",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(20,4))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC))
            .cast("decimal(20,4)")
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q10-shape returned-item report: customers ranked by revenue lost to
# returns in a quarter — join + agg + top-k (TakeOrderedAndProject).
# ---------------------------------------------------------------------------
@bench_query(
    "returned_item_customers",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(20,4))
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_customers(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice").cast(_DEC) * (1 - F.col("l_discount").cast(_DEC))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(rev).cast("decimal(20,4)").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q14-shape class revenue share (ECONOMY parts standing in for the
# PROMO class): a conditional numerator over the same
# join — one pass, both aggregates from one shuffle; the share is ONE
# correctly-rounded double division of two exact DECIMAL sums.
# ---------------------------------------------------------------------------
@bench_query(
    "promo_revenue_share",
    oracle="""
    SELECT ROUND(
             100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'ECONOMY'
                        THEN CAST(l_extendedprice AS DECIMAL(18,4))
                             * (1 - CAST(l_discount AS DECIMAL(18,4)))
                        ELSE 0 END) AS DECIMAL(20,4)) AS DOUBLE)
             / CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(20,4)) AS DOUBLE),
           6) AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1995-03-01' AND l_shipdate < DATE '1995-04-01'
    """,
)
def promo_revenue_share(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-03-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1995-04-01").cast("date"))
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(_DEC) * (1 - F.col("l_discount").cast(_DEC))
    promo = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0))
    joined = li.join(part, li["l_partkey"] == part["p_partkey"])
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(promo).cast("decimal(20,4)").cast("double")
            / F.sum(rev).cast("decimal(20,4)").cast("double"),
            6,
        ).alias("promo_share_pct")
    )


# ---------------------------------------------------------------------------
# Q19-shape disjunctive-predicate revenue: OR-of-ANDs across two
# tables — the filter Catalyst must keep ABOVE the join for the
# cross-table conjuncts while pushing the single-table prefilters
# (brand/size, quantity) into the scans.
# ---------------------------------------------------------------------------
@bench_query(
    "disjunctive_promo_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(20,4))
                AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
    """,
)
def disjunctive_promo_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(_DEC) * (1 - F.col("l_discount").cast(_DEC))
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 21)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .where(cond)
        .agg(F.sum(rev).cast("decimal(20,4)").cast("double").alias("revenue"))
    )
