"""Plan-quality regression gate over the bench headline queries: no
row-at-a-time Python UDF ever appears in a hot path, and nested-loop
joins appear only where a 1-row control-plane frame is crossJoined by
design (corpus totals, bloom bitmaps, broadcast query vectors). Counts
come from tools/plan_audit.py — the same audit the driver can diff
across rounds."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


#: queries whose plan intentionally carries a BroadcastNestedLoopJoin:
#: each crossJoins ONE broadcast row (or a k-row constant frame) of
#: control-plane data — corpus-level totals, a bloom bitmap, a query
#: vector. A nested loop against a 1-row side is a map-side constant
#: fold, not a quadratic join.
NESTED_LOOP_BY_DESIGN = {
    "similarity_cosine_topk",      # broadcast query-vector frame
    "docs_decontaminate_bloom",    # broadcast bloom bitmap row
    "text_unigram_ce",             # corpus-total row
    "similarity_pq_topk",          # broadcast query-vector frame
    "similarity_hamming_topk",     # broadcast query-signature frame
    "docs_dsir_weights",           # corpus-total row
    "docs_bm25_topk",              # corpus stats (N, avgdl) row
    "retrieval_rrf_hybrid",        # BM25 corpus-stats row (twice: two arms)
    "corpus_unigram_em_tokens",    # M-step piece-count total row
    "orders_price_exact_percentiles",  # broadcast 4-row fraction-rank frame
    # temperature grid: the scored frame crossJoins the broadcast
    # |T|=8-row candidate frame (a bounded constant — the |T|× scan is
    # the point: one pass instead of |T|), and the final
    # chosen×before assembly crossJoins two 1-row frames
    "docs_quality_temperature_fit",
}

#: queries whose plan intentionally carries a window fed by
#: ``Exchange SinglePartition`` — every entry needs an ARGUED
#: cardinality bound. Unbounded cases get fixed, not pinned: the
#: round-12 dead detector hid an unbounded rank window inside
#: classifier_auc (fixed with operators/rank.py's range-partitioned
#: prefix sum) and, once revived, caught rrf_fuse ranking the whole
#: fused id domain through one task (fixed with a distributed
#: TakeOrdered top-k BEFORE the rank window).
SINGLE_PARTITION_BY_DESIGN: set[str] = {
    # rrf_fuse's rank-number tail: the window input is the OUTPUT of
    # orderBy().limit(k) — at most k = 10 rows by construction
    # (control-plane sized at any corpus scale)
    "retrieval_rrf_hybrid",
}


def test_headline_plans_have_no_row_python_and_bounded_nested_loops(spark):
    from bench import HEADLINE
    from tools.plan_audit import audit_query

    sf_dir = "/root/testdata/sf0.001"
    offenders, py_row, one_part = [], [], []
    for name in HEADLINE:
        r = audit_query(spark, name, sf_dir)
        if r["py_row"]:
            py_row.append(name)
        if r["nested_loop"] and name not in NESTED_LOOP_BY_DESIGN:
            offenders.append(name)
        if r["single_part_win"] and name not in SINGLE_PARTITION_BY_DESIGN:
            one_part.append(name)
    assert not py_row, f"row-at-a-time Python UDF in hot path: {py_row}"
    assert not offenders, (
        "unexpected nested-loop/cartesian join (quadratic unless one "
        f"side is a 1-row control frame): {offenders} — if intentional, "
        "document it in NESTED_LOOP_BY_DESIGN"
    )
    assert not one_part, (
        "window fed by Exchange SinglePartition (every row through one "
        f"task): {one_part} — use operators/rank.py's range-partitioned "
        "prefix sum, or argue a bound in SINGLE_PARTITION_BY_DESIGN"
    )


def test_single_partition_window_counter_is_alive(spark):
    """Regression for the round-12 dead counter: the old detector
    required Window/Sort/Exchange on CONSECUTIVE lines, which a
    finalized AQE plan never satisfies (a ShuffleQueryStage line
    interposes), so it reported 0 on plans carrying real global-order
    windows. A deliberately global cumulative-sum window must now
    count — on the EXECUTED (AQE-finalized) plan."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from tools.plan_audit import audit_plan

    df = spark.range(100).withColumn(
        "run",
        F.sum("id").over(
            W.orderBy("id").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    r = audit_plan(plan)
    assert r["single_part_win"] >= 1, plan
    assert r["single_part_exchange"] >= 1, plan
    # ...and the exchanges counter sees the SinglePartition spelling too
    assert r["exchanges"] >= 1, plan


def test_exchange_counter_sees_round_robin(spark):
    """ADVICE r13: plain ``repartition(n)`` plans
    ``Exchange RoundRobinPartitioning`` — a spelling the exchanges
    regex used to miss, undercounting shuffles in audited plans."""
    from tools.plan_audit import audit_plan

    df = spark.range(100).repartition(7)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan, plan
    assert audit_plan(plan)["exchanges"] >= 1, plan


def test_codegen_counter_sees_finalized_aqe_spans(spark):
    """Regression for the dead-counter class: an UNEXECUTED AQE plan
    string contains no codegen markers, so audit_query(execute=True)
    must finalize the plan (noop sink) and read nonzero codegen spans
    on a trivially-codegen'd aggregate query."""
    from tools.plan_audit import audit_query

    r = audit_query(
        spark, "pricing_summary", "/root/testdata/sf0.001", execute=True
    )
    assert r["codegen"] > 0, r


def test_no_phantom_reference_citations():
    """Round-11 verdict #4: every reference-style path cited in a
    package docstring/comment must exist under the actual reference
    tree (or be a self-cite into this repo). Guards against fabricated
    citations like the deleted ``vector_ops/knn.(rs|go)``."""
    import sys
    sys.path.insert(0, "tools")
    try:
        from check_citations import find_phantoms
    finally:
        sys.path.pop(0)
    assert find_phantoms() == []
