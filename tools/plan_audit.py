#!/usr/bin/env python
"""Physical-plan audit over the bench headline queries.

For every ``bench.HEADLINE`` query, builds the DataFrame at
``$SPARK_GRAFT_SF_DIR`` (default sf0.001 — plan SHAPE only, so the
smallest data suffices) and counts the plan features that decide
100 TB behavior:

- ``exchanges``      shuffle boundaries (fewer is better at fixed semantics)
- ``bhj`` / ``smj``  broadcast vs sort-merge joins the planner picked
- ``nested_loop``    BroadcastNestedLoopJoin / CartesianProduct — red flag
                     unless one side is a literal 1-row frame
- ``codegen``        WholeStageCodegen spans (wider is better)
- ``py_row``         BatchEvalPython = row-at-a-time Python UDF — a hot-path
                     bug by this repo's rules (Arrow mapInPandas shows as
                     ``py_arrow`` and is allowed at media edges)
- ``pushed``         scans with non-empty PushedFilters
- ``single_part_win`` windows forced to one partition (global orderBy
                     without partitionBy that did NOT collapse into a
                     TakeOrderedAndProject)

Prints one JSON line per query plus a totals line — diffable across
rounds, and the red-flag columns are pinned by
``tests/test_plan_audit.py``.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from data_ingestion_framework_spark import registry  # noqa: E402
from data_ingestion_framework_spark.session import get_spark  # noqa: E402

registry.load_all_queries()


def audit_plan(plan: str) -> dict:
    """Feature counts from an executedPlan/explain string."""
    return {
        "exchanges": len(re.findall(r"Exchange (hash|range|single)", plan)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "nested_loop": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        "codegen": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "py_row": plan.count("BatchEvalPython"),
        "py_arrow": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        "pushed": len(
            [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m.strip()]
        ),
        "take_ordered": plan.count("TakeOrderedAndProject"),
        "single_part_win": len(
            re.findall(r"Window .*\n.*Sort.*\n.*Exchange SinglePartition", plan)
        ),
    }


def audit_query(spark, name: str, sf_dir: str) -> dict:
    df = registry.QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {"query": name, **audit_plan(plan)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("plan-audit")
    rows = []
    for name in HEADLINE:
        try:
            rows.append(audit_query(spark, name, sf_dir))
        except Exception as exc:  # surface, keep auditing the rest
            rows.append({"query": name, "error": str(exc)[:200]})
    for r in rows:
        print(json.dumps(r))
    ok = [r for r in rows if "error" not in r]
    totals = {
        k: sum(r[k] for r in ok)
        for k in ok[0]
        if k != "query"
    } if ok else {}
    print(json.dumps({"query": "__totals__", "n": len(ok), **totals}))


if __name__ == "__main__":
    main()
