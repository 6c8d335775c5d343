"""Ordered-funnel analytics over event streams.

Beyond-reference surface (event-pipeline analytics): how many users
progressed through an ordered sequence of event types, where each step
must occur STRICTLY AFTER the user's previous step (the standard
product-funnel semantics — a purchase logged before the first view does
not count as conversion).

Scale shape: stage k is a filtered per-user ``min(ts)`` aggregate
joined to stage k-1's (user, ts) frame — the event scan pushes the
``event_type`` filter into the source, each stage frame is one narrow
row per qualifying user, and the joins are user-keyed equi-joins AQE
can broadcast when a funnel narrows. No window over the whole event
history, no per-user event arrays (a power user's history never has to
fit in memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stage_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user earliest completion time of each funnel step:
    ``(user, t_0, …, t_{k-1})`` with ``t_i`` NULL once the user stalls.
    ``t_0`` is the user's first ``steps[0]`` event; ``t_i`` the first
    ``steps[i]`` event strictly after ``t_{i-1}``."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            events.where(F.col(type_col) == step)
            .select(user_col, F.col(ts_col).alias("__ts"))
            .join(cur.select(user_col, F.col(f"t_{i-1}").alias("__prev")), user_col)
            .where(F.col("__ts") > F.col("__prev"))
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"t_{i}"))
        )
        cur = cur.join(nxt, user_col, "left")
    return cur


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel report: one row per step — ``(stage_idx, stage,
    users)`` where ``users`` counts users who reached that step under
    the strictly-after ordering. Monotonically non-increasing by
    construction."""
    times = funnel_stage_times(events, steps, user_col, type_col, ts_col)
    counts = times.agg(
        *[
            F.count(F.col(f"t_{i}")).cast("bigint").alias(f"__n_{i}")
            for i in range(len(steps))
        ]
    )
    # one row per stage via a single explode of the 1-row aggregate —
    # a per-stage select/union would re-execute the whole stage chain
    # once per step (k filtered scans × k branches)
    stage_structs = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(step).alias("stage"),
                F.col(f"__n_{i}").alias("users"),
            )
            for i, step in enumerate(steps)
        ]
    )
    return counts.select(F.explode(stage_structs).alias("__st")).select(
        "__st.stage_idx", "__st.stage", "__st.users"
    )
