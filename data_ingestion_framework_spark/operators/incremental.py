"""Incremental aggregate maintenance — continuous-aggregate /
materialized-view refresh over the commit log.

The hypertable-rollup story at 100 TB: a dashboard aggregate over an
append-only fact table should cost O(new data) per refresh, not a full
recompute. ``refresh_aggregate`` reads ONLY the commits after its
cursor (``ParquetTable.read_since`` — file-level increments, never the
table), partially aggregates the delta, and folds it into the stored
aggregate state by re-aggregating ``state ∪ partial`` on the group
keys. Restricted to MERGEABLE measures (count/sum/min/max — the
classic semigroup aggregates; express avg as sum+count and divide at
read time), which is exactly the restriction real continuous
aggregates (TimescaleDB, Materialize's append-only mode) impose.

``read_since`` raises if any commit after the cursor is not
file-additive (overwrite/compact/delete), so a rewritten base can
never be silently double-counted — the caller resets the aggregate
(drop + refresh from scratch) in that case.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_framework_spark.sources.tablestore import ParquetTable

#: measure fn -> (partial aggregation, merge aggregation). Partial count
#: merges by SUM — the semigroup law; everything else merges by itself.
_MERGEABLE = {
    "count": (lambda c: F.count(c).cast("bigint"), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}

CURSOR_PROP = "agg_cursor_seq"


def refresh_aggregate(
    base: ParquetTable,
    agg_table: ParquetTable,
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
    cursor_prop: str = CURSOR_PROP,
) -> int:
    """Fold new base commits into ``agg_table``. ``measures`` maps
    output column -> (fn, input column) with fn in count/sum/min/max.
    Returns the number of commits folded (0 = already current).

    First call (no cursor) aggregates the whole base; later calls read
    only the delta. The cursor (last folded commit seq) lives in the
    aggregate table's properties AND in each refresh commit's metrics:
    a crash between the state overwrite and the properties write is
    repaired from the commit record on the next call (never refolded).
    The remaining unprotected window is a crash between the staged
    swap and its commit record — detectable (state newer than the
    log) but not self-healing; re-create the aggregate from scratch
    after such a crash, the base table is untouched either way.
    """
    for out, (fn, _col) in measures.items():
        if fn not in _MERGEABLE:
            raise ValueError(
                f"measure {out!r}: {fn!r} is not mergeable "
                f"(supported: {sorted(_MERGEABLE)})"
            )
    hist = base.history()
    if not hist:
        return 0
    current_seq = hist[-1]["seq"]
    props = agg_table.properties() if agg_table.exists() else {}
    last = props.get(cursor_prop)

    # crash repair: the last refresh commit's metrics carry the seq it
    # folded through; if the properties write didn't land, advance the
    # cursor from the record instead of double-folding the delta
    agg_hist = agg_table.history() if agg_table.exists() else []
    if agg_hist:
        recorded = (agg_hist[-1].get("metrics") or {}).get(cursor_prop)
        if recorded is not None and (last is None or int(recorded) > int(last)):
            last = int(recorded)
            props = {**props, cursor_prop: str(last)}
            agg_table.set_properties(props)

    if last is not None and int(last) == current_seq:
        return 0
    delta = base.read() if last is None else base.read_since(int(last))

    partial = delta.groupBy(*group_cols).agg(
        *[
            _MERGEABLE[fn][0](F.col(col)).alias(out)
            for out, (fn, col) in measures.items()
        ]
    )
    if last is not None and agg_table.exists():
        merged = (
            agg_table.read()
            .unionByName(partial)
            .groupBy(*group_cols)
            .agg(
                *[
                    _MERGEABLE[fn][1](F.col(out)).alias(out)
                    for out, (fn, _col) in measures.items()
                ]
            )
        )
    else:
        merged = partial
    n_folded = len([r for r in hist if last is None or r["seq"] > int(last)])
    agg_table.overwrite(
        merged, metrics={cursor_prop: current_seq}, op="agg_refresh"
    )
    agg_table.set_properties({**props, cursor_prop: str(current_seq)})
    return n_folded
