"""Distributed exact cumulative counts (the shared rank primitive
behind ``classify.classifier_auc`` and ``dq.equi_depth_histogram``).

Both consumers need, for every DISTINCT value ``v`` of a column, the
exact cumulative count ``hi(v) = Σ_{u ≤ v} c(u)`` — the end rank of
``v``'s tie group. The obvious Spark spelling is
``sum(c) over (order by v)``, but a window with ``orderBy`` and no
``partitionBy`` plans ``Exchange SinglePartition``: every distinct
value funnels through ONE task, a scale cliff at 100 TB when the
value domain is large (the round-12 audit found exactly this shape
hiding in the executed AUC plan).

This primitive computes the same exact integers with zero
single-partition stages, the classic two-pass distributed prefix sum:

1. ``repartitionByRange(value)`` — contiguous value ranges land on
   ascending partition ids — then ``localCheckpoint()`` so the
   partition layout is FROZEN data, not a recomputable plan (range
   boundaries come from sampling; two separate jobs over an
   unmaterialized range exchange could legally resample and disagree).
2. One small job: per-partition subtotals ``(pid, Σc)`` — at most
   ``spark.sql.shuffle.partitions`` rows to the driver, control-plane
   sized by construction, independent of data volume.
3. Offsets (exclusive prefix sums of the subtotals in pid order) go
   back as a broadcast join, and the final cumulative count is a
   PARTITIONED window — ``partitionBy(pid) orderBy(value)`` — plus the
   offset: partition-local work everywhere.

Exactness: counts are BIGINTs, the offsets are Python ints summed at
the driver in pid order — the same integers the single-partition
window would produce, in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def exact_cumulative_counts(
    per: DataFrame,
    value_col: str,
    count_col: str,
    out_col: str = "__hi",
) -> tuple[DataFrame, int]:
    """``(frame + out_col, grand_total)`` over a distinct-value count
    table: ``out_col = Σ counts of rows with value ≤ this value``.

    ``per`` must carry one row per distinct ``value_col`` (the callers
    build it with a groupBy), so the per-partition ``orderBy`` is a
    total order and the cumulative sum is well-defined. The returned
    frame is backed by a ``localCheckpoint`` of the range exchange —
    already materialized, so downstream reuse costs no recompute — and
    the grand total comes free from the subtotal pass (callers use it
    in place of a crossJoined total row).
    """
    # lazy checkpoint (r16 opt, guide §5): the subtotal agg below is a
    # full-scan action, so it materializes (and freezes) the range
    # exchange in the SAME job — the eager form paid a separate
    # materialization job per rank-primitive call. The one-execution
    # guarantee the docstring requires still holds: the exchange's
    # sampled boundaries are computed once, in that job, and every
    # later consumer reads the persisted partitions.
    part = (
        per.repartitionByRange(F.col(value_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    subtotals = (
        part.groupBy("__pid")
        .agg(F.sum(F.col(count_col).cast("bigint")).alias("__sub"))
        .collect()
    )
    offsets, running = [], 0
    # range partitions carry ascending value ranges in pid order, so
    # the exclusive prefix sum in pid order IS each partition's offset
    for row in sorted(subtotals, key=lambda r: r["__pid"]):
        offsets.append((int(row["__pid"]), running))
        running += int(row["__sub"])
    spark = per.sparkSession
    off = spark.createDataFrame(offsets, "__pid int, __off bigint")
    w = (
        W.partitionBy("__pid")
        .orderBy(value_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = (
        part.join(F.broadcast(off), "__pid")
        .withColumn(
            out_col,
            F.sum(F.col(count_col).cast("bigint")).over(w) + F.col("__off"),
        )
        .drop("__pid", "__off")
    )
    return out, running
