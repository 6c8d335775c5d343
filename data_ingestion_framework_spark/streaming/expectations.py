"""DLT-style streaming expectations: declarative data-quality gates on
a stream, with drop / fail / quarantine violation policies.

Delta Live Tables attaches expectations to a flow (``EXPECT ... ON
VIOLATION DROP ROW | FAIL UPDATE``); the reference runs the same DQ
rule set batch-side (di_landing_to_raw_generic_v2.py:585-611). This
module lifts the engine's existing rule compiler (``operators/dq.py``
— the rules are pure Column expressions, so they evaluate on a
streaming frame exactly as on a batch one) into the streaming writers:

- ``expect(df, rules, on_violation="drop")`` → streaming frame with
  violating rows removed (DLT ``DROP ROW``);
- ``on_violation="fail"`` → any violating row kills the stream with a
  loud error naming the rule (DLT ``FAIL UPDATE``);
- ``expect_and_quarantine(...)`` → ``foreachBatch`` sink writing the
  passing rows to the target table and the violating rows (with their
  ``data_quality_result_array`` explaining WHICH rules fired) to a
  quarantine table — both through the commit log, replay-guarded by
  batch id so checkpoint restarts never double-write.

Scale notes: row-local rules are codegen'd Column expressions (no
Python); drop/fail are narrow transformations. The quarantine sink is
one foreachBatch pass — the split is two filters over one evaluated
frame, not two rule evaluations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators.dq import (
    RESULT_ARRAY,
    VALID_FLAG,
    DQRule,
    apply_rules,
)

#: rule types evaluable on a streaming frame (row-local — no window,
#: no join against the stream itself)
_STREAM_OK = "row-local"


def _flagged(df: DataFrame, rules: list[DQRule]) -> DataFrame:
    from data_ingestion_framework_spark.operators.dq import ROW_LOCAL_TYPES

    bad = [r.rule_id for r in rules if r.enabled and r.rule_type not in ROW_LOCAL_TYPES]
    if bad:
        raise ValueError(
            f"streaming expectations must be row-local rules; {bad} need "
            "state/joins — run them in the foreachBatch merge instead"
        )
    return apply_rules(df, rules)


def expect(
    df: DataFrame,
    rules: list[DQRule],
    on_violation: str = "drop",
) -> DataFrame:
    """Gate a (streaming or batch) frame on row-local DQ rules.

    ``drop`` removes violating rows (DLT ``ON VIOLATION DROP ROW``);
    ``fail`` makes any violating row raise mid-stream, naming the rules
    that fired (DLT ``FAIL UPDATE`` — the error surfaces through the
    streaming query's exception). The DQ flag columns are stripped from
    the survivors, so the gate is transparent to downstream schema."""
    if on_violation not in ("drop", "fail"):
        raise ValueError("on_violation must be 'drop' or 'fail'")
    flagged = _flagged(df, rules)
    if on_violation == "drop":
        out = flagged.where(F.col(VALID_FLAG))
    else:
        # the guard must ride a SURVIVING column — a dedicated guard
        # column gets pruned by Catalyst and the raise never evaluates
        c0 = df.columns[0]
        t0 = flagged.schema[c0].dataType
        out = flagged.withColumn(
            c0,
            F.when(
                ~F.col(VALID_FLAG),
                F.raise_error(
                    F.concat(
                        F.lit("expectation failed: "),
                        F.to_json(F.col(RESULT_ARRAY)),
                    )
                ).cast(t0),
            ).otherwise(F.col(c0)),
        )
    drop_cols = [c for c in out.columns if c.startswith("__dq_")]
    return out.drop(RESULT_ARRAY, VALID_FLAG, *drop_cols)


def expect_and_quarantine(
    df: DataFrame,
    rules: list[DQRule],
    target,
    quarantine,
    checkpoint: str,
    trigger: str = "availableNow",
    await_termination: bool | None = None,
):
    """Streaming sink: passing rows append to ``target``, violating
    rows (with their ``data_quality_result_array``) to ``quarantine``
    — both :class:`ParquetTable` commits inside one ``foreachBatch``,
    replay-guarded by ``(stream_query_id, stream_batch_id)`` (Delta's
    txnAppId+txnVersion discipline: a checkpoint restart re-delivers
    the last batch and the guard makes the second delivery a no-op on
    BOTH tables, while a SECOND pipeline — fresh checkpoint, batch ids
    restarting at 0 — appending to the same tables is scoped to its
    own ledger instead of being swallowed by this one's). The query
    identity derives from the checkpoint path, stable across restarts
    of the same pipeline; legacy records carrying only a batch id are
    treated as this pipeline's (the pre-query-id one-pipeline-per-
    table contract)."""
    import hashlib

    from data_ingestion_framework_spark.streaming.writers import (
        apply_trigger,
        _maybe_await,
    )

    qid = hashlib.sha256(str(checkpoint).encode()).hexdigest()[:16]

    def _last_committed(table) -> int:
        last = -1
        for rec in table.history():
            m = rec.get("metrics", {})
            bid = m.get("stream_batch_id")
            if bid is not None and m.get("stream_query_id", qid) == qid:
                last = max(last, bid)
        return last

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # Each table carries its OWN replay ledger: a crash between
        # target.append and quarantine.append replays the batch with
        # the id already in target but not in quarantine, so the
        # guards must be independent or the quarantine rows are lost.
        need_target = batch_id > _last_committed(target)
        need_quarantine = batch_id > _last_committed(quarantine)
        if not need_target and not need_quarantine:
            return  # replayed batch: already committed everywhere
        flagged = _flagged(batch_df, rules)
        flagged = flagged.drop(
            *[c for c in flagged.columns if c.startswith("__dq_")]
        )
        good = flagged.where(F.col(VALID_FLAG)).drop(RESULT_ARRAY, VALID_FLAG)
        # pin the result array's element nullability: the expression-
        # built array carries containsNull=false while a parquet
        # read-back reports true, and the store's strict append would
        # refuse the "mismatch" on every quarantine append after the
        # table exists
        bad = (
            flagged.where(~F.col(VALID_FLAG))
            .drop(VALID_FLAG)
            .withColumn(RESULT_ARRAY, F.col(RESULT_ARRAY).cast("array<string>"))
        )
        if need_target:
            target.append(
                good,
                metrics={"stream_batch_id": batch_id, "stream_query_id": qid},
            )
        if need_quarantine:
            quarantine.append(
                bad,
                metrics={"stream_batch_id": batch_id, "stream_query_id": qid},
            )

    writer = apply_trigger(df.writeStream.foreachBatch(_sink), trigger).option(
        "checkpointLocation", checkpoint
    )
    return _maybe_await(writer.start(), await_termination, trigger)
