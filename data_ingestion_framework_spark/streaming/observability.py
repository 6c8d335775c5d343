"""Streaming observability: engine progress events captured into a
table.

The reference's pipelines log per-batch merge metrics to an audit table
(``sinks/audit.py`` carries that surface); this module adds the
STREAMING-ENGINE side — a ``StreamingQueryListener`` that records every
micro-batch's progress event (rows, durations, state metrics) so ops
queries can join engine telemetry against the audit log.

Listener callbacks run on a driver-side listener thread where starting
Spark jobs is legal but easy to deadlock under shutdown — so events
buffer in memory and ``flush()`` (called by YOUR code after
``awaitTermination``) writes them through the table store's commit log.
Nothing is lost on crash that the checkpoint wouldn't replay anyway:
the ledger is telemetry, not the source of truth.
"""

from __future__ import annotations

import json

from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_id string, run_id string, batch_id bigint, ts string, "
    "num_input_rows bigint, batch_duration_ms bigint, "
    "state_rows_total bigint, sources string"
)


class ProgressLogger(StreamingQueryListener):
    """Buffer every ``onQueryProgress`` event; ``flush()`` appends the
    buffered rows to ``table`` (a :class:`ParquetTable`) and clears."""

    def __init__(self, spark, table):
        self.spark = spark
        self.table = table
        self.rows: list[tuple] = []

    # -- listener callbacks (buffer only — never start jobs here) ----------
    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        state_rows = 0
        for op in p.stateOperators or []:
            state_rows += op.numRowsTotal or 0
        self.rows.append(
            (
                str(p.id),
                str(p.runId),
                int(p.batchId),
                p.timestamp,
                int(p.numInputRows or 0),
                int((p.batchDuration or 0)),
                int(state_rows),
                json.dumps(
                    [
                        {
                            "description": s.description,
                            "numInputRows": s.numInputRows,
                        }
                        for s in (p.sources or [])
                    ],
                    sort_keys=True,
                ),
            )
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass

    # -- explicit flush ------------------------------------------------------
    def flush(self) -> int:
        """Append buffered progress rows to the table; returns how many
        landed. Call after ``awaitTermination`` — not from a callback."""
        if not self.rows:
            return 0
        batch = self.spark.createDataFrame(self.rows, PROGRESS_SCHEMA)
        n = len(self.rows)
        self.table.append(batch, metrics={"progress_events": n})
        self.rows = []
        return n
