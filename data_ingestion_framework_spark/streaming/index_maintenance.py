"""Streaming ANN-index maintenance: micro-batches append to an
embeddings table and the persisted IVF index catches up — two ledgers,
one exactly-once composition.

The foreachBatch body does two commits: (1) a ``(stream_query_id,
stream_batch_id)``-guarded append of the batch to the embeddings table
(the package's idempotent-write discipline), then (2)
``similarity.ivf_index_refresh`` — which is idempotent through its OWN
commit-cursor. That makes every crash point safe:

- crash before the append → replay appends, refresh catches up;
- crash between append and refresh → replay SKIPS the append (ledger)
  and the refresh folds the stranded commit (cursor behind head);
- crash after both → replay is a double no-op.

No distributed transaction needed — two independent idempotent ledgers
compose into end-to-end exactly-once, the same argument as
``expect_and_quarantine``'s per-table guards."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame


def stream_append_with_ivf_index(
    stream: DataFrame,
    emb_table,
    index_table,
    centroids: list[list[float]],
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger: str = "availableNow",
    await_termination: bool | None = None,
):
    """Run the stream into ``emb_table`` while keeping ``index_table``
    (a :func:`similarity.ivf_index_refresh` cell-partitioned IVF index)
    current — the streaming ingest shape for a continuously-growing
    embedding corpus whose ANN probes must stay partition-pruned.
    Centroids are frozen (the FAISS model; retrain = rebuild)."""
    from data_ingestion_framework_spark.operators.similarity import (
        ivf_index_refresh,
    )
    from data_ingestion_framework_spark.streaming.writers import (
        _maybe_await,
        apply_trigger,
    )

    qid = hashlib.sha256(str(checkpoint).encode()).hexdigest()[:16]

    # the replay guard reads the commit history ONCE per stream start,
    # then tracks the cursor in the closure — this query is the only
    # writer advancing its (qid, batch_id) ledger, so the cached max
    # stays exact and a long-lived stream does O(1) ledger work per
    # micro-batch instead of rescanning a growing history
    cursor = {"last": None}

    def _last_committed() -> int:
        if cursor["last"] is None:
            last = -1
            if emb_table.exists():
                for rec in emb_table.history():
                    m = rec.get("metrics", {})
                    bid = m.get("stream_batch_id")
                    if (
                        bid is not None
                        and m.get("stream_query_id", qid) == qid
                    ):
                        last = max(last, bid)
            cursor["last"] = last
        return cursor["last"]

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id > _last_committed():
            emb_table.append(
                batch_df,
                metrics={
                    "stream_batch_id": batch_id,
                    "stream_query_id": qid,
                },
            )
            cursor["last"] = batch_id
        # idempotent via the index's own cursor — also heals a prior
        # crash that appended without refreshing
        ivf_index_refresh(
            emb_table, index_table, centroids,
            id_col=id_col, vec_col=vec_col,
        )

    writer = apply_trigger(stream.writeStream.foreachBatch(_sink), trigger)
    writer = writer.option("checkpointLocation", checkpoint)
    return _maybe_await(writer.start(), await_termination, trigger)
