"""Table-as-a-streaming-source: replay the commit log as micro-batches.

Delta parity: the reference's streaming readers consume Delta tables as
streaming SOURCES (``spark.readStream.format("delta")`` under
``readers/streaming_readers.py``-style entry points) — the Delta
streaming source tails the transaction log and emits each commit's new
files as micro-batch input, with ``startingVersion`` /
``maxFilesPerTrigger`` / ``ignoreDeletes`` / ``ignoreChanges`` options.
This module gives ``ParquetTable`` the same role for the engine's own
commit log, completing the medallion loop the reference runs end to
end: files -> bronze (append) -> [bronze AS STREAM] -> silver (merge)
-> gold.

Semantics (matched to Delta's documented streaming-source contract):

- default: every commit past the cursor must be file-additive
  (``append``/``create``; ``cdf_reconcile`` markers are file-neutral).
  Hitting a rewrite or delete raises — Delta's "Detected a data
  update/delete ... This is currently not supported" — so a consumer
  never silently misses a change.
- ``ignore_deletes=True``: commits that only REMOVE files (DELETE,
  including deletion-vector deletes, which remove rows without
  removing files) are skipped; appends keep flowing.
- ``ignore_changes=True``: rewrite commits (overwrite / update /
  compact / merge) re-emit the rows of their NEW files. As in Delta,
  this can re-deliver rows that were already emitted (a compaction
  rewrites old rows into new files) — downstream must be idempotent,
  which the foreachBatch SCD mergers are. Implies ``ignore_deletes``.
- ``starting_seq=N``: begin at commit N (inclusive — Delta's
  ``startingVersion``); rows written before N are never emitted.
  ``starting_seq="latest"``: emit nothing now, only future commits
  (Delta's default for a fresh stream without startingVersion).
  Default ``None`` replays the log from the first commit (the bronze
  -> silver backfill shape).
- ``max_commits_per_batch``: rate limiting — the ``maxFilesPerTrigger``
  analog at commit granularity; pending commits are chunked so one
  enormous backlog does not become one enormous micro-batch.

Exactly-once: the cursor (last consumed seq) is checkpointed with a
tmp-file + ``os.replace`` AFTER the batch callback returns, exactly
like the engine's commit records. A crash between callback and cursor
write re-delivers that batch on restart (at-least-once into the
callback); batch ids are the commit seqs, so they are REPLAY-STABLE —
a re-delivered batch carries the same id, and the idempotent
foreachBatch mergers plus the CDF ``batch_id`` replay guard turn that
into exactly-once end-to-end state. (Spark's own foreachBatch
documents the identical contract; Delta's streaming source keys its
offsets by reservoir version the same way.)

Scale: per trigger the driver reads O(commit records) of JSON and
lists no directories; the data read is exactly the new files of the
pending commits — proportional to the CHANGE, never the table. This is
the property that makes tailing a 100 TB bronze table cheap: a
1000-executor cluster reads only each micro-batch's appended files.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestion_framework_spark.sources.tablestore import ParquetTable

#: Commit ops that never add live data files a stream must emit.
_FILE_NEUTRAL_OPS = {"cdf_reconcile", "create_empty", "properties"}


class TableChangeStream:
    """Micro-batch reader over a ``ParquetTable``'s commit log."""

    def __init__(
        self,
        table: ParquetTable,
        checkpoint: str,
        starting_seq: int | str | None = None,
        max_commits_per_batch: int | None = None,
        ignore_deletes: bool = False,
        ignore_changes: bool = False,
        with_commit_seq: bool = False,
    ):
        if max_commits_per_batch is not None and max_commits_per_batch < 1:
            raise ValueError("max_commits_per_batch must be >= 1")
        self.table = table
        self.checkpoint = checkpoint
        self.starting_seq = starting_seq
        self.max_commits_per_batch = max_commits_per_batch
        self.ignore_deletes = ignore_deletes or ignore_changes
        self.ignore_changes = ignore_changes
        self.with_commit_seq = with_commit_seq

    # -- cursor ---------------------------------------------------------
    @property
    def _cursor_path(self) -> str:
        return os.path.join(self.checkpoint, "cursor.json")

    def cursor(self) -> int | None:
        """Last consumed commit seq, or None before the first trigger."""
        try:
            with open(self._cursor_path) as f:
                return json.load(f)["last_seq"]
        except FileNotFoundError:
            return None

    def _save_cursor(self, seq: int) -> None:
        os.makedirs(self.checkpoint, exist_ok=True)
        tmp = os.path.join(self.checkpoint, f"_cursor.{seq}.tmp")
        with open(tmp, "w") as f:
            json.dump({"last_seq": seq}, f)
        os.replace(tmp, self._cursor_path)

    # -- pending-commit classification ---------------------------------
    def _pending(self) -> tuple[list[dict], dict[int, list[str]]]:
        """History records past the cursor, plus a seq -> files map
        (the map includes the record BEFORE the first pending one, so
        file diffs are computable for every pending record)."""
        hist = self.table.history()
        by_seq = {r["seq"]: r.get("files", []) for r in hist}
        cur = self.cursor()
        if cur is None:
            if self.starting_seq == "latest":
                return [], by_seq
            if self.starting_seq is not None:
                pend = [r for r in hist if r["seq"] >= self.starting_seq]
            else:
                pend = list(hist)
        else:
            pend = [r for r in hist if r["seq"] > cur]
        return pend, by_seq

    def _emit_files(self, rec: dict, prev_files: list[str]) -> list[str]:
        """New files this commit must emit, after classification.

        Raises on a change/delete commit the options don't allow —
        the Delta streaming source's safety contract."""
        cur = rec.get("files", [])
        prev_set = set(prev_files)
        new = [f for f in cur if f not in prev_set]
        cur_set = set(cur)
        removed = [f for f in prev_files if f not in cur_set]
        op = rec.get("op", "")
        if op in ("append", "create") or op in _FILE_NEUTRAL_OPS:
            return new
        if op == "delete_dv" or (removed and not new):
            # rows disappeared (file removal or deletion vector)
            if self.ignore_deletes:
                return []
            raise ValueError(
                f"TableChangeStream: commit {rec['seq']} is a delete "
                f"({op!r}) — pass ignore_deletes=True to skip delete "
                "commits, or ignore_changes=True to also accept rewrites"
            )
        if removed or new:
            # rewrite: overwrite/update/merge/compact/zorder/restore
            if self.ignore_changes:
                return new
            raise ValueError(
                f"TableChangeStream: commit {rec['seq']} rewrites data "
                f"({op!r}) — pass ignore_changes=True to re-emit its new "
                "files (rows may be re-delivered; downstream must be "
                "idempotent)"
            )
        return []  # metadata-only commit (column ops, constraints)

    # -- frame construction --------------------------------------------
    def _read_files(self, rels: list[str], seq: int | None) -> DataFrame:
        """Read one commit's emitted files. A file the stream is
        replaying may have been RETIRED by a later rewrite (overwrite /
        COW) — exactly Delta's removed-but-not-vacuumed state — so
        resolution falls back to the ``_history/pre*`` snapshots the
        same way ``as_of`` does. Vacuumed files raise, matching Delta's
        streaming-source failure when a replayed version's files are
        gone."""
        t = self.table
        roots = [t.path]
        hist = t._hist_dir()
        if os.path.isdir(hist):
            roots += [os.path.join(hist, d) for d in sorted(os.listdir(hist))]
        by_root: dict[str, list[str]] = {}
        for rel in rels:
            for root in roots:
                cand = os.path.join(root, rel)
                if os.path.isfile(cand):
                    by_root.setdefault(root, []).append(cand)
                    break
            else:
                raise ValueError(
                    f"TableChangeStream: file {rel} no longer retained "
                    f"(vacuumed?) in {t.path} — cannot replay its commit"
                )
        merge = t.properties().get("schema_evolved")
        frames = []
        for root, paths in by_root.items():
            r = t.spark.read
            if t.partition_by:
                r = r.option("basePath", root)
            if merge:
                r = r.option("mergeSchema", "true")
            frames.append(r.parquet(*paths))
        df = frames[0]
        for other in frames[1:]:
            df = df.unionByName(other, allowMissingColumns=True)
        df = t._from_physical(df)
        if seq is not None:
            df = df.withColumn("_commit_seq", F.lit(seq).cast("long"))
        return df

    def _batch_frame(self, emits: list[tuple[int, list[str]]]) -> DataFrame | None:
        emits = [(s, fs) for s, fs in emits if fs]
        if not emits:
            return None
        if not self.with_commit_seq:
            allf = [f for _, fs in emits for f in fs]
            return self._read_files(allf, None)
        out = None
        for s, fs in emits:
            part = self._read_files(fs, s)
            out = part if out is None else out.unionByName(
                part, allowMissingColumns=True
            )
        return out

    # -- the trigger ----------------------------------------------------
    def process_available(
        self, fn: Callable[[DataFrame, int], None]
    ) -> int:
        """Drain all pending commits through ``fn(batch_df, batch_id)``
        — ``Trigger.AvailableNow`` over the commit log. Returns the
        number of non-empty micro-batches delivered. ``batch_id`` is
        the max commit seq of the batch (replay-stable)."""
        pend, by_seq = self._pending()
        if not pend:
            if self.cursor() is None and self.starting_seq == "latest":
                hist = self.table.history()
                if hist:
                    self._save_cursor(hist[-1]["seq"])
            return 0
        first = pend[0]["seq"]
        # files of the commit just before the first pending one (empty
        # when the stream starts at the log's first record)
        prev = by_seq.get(first - 1, [])
        chunk = self.max_commits_per_batch or len(pend)
        n = 0
        for i in range(0, len(pend), chunk):
            group = pend[i : i + chunk]
            emits = []
            for rec in group:
                emits.append((rec["seq"], self._emit_files(rec, prev)))
                prev = rec.get("files", [])
            df = self._batch_frame(emits)
            last = group[-1]["seq"]
            if df is not None:
                fn(df, last)
                n += 1
            # cursor AFTER the callback: a crash in fn re-delivers this
            # batch with the same batch_id on restart
            self._save_cursor(last)
        return n


def stream_table_scd_merge(
    source: ParquetTable,
    target: ParquetTable,
    key_cols: list[str],
    order_col: str,
    checkpoint: str,
    scd_type: int = 1,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    cdf_table: ParquetTable | None = None,
    optimize_every: int | None = None,
    **stream_kwargs,
) -> int:
    """Bronze -> silver in one call: drain ``source``'s pending commits
    into an SCD merge on ``target`` — the table-source twin of
    ``foreach_batch_scd_merge`` (same batch operators, same replay
    guards), mirroring the reference's Delta-to-Delta streaming merges
    (writers/writer.py:695-758 consuming a Delta source stream).

    Returns the number of micro-batches merged. Safe to call on a
    schedule: each call picks up exactly the commits appended since the
    last one (the incremental-ingest heartbeat shape)."""
    from data_ingestion_framework_spark.operators.cdc import change_data_feed
    from data_ingestion_framework_spark.operators.scd import dedupe_latest
    from data_ingestion_framework_spark.sinks.writers import batch_write

    if cdf_table is not None and scd_type != 1:
        raise ValueError("cdf_table is only supported for scd_type=1 merges")
    stream = TableChangeStream(source, checkpoint, **stream_kwargs)

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch_df = transform(batch_df)
        if cdf_table is not None:
            already = any(
                (h.get("metrics") or {}).get("cdf_batch_id") == batch_id
                for h in (cdf_table.history() if cdf_table.exists() else [])
            )
            if not already:
                latest = dedupe_latest(batch_df, key_cols, order_col)
                tgt = target.read() if target.exists() else latest.limit(0)
                feed = change_data_feed(
                    tgt, latest, key_cols, commit_version=batch_id
                )
                cdf_table.append(feed, metrics={"cdf_batch_id": batch_id})
        batch_write(
            batch_df,
            target,
            mode="merge",
            key_cols=key_cols,
            order_col=order_col,
            scd_type=scd_type,
        )
        if optimize_every and batch_id % optimize_every == 0:
            target.optimize()

    return stream.process_available(_upsert)
