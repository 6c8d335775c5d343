"""Minimal Delta Lake transaction-log reader (no delta-spark needed).

Implements the open Delta protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md) far enough
to resolve the ACTIVE file set of a table snapshot and read it as
parquet — the one piece the reference relies on Databricks for
(readers/batch_readers.py:82-86 ``read_delta_path``, ``VERSION AS OF``
in di_landing_to_raw_generic_v2.py:774-794):

- ``_delta_log/NNNNNNNNNNNNNNNNNNNN.json``: line-delimited action
  files. ``add`` registers a data file, ``remove`` tombstones one;
  ``metaData``/``protocol``/``commitInfo``/``txn`` are skipped (we only
  reconstruct the file set — Spark infers the schema from the parquet
  footers themselves).
- ``NNNNNNNNNNNNNNNNNNNN.checkpoint.parquet``: a parquet snapshot of
  the action state; ``_last_checkpoint`` points at the newest one so a
  long log does not have to be replayed from version 0.

Naively reading a Delta directory with ``spark.read.parquet`` is
WRONG — removed files still exist on disk until VACUUM and would
resurrect deleted/overwritten rows. That is exactly the failure mode
this reader closes.

Scale note: log replay is driver-side and proportional to the number of
*actions since the last checkpoint* (Delta itself checkpoints every 10
commits), never to table size. The data read is a plain parquet scan of
the resolved file list, so pushdown/pruning work as usual. Reading the
checkpoint parquet uses pyarrow directly — it is a small metadata file.

Writer support (checkpointing, DVs, column mapping) is intentionally
out of scope: ``ParquetTable`` (tablestore.py) is this engine's native
transactional store; this module is the *interop read path* for
existing Delta tables. Tables using deletion vectors or column mapping
are detected via ``protocol.readerFeatures`` and rejected loudly
rather than read wrong.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_UNSUPPORTED_READER_FEATURES = {"deletionVectors", "columnMapping", "v2Checkpoint"}


class DeltaLogError(ValueError):
    pass


def _log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def is_delta_table(path: str) -> bool:
    return os.path.isdir(_log_dir(path))


def _commit_versions(log_dir: str) -> list[int]:
    out = []
    for f in os.listdir(log_dir):
        base = f.split(".")[0]
        if f.endswith(".json") and base.isdigit() and len(base) == 20:
            out.append(int(base))
    return sorted(out)


def _checkpoint_version_at_or_before(log_dir: str, version: int) -> int | None:
    """Newest classic checkpoint ≤ version. ``_last_checkpoint`` is an
    optimization hint; listing covers time travel to older versions."""
    best = None
    for f in os.listdir(log_dir):
        if f.endswith(".checkpoint.parquet"):
            v = int(f.split(".")[0])
            if v <= version and (best is None or v > best):
                best = v
    return best

def _apply_action(action: dict, live: dict[str, dict]) -> None:
    if "add" in action:
        a = action["add"]
        live[a["path"]] = a
    elif "remove" in action:
        live.pop(action["remove"]["path"], None)
    elif "protocol" in action:
        feats = set(action["protocol"].get("readerFeatures") or [])
        bad = feats & _UNSUPPORTED_READER_FEATURES
        if bad:
            raise DeltaLogError(
                f"Delta reader features not supported by this minimal "
                f"reader: {sorted(bad)} — read with delta-spark instead"
            )


def snapshot_files(path: str, version: int | None = None) -> tuple[int, list[str]]:
    """Resolve ``(version, active data file relative paths)`` for the
    snapshot at ``version`` (default: latest)."""
    log_dir = _log_dir(path)
    if not os.path.isdir(log_dir):
        raise DeltaLogError(f"{path} has no _delta_log — not a Delta table")
    versions = _commit_versions(log_dir)
    if version is None:
        if not versions:
            raise DeltaLogError(f"empty _delta_log in {path}")
        version = versions[-1]
    elif version not in versions and not os.path.isfile(
        os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")
    ):
        raise DeltaLogError(f"version {version} not found in {path} log")

    live: dict[str, dict] = {}
    start = 0
    ckpt = _checkpoint_version_at_or_before(log_dir, version)
    if ckpt is not None:
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            os.path.join(log_dir, f"{ckpt:020d}.checkpoint.parquet")
        ).to_pylist()
        for row in tbl:
            action = {k: v for k, v in row.items() if v is not None}
            _apply_action(action, live)
        start = ckpt + 1

    for v in versions:
        if start <= v <= version:
            with open(os.path.join(log_dir, f"{v:020d}.json")) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        _apply_action(json.loads(line), live)
    return version, sorted(live)


def read_delta_log(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    options: dict | None = None,
) -> DataFrame:
    """Read a Delta table snapshot as a DataFrame by resolving the
    active file set from the transaction log. ``version`` gives
    ``VERSION AS OF`` time travel."""
    _, files = snapshot_files(path, version)
    if not files:
        # empty snapshot: scan zero files but keep a real schema if any
        # parquet exists is impossible — surface it explicitly instead
        raise DeltaLogError(
            f"snapshot of {path} at version {version} has no data files"
        )
    reader = spark.read.options(**(options or {})).option("basePath", path)
    return reader.parquet(*[os.path.join(path, f) for f in files])


def describe_history(path: str) -> list[dict]:
    """Commit summaries from the log — ``DESCRIBE HISTORY`` interop
    (di_landing_to_raw_generic_v2.py:813-891): one record per version
    with operation + operationMetrics from commitInfo, plus add/remove
    counts replayed from the actions themselves."""
    log_dir = _log_dir(path)
    out = []
    for v in _commit_versions(log_dir):
        rec = {"version": v, "operation": None, "operationMetrics": {},
               "n_added": 0, "n_removed": 0}
        with open(os.path.join(log_dir, f"{v:020d}.json")) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "commitInfo" in action:
                    rec["operation"] = action["commitInfo"].get("operation")
                    rec["operationMetrics"] = action["commitInfo"].get(
                        "operationMetrics", {}
                    )
                elif "add" in action:
                    rec["n_added"] += 1
                elif "remove" in action:
                    rec["n_removed"] += 1
        out.append(rec)
    return out
