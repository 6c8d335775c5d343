"""Delta transaction-log EXPORT: make the table store's tables readable
as Delta tables.

The write-side complement of ``sources/delta_log.py`` (which READS
existing Delta logs): ``export_delta_log`` writes a spec-conformant
``_delta_log`` for a :class:`ParquetTable`'s current state, in place —
the data files are already parquet under the table root, so after the
export any Delta reader (delta-spark, delta-rs, DuckDB's delta
extension) opens the same directory as a Delta table. This is the
reference's deployment direction made portable: its pipelines write
Delta natively (writers/writer.py targets Delta tables throughout); an
engine whose tables any Delta client can read closes the interop loop.

Model: Delta's own ``CONVERT TO DELTA`` — snapshot conversion, not
history replay. The FIRST export writes version 0 with ``protocol`` +
``metaData`` + one ``add`` per live file; each subsequent export
appends one version holding the ``remove``/``add`` DIFF against the
previously exported snapshot (resolved by replaying the exported log
with our own reader — the reader and writer check each other).

Scope note: the LATEST exported snapshot is always faithful. Delta
VERSION AS OF to older exports works only while those files still sit
at their logged paths — this store's rewrites MOVE replaced files into
``_history`` (its own time travel resolves them there), which to a
Delta reader looks like an aggressive VACUUM: old versions' files are
gone from the logged locations. Use ``ParquetTable.as_of`` for
history; use the Delta log for current-state interop.

Only the public Delta protocol (protocol 1/2 actions: add, remove,
metaData, protocol) is emitted. Refused: live deletion vectors (Delta
encodes DVs differently), column mapping, widened schemas, transform
partitions (Delta has no hidden partitioning) — rewrite/converge first.
Identity-partitioned layouts export with ``partitionValues`` parsed
from the directory names.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from data_ingestion_framework_spark.sources import delta_log
from data_ingestion_framework_spark.sources.tablestore import ParquetTable


def _partition_values(rel: str) -> dict[str, str]:
    out = {}
    for comp in rel.split(os.sep)[:-1]:
        if "=" in comp:
            k, v = comp.split("=", 1)
            out[k] = v
    return out


def export_delta_log(table: ParquetTable) -> int:
    """Write/advance the table's ``_delta_log``; returns the exported
    Delta version. Idempotent when nothing changed (re-exporting the
    same snapshot appends no new version)."""
    props = table.properties()
    if props.get("column_mapping") or props.get("dropped_columns"):
        raise ValueError("export_delta_log: column-mapped tables unsupported")
    if props.get("widened_schema"):
        raise ValueError("export_delta_log: type-widened tables unsupported")
    if os.path.isdir(table._dv_dir()) and table._data_files(table._dv_dir()):
        raise ValueError(
            "export_delta_log: live deletion vectors present — compact() "
            "to materialize them first (Delta encodes DVs differently)"
        )
    if table._identity_partition_cols() != table.partition_by:
        raise ValueError(
            "export_delta_log: transform partitions have no Delta "
            "equivalent — rewrite_to_current_spec() on an identity spec"
        )
    if table._is_mixed_spec():
        raise ValueError(
            "export_delta_log: mixed partition-spec eras — "
            "rewrite_to_current_spec() first"
        )

    live = table._live_files()
    log_dir = os.path.join(table.path, "_delta_log")
    ts_ms = int(time.time() * 1000)
    actions: list[dict] = []
    if delta_log.is_delta_table(table.path):
        version, prev = delta_log.snapshot_files(table.path)
        prev_set, live_set = set(prev), set(live)
        if prev_set == live_set:
            return version  # nothing changed since the last export
        next_version = version + 1
        for rel in sorted(prev_set - live_set):
            actions.append(
                {
                    "remove": {
                        "path": rel,
                        "deletionTimestamp": ts_ms,
                        "dataChange": True,
                    }
                }
            )
        new = sorted(live_set - prev_set)
    else:
        next_version = 0
        # the protocol's schemaString is the FULL table schema —
        # partition columns included (they additionally appear in
        # metaData.partitionColumns)
        schema_json = table.read().schema.json()
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": uuid.uuid4().hex,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_json,
                    "partitionColumns": list(table.partition_by),
                    "configuration": {},
                    "createdTime": ts_ms,
                }
            }
        )
        new = sorted(live)
    for rel in new:
        p = os.path.join(table.path, rel)
        actions.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": _partition_values(rel),
                    "size": os.path.getsize(p),
                    "modificationTime": int(os.path.getmtime(p) * 1000),
                    "dataChange": True,
                }
            }
        )
    os.makedirs(log_dir, exist_ok=True)
    tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    dst = os.path.join(log_dir, f"{next_version:020d}.json")
    try:
        os.link(tmp, dst)  # put-if-absent, like the commit log
    except FileExistsError:
        raise RuntimeError(
            f"export_delta_log: version {next_version} already exists — "
            "concurrent exporter?"
        ) from None
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass
    return next_version
