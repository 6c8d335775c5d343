"""Persistent streaming schema registry — OSS parity for Auto Loader's
``cloudFiles.schemaLocation`` (+ schema evolution + rescued data).

Reference parity: readers/streaming_readers.py:44-51 snapshots the
schema per run, and db-config/db_config_current_schema.py:93 persists
the *current schema* per table so later runs evolve rather than
re-infer. Here the registry is a versioned directory of JSON schema
files (``{location}/_schemas/00000000.json`` ...) exactly like Auto
Loader's ``_schemas`` log:

- run 1 infers and persists version 0;
- run N snapshots again and MERGES into the registered schema: known
  fields keep their registered type (no silent type flips mid-stream),
  genuinely new fields are appended nullable, and a new version is
  persisted only when something changed;
- field order is stable across versions (existing first, new appended),
  so a checkpointed sink keyed on the old columns keeps aligning.

Scale note: the registry read/write is a single tiny JSON file per run
(control-plane); the expensive part — re-inferring from data files — is
the snapshot read the caller already does, and an explicit registry hit
means later runs can skip inference entirely via ``latest()``.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaRegistry:
    """Versioned on-disk schema log for one streaming source."""

    def __init__(self, location: str):
        self.dir = os.path.join(location, "_schemas")

    # -- log access ----------------------------------------------------------
    def versions(self) -> list[int]:
        if not os.path.isdir(self.dir):
            return []
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.dir)
            if f.endswith(".json") and not f.startswith(".")
        )

    def load(self, version: int) -> T.StructType:
        with open(os.path.join(self.dir, f"{version:08d}.json")) as f:
            return T.StructType.fromJson(json.load(f))

    def latest(self) -> T.StructType | None:
        vs = self.versions()
        return self.load(vs[-1]) if vs else None

    def _persist(self, schema: T.StructType) -> int:
        os.makedirs(self.dir, exist_ok=True)
        v = (self.versions()[-1] + 1) if self.versions() else 0
        tmp = os.path.join(self.dir, f".tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(schema.jsonValue(), f)
        os.rename(tmp, os.path.join(self.dir, f"{v:08d}.json"))
        return v

    # -- evolution -----------------------------------------------------------
    def evolve(self, inferred: T.StructType) -> T.StructType:
        """Merge a freshly inferred schema into the registered one and
        persist a new version iff it changed. Registered field types
        win; new fields append as nullable."""
        current = self.latest()
        if current is None:
            self._persist(inferred)
            return inferred
        known = {f.name for f in current.fields}
        added = [
            T.StructField(f.name, f.dataType, True)
            for f in inferred.fields
            if f.name not in known
        ]
        if not added:
            return current
        merged = T.StructType(list(current.fields) + added)
        self._persist(merged)
        return merged


def read_json_stream_with_rescue(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    options: dict[str, str] | None = None,
    rescued_column: str = "_rescued_data",
) -> DataFrame:
    """JSON file stream that parses against ``schema`` and captures any
    keys the schema does not know into ``rescued_column`` (JSON object
    string, NULL when nothing was rescued) — Auto Loader's
    ``_rescued_data`` semantics without Databricks.

    Plan shape: one text scan, two ``from_json`` projections (typed +
    string map), a ``map_filter`` against the known-key set — all JVM
    expressions, no Python in the hot path, fully streaming-safe
    (stateless projection)."""
    known = F.array(*[F.lit(f.name) for f in schema.fields])
    raw = (
        spark.readStream.options(**(options or {}))
        .text(path)
        .where(F.length(F.trim(F.col("value"))) > 0)
    )
    parsed = raw.select(
        F.from_json(F.col("value"), schema).alias("__row"),
        F.map_filter(
            F.from_json(F.col("value"), "map<string,string>"),
            lambda k, _v: ~F.array_contains(known, k),
        ).alias("__extra"),
    )
    return parsed.select(
        "__row.*",
        F.when(F.size(F.map_keys(F.col("__extra"))) > 0, F.to_json(F.col("__extra")))
        .otherwise(F.lit(None).cast("string"))
        .alias(rescued_column),
    )
