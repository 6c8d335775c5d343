"""Minimal Delta transaction-log reader: snapshots resolve add/remove
actions (a naive parquet read would resurrect removed files), version
time travel, checkpoint replay, DESCRIBE HISTORY interop, and loud
rejection of reader features we can't honor."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_ingestion_framework_spark.sources.batch import read_delta_path
from data_ingestion_framework_spark.sources.delta_log import (
    DeltaLogError,
    describe_history,
    read_delta_log,
    snapshot_files,
)


def _data_file(root, name, ids):
    pq.write_table(pa.table({"id": pa.array(ids, pa.int64())}), str(root / name))


def _commit(log_dir, version, actions):
    (log_dir / f"{version:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions)
    )


@pytest.fixture()
def delta_table(tmp_path):
    """v0: add f0,f1 · v1: overwrite f1 -> f2 (remove+add)."""
    root = tmp_path / "dt"
    root.mkdir()
    log = root / "_delta_log"
    log.mkdir()
    _data_file(root, "f0.parquet", [1, 2])
    _data_file(root, "f1.parquet", [3, 4])
    _data_file(root, "f2.parquet", [30, 40])
    _commit(
        log,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {"id": "m0", "format": {"provider": "parquet"}}},
            {"commitInfo": {"operation": "WRITE", "operationMetrics": {"numFiles": "2"}}},
            {"add": {"path": "f0.parquet", "size": 1, "dataChange": True}},
            {"add": {"path": "f1.parquet", "size": 1, "dataChange": True}},
        ],
    )
    _commit(
        log,
        1,
        [
            {"commitInfo": {"operation": "MERGE", "operationMetrics": {"numTargetRowsUpdated": "2"}}},
            {"remove": {"path": "f1.parquet", "dataChange": True}},
            {"add": {"path": "f2.parquet", "size": 1, "dataChange": True}},
        ],
    )
    return root


def test_snapshot_skips_removed_files(spark, delta_table):
    version, files = snapshot_files(str(delta_table))
    assert version == 1 and files == ["f0.parquet", "f2.parquet"]
    got = sorted(r["id"] for r in read_delta_log(spark, str(delta_table)).collect())
    assert got == [1, 2, 30, 40]
    # the trap this reader exists to close: raw parquet resurrects f1
    naive = sorted(r["id"] for r in spark.read.parquet(str(delta_table)).collect())
    assert naive == [1, 2, 3, 4, 30, 40]


def test_version_as_of(spark, delta_table):
    _, files = snapshot_files(str(delta_table), version=0)
    assert files == ["f0.parquet", "f1.parquet"]
    got = sorted(
        r["id"] for r in read_delta_log(spark, str(delta_table), version=0).collect()
    )
    assert got == [1, 2, 3, 4]


def test_read_delta_path_dispatch(spark, delta_table, tmp_path):
    # delta-format source absent in this env -> log reader path
    got = sorted(r["id"] for r in read_delta_path(spark, str(delta_table)).collect())
    assert got == [1, 2, 30, 40]
    # non-delta directory -> plain parquet fallback
    plain = tmp_path / "plain"
    plain.mkdir()
    _data_file(plain, "a.parquet", [7])
    assert [r["id"] for r in read_delta_path(spark, str(plain)).collect()] == [7]


def test_checkpoint_replay(spark, delta_table):
    log = delta_table / "_delta_log"
    # classic checkpoint at v1 = full action state as one parquet
    ckpt = pa.table(
        {
            "add": pa.array(
                [{"path": "f0.parquet"}, {"path": "f2.parquet"}, None],
                pa.struct([("path", pa.string())]),
            ),
            "remove": pa.array(
                [None, None, {"path": "f1.parquet"}],
                pa.struct([("path", pa.string())]),
            ),
        }
    )
    pq.write_table(ckpt, str(log / f"{1:020d}.checkpoint.parquet"))
    (log / "_last_checkpoint").write_text(json.dumps({"version": 1, "size": 3}))
    # v2 after the checkpoint
    _data_file(delta_table, "f3.parquet", [500])
    _commit(
        log,
        2,
        [
            {"commitInfo": {"operation": "WRITE"}},
            {"add": {"path": "f3.parquet", "dataChange": True}},
        ],
    )
    _, files = snapshot_files(str(delta_table))
    assert files == ["f0.parquet", "f2.parquet", "f3.parquet"]
    got = sorted(r["id"] for r in read_delta_log(spark, str(delta_table)).collect())
    assert got == [1, 2, 30, 40, 500]


def test_describe_history(delta_table):
    hist = describe_history(str(delta_table))
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[0]["operation"] == "WRITE" and hist[0]["n_added"] == 2
    assert hist[1]["operation"] == "MERGE"
    assert hist[1]["n_added"] == 1 and hist[1]["n_removed"] == 1
    assert hist[1]["operationMetrics"]["numTargetRowsUpdated"] == "2"


def test_unsupported_reader_features_rejected(delta_table):
    _commit(
        delta_table / "_delta_log",
        2,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "readerFeatures": ["deletionVectors"],
                }
            }
        ],
    )
    with pytest.raises(DeltaLogError, match="deletionVectors"):
        snapshot_files(str(delta_table))


def test_missing_version_raises(delta_table):
    with pytest.raises(DeltaLogError, match="version 9"):
        snapshot_files(str(delta_table), version=9)
