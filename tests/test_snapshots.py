"""Snapshot-log table format (sources/snapshots.py): atomic commits,
time travel, dynamic partition overwrite, expiry, crash/conflict safety.

The Iceberg-layout contract the engine's checkpoint/resume and streaming
sinks assume, implemented as a real transaction log over parquet.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from gfw_raster_analysis_lambda_spark.sources.snapshots import SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, day string, v long")


def test_append_read_and_time_travel(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), partition_by=["day"])
    s1 = t.append(_df(spark, [(1, "d1", 10), (2, "d1", 20)]))
    s2 = t.append(_df(spark, [(3, "d2", 30)]))
    assert (s1, s2) == (1, 2)
    assert {r.k for r in t.read().collect()} == {1, 2, 3}
    assert {r.k for r in t.read(snapshot_id=1).collect()} == {1, 2}
    hist = t.snapshots()
    assert [h["snapshot_id"] for h in hist] == [1, 2]
    assert [h["n_rows"] for h in hist] == [2, 3]
    # as_of the first commit's timestamp resolves to snapshot 1
    as_of = hist[0]["ts"]
    assert {r.k for r in t.read(as_of=as_of).collect()} == {1, 2}


def test_overwrite_partitions_is_idempotent_sink(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), partition_by=["day"])
    t.append(_df(spark, [(1, "d1", 10), (2, "d2", 20)]))
    # replay of day d1 (e.g. a retried streaming batch) replaces, never dups
    t.overwrite_partitions(_df(spark, [(9, "d1", 99)]))
    got = {(r.k, r.day, r.v) for r in t.read().collect()}
    assert got == {(9, "d1", 99), (2, "d2", 20)}
    # and again — byte-for-byte idempotent result set
    t.overwrite_partitions(_df(spark, [(9, "d1", 99)]))
    got2 = {(r.k, r.day, r.v) for r in t.read().collect()}
    assert got2 == got
    # pre-overwrite history is still readable (time travel)
    assert {r.k for r in t.read(snapshot_id=1).collect()} == {1, 2}


def test_partition_filter_prunes_files_from_manifest(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), partition_by=["day"])
    t.append(_df(spark, [(1, "d1", 10), (2, "d2", 20), (3, "d3", 30)]))
    all_files = t.files()
    d2_files = t.files(partition_filter={"day": "d2"})
    assert len(d2_files) < len(all_files) and len(d2_files) >= 1
    got = t.read(partition_filter={"day": "d2"}).collect()
    assert [(r.k, r.v) for r in got] == [(2, 20)]


def test_staged_but_uncommitted_files_are_invisible(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), partition_by=["day"])
    t.append(_df(spark, [(1, "d1", 10)]))
    # simulate a writer that crashed after staging data, before commit
    orphan = _df(spark, [(666, "d1", 0)])
    t._stage(orphan)
    assert {r.k for r in t.read().collect()} == {1}


def test_commit_conflict_retries_to_next_id(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), partition_by=["day"])
    t.append(_df(spark, [(1, "d1", 10)]))
    # a concurrent writer owns snap-2 already
    fake = {"snapshot_id": 2, "parent_id": 1, "ts": 0.0,
            "operation": "append", "manifest": []}
    with open(t._snap_path(2), "w") as f:
        json.dump(fake, f)
    sid = t.append(_df(spark, [(2, "d2", 20)]))
    assert sid == 3
    # the retried commit based itself on the NEW head (snap-2's manifest)
    snap3 = t._load_snapshot(3)
    assert snap3["parent_id"] == 2


def test_expire_snapshots_keeps_referenced_files(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), partition_by=["day"])
    t.append(_df(spark, [(1, "d1", 10)]))          # snap 1
    t.overwrite_partitions(_df(spark, [(2, "d1", 20)]))  # snap 2: drops snap-1 file
    t.append(_df(spark, [(3, "d2", 30)]))          # snap 3
    dropped = t.expire_snapshots(keep_last=2)
    assert dropped["snapshots"] == 1
    assert dropped["files"] == 1  # only snap-1's d1 file was unreferenced
    # head reads unaffected; expired snapshot unreadable
    assert {r.k for r in t.read().collect()} == {2, 3}
    with pytest.raises(FileNotFoundError):
        t.read(snapshot_id=1)
    # snapshot 2 (retained) still reads: its file survived expiry
    assert {r.k for r in t.read(snapshot_id=2).collect()} == {2}
    # all files named by retained manifests exist on disk
    for sid in (2, 3):
        for p in t.files(snapshot_id=sid):
            assert os.path.exists(p)


def test_unpartitioned_table_appends(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"))
    t.append(spark.range(5).select(F.col("id").alias("k")))
    t.append(spark.range(5, 8).select(F.col("id").alias("k")))
    assert t.read().count() == 8
    with pytest.raises(ValueError, match="unpartitioned"):
        t.read(partition_filter={"day": "d1"})
    with pytest.raises(ValueError, match="partitioned"):
        t.overwrite_partitions(spark.range(1).select(F.col("id").alias("k")))


def test_overwrite_all_replaces_everything(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), partition_by=["day"])
    t.append(_df(spark, [(1, "d1", 10), (2, "d2", 20)]))
    t.overwrite_all(_df(spark, [(7, "d9", 70)]))
    assert [(r.k, r.day) for r in t.read().collect()] == [(7, "d9")]
    assert {r.k for r in t.read(snapshot_id=1).collect()} == {1, 2}
