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


def test_zonal_checkpoint_snapshot_resume(spark, corpus, tmp_path):
    """The snapshot-native resume path: one atomic commit per run, the
    committed partials ARE the done set, replayed run_ids idempotent."""
    from gfw_raster_analysis_lambda_spark import checkpoint, oracle
    from gfw_raster_analysis_lambda_spark.plans.ir import Aggregate, ZonalQuery
    from gfw_raster_analysis_lambda_spark.sources import fixtures
    from gfw_raster_analysis_lambda_spark.sources.images import read_images
    from tests.test_zonal_e2e import assert_frames_match

    images = read_images(spark, corpus["images"])
    env = fixtures.fixture_environment()
    aois = fixtures.fixture_aois()
    q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year",),
        aggregates=(Aggregate("sum", "area__ha", "a"), Aggregate("count", None, "n")),
    )
    ck = str(tmp_path / "snapck")
    aoi1 = spark.createDataFrame([aois[0]], "aoi_id string, geom_wkb binary")
    checkpoint.run_zonal_checkpointed_snapshot(
        spark, images, aoi1, q, env, fixtures.GRID.name, ck, run_id="r1"
    ).toPandas()

    fp = checkpoint.query_fingerprint(q, env, fixtures.GRID.name)
    pt = SnapshotTable.load(spark, f"{ck}/partials_q_{fp}")
    snaps_after_r1 = pt.current_snapshot_id()
    assert snaps_after_r1 == 1

    # superset resume: only the new AOI computes (one more commit)
    aoi2 = spark.createDataFrame(aois[:2], "aoi_id string, geom_wkb binary")
    r2 = checkpoint.run_zonal_checkpointed_snapshot(
        spark, images, aoi2, q, env, fixtures.GRID.name, ck, run_id="r2"
    ).toPandas()
    assert pt.current_snapshot_id() == 2
    assert {r.run_id for r in pt.read().select("run_id").distinct().collect()} == {"r1", "r2"}

    # pure cache hit: NO new snapshot commit
    r3 = checkpoint.run_zonal_checkpointed_snapshot(
        spark, images, aoi2, q, env, fixtures.GRID.name, ck, run_id="r3"
    ).toPandas()
    assert pt.current_snapshot_id() == 2

    # a crashed writer that staged but never committed is invisible
    orphan = pt.read().limit(5).withColumn("run_id", F.lit("crashed"))
    pt._stage(orphan)
    r4 = checkpoint.run_zonal_checkpointed_snapshot(
        spark, images, aoi2, q, env, fixtures.GRID.name, ck, run_id="r4"
    ).toPandas()
    assert pt.current_snapshot_id() == 2  # still nothing new to do

    exp = oracle.run_oracle(q, env, aois[:2])
    for got in (r2, r3, r4):
        assert_frames_match(
            got.sort_values(["aoi_id", "tcl_year"]).reset_index(drop=True),
            exp.sort_values(["aoi_id", "tcl_year"]).reset_index(drop=True),
        )

    # lineage table has per-run metrics and queryable snapshot history
    lt = SnapshotTable.load(spark, f"{ck}/lineage")
    lin = lt.read().toPandas()
    assert set(lin["run_id"]) == {"r1", "r2"}
    assert (lin["kernel_ms"] > 0).all()
    assert [s["operation"] for s in lt.snapshots()] == ["overwrite", "overwrite"]


def test_incremental_zonal_snapshot_sink_time_travel(spark, corpus, tmp_path):
    """Streaming sink through SnapshotTable: idempotent replays AND the
    zonal result as-of any past micro-batch stays queryable."""
    import numpy as np

    from gfw_raster_analysis_lambda_spark.api import run_zonal_query
    from gfw_raster_analysis_lambda_spark.plans.ir import (
        Aggregate,
        ZonalQuery,
    )
    from gfw_raster_analysis_lambda_spark.sources import fixtures
    from gfw_raster_analysis_lambda_spark.sources.images import read_images
    from gfw_raster_analysis_lambda_spark.streaming.incremental import (
        incremental_zonal,
        query_fingerprint,
        read_incremental_result,
    )

    env = fixtures.fixture_environment()
    aoi = spark.read.parquet(corpus["aoi"])
    q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year",),
        aggregates=(
            Aggregate("sum", "area__ha", "loss_ha"),
            Aggregate("count", None, "n"),
        ),
    )
    rows = fixtures.generate_images_rows()
    wave1 = [r for r in rows if r[0].startswith("tcl_year/")]
    wave2 = [r for r in rows if not r[0].startswith("tcl_year/")]
    stream_dir = str(tmp_path / "stream_images")
    out_dir = str(tmp_path / "inc")
    os.makedirs(stream_dir, exist_ok=True)

    def run(batch_rows):
        if batch_rows:
            spark.createDataFrame(
                batch_rows, fixtures.IMAGES_SCHEMA
            ).coalesce(1).write.mode("append").parquet(stream_dir)
        incremental_zonal(
            spark, stream_dir, aoi, q, env, fixtures.GRID.name, out_dir,
            use_snapshots=True,
        ).awaitTermination(120)

    def result(**kw):
        return (
            read_incremental_result(
                spark, q, env, fixtures.GRID.name, out_dir,
                use_snapshots=True, **kw)
            .toPandas().sort_values(["aoi_id", "tcl_year"])
            .reset_index(drop=True)
        )

    run(wave1)
    got1 = result()
    fp = query_fingerprint(q, env, fixtures.GRID.name)
    t = SnapshotTable.load(spark, f"{out_dir}/partials/q={fp}.snap")
    sid1 = t.current_snapshot_id()
    assert sid1 >= 1

    run(wave2)
    got2 = result()
    exp = (
        run_zonal_query(
            spark, read_images(spark, corpus["images"]), aoi, q, env,
            fixtures.GRID.name)
        .toPandas().sort_values(["aoi_id", "tcl_year"]).reset_index(drop=True)
    )
    assert got2["n"].tolist() == exp["n"].tolist()
    np.testing.assert_allclose(got2["loss_ha"], exp["loss_ha"], rtol=1e-9)

    # TIME TRAVEL: the result as of the wave-1 commit is still got1
    back = result(snapshot_id=sid1)
    assert back["n"].tolist() == got1["n"].tolist()

    # replay with no new files: no new snapshot, result unchanged
    head = t.current_snapshot_id()
    run([])
    assert t.current_snapshot_id() == head
    assert result()["n"].tolist() == got2["n"].tolist()


def test_changes_incremental_consumption(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), partition_by=["day"])
    t.append(_df(spark, [(1, "d1", 10)]))
    t.append(_df(spark, [(2, "d1", 20), (3, "d2", 30)]))
    t.append(_df(spark, [(4, "d3", 40)]))
    # consumer processed snapshot 1: reads exactly what 2..3 added
    assert {r.k for r in t.changes(1).collect()} == {2, 3, 4}
    assert {r.k for r in t.changes(1, to_id=2).collect()} == {2, 3}
    assert {r.k for r in t.changes(0, to_id=1).collect()} == {1}
    with pytest.raises(ValueError, match="no rows added"):
        t.changes(3)
    # overwrite: adds rewritten rows, removals visible via removed_files
    t.overwrite_partitions(_df(spark, [(9, "d1", 99)]))
    assert {r.k for r in t.changes(3).collect()} == {9}
    assert len(t.removed_files(3)) == 2  # d1 had two files (snap 1 + 2)


def test_compact_files_preserves_content_and_history(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), partition_by=["day"])
    for i in range(4):  # 4 small appends into the same partition
        t.append(_df(spark, [(i, "d1", i * 10)]))
    t.append(_df(spark, [(100, "d2", 1)]))
    before = {(r.k, r.day, r.v) for r in t.read().collect()}
    n_files_before = len(t.files(partition_filter={"day": "d1"}))
    assert n_files_before == 4
    sid = t.compact_files(files_per_partition=1)
    assert sid == t.current_snapshot_id()
    assert len(t.files(partition_filter={"day": "d1"})) == 1
    # logical content identical; pre-compaction snapshots still read
    assert {(r.k, r.day, r.v) for r in t.read().collect()} == before
    assert {r.k for r in t.read(snapshot_id=2).collect()} == {0, 1}
    # d2 (a single file) untouched
    assert t.compact_files(files_per_partition=1) is None
    # expiry then reclaims the replaced small files
    dropped = t.expire_snapshots(keep_last=1)
    assert dropped["files"] >= 4
    assert {(r.k, r.day, r.v) for r in t.read().collect()} == before


def test_spark_submit_maintenance(spark, tmp_path):
    """maintenance_submit.py through a real spark-submit --py-files run:
    compaction + expiry on a fragmented table, logical content intact."""
    import json as _json
    import os
    import subprocess
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import build_dist

    tdir = str(tmp_path / "frag")
    t = SnapshotTable.create(spark, tdir, partition_by=["day"])
    for i in range(5):
        t.append(_df(spark, [(i, "d1", i), (100 + i, "d2", i)]))
    before = {(r.k, r.day, r.v) for r in t.read().collect()}

    zip_path = build_dist.build(str(tmp_path / "engine.zip"))
    report_path = str(tmp_path / "report.json")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=2",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "maintenance_submit.py"),
            "--table", tdir, "--files-per-partition", "1",
            "--keep-snapshots", "1", "--report", report_path,
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    rep = _json.load(open(report_path))
    assert rep["head_before"] == 5 and rep["compacted_snapshot"] == 6
    assert rep["files_after"] == 2  # one file per day partition
    # keep only the compacted head: all 5 append snapshots expire and
    # their 10 small files are unreferenced -> reclaimed
    assert rep["expired_snapshots"] == 5 and rep["reclaimed_files"] == 10
    assert {(r.k, r.day, r.v) for r in t.read().collect()} == before


def test_concurrent_appends_all_commit(spark, tmp_path):
    """8 threads append concurrently: the O_EXCL CAS serializes them —
    every commit lands, no rows lost, snapshot ids are a clean 1..8."""
    import threading

    t = SnapshotTable.create(spark, str(tmp_path / "t"), partition_by=["day"])
    errs = []

    def writer(i):
        try:
            t.append(_df(spark, [(i, f"d{i % 3}", i * 10)]))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert t.current_snapshot_id() == 8
    assert {r.k for r in t.read().collect()} == set(range(8))
    # parent chain is a clean linear history
    hist = t.snapshots()
    assert [h["snapshot_id"] for h in hist] == list(range(1, 9))
    assert [h["parent_id"] for h in hist] == [None] + list(range(1, 8))


def test_schema_evolution_additive_column(spark, tmp_path):
    """An append carrying a new column evolves the table: old files read
    back with NULLs (Iceberg add-column semantics), time travel to the
    pre-evolution snapshot keeps the old schema."""
    t = SnapshotTable.create(spark, str(tmp_path / "t"), partition_by=["day"])
    t.append(_df(spark, [(1, "d1", 10)]))
    evolved = spark.createDataFrame(
        [(2, "d2", 20, "en")], "k long, day string, v long, lang string"
    )
    t.append(evolved)
    got = {r.k: r for r in t.read().collect()}
    assert set(t.read().columns) == {"k", "day", "v", "lang"}
    assert got[1].lang is None and got[2].lang == "en"
    assert "lang" not in t.read(snapshot_id=1).columns


def test_tags_named_refs(spark, tmp_path):
    """Iceberg-style tags: pin a training cut by name, read it forever
    (until expiry), re-tag moves the name."""
    t = SnapshotTable.create(spark, str(tmp_path / "t"), partition_by=["day"])
    t.append(_df(spark, [(1, "d1", 10)]))
    t.tag("train-v1")
    t.append(_df(spark, [(2, "d2", 20)]))
    assert {r.k for r in t.read(tag="train-v1").collect()} == {1}
    assert {r.k for r in t.read().collect()} == {1, 2}
    t.tag("train-v1", 2)  # re-tag
    assert {r.k for r in t.read(tag="train-v1").collect()} == {1, 2}
    assert t.tags() == {"train-v1": 2}
    with pytest.raises(ValueError, match="unknown tag"):
        t.read(tag="nope")
    with pytest.raises(ValueError, match="exactly one"):
        t.read(tag="train-v1", snapshot_id=1)
    with pytest.raises(ValueError, match="no snapshot"):
        t.tag("bad", 99)


def test_delete_partitions_logical_tombstone(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), partition_by=["day"])
    t.append(_df(spark, [(1, "d1", 10), (2, "d2", 20), (3, "d3", 30)]))
    sid = t.delete_partitions([{"day": "d1"}, {"day": "d3"}])
    assert sid == 2
    assert {r.k for r in t.read().collect()} == {2}
    # audit trail: pre-delete snapshot still reads everything
    assert {r.k for r in t.read(snapshot_id=1).collect()} == {1, 2, 3}
    # the files exist until expiry reclaims them
    assert len(t.files(snapshot_id=1)) == 3
    dropped = t.expire_snapshots(keep_last=1)
    assert dropped["files"] == 2
    with pytest.raises(ValueError, match="all partition cols"):
        t.delete_partitions([{}])
