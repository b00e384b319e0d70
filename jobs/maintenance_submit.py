#!/usr/bin/env python
"""spark-submit entry point for snapshot-table maintenance.

The operational companion to sources/snapshots.py: streaming sinks and
frequent small appends accumulate tiny data files and old snapshots;
this job compacts partitions down to a target file count and expires
unreachable snapshots — the `rewriteDataFiles` + `expireSnapshots`
maintenance pair every Iceberg deployment schedules. Ships to a
cluster as:

    python tools/build_dist.py
    spark-submit --master <url> [--num-executors N ...] \\
        --py-files dist/gfw_raster_analysis_lambda_spark.zip \\
        jobs/maintenance_submit.py \\
        --table /data/partials_table \\
        [--files-per-partition 1] [--keep-snapshots 3] \\
        [--report /data/maintenance_report.json]

Prints (and optionally writes) one JSON report line: snapshot head
before/after, partitions compacted, snapshots/files reclaimed — the
metrics row an orchestration DAG asserts on.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--files-per-partition", type=int, default=1)
    ap.add_argument("--keep-snapshots", type=int, default=3)
    ap.add_argument("--report", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from gfw_raster_analysis_lambda_spark.sources.snapshots import SnapshotTable

    spark = SparkSession.builder.appName("snapshot-maintenance").getOrCreate()
    t = SnapshotTable.load(spark, args.table)
    head_before = t.current_snapshot_id()
    n_files_before = len(t.files())

    compact_sid = t.compact_files(files_per_partition=args.files_per_partition)
    dropped = t.expire_snapshots(keep_last=args.keep_snapshots)

    report = {
        "table": args.table,
        "head_before": head_before,
        "files_before": n_files_before,
        "compacted_snapshot": compact_sid,
        "head_after": t.current_snapshot_id(),
        "files_after": len(t.files()),
        "expired_snapshots": dropped["snapshots"],
        "reclaimed_files": dropped["files"],
    }
    line = json.dumps(report)
    print(line)
    if args.report:
        with open(args.report, "w") as f:
            f.write(line)
    spark.stop()


if __name__ == "__main__":
    main()
