"""Distributed global ranking primitives.

``F.dense_rank().over(Window.orderBy(...))`` with no partition key is a
single-task bottleneck — the one Spark window shape that does NOT scale.
:func:`distributed_dense_rank` is the TeraSort-style replacement: range-
partition the DISTINCT keys (so every worker holds a contiguous,
disjoint key range), rank locally, and add per-partition offsets
computed from the O(num_partitions) count table — the only thing that
ever reaches the driver. Used by the suffix-array prefix-doubling
construction (operators/text.py) where a global dense rank runs once
per doubling round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_dense_rank(
    df: DataFrame,
    cols: "list[str]",
    out: str = "rank",
    num_parts: int | None = None,
) -> DataFrame:
    """Attach a global DENSE rank (1-based, ordered by ``cols`` asc,
    equal keys share a rank) without a single-partition window.

    Plan: distinct keys -> repartitionByRange(cols) -> local row_number
    within each range partition (keys are distinct, so row_number ==
    dense rank locally) + an offset per partition derived from the
    partition-count table (<= num_parts rows collected — never keys).
    The ranked key table joins back to ``df`` on ``cols``; Catalyst
    picks broadcast vs shuffle join by its own size estimate.

    Rows where any ranking column is NULL are rejected — encode
    sentinels explicitly (the caller knows its domain; silent NULL
    ordering is how ranks diverge between engines).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    for c in cols:
        if df.filter(F.col(c).isNull()).limit(1).count() > 0:
            raise ValueError(
                f"distributed_dense_rank: NULL in ranking column {c!r}; "
                "encode an explicit sentinel instead"
            )
    n = num_parts or df.sparkSession.sparkContext.defaultParallelism
    keys = df.select(*cols).distinct()
    keys = keys.repartitionByRange(n, *[F.col(c) for c in cols])
    # materialize ONCE: the range partitioner samples its boundaries, so
    # re-executing the lineage for the count job and the window job could
    # land keys in different partitions than the offsets were built for
    keys = keys.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in keys.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.lit(0)
    for pid, o in offsets.items():
        if o:
            off = F.when(F.col("__pid") == pid, F.lit(o)).otherwise(off)
    w = Window.partitionBy("__pid").orderBy(*[F.col(c).asc() for c in cols])
    ranked = keys.withColumn(
        out, (F.row_number().over(w) + off).cast("long")
    ).drop("__pid")
    return df.join(ranked, cols)
