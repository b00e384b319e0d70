"""Incrementally-maintained focal statistics over a growing/changing
tile corpus (Structured Streaming + the halo-exchange focal kernel).

A focal output depends on a tile AND its 8 neighbors, so a naive
"recompute what arrived" stream is WRONG the moment a neighbor lands in
a different micro-batch. This module composes two round-4 pieces into
the correct incremental shape:

- ``operators.focal.touched_focal_cells`` semantics give the exact
  invalidation set: a changed tile invalidates its own cell plus the
  ring around it (the cells whose windows read the changed pixels).
- The ``incremental.py`` recompute-from-source + dynamic-partition-
  overwrite pattern makes replays idempotent: the micro-batch is only a
  CHANGE SIGNAL (which cells got new tiles); the recompute reads the
  full corpus pruned to the needed cells, so a neighbor that arrived in
  an earlier batch is always visible.

Per batch the work is O(touched cells x 9), never O(corpus): the
recompute set is ring(changed), its INPUT tile set is ring(ring(changed))
— both pruned into the parquet scan as one IN-list — and the focal
kernel's one Exchange carries only those cells' strips + encoded
payloads.

Delivery guarantee: end-to-end EXACTLY-ONCE by the same composition as
``incremental.py`` — exactly-once file-source input assignment +
idempotent recompute-from-source output keyed by ``_fcell`` dynamic
partition overwrite. ``foreachBatch`` is at-least-once; the overwrite
absorbs the retry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import grid as G
from ..operators import focal
from ..plans.planner import _in_long_set
from ..sources.images import with_derived_keys

IMAGES_SCHEMA_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def _ring(cells: "set[int]") -> "set[int]":
    """Driver-side closed 1-ring of a (small) changed-cell id set — the
    same packed-id bit arithmetic as ``focal.touched_focal_cells``, kept
    on the driver because the change signal is already collected."""
    yb = G._Y_BITS
    return {
        c + (dx << yb) + dy
        for c in cells
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    }


def incremental_focal(
    spark: SparkSession,
    images_dir: str,
    layer: str,
    out_dir: str,
    radius: int = 1,
    trigger_once: bool = True,
    kernel=None,
):
    """Start (and by default run-once) the incremental focal stream over
    ``images_dir`` for one ``layer``. Current state lives under
    ``{out_dir}/focal/layer={layer}`` partitioned by ``_fcell``; read it
    with :func:`read_incremental_focal`. Returns the StreamingQuery.

    ``kernel`` generalizes the maintained table to ANY member of the
    halo-exchange focal family: a callable ``tiles_df -> DataFrame``
    whose output has a ``cell_id`` column — e.g.
    ``focal.terrain_stats``, ``focal.focal_mode`` (partially applied),
    or ``lambda df: focal.proximity_stats(df, [20], radius=8)``. The
    invalidation contract is the same for all of them (an output cell
    reads at most its 1-ring of neighbor tiles, since every kernel
    radius is <= the tile size); default is ``focal_stats(radius)``.
    Use a distinct ``out_dir`` per kernel — the state table's schema is
    the kernel's."""
    fdir = f"{out_dir}/focal/layer={layer}"

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        changed = {
            int(r["cell_id"])
            for r in with_derived_keys(batch_df)
            .filter(F.col("layer") == layer)
            .select("cell_id").distinct().collect()
        }
        if not changed:
            return
        out_cells = _ring(changed)          # outputs to recompute
        in_cells = _ring(out_cells)         # tiles those outputs read
        imgs = with_derived_keys(
            spark.read.schema(IMAGES_SCHEMA_DDL).parquet(images_dir)
        ).filter(
            (F.col("layer") == layer) & _in_long_set("cell_id", in_cells)
        )
        run = kernel if kernel is not None else (
            lambda df: focal.focal_stats(df, radius=radius)
        )
        result = run(imgs).filter(_in_long_set("cell_id", out_cells))
        (
            result.withColumn("_fcell", F.col("cell_id"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_fcell")
            .parquet(fdir)
        )

    stream = (
        spark.readStream.schema(IMAGES_SCHEMA_DDL)
        .parquet(images_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", f"{out_dir}/checkpoint/focal_{layer}")
    )
    if trigger_once:
        stream = stream.trigger(availableNow=True)
    return stream.start()


def read_incremental_focal(spark: SparkSession, out_dir: str, layer: str) -> DataFrame:
    """The stream's current focal table (one row per cell that has ever
    had a tile)."""
    return (
        spark.read.parquet(f"{out_dir}/focal/layer={layer}")
        .drop("_fcell")
    )
