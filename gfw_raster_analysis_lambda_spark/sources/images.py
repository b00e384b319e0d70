"""Images corpus table: read/derive/partition.

The stored schema is exactly the input hint:
``(image_id string, bytes binary, w int, h int, fmt string,
caption string, phash long)``.

The engine derives ``layer`` and ``cell_id`` from ``image_id``
(``"{layer}/{cell_id:016x}"``) with JVM-side expressions — no UDF — so
Catalyst can prune and push down on them. At production scale the corpus
would be an Iceberg table partitioned by ``bucket(N, cell_id)`` with a
``layer`` identity partition; this environment has no Iceberg runtime jar,
so we emulate the layout with parquet partitioned by ``layer`` and a
``cell_bucket`` column (same pruning behavior: layer pruning via partition
directories, cell pruning via parquet row-group min/max on the sorted
``cell_id``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_CELL_BUCKETS = 64
_LAYOUT_SIDECAR = "_layout.json"


def with_derived_keys(images: DataFrame) -> DataFrame:
    """Attach engine-derived ``layer`` / ``cell_id`` columns (pure Catalyst
    expressions: split + hex parse; conv() handles the 016x suffix)."""
    return images.withColumn(
        "layer", F.substring_index("image_id", "/", 1)
    ).withColumn(
        "cell_id",
        F.conv(F.substring_index("image_id", "/", -1), 16, 10).cast("long"),
    )


def read_images(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    if "cell_id" in df.columns and "layer" in df.columns:
        # engine-written layout stores the derived keys as real columns:
        # keep them so layer/cell_id predicates push down to parquet
        # row-group stats (re-deriving via withColumn would turn them into
        # expressions over image_id and kill the pushdown)
        return df
    return with_derived_keys(df)


def write_images_partitioned(images: DataFrame, path: str) -> None:
    """Production-layout writer: partition directories by layer, bucket-key
    by cell, sort within files by cell_id for row-group pruning + spatial
    locality (cell ids are row-major space-filling)."""
    (
        with_derived_keys(images)
        .withColumn("cell_bucket", F.pmod(F.hash("cell_id"), F.lit(N_CELL_BUCKETS)))
        .repartition("layer", "cell_bucket")
        .sortWithinPartitions("cell_id")
        .write.mode("overwrite")
        .partitionBy("layer")
        .parquet(path)
    )


def write_images_cell_sorted(images: DataFrame, path: str, n_files: int = 64) -> None:
    """Cell-COLOCATED layout for the zero-shuffle zonal path: every row of
    a cell (all layers) lands in the same file, contiguous.

    ``repartitionByRange(cell_id)`` gives each file a disjoint cell range
    and ``sortWithinPartitions(cell_id, layer)`` makes each cell's layer
    rows adjacent, so any task's row stream presents whole cells
    contiguously — the contract planner._streaming_cells relies on. The
    Iceberg equivalent is ``PARTITIONED BY bucket(N, cell_id)`` with a
    ``cell_id, layer`` sort order. A ``_layout.json`` sidecar records the
    guarantee for readers."""
    (
        with_derived_keys(images)
        .repartitionByRange(n_files, "cell_id")
        .sortWithinPartitions("cell_id", "layer")
        .write.mode("overwrite")
        .parquet(path)
    )
    with open(os.path.join(path, _LAYOUT_SIDECAR), "w") as f:
        json.dump({"cell_sorted": True, "sorted_by": ["cell_id", "layer"]}, f)


def images_cell_sorted(path: str) -> bool:
    """True when the parquet dir was written by write_images_cell_sorted
    (safe to run the colocated zonal strategy)."""
    try:
        with open(os.path.join(path, _LAYOUT_SIDECAR)) as f:
            return bool(json.load(f).get("cell_sorted"))
    except (OSError, ValueError):
        return False
