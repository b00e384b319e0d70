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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_CELL_BUCKETS = 64


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
    return with_derived_keys(spark.read.parquet(path))


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
