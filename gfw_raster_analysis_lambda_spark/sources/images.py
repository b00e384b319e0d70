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
    sorted_layout = images_cell_sorted(path)
    if sorted_layout:
        # the colocated zonal strategy depends on whole-cell-per-task scans;
        # make the session split-safe BEFORE any plan over this table
        ensure_colocated_split_safe(spark, path)
    df = spark.read.parquet(path)
    if not ("cell_id" in df.columns and "layer" in df.columns):
        # engine-written layout stores the derived keys as real columns:
        # keep them so layer/cell_id predicates push down to parquet
        # row-group stats (re-deriving via withColumn would turn them into
        # expressions over image_id and kill the pushdown)
        df = with_derived_keys(df)
    if sorted_layout:
        # tag the frame so the planner's auto strategy can take the
        # zero-shuffle colocated plan without the caller asking (the tag
        # does not survive further transformations, which is correct: a
        # filtered/reshaped frame no longer guarantees the scan layout —
        # except planner-side pushdowns, which filter on cell/layer only
        # and preserve file order)
        df._gfw_cell_sorted = True
    return df


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
    # record the largest data file so readers can guarantee one-file-per-
    # task scans (ensure_colocated_split_safe); parquet is splittable and
    # Spark's FilePartition will otherwise split any file larger than
    # min(maxPartitionBytes, max(openCostInBytes, bytesPerCore)) across
    # tasks, breaking the whole-cells-per-partition contract
    max_bytes = _max_data_file_bytes(images.sparkSession, path)
    with open(os.path.join(path, _LAYOUT_SIDECAR), "w") as f:
        json.dump(
            {
                "cell_sorted": True,
                "sorted_by": ["cell_id", "layer"],
                "max_file_bytes": max_bytes,
            },
            f,
        )


def _max_data_file_bytes(spark: SparkSession, path: str) -> int:
    """Largest data file in a table directory, via the Hadoop FileSystem
    API (works for local paths and object stores alike)."""
    sc = spark.sparkContext
    jvm = sc._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    best = 0
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if status.isFile() and not name.startswith(("_", ".")):
            best = max(best, int(status.getLen()))
    return best


def ensure_colocated_split_safe(spark: SparkSession, path: str) -> int:
    """Guarantee that a scan of the cell-sorted layout never splits one
    file across tasks (planner._streaming_cells requires each cell's rows
    contiguous within one task's stream; a cell straddling a split would be
    processed twice, each half zero-filling the other's layers — silently
    wrong results).

    Raises ``spark.sql.files.maxPartitionBytes`` AND
    ``spark.sql.files.openCostInBytes`` to at least the layout's largest
    file: Spark's split size is ``min(maxPartitionBytes, max(openCost,
    bytesPerCore))``, and ``bytesPerCore`` shrinks under partition pruning,
    so both knobs must clear the file size. The side effect — each file
    becomes exactly one partition — is the intended physical plan for this
    layout (the writer's ``n_files`` is the scan parallelism). Returns the
    byte bound applied."""
    meta = _layout_sidecar(path)
    if not meta.get("cell_sorted"):
        return 0
    max_bytes = int(meta.get("max_file_bytes") or 0)
    if not max_bytes:  # pre-sidecar-v2 layout: measure directly
        max_bytes = _max_data_file_bytes(spark, path)
    need = max_bytes + (1 << 20)  # headroom over exact equality
    for key in ("spark.sql.files.maxPartitionBytes", "spark.sql.files.openCostInBytes"):
        if _parse_bytes(spark.conf.get(key)) < need:
            spark.conf.set(key, str(need))
    return need


_BYTE_SUFFIX = {
    "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30, "t": 1 << 40, "tb": 1 << 40,
}


def _parse_bytes(v: str) -> int:
    s = str(v).strip().lower()
    for suf in sorted(_BYTE_SUFFIX, key=len, reverse=True):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * _BYTE_SUFFIX[suf])
    return int(float(s))


def _layout_sidecar(path: str) -> dict:
    try:
        with open(os.path.join(path, _LAYOUT_SIDECAR)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def images_cell_sorted(path: str) -> bool:
    """True when the parquet dir was written by write_images_cell_sorted
    (safe to run the colocated zonal strategy)."""
    return bool(_layout_sidecar(path).get("cell_sorted"))
