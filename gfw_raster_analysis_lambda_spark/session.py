"""SparkSession construction for the engine.

Local mode is the test target (one JVM, N threads); the same configs are the
ones we would pass to spark-submit on a real multi-executor cluster. The
knobs below are the scale-relevant ones:

- AQE on (runtime coalesce + skew-join splitting — the engine's spatial
  joins can produce skewed cell keys when many AOIs overlap hot cells).
- Arrow exchange on (every raster kernel is an Arrow-batched pandas UDF).
- ``maxRecordsPerBatch`` bounds per-task memory: one record is one image
  tile; at 5000x5000 uint16 a decoded tile is ~50 MB, so batches must stay
  small. The reference had the same bound as a hard 3 GB lambda cap
  (reference README.md:369); here it is a first-class config.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "gfw_spark_zonal",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 32,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the zonal engine.

    ``arrow_batch_rows`` is tiles-per-Arrow-batch — the per-task memory
    bound for the zonal kernel (each row carries an encoded tile that
    decodes to w*h pixels).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    nshuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows)
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
