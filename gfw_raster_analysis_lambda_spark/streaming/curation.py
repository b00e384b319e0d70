"""Streaming corpus curation: stream-static composition of the batch
pipeline operators over an arriving document stream.

The pattern here is ``foreachBatch``: when the per-document logic already
exists as a (deterministic, broadcast-sided) batch operator, each
micro-batch simply runs it against the STATIC side — no reimplementation,
no streaming-specific state.

Delivery guarantee: END-TO-END EXACTLY-ONCE, from two composed mechanisms.
The file source's checkpoint assigns every input file to exactly one
micro-batch (exactly-once *input* assignment), and the sink writes each
batch's rows to a ``_batch_id=N`` partition with dynamic partition
overwrite (idempotent *output*): ``foreachBatch`` itself is only
at-least-once — a batch that fails after a partial parquet flush is
retried with the SAME batch_id, and the overwrite replaces the partial
partition instead of appending next to it. A plain ``mode("append")``
sink here would duplicate rows on retry; batch tracking alone dedupes
inputs, never outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id long, text string"


def write_decontaminate_batch(
    batch_df: DataFrame,
    batch_id: int,
    bench: DataFrame,
    out_dir: str,
    n: int = 3,
    threshold: float = 0.5,
) -> None:
    """One micro-batch of :func:`decontaminate_stream`, IDEMPOTENT on
    retry: the batch's pairs land in the ``_batch_id={batch_id}``
    partition under dynamic partition overwrite, so re-running the same
    (batch_df, batch_id) — Structured Streaming's at-least-once retry —
    replaces any partial earlier attempt instead of duplicating it.
    Module-level (not a closure) so the retry contract is directly
    testable. The batch's output is a deterministic function of its
    input, so a retry can never need to CLEAR a partition a previous
    attempt wrote rows to while itself writing none."""
    from ..operators.text import benchmark_contamination

    out = benchmark_contamination(batch_df, bench, n=n, threshold=threshold)
    (
        out.withColumn("_batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(f"{out_dir}/data")
    )


def decontaminate_stream(
    spark: SparkSession,
    docs_dir: str,
    bench: DataFrame,
    out_dir: str,
    n: int = 3,
    threshold: float = 0.5,
    trigger_once: bool = True,
):
    """Flag contaminated documents AS THEY ARRIVE: each micro-batch of
    the document stream is checked against the static benchmark set with
    :func:`operators.text.benchmark_contamination` (benchmark shingles
    broadcast — the arriving corpus rows never shuffle). Output parquet
    under ``{out_dir}/data`` accumulates ``(doc_id, bench_id, n_overlap,
    n_bench_shingles, overlap_frac)`` rows in per-micro-batch
    ``_batch_id=`` partitions (see :func:`write_decontaminate_batch` for
    the exactly-once mechanism); after the stream drains, the union over
    micro-batches equals the batch operator over the full corpus (checked
    by the driver-contract gate)."""
    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_dir)

    def proc(batch_df: DataFrame, batch_id: int) -> None:
        write_decontaminate_batch(
            batch_df, batch_id, bench, out_dir, n=n, threshold=threshold
        )

    writer = docs.writeStream.foreachBatch(proc).option(
        "checkpointLocation", f"{out_dir}/ckpt"
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
