"""Streaming corpus curation: stream-static composition of the batch
pipeline operators over an arriving document stream.

The pattern here is ``foreachBatch``: when the per-document logic already
exists as a (deterministic, broadcast-sided) batch operator, each
micro-batch simply runs it against the STATIC side — no reimplementation,
no streaming-specific state. Exactly-once per (doc, benchmark) pair falls
out of the source's file tracking: a document is processed in exactly one
micro-batch, and its pairs are derived from that batch alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCS_SCHEMA = "doc_id long, text string"


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
    n_bench_shingles, overlap_frac)`` rows; after the stream drains, the
    union over micro-batches equals the batch operator over the full
    corpus (checked by the driver-contract gate)."""
    from ..operators.text import benchmark_contamination

    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_dir)

    def proc(batch_df: DataFrame, batch_id: int) -> None:
        out = benchmark_contamination(batch_df, bench, n=n, threshold=threshold)
        out.write.mode("append").parquet(f"{out_dir}/data")

    writer = docs.writeStream.foreachBatch(proc).option(
        "checkpointLocation", f"{out_dir}/ckpt"
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
