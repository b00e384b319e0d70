"""Stream-stream interval join: event attribution as a streaming job.

The one Structured Streaming idiom the events surface did not yet
cover: joining TWO live streams on a key plus an event-time range —
here the classic attribution shape, purchases joined to the views they
followed within ``max_gap``. Both sides are watermarked and the join
condition carries the time bound, which is exactly what lets Spark
evict join state: a buffered view can be dropped once the purchase-side
watermark passes ``view.ts + max_gap``, so state is O(events inside the
gap window), not O(stream history) — the property that makes this run
forever on an unbounded stream.

Output is append-mode parquet through the streaming sink (same
exactly-once file-log contract as streaming/events.py). The gap is
emitted as INTEGER microseconds (``unix_micros`` difference), so the
DuckDB twin (``epoch_us(p.ts) - epoch_us(v.ts)``) compares exactly —
no float time arithmetic anywhere.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .events import EVENTS_SCHEMA_DDL


def attribution_join_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    left_type: str = "view",
    right_type: str = "purchase",
    max_gap: str = "2 hours",
    watermark: str = "0 seconds",
    trigger_once: bool = True,
):
    """Join ``right_type`` events to same-user ``left_type`` events that
    precede them by at most ``max_gap`` (inclusive on both ends).
    Returns the StreamingQuery; rows land under ``{out_dir}/data`` as
    ``(view_id, purchase_id, user_id, gap_us, value)``."""
    src = spark.readStream.schema(EVENTS_SCHEMA_DDL).parquet(events_dir)
    views = (
        src.filter(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    buys = (
        src.filter(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("b_ts"),
            F.col("value"),
        )
        .withWatermark("b_ts", watermark)
    )
    joined = (
        views.join(
            buys,
            (F.col("v_user") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("v_ts"))
            & (F.col("b_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {max_gap}")),
            "inner",
        )
        .select(
            "view_id",
            "purchase_id",
            F.col("v_user").alias("user_id"),
            (F.unix_micros("b_ts") - F.unix_micros("v_ts")).alias("gap_us"),
            F.round("value", 3).alias("value"),
        )
    )
    stream = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/ckpt")
    )
    if trigger_once:
        stream = stream.trigger(availableNow=True)
    return stream.start()
