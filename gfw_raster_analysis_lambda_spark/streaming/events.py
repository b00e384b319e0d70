"""Event-stream operators: watermarked windowed aggregation and custom
stateful sessionization (``applyInPandasWithState``).

The reference is batch request/response only; these cover the two
Structured Streaming idioms the images-incremental path does not:

- :func:`windowed_event_stats` — the canonical ``readStream ->
  withWatermark -> window() groupBy -> append sink`` pipeline. Late rows
  within the watermark merge into their window; a window is emitted
  exactly once, when the watermark passes its end.
- :func:`sessionize_events` — gap-based per-user sessions via
  ``applyInPandasWithState`` (arbitrary stateful processing). Sessions
  close when the event-time watermark passes ``last_event + gap`` (state
  timeout), so ordering within a micro-batch doesn't matter and the
  output is deterministic for a deterministic input.

Both run on the ``events`` table shape (BASELINE input hint):
``(event_id long, ts timestamp, user_id long, event_type string,
value double, props string)``.

Scale notes: both are single-shuffle plans (hash by window/event_type or
by user_id); state is O(open sessions), bounded by the watermark — the
exact shape a 100-TB/day event stream needs. Watermark semantics mean a
window/session is emitted by the micro-batch AFTER the one whose data
advanced the watermark past it (Spark computes each batch's watermark
from the previous batch's max event time).

Delivery guarantee (all four ops in this module): end-to-end
EXACTLY-ONCE for readers that honor the sink's transaction log. Every
op writes through Spark's built-in parquet STREAMING sink, which
records each batch's committed files in ``{out}/_spark_metadata``; a
batch retried after a partial flush re-commits the same batch id, and
``spark.read`` on the directory serves only log-listed files. The
guarantee is weaker for raw file listers (``glob``/``ls``): a crashed
attempt can leave an orphan file on disk that the log never references
— the repo's own test drains only see committed files because
``availableNow`` runs complete before reading, but a production
consumer should either read through Spark or compact the sink output
first. (``foreachBatch`` sinks do NOT get this for free — see
``curation.write_decontaminate_batch`` for the explicit batch-id
partition-overwrite idempotency that replaces it there, and
``incremental.py`` for the dynamic-partition-overwrite variant.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_stats(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    window_duration: str = "1 day",
    watermark: str = "0 seconds",
    trigger_once: bool = True,
):
    """Per-(time window, event_type) counts and value sums, append mode.

    Returns the StreamingQuery; results land as parquet under
    ``{out_dir}/data`` with columns
    ``(window_start, event_type, n, value_sum)``."""
    src = spark.readStream.schema(EVENTS_SCHEMA_DDL).parquet(events_dir)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 3).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "value_sum"
        )
    )
    stream = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/ckpt")
    )
    if trigger_once:
        stream = stream.trigger(availableNow=True)
    return stream.start()


SESSION_SCHEMA_DDL = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, value_sum double"
)
_STATE_SCHEMA_DDL = "start long, last long, n long, vsum double"


def sessionize_events(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
    trigger_once: bool = True,
):
    """Gap-based sessionization: consecutive events of a user belong to one
    session while the gap between them is <= ``gap_minutes``; a session is
    emitted once the event-time watermark passes ``last_event + gap``
    (EventTimeTimeout state timeout — no reliance on batch boundaries).

    ``applyInPandasWithState`` is the custom-stateful-operator surface:
    state per user is the open session's ``(start, last, n, value_sum)``
    epoch-microsecond tuple. Output parquet under ``{out_dir}/data`` has
    ``(user_id, session_start, session_end, n_events, value_sum)``.

    Late-data semantics: rows older than the ``watermark`` delay are
    dropped by Spark before they reach the operator (the streaming
    contract); rows late-but-within-the-watermark merge into the user's
    OPEN session conservatively — they extend its bounds, but never
    retroactively split it or reopen an already-emitted session (append
    mode cannot retract). A within-watermark row older than
    ``session_start - gap`` is emitted as its own single-event session."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_minutes) * 60 * 1_000_000

    def fn(key, pdfs, state):
        user_id = int(key[0])
        ts_all = []
        val_all = []
        for pdf in pdfs:
            if len(pdf):
                ts_all.append(pdf["ts"].astype("datetime64[us]").astype("int64"))
                val_all.append(pdf["value"].astype("float64"))
        closed = []
        if state.exists:
            start, last, n, vsum = state.get
            have_state = True
        else:
            start, last, n, vsum = 0, 0, 0, 0.0
            have_state = False

        if ts_all:
            ts = pd.concat(ts_all).to_numpy()
            vals = pd.concat(val_all).to_numpy()
            order = ts.argsort(kind="stable")
            ts, vals = ts[order], vals[order]
            for t, v in zip(ts.tolist(), vals.tolist()):
                if not have_state:
                    start, last, n, vsum = t, t, 1, float(v)
                    have_state = True
                elif t < start - gap_us:
                    # late orphan (within the watermark, before the open
                    # session): its own immediately-closed session
                    closed.append((user_id, t, t, 1, float(v)))
                elif t - last > gap_us:
                    closed.append((user_id, start, last, n, vsum))
                    start, last, n, vsum = t, t, 1, float(v)
                else:
                    # in-session, incl. late rows within the watermark that
                    # arrive out of order across batches (t may be < last)
                    start = min(start, t)
                    last = max(last, t)
                    n += 1
                    vsum += float(v)

        if ts_all:
            state.update((int(start), int(last), int(n), float(vsum)))
            state.setTimeoutTimestamp(int(last) // 1000 + gap_us // 1000)
        elif state.hasTimedOut and have_state:
            closed.append((user_id, start, last, n, vsum))
            state.remove()

        if closed:
            yield pd.DataFrame(
                [
                    (
                        u,
                        pd.Timestamp(s, unit="us"),
                        pd.Timestamp(e, unit="us"),
                        cn,
                        round(cv, 3),
                    )
                    for (u, s, e, cn, cv) in closed
                ],
                columns=[
                    "user_id", "session_start", "session_end",
                    "n_events", "value_sum",
                ],
            )

    src = spark.readStream.schema(EVENTS_SCHEMA_DDL).parquet(events_dir)
    sessions = (
        src.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA_DDL,
            stateStructType=_STATE_SCHEMA_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    stream = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/ckpt")
    )
    if trigger_once:
        stream = stream.trigger(availableNow=True)
    return stream.start()


def dedup_events_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    keys: "list[str] | None" = None,
    watermark: str = "3650 days",
    trigger_once: bool = True,
):
    """Streaming exactly-once ingest dedup: at-least-once sources
    (replayed files, redelivered queue batches) re-deliver rows; this
    drops re-arrivals by key with ``dropDuplicatesWithinWatermark`` so
    downstream consumers see each event once. State is keyed by the
    dedup key and EVICTED once the event-time watermark passes a key's
    timestamp + delay — the property that makes streaming dedup viable
    at 100-TB/day: a plain ``dropDuplicates`` would grow state forever,
    the watermarked form is O(events within the dedup horizon).

    First arrival wins; rows land append-mode under ``{out_dir}/data``.
    Pick ``watermark`` = the maximum redelivery lag of the source."""
    keys = keys or ["event_id"]
    src = spark.readStream.schema(EVENTS_SCHEMA_DDL).parquet(events_dir)
    deduped = src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    stream = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/ckpt")
    )
    if trigger_once:
        stream = stream.trigger(availableNow=True)
    return stream.start()


def cumulative_features_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    trigger_once: bool = True,
):
    """Per-user RUNNING features emitted once per event — the streaming
    twin of ``operators.asof.rolling_features``'s cumulative columns:
    ``(event_id, user_id, ts, value, cum_n, cum_sum, cum_mean)``.

    ``applyInPandasWithState`` with NoTimeout: state per user is just
    ``(n, value_sum)`` — O(1) per key, never grows with history (the
    property that lets this run forever). Events are processed in
    (ts, event_id) order WITHIN each micro-batch; across batches the
    running totals simply continue (arrival order), the standard
    incremental-ingest contract. Output parquet lands under
    ``{out_dir}/data``.

    The running sum is kept in EXACT integer micro-units
    (``round(value * 1e6)`` per event, ``cum_sum_u6``): float
    accumulation is summation-order-dependent, so a float running sum
    can differ in the last ulp from any other engine's (or even this
    engine's re-partitioned) computation and flip values sitting on a
    rounding boundary — the same reason ``rolling_features`` emits
    integer-microsecond gaps. ``cum_mean`` derives from the exact
    integers, so it is bit-reproducible too.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        user_id = int(key[0])
        from ..functions.expressions import round_half_up

        if state.exists:
            n, sum_u6 = state.get
        else:
            n, sum_u6 = 0, 0
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            state.update((n, int(sum_u6)))
            return iter(())
        pdf = pd.concat(frames).sort_values(["ts", "event_id"], kind="mergesort")
        out_n, out_sum, out_mean = [], [], []
        for v in pdf["value"].astype("float64").tolist():
            n += 1
            sum_u6 += int(round_half_up(v * 1e6, 0))
            out_n.append(n)
            out_sum.append(sum_u6)
            # exact integers in, identical double out on every engine
            out_mean.append(float(round_half_up(sum_u6 / (1e6 * n), 6)))
        state.update((n, int(sum_u6)))
        out = pd.DataFrame(
            {
                "event_id": pdf["event_id"].astype("int64"),
                "user_id": user_id,
                "ts": pdf["ts"],
                "value": pdf["value"].astype("float64"),
                "cum_n": pd.Series(out_n, index=pdf.index, dtype="int64"),
                "cum_sum_u6": pd.Series(out_sum, index=pdf.index, dtype="int64"),
                "cum_mean": pd.Series(out_mean, index=pdf.index),
            }
        )
        return iter([out])

    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(events_dir)
    )
    stream = (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=(
                "event_id long, user_id long, ts timestamp_ntz, value double, "
                "cum_n long, cum_sum_u6 long, cum_mean double"
            ),
            stateStructType="n long, sum_u6 long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        stream.writeStream.format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/ckpt")
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
