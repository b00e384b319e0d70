"""As-of (point-in-time) join — the timeseries primitive Spark's built-in
join set lacks: for every left row, the single right row with the
greatest ``on`` value <= the left's (per ``by`` key), the attribution /
last-known-state join of event pipelines.

Spark shape: the classic union trick — tag both sides, sort each ``by``
partition by (``on``, side) and carry the last-seen right payload forward
with ``last(..., ignorenulls=True)`` over a running window. ONE shuffle of
both inputs on the ``by`` key, no range join, no per-key collect; at any
corpus size this is the same plan a sort-merge join would pay, and skew
follows the ``by``-key distribution exactly like any keyed window.

Oracle twin: DuckDB's native ``ASOF LEFT JOIN`` (driver contract query
``rel_asof_attribution``) — identical greatest-ts<=ts semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_seconds(col: "F.Column") -> "F.Column":
    """Numeric seconds from a numeric, TIMESTAMP, or TIMESTAMP_NTZ column
    (NTZ cannot cast straight to double; route through TIMESTAMP)."""
    return col.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: "list[str] | str" = "user_id",
    right_cols: "list[str] | None" = None,
    prefix: str = "asof_",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row picks the latest ``right`` row
    with ``right.on <= left.on`` within the same ``by`` key (inclusive;
    unmatched lefts keep nulls). ``right_cols`` (default: all non-key
    right columns) arrive prefixed. ``tolerance_seconds`` voids matches
    older than the window (timestamp ``on`` columns)."""
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]
    carry = [on] + right_cols

    # the carried payload travels as ONE struct: last(ignorenulls) then
    # picks whole right ROWS atomically. Per-column lasts would stitch
    # fields from different rows whenever the matched row has NULL in one
    # carried column (a row that never existed).
    payload = F.struct(*[F.col(c).alias(c) for c in carry])
    rtypes = dict(right.dtypes)
    null_payload = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in carry) + ">"
    )
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        null_payload.alias("__r"),
    )
    rhs = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias("__side"),  # sorts BEFORE left at equal `on` (inclusive)
        payload.alias("__r"),
    )
    # right rows contribute nothing but their carried payload
    for c in left.columns:
        if c not in by and c != on:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    rhs = rhs.select(*lhs.columns)

    # deterministic tie handling: right rows sharing (by, on) sort by the
    # whole payload struct, so the match is the greatest tuple
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc(), F.col("__r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = lhs.unionByName(rhs).withColumn(
        "__m", F.last(F.col("__r"), ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        fresh = (
            _epoch_seconds(F.col(on)) - _epoch_seconds(F.col(f"__m.{on}"))
        ) <= F.lit(float(tolerance_seconds))
        out = out.withColumn("__m", F.when(fresh, F.col("__m")))
    keep = [F.col(c) for c in left.columns]
    keep += [F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in carry]
    return out.select(*keep)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_seconds: float = 3600.0,
    max_bins_per_interval: int = 100_000,
) -> DataFrame:
    """Point-in-interval join without the quadratic theta-join: bucketize
    time into ``bin_seconds`` bins, explode each interval over the bins it
    covers, equi-join points on their bin, then verify exact containment
    (half-open ``start <= p < end``). Spark plans a bare inequality join
    as BroadcastNestedLoop/cartesian — O(points x intervals); the binned
    plan shuffles O(points + interval-bins) rows and the verify filter is
    codegen. Pick ``bin_seconds`` near the median interval length (each
    interval then covers ~2 bins).

    Output: every (point, containing interval) pair — all point columns
    plus the interval's columns."""
    p_bin = F.floor(_epoch_seconds(F.col(point_col)) / F.lit(float(bin_seconds)))
    s_bin = F.floor(_epoch_seconds(F.col(start_col)) / F.lit(float(bin_seconds)))
    e_bin = F.floor(_epoch_seconds(F.col(end_col)) / F.lit(float(bin_seconds)))
    nbins = e_bin.cast("long") - s_bin.cast("long") + 1
    # the validity check lives INSIDE the consumed __bin expression — an
    # assert in a separate dropped column is pruned away by Catalyst and
    # never fires (a sentinel end_ts would then explode each interval
    # into up to max_bins_per_interval rows). assert_true returns NULL on
    # success, so the when() branch both gates and checks.
    ok = (nbins >= 1) & (nbins <= F.lit(int(max_bins_per_interval)))
    checked_bins = F.when(
        F.assert_true(
            ok,
            F.concat(
                F.lit("interval_join: interval covers an invalid/huge bin count "
                      "(inverted interval or open-ended sentinel?): "),
                nbins.cast("string"),
            ),
        ).isNull(),
        F.sequence(s_bin.cast("long"), e_bin.cast("long")),
    )
    iv = intervals.withColumn("__bin", F.explode(checked_bins))
    pt = points.withColumn("__bin", p_bin.cast("long"))
    return (
        pt.join(iv, "__bin")
        .filter(
            (_epoch_seconds(F.col(point_col)) >= _epoch_seconds(F.col(start_col)))
            & (_epoch_seconds(F.col(point_col)) < _epoch_seconds(F.col(end_col)))
        )
        .drop("__bin")
    )


def rolling_features(
    df,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window: int = 5,
):
    """Per-key rolling time-series features — the training-feature
    primitives a sessionized event log feeds into a model: previous
    value (lag), seconds since the previous event, moving average over
    the trailing ``window`` events, and a cumulative event count.

    One keyed shuffle; every window is ROWS-bounded (``window`` trailing
    rows), so state per task is O(window), not O(history). Ordering ties
    on identical timestamps break on ``id_col`` for determinism. The
    inter-event gap is integer MICROSECONDS (``delta_us``), not float
    seconds: epoch-seconds doubles cannot represent microseconds at
    2024 magnitudes (resolution ~5e-7 s), so a float delta would differ
    across engines in the last ulp. At 100 TB the only hazard is a
    single hyperactive key — unlike grouped top-k, an order-dependent
    scan cannot be salted losslessly, so bound per-key history upstream
    (e.g. sessionize first) if keys can be pathological.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    w_mov = w.rowsBetween(-(int(window) - 1), 0)
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    us = _wall_clock_micros(df, ts_col)
    return df.select(
        id_col, key_col, ts_col, value_col,
        F.lag(value_col).over(w).alias("prev_value"),
        (us - F.lag(us).over(w)).cast("long").alias("delta_us"),
        F.round(F.avg(value_col).over(w_mov), 6).alias("mov_avg"),
        F.count(F.lit(1)).over(w_cum).cast("long").alias("cum_n"),
    )


def _wall_clock_micros(df, ts_col: str):
    """Epoch microseconds of a timestamp column, SESSION-TIMEZONE-PROOF
    for TIMESTAMP_NTZ: ``CAST(ntz AS TIMESTAMP)`` interprets the wall
    time in spark.sql.session.timeZone, so a non-UTC session silently
    shifts gaps across DST transitions (and disagrees with DuckDB's
    ``epoch_us``, which treats naive timestamps as-is). For NTZ we
    derive micros from the wall-clock FIELDS (day number + h/m/s with
    EXTRACT's exact decimal seconds) — no timezone anywhere. Instant
    (TIMESTAMP) columns keep the direct unix_micros."""
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(ts_col, "")
    if dtype == "timestamp_ntz":
        return F.expr(
            f"CAST(datediff({ts_col}, DATE'1970-01-01') AS BIGINT) * 86400000000"
            f" + CAST(EXTRACT(HOUR FROM {ts_col}) AS BIGINT) * 3600000000"
            f" + CAST(EXTRACT(MINUTE FROM {ts_col}) AS BIGINT) * 60000000"
            f" + CAST(EXTRACT(SECOND FROM {ts_col}) * 1000000 AS BIGINT)"
        )
    return F.expr(f"unix_micros({ts_col})")


def rolling_time_features(
    df,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window_seconds: int = 600,
):
    """RANGE-framed rolling features: aggregates over the trailing
    ``window_seconds`` of EVENT TIME per key ("sum/count over the last
    10 minutes"), the time-interval twin of :func:`rolling_features`'s
    ROWS frames — a quiet key's window holds few events, a bursty key's
    holds many, which row-count frames cannot express.

    The frame orders by integer epoch MICROSECONDS (the repo's
    cross-engine time rule) with ``rangeBetween(-window_us, 0)``, and the
    windowed sum accumulates integer MICRO-UNITS of the value (micros =
    value * 1e6 rounded half-up), so every frame sum is
    summation-order-exact and the DuckDB twin (``RANGE BETWEEN n
    PRECEDING``) hash-matches; the float view divides back out at the
    end. One keyed shuffle; state per task is O(events inside the
    window), bounded by event-time density rather than history length.

    NOTE: RANGE frames are defined on the ordering VALUE, so two events
    with identical timestamps share a frame (both included) — unlike the
    ROWS variant there is no id tie-break inside the frame, and none is
    needed for deterministic results."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    us = _wall_clock_micros(df, ts_col)
    vmicro = F.expr(
        f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
    )
    win_us = int(window_seconds) * 1_000_000
    base = df.select(
        id_col, key_col, ts_col, value_col,
        us.alias("__us"), vmicro.alias("__vm"),
    )
    w = (
        Window.partitionBy(key_col).orderBy(F.col("__us").asc())
        .rangeBetween(-win_us, 0)
    )
    return base.select(
        id_col, key_col, ts_col, value_col,
        F.count(F.lit(1)).over(w).cast("long").alias("win_n"),
        F.round(
            F.sum("__vm").over(w).cast("double") / F.lit(1e6), 6
        ).alias("win_sum"),
    )
