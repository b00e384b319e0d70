"""Trajectory analytics: per-track movement statistics and stay-point
detection over ordered GPS-style point streams.

The reference analyzes static rasters; a 10^12-image corpus with GPS
provenance (vehicle captures, drone sweeps, field photos) needs the
track-level curation questions — how far did this collector move, where
did it dwell, is this track a stationary duplicate burst? These are the
classic trajectory primitives (stay points per Li et al. 2008, "Mining
user similarity based on location history"; straightness index from
movement ecology), expressed as ONE keyed window pass each.

Scale shape: everything is ``Window.partitionBy(track).orderBy(ts)`` —
a single shuffle on track id, no self-joins, no UDFs. Coordinates are
INTEGER micro-units and every derived quantity stays integer-exact
(segment lengths are ``floor(sqrt(int64))`` — the double sqrt of an
exact int64 is correctly rounded IEEE, so both oracle engines agree
bit-for-bit), which keeps the whole family hash-gateable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordered(track_col: str, ts_col: str, id_col: str):
    return Window.partitionBy(track_col).orderBy(
        F.asc(ts_col), F.asc(id_col)
    )


def _isqrt(d2: Column) -> Column:
    """floor(sqrt(n)) for an exact int64 — IEEE-identical across engines
    for n < 2^52 (the double conversion is exact there)."""
    return F.floor(F.sqrt(d2.cast("double"))).cast("long")


def track_stats(
    points: DataFrame,
    track_col: str = "track_id",
    ts_col: str = "ts",
    id_col: str = "point_id",
    x_col: str = "x_micro",
    y_col: str = "y_micro",
) -> DataFrame:
    """Per-track movement summary from integer micro-unit coordinates:
    point count, path length (sum of per-segment ``floor(sqrt(dx²+dy²))``),
    longest segment, net displacement (first→last), and straightness =
    net/path rounded to 6 (1.0 = beeline, →0 = wandering; the movement-
    ecology straightness index). One window pass + one groupBy — the
    shuffle key is the track id; a 10^12-point corpus partitions cleanly
    because no operator ever crosses tracks."""
    w = _ordered(track_col, ts_col, id_col)
    dx = F.col(x_col) - F.lag(x_col).over(w)
    dy = F.col(y_col) - F.lag(y_col).over(w)
    seg = _isqrt(dx * dx + dy * dy)
    stepped = points.select(
        F.col(track_col),
        seg.alias("__seg"),
        F.first(x_col).over(w).alias("__x0"),
        F.first(y_col).over(w).alias("__y0"),
        F.col(x_col),
        F.col(y_col),
        F.row_number().over(w).alias("__rn"),
    )
    per = stepped.groupBy(track_col).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.coalesce(F.sum("__seg"), F.lit(0)).alias("path_micro"),
        F.coalesce(F.max("__seg"), F.lit(0)).alias("max_seg_micro"),
        F.max_by(
            F.struct(F.col(x_col).alias("x"), F.col(y_col).alias("y")),
            F.col("__rn"),
        ).alias("__last"),
        F.first("__x0").alias("__fx"),
        F.first("__y0").alias("__fy"),
    )
    net = _isqrt(
        (F.col("__last.x") - F.col("__fx")) * (F.col("__last.x") - F.col("__fx"))
        + (F.col("__last.y") - F.col("__fy")) * (F.col("__last.y") - F.col("__fy"))
    )
    return per.select(
        track_col,
        "n_points",
        "path_micro",
        "max_seg_micro",
        net.alias("net_micro"),
        F.when(F.col("path_micro") > 0, F.round(net / F.col("path_micro"), 6))
        .otherwise(F.lit(0.0))
        .alias("straightness"),
    )


def stay_points(
    points: DataFrame,
    eps_micro: int,
    min_run: int = 3,
    track_col: str = "track_id",
    ts_col: str = "ts",
    id_col: str = "point_id",
    x_col: str = "x_micro",
    y_col: str = "y_micro",
) -> DataFrame:
    """Stay-point detection, gaps-and-islands form: a point is SLOW when
    its squared distance to the previous track point is <= eps², and a
    stay is a maximal run of >= ``min_run`` consecutive slow points.
    Returns per track: n_stays, points inside stays, and the longest
    stay's length. (Li et al.'s definition clusters by time threshold;
    the distance-run form is the common curation variant — it flags the
    stationary duplicate bursts an image pipeline wants to thin.)

    Exactly two window passes over one track-keyed shuffle: the slow
    flag, then the run id as a cumulative sum of run starts — the
    classic gaps-and-islands trick, all integer arithmetic."""
    w = _ordered(track_col, ts_col, id_col)
    dx = F.col(x_col) - F.lag(x_col).over(w)
    dy = F.col(y_col) - F.lag(y_col).over(w)
    slow = (dx * dx + dy * dy) <= F.lit(int(eps_micro) ** 2)
    flagged = points.select(
        F.col(track_col),
        F.col(ts_col),
        F.col(id_col),
        F.coalesce(slow, F.lit(False)).alias("__slow"),
    )
    # run id: increments whenever slowness turns on/off
    w2 = _ordered(track_col, ts_col, id_col)
    change = (
        F.col("__slow")
        != F.coalesce(F.lag("__slow").over(w2), ~F.col("__slow"))
    ).cast("long")
    runs = flagged.select(
        F.col(track_col),
        F.col("__slow"),
        F.sum(change).over(
            w2.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("__run"),
    )
    # aggregate ALL runs (slow and fast) with conditionals so every
    # track keeps a row — no distinct-tracks branch, no join-back, and
    # both groupBys reuse the window's hashpartitioning(track): the
    # whole operator is exactly ONE Exchange (asserted by
    # test_new_ops_plan_shapes). grouping on (track, run) is satisfied
    # by partitioning on track alone (same track ⇒ same partition).
    run_stats = runs.groupBy(track_col, "__run").agg(
        F.count(F.lit(1)).alias("__len"),
        F.first("__slow").alias("__s"),
    )
    is_stay = F.col("__s") & (F.col("__len") >= int(min_run))
    return run_stats.groupBy(track_col).agg(
        F.sum(is_stay.cast("long")).alias("n_stays"),
        F.sum(F.when(is_stay, F.col("__len")).otherwise(F.lit(0)))
        .alias("stay_points"),
        F.coalesce(
            F.max(F.when(is_stay, F.col("__len"))), F.lit(0)
        ).alias("longest_stay"),
    )
