"""Grouped time-series trend statistics over zonal outputs.

The question GFW-style zonal numbers exist to answer is rarely "how
much loss in 2014" but "is loss ACCELERATING here" — a per-AOI trend
over the yearly series the zonal engine already produces (the reference
emits per-year rows, e.g. its ``tcl_year`` grouped sums; trend fitting
is left to the consumer). These operators close that gap relationally,
so the fit runs as one aggregation over O(AOIs x years) rows — never
collecting series to the driver.

- :func:`ols_trend` — least-squares line per group from the five
  classical sums (n, Σx, Σy, Σxy, Σx²): slope, intercept, and R².
  Offset ``x`` by its domain start before calling (the caller knows
  it), keeping the normal-equation cancellation small.
- :func:`mann_kendall` — the non-parametric Mann-Kendall S statistic
  (Σ_{i<j} sign(y_j − y_i)) via a per-group self-join on x — integer
  EXACT given exact inputs, which is why callers should pass the
  rounded series they publish: sign() of a last-ulp difference is the
  one place two engines can disagree. Series per group are short
  (years), so the join is O(groups x years²) rows — tiny next to the
  pixel work that produced them.

Both are pure DataFrame aggregations: one Exchange on the group key
each (the self-join reuses the same hash partitioning), identical
formulas in the DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ols_trend(
    df: DataFrame,
    x_col: str,
    y_col: str,
    keys: "list[str]",
    round_to: int = 6,
) -> DataFrame:
    """Per-group least-squares fit of ``y = slope * x + intercept``.

    Emits ``n`` (points), ``slope``, ``intercept``, ``r2`` (NULL when
    degenerate: fewer than 2 points or zero x-variance / y-variance).
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    agg = df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
    )
    n = F.col("n").cast("double")
    dx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    slope = F.when((F.col("n") >= 2) & (dx != 0), cov / dx)
    intercept = (F.col("__sy") - slope * F.col("__sx")) / n
    r2 = F.when((F.col("n") >= 2) & (dx != 0) & (dy != 0), cov * cov / (dx * dy))
    return agg.select(
        *keys,
        "n",
        F.round(slope, round_to).alias("slope"),
        F.round(intercept, round_to).alias("intercept"),
        F.round(r2, round_to).alias("r2"),
    )


def mann_kendall(
    df: DataFrame,
    x_col: str,
    y_col: str,
    keys: "list[str]",
) -> DataFrame:
    """Per-group Mann-Kendall trend statistic
    ``S = sum over pairs x_i < x_j of sign(y_j - y_i)`` plus the pair
    count — integer exact. Positive S = rising trend; |S| near the
    pair count = monotone. Callers pass the published (rounded)
    series so tie handling is engine-independent."""
    a = df.select(*keys, F.col(x_col).alias("__xa"), F.col(y_col).alias("__ya"))
    b = df.select(*keys, F.col(x_col).alias("__xb"), F.col(y_col).alias("__yb"))
    pairs = a.join(b, on=keys).filter(F.col("__xa") < F.col("__xb"))
    return pairs.groupBy(*keys).agg(
        F.sum(F.signum(F.col("__yb") - F.col("__ya")).cast("long")).alias("s"),
        F.count("*").alias("n_pairs"),
    )


def theil_sen(
    df: DataFrame,
    x_col: str,
    y_col: str,
    keys: "list[str]",
    round_to: int = 6,
) -> DataFrame:
    """Per-group Theil-Sen slope — the robust companion to
    :func:`ols_trend` (the median of all pairwise slopes; breakdown
    point ~29%, so one anomalous year cannot swing the trend the way
    it swings least squares). Same O(groups x years²) pair join as
    :func:`mann_kendall`; the median is Spark's exact interpolating
    ``percentile`` (DuckDB ``quantile_cont`` twin computes the same
    midpoint of the two central doubles). Pairs with equal x are
    excluded (vertical slopes), matching the classical estimator."""
    a = df.select(*keys, F.col(x_col).alias("__xa"), F.col(y_col).alias("__ya"))
    b = df.select(*keys, F.col(x_col).alias("__xb"), F.col(y_col).alias("__yb"))
    pairs = a.join(b, on=keys).filter(F.col("__xa") < F.col("__xb"))
    slope = (F.col("__yb") - F.col("__ya")) / (
        F.col("__xb").cast("double") - F.col("__xa").cast("double")
    )
    return pairs.groupBy(*keys).agg(
        F.round(F.percentile(slope, F.lit(0.5)), round_to).alias("ts_slope"),
        F.count("*").alias("n_pairs"),
    )
