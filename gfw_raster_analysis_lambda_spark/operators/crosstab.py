"""Raster cross-tabulation and classification-agreement statistics.

The accuracy-assessment half of zonal statistics (GRASS ``r.coin`` /
``r.kappa``, ArcGIS *Tabulate Area*): the n x m contingency table of two
co-registered categorical layers comes straight from the zonal engine's
multi-layer GROUP BY (one kernel pass, reference-parity semantics:
base-layer NoData masked, group-layer NoData dropped unless the layer
has a default meaning — catalog.py:253), and this module derives the
agreement statistics from those O(groups) rows:

- overall accuracy  = sum(diagonal) / N
- Cohen's kappa     = (N*sum_diag - sum_c row_c*col_c)
                      / (N^2      - sum_c row_c*col_c)

Everything until the final division is INTEGER-EXACT, accumulated in
decimal(38,0): at the 100-TB design point a single AOI can hold ~1e12
pixels, so N^2 (~1e24) wraps int64 silently under non-ANSI arithmetic —
the same trap the variance rollup hit (planner.py:316); DuckDB's SUM
already returns HUGEINT, so the decimal path is also what keeps the twin
bit-comparable. Scale: inputs are confusion COUNTS (O(classes^2) rows
per group), so every join/agg here is driver-trivial no matter how many
pixels produced them.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def agreement_stats(
    counts: DataFrame,
    group_col: str = "aoi_id",
    a_col: str = "pred",
    b_col: str = "truth",
    n_col: str = "n",
) -> DataFrame:
    """Per-group overall accuracy + Cohen's kappa from a confusion-count
    frame ``(group, a, b, n)``. ``a``/``b`` are class labels in a shared
    label space (any orderable type); classes present on only one side
    contribute 0 to the chance-agreement term, exactly as in the closed
    form. Returns (group, n_px, agree_px, acc, kappa); kappa is NULL for
    the degenerate single-class table (0/0), on both engines."""
    g = F.col(group_col)
    dn = F.col(n_col).cast(_DEC)
    tot = counts.groupBy(g.alias(group_col)).agg(
        F.sum(dn).alias("__n"),
        F.sum(F.when(F.col(a_col) == F.col(b_col), dn).otherwise(F.lit(0).cast(_DEC)))
        .alias("__agree"),
    )
    rows = counts.groupBy(g.alias(group_col), F.col(a_col).alias("__cls")).agg(
        F.sum(dn).alias("__r")
    )
    cols = counts.groupBy(g.alias(group_col), F.col(b_col).alias("__cls")).agg(
        F.sum(dn).alias("__c")
    )
    pe = (
        rows.join(cols, [group_col, "__cls"])
        .groupBy(group_col)
        .agg(F.sum(F.col("__r") * F.col("__c")).alias("__pe"))
    )
    out = tot.join(pe, group_col, "left").na.fill({"__pe": 0})
    kd = (F.col("__n") * F.col("__n") - F.col("__pe")).cast("double")
    kn = (F.col("__n") * F.col("__agree") - F.col("__pe")).cast("double")
    return out.select(
        F.col(group_col),
        F.col("__n").cast("long").alias("n_px"),
        F.col("__agree").cast("long").alias("agree_px"),
        F.round(F.col("__agree").cast("double") / F.col("__n").cast("double"), 6)
        .alias("acc"),
        F.round(F.when(kd != 0, kn / kd), 6).alias("kappa"),
    )


def binarize(col: Column, predicate: Column) -> Column:
    """1/0 classification of a decoded layer column; NULL (un-decodable
    raw value) lands in class 0 on both engines (CASE WHEN ... ELSE 0)."""
    return F.when(predicate, F.lit(1)).otherwise(F.lit(0))
