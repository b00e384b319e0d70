"""Deterministic sampling and split assignment for training-data
pipelines.

A corpus rebuild must reproduce the SAME sample and the SAME
train/val/test membership — so nothing here uses ``rand()``. Every
decision derives from an md5 hash of (salt, id) mapped to a uniform
[0, 1) — one Catalyst expression, embarrassingly parallel, identical in
DuckDB (the driver-contract twins re-derive membership bit-for-bit).
Membership is stable under corpus growth: adding documents never flips
an existing document's split (the property rand-based splits lack).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^48 — the hash is truncated to 12 hex digits, so u = h / 2^48 is an
# exact dyadic rational both engines compute identically
_HASH_DENOM = float(1 << 48)


def hash_uniform(id_col: Column, salt: str = "") -> Column:
    """Deterministic uniform [0, 1) from an id: md5(salt:id) -> first 12
    hex digits -> / 2^48. Same formula in the DuckDB oracle twins."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), id_col.cast("string"))), 1, 12),
        16, 10,
    ).cast("double")
    return h / F.lit(_HASH_DENOM)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep each row iff its hash-uniform < ``fraction``. Reproducible,
    collect-free, and composable: a 0.1 sample is a superset of a 0.05
    sample under the same salt (nested subsamples for ablations)."""
    return df.filter(hash_uniform(F.col(id_col), salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: "dict[str, float]",
    strata_col: str,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (balance a skewed corpus):
    stratum s keeps its rows with hash-uniform < fractions[s]."""
    frac = F.lit(float(default_fraction))
    for k, v in fractions.items():
        frac = F.when(F.col(strata_col) == F.lit(k), F.lit(float(v))).otherwise(frac)
    return df.filter(hash_uniform(F.col(id_col), salt) < frac)


def split_assign(
    df: DataFrame,
    weights: "dict[str, float]",
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
    key: Column | None = None,
) -> DataFrame:
    """Assign every row to one split by cumulative weight intervals over
    the hash-uniform (e.g. ``{"train": 0.8, "val": 0.1, "test": 0.1}``).
    Deterministic and growth-stable; weights are normalized; the final
    split absorbs the remainder so every row is assigned. ``key``
    overrides the hashed expression (default: the id column) — rows
    sharing a key land in the same split."""
    total = float(sum(weights.values()))
    u = hash_uniform(key if key is not None else F.col(id_col), salt)
    expr = None
    cum = 0.0
    names = list(weights.keys())
    for name in names[:-1]:
        cum += float(weights[name]) / total
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    weights: "dict[str, float]",
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test assignment where near-duplicate CLUSTERS move as a
    unit — the split key is the document's cluster label, so two
    near-duplicates can never straddle an eval boundary (the standard
    leakage guard before held-out evaluation). ``clusters`` is an
    ``(id, cluster)`` frame from ``dedup.minhash_dedup_clusters`` /
    ``phash_dedup_clusters`` / ``cross_modal_dedup_clusters``; documents
    absent from it are singletons and hash on their own id, which keeps
    the assignment identical to :func:`split_assign` for everything
    without a near-dup (growth-stable: clustering MORE documents later
    never flips a singleton's split unless it actually joins a cluster).

    Scale shape: one equi-join of the corpus against the O(docs) cluster
    map (sort-merge on id; AQE-broadcast when the cluster set is small
    because the corpus is mostly unique), then the same zero-shuffle
    hash-threshold CASE as every sampler here.
    """
    c = clusters.select(
        F.col("id").alias("__lid"), F.col("cluster").alias("__cl")
    )
    joined = df.join(c, F.col(id_col) == F.col("__lid"), "left").drop("__lid")
    key = F.coalesce(F.col("__cl"), F.col(id_col)).cast("string")
    return split_assign(
        joined, weights, id_col=id_col, salt=salt, out_col=out_col, key=key
    ).drop("__cl")


def mix_sources(
    df: DataFrame,
    targets: "dict[str, float]",
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic corpus mixing: subsample each source so the OUTPUT
    follows the ``targets`` proportions (e.g. 60% web, 30% code, 10%
    reference) at the largest total the inventory allows.

    Two passes: a tiny counts action (one row per source — the only
    thing collected), then the same hash-threshold filter as every
    sampler here. The feasible total is ``T = min_s count_s / w_s`` —
    the binding source keeps everything, the rest downsample to match.
    Unlisted sources drop. Reproducible and growth-stable for the
    non-binding sources (their rate depends only on the binding ratio);
    no ``rand()`` anywhere.

    Returns rows of ``df`` filtered to the mix (schema unchanged).
    """
    weights = {s: float(w) for s, w in targets.items() if float(w) > 0}
    if not weights:
        raise ValueError("mix_sources needs at least one positive target weight")
    total_w = sum(weights.values())
    weights = {s: w / total_w for s, w in weights.items()}
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).count().collect()
        if r[0] in weights
    }
    missing = sorted(set(weights) - set(counts))
    if missing:
        raise ValueError(f"targets name absent sources: {missing}")
    feasible_total = min(counts[s] / w for s, w in weights.items())
    rate = F.lit(0.0)
    for s, w in weights.items():
        r = min(1.0, (w * feasible_total) / counts[s])
        rate = F.when(F.col(source_col) == F.lit(s), F.lit(r)).otherwise(rate)
    return df.filter(hash_uniform(F.col(id_col), salt) < rate)


def temperature_sample(
    df: DataFrame,
    score_col: str,
    alpha: float = 0.5,
    by: str | None = None,
    id_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Quality-temperature sampling: keep each row with probability
    ``(score / max_score) ** alpha`` — the standard softened-by-quality
    corpus reweighting (alpha -> 0 keeps everything, alpha = 1 is
    proportional-to-quality). ``by`` normalizes against the PER-GROUP
    maximum (e.g. per source), so one high-scoring source can't starve
    the others; None normalizes globally.

    Deterministic like every sampler here: membership is
    ``hash_uniform(id) < p``; no ``rand()``. The max-score frame is one
    row per group, broadcast back onto the corpus — the corpus itself
    never shuffles. With the default ``alpha = 0.5`` the power is
    ``sqrt``, which IEEE-754 rounds correctly in every engine, so the
    DuckDB twin is bit-exact; other alphas go through ``pow``, whose
    last ulp is libm-specific (documented, not gate-checked).

    Returns kept rows with a ``p_keep`` column (rounded to 6).
    """
    score = F.col(score_col).cast("double")
    if by is None:
        mx = df.agg(F.max(score).alias("__mx"))
        joined = df.crossJoin(F.broadcast(mx))
    else:
        mx = df.groupBy(by).agg(F.max(score).alias("__mx"))
        joined = df.join(F.broadcast(mx), by)
    ratio = score / F.col("__mx")
    p = F.sqrt(ratio) if float(alpha) == 0.5 else F.pow(ratio, F.lit(float(alpha)))
    return (
        joined.filter(hash_uniform(F.col(id_col), salt) < p)
        .withColumn("p_keep", F.round(p, 6))
        .drop("__mx")
    )


def reservoir_sample(
    df: DataFrame,
    k: int,
    strata_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "reservoir",
) -> DataFrame:
    """Deterministic fixed-SIZE sample: the k rows with the smallest
    hash-uniform, per stratum (or globally with ``strata_col=None``) —
    the reproducible equivalent of reservoir sampling (fractions give a
    fixed RATE; quotas need a fixed COUNT). Stable under reordering and
    partitioning; adding rows can only displace the largest-hash members
    (bounded churn, unlike ``rand()`` reservoirs which reshuffle fully).

    Scale shape: one windowed top-k per stratum — Catalyst rewrites
    ``row_number <= k`` into a per-partition TopK, so no stratum is ever
    fully sorted; skew-prone strata can pre-thin with
    ``deterministic_sample`` first (the same hash order makes that a
    strict superset, so composition is lossless)."""
    from pyspark.sql import Window

    u = hash_uniform(F.col(id_col), salt)
    parts = [strata_col] if strata_col else []
    w = Window.partitionBy(*parts).orderBy(u.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .drop("__rn")
    )


def spatial_block_split(
    cells: DataFrame,
    weights: "dict[str, float]",
    block_cells: int = 4,
    buffer_cells: int = 1,
    cell_col: str = "cell_id",
    salt: str = "spatial",
    out_col: str = "split",
    grid_name: "str | None" = None,
) -> DataFrame:
    """Leakage-safe SPATIAL train/val/test assignment with a boundary
    buffer — the geospatial analog of :func:`leakage_safe_split`.

    Random per-tile splits leak in geospatial ML because neighboring
    tiles are spatially autocorrelated (a val tile 30 m from a train
    tile is nearly a duplicate). The standard remedy (Roberts et al.
    2017, "Cross-validation strategies for data with temporal, spatial,
    hierarchical, or phylogenetic structure", Ecography 40) is block
    cross-validation with a dead zone: tiles are assigned by SUPERBLOCK
    (``block_cells`` x ``block_cells`` groups of grid cells, hashed as a
    unit exactly like :func:`split_assign`), and any tile within
    ``buffer_cells`` of a boundary to a block holding a DIFFERENT split
    is re-assigned to the sentinel split ``"buffer"`` and excluded from
    both sides.

    Everything is integer arithmetic on the cell id (grid index / x / y
    bit fields) plus up to 8 md5-threshold evaluations for the adjacent
    blocks — one codegen projection, zero shuffle, zero Python. The
    assignment is a pure function of (salt, block), so it is stable
    under corpus growth and identical in the DuckDB twin. Boundary
    blocks at the grid edge have no neighbor on that side, so edge
    proximity alone never buffers a tile; two adjacent blocks that
    hash to the SAME split keep their border tiles (no dead zone is
    needed where there is no split boundary).

    ``buffer_cells`` must be < ``block_cells`` (a buffer as wide as the
    block would erase whole blocks; use a coarser block instead).

    With ``grid_name`` set, block neighbors WRAP at the antimeridian
    (block column arithmetic mod the grid's block count) — without it a
    train tile at x = nx-1 sits unguarded next to a val tile at x = 0,
    the one adjacency the open-plane default cannot see. Requires the
    blocks to tile the grid evenly (nx % block_cells == 0), because a
    ragged last column would make "the block across the seam" ambiguous.
    """
    if not 0 <= int(buffer_cells) < int(block_cells):
        raise ValueError("need 0 <= buffer_cells < block_cells")
    b = int(block_cells)
    r = int(buffer_cells)
    nbx = None
    if grid_name is not None:
        from ..functions import grid as G

        nx_cells = G.get_grid(grid_name).nx
        if nx_cells % b:
            raise ValueError(
                f"blocks of {b} cells do not tile grid {grid_name}"
                f" (nx={nx_cells}) evenly; antimeridian wrap undefined"
            )
        nbx = nx_cells // b
    c = F.col(cell_col).cast("long")
    x = F.shiftright(c, 27).bitwiseAND(F.lit((1 << 27) - 1))
    y = c.bitwiseAND(F.lit((1 << 27) - 1))
    bx = (x / b).cast("long")
    by = (y / b).cast("long")
    lx = x % b
    ly = y % b

    names = list(weights.keys())
    total = float(sum(weights.values()))

    def split_of(kx: Column, ky: Column) -> Column:
        u = hash_uniform(F.concat_ws("/", kx.cast("string"), ky.cast("string")), salt)
        expr = None
        cum = 0.0
        for name in names[:-1]:
            cum += float(weights[name]) / total
            cond = u < F.lit(cum)
            expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        return F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))

    home = split_of(bx, by)
    if nbx is None:
        west, east = bx - 1, bx + 1
        w_ok = bx > 0  # open plane: no neighbor past the edge
        e_ok = F.lit(True)
    else:
        west = F.pmod(bx - 1, F.lit(nbx))  # antimeridian wrap
        east = F.pmod(bx + 1, F.lit(nbx))
        w_ok = F.lit(True)
        e_ok = F.lit(True)
    # (neighbor-block, near-that-boundary) for the 8 adjacent blocks;
    # r = 0 disables buffering entirely (no condition can hold)
    sides = [
        (west, by, w_ok & (lx < r)),
        (east, by, e_ok & (lx >= b - r)),
        (bx, by - 1, (by > 0) & (ly < r)),
        (bx, by + 1, ly >= b - r),
        (west, by - 1, w_ok & (by > 0) & (lx < r) & (ly < r)),
        (west, by + 1, w_ok & (lx < r) & (ly >= b - r)),
        (east, by - 1, e_ok & (by > 0) & (lx >= b - r) & (ly < r)),
        (east, by + 1, e_ok & (lx >= b - r) & (ly >= b - r)),
    ]
    buffered = F.lit(False)
    if r > 0:
        for nx_, ny_, near in sides:
            buffered = buffered | (near & (split_of(nx_, ny_) != home))
    return cells.withColumn(out_col, F.when(buffered, F.lit("buffer")).otherwise(home))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "weighted",
) -> DataFrame:
    """Deterministic Poisson sampling with inclusion probability
    proportional to a per-row weight: keep row i iff
    ``hash_uniform(id) < min(1, w_i * rate)`` — the survey-sampling
    Poisson design (Särndal et al., "Model Assisted Survey Sampling",
    ch. 3), the standard way to bias a training mix toward long or
    high-quality documents without a shuffle.

    Expected sample size is ``sum(min(1, w_i * rate))``; rows with
    ``w_i >= 1/rate`` are always kept. Like every sampler here the
    decision is a pure function of (salt, id), so the sample is
    reproducible across runs, partitionings, and engines, and changing
    ``rate`` grows/shrinks the sample monotonically (nested designs).
    ``w * rate`` is one IEEE double multiply — bit-identical in the
    DuckDB twin — and the filter is a codegen scan: zero shuffle.

    Returns the kept rows plus ``inclusion_p`` (the Horvitz-Thompson
    1/pi reweighting needs it downstream)."""
    w = F.col(weight_col).cast("double")
    p = F.least(F.lit(1.0), w * F.lit(float(rate)))
    return df.filter(hash_uniform(F.col(id_col), salt) < p).withColumn(
        "inclusion_p", F.round(p, 9)
    )
