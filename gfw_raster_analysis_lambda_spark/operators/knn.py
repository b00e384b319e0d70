"""kNN tile lookup: Hamming-distance top-k over the 64-bit perceptual hash.

North-rule operator with no reference counterpart (the reference has no
similarity search). Two strategies:

- ``knn_phash``        one full scan of the images table serves *all*
                       queries at once: broadcast the (small) query set,
                       compute ``bit_count(phash XOR q)`` entirely in
                       codegen, then a per-query windowed top-k. No
                       index; cost = one scan regardless of query count.
- ``knn_phash_pruned`` spatially pruned variant: each query carries a
                       cell, candidates restricted to its k-ring
                       neighborhood via an equi-join on exploded ring
                       cells — the 100-TB path when queries are local.

Ties at the k-boundary break deterministically on (distance, image_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import grid as G


def _hamming(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def knn_phash(images: DataFrame, queries: DataFrame, k: int) -> DataFrame:
    """(query_id, q_phash) x images -> top-k nearest tiles per query.

    ``rank <= k`` over a window is rewritten by Catalyst into a per-
    partition TopK (no global sort); the crossJoin with a broadcast query
    set is a single pass over images.
    """
    q = F.broadcast(queries.select("query_id", F.col("phash").alias("q_phash")))
    scored = (
        images.select("image_id", "phash")
        .crossJoin(q)
        .withColumn("hamming", _hamming(F.col("phash"), F.col("q_phash")))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("image_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "image_id", "hamming", F.col("rn").alias("rank"))
    )


def knn_phash_pruned(
    images: DataFrame,  # must carry cell_id (sources.images.with_derived_keys)
    queries: DataFrame,  # (query_id, phash, cell_id)
    k: int,
    ring: int = 1,
    grid_name: str = "4/1024",
) -> DataFrame:
    """Spatially pruned kNN: candidates come only from each query's
    (2*ring+1)^2 cell neighborhood, turning the scan into a partition-
    pruned equi-join. Returns fewer than k rows for queries whose
    neighborhood has fewer tiles (caller widens the ring and retries —
    the standard expanding-ring search)."""
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def ring_cells(cells: pd.Series) -> pd.Series:
        grid = G.get_grid(grid_name)
        return pd.Series(
            [G.k_ring(grid, int(c), ring).tolist() for c in cells]
        )

    # relational ring expansion (no driver collect — query sets can be big)
    ringdf = F.broadcast(
        queries.select(
            "query_id",
            F.col("phash").alias("q_phash"),
            F.explode(ring_cells("cell_id")).alias("cell_id"),
        )
    )
    scored = images.select("image_id", "phash", "cell_id").join(
        ringdf, "cell_id"
    ).withColumn("hamming", _hamming(F.col("phash"), F.col("q_phash")))
    w = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("image_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "image_id", "hamming", F.col("rn").alias("rank"))
    )


def knn_phash_pruned_auto(
    images: DataFrame,
    queries: DataFrame,  # (query_id, phash, cell_id)
    k: int,
    ring: int = 1,
    max_ring: int = 8,
    grid_name: str = "4/1024",
) -> DataFrame:
    """Expanding-ring kNN: runs :func:`knn_phash_pruned` and WIDENS the
    ring (doubling, capped at ``max_ring``) for any query that received
    fewer than ``k`` rows, so callers get k rows per query without hand-
    rolling the retry loop. Semantics are the standard expanding-ring
    search: each query's result is the hamming top-k within the SMALLEST
    tried ring that yields >= k candidates (a sparser-but-closer-in-hash
    tile farther away is out of scope by design — this is the local-
    search operator; use :func:`knn_phash` for the global scan). Queries
    whose ``max_ring`` neighborhood still holds fewer than k tiles return
    what exists. Each round's result is localCheckpoint-ed, so no kernel
    re-runs across rounds; satisfied/pending routing is relational
    (semi/anti joins against the per-query counts — no driver collect of
    query ids, no per-id isin literals), so large query batches stay
    cheap; the per-round driver sync is one emptiness check."""
    if ring < 1 or max_ring < ring:
        raise ValueError(f"need 1 <= ring <= max_ring (got {ring}, {max_ring})")
    pending = queries
    parts = []
    r = int(ring)
    while True:
        got = knn_phash_pruned(images, pending, k, r, grid_name).localCheckpoint(eager=True)
        if r >= max_ring:
            parts.append(got)
            break
        sat = (
            got.groupBy("query_id").count()
            .filter(F.col("count") >= k)
            .select("query_id")
            .localCheckpoint(eager=True)
        )
        parts.append(got.join(F.broadcast(sat), "query_id", "left_semi"))
        pending = pending.join(F.broadcast(sat), "query_id", "left_anti")
        if pending.limit(1).count() == 0:
            break
        r = min(r * 2, int(max_ring))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def hamming64(a: int, b: int) -> int:
    """Driver-side Hamming for oracles/tests."""
    return int(bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1"))


def knn_oracle(images_phash: list[tuple[str, int]], q_phash: int, k: int) -> list[str]:
    d = sorted(
        ((hamming64(p, q_phash), iid) for iid, p in images_phash),
    )
    return [iid for _, iid in d[:k]]
