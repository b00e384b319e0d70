"""Iterative graph analytics: PageRank as deterministic Spark joins.

The components engine (operators/components.py) covers reachability;
this module adds the weighted-iteration family — link-based importance
over a directed edge table (Page et al. 1999). The use case in an
image+caption corpus: dedup/similarity passes emit edge tables
(near-dup graphs, citation/backlink graphs for provenance), and rank
over them decides which copy is canonical better than lowest-id when
the graph is skewed.

Determinism design: ranks are INTEGER micro-units end to end —
``contribution = rank // out_degree`` (integer division) and
``rank' = teleport + (damping_pct · Σ contributions) // 100`` — so
per-iteration results are bit-identical regardless of partitioning,
summation order, or engine; the DuckDB twin replays the same k
iterations as chained CTEs and hash-matches exactly. (Float PageRank
would differ across engines in ulps through unordered sums; integer
floor-division loses < 1 micro-unit per edge per round — irrelevant for
ranking, essential for verifiability.)

Scale shape per iteration: ONE shuffle (groupBy dst of the
contribution join); the edge table partitions by src and the rank
table is O(nodes). ``localCheckpoint`` per round truncates lineage
(the repo's standard iterative pattern). Dangling nodes (no out-edges)
follow the standard remedy: their mass redistributes uniformly — kept
integer-exact by adding ``dangling_sum // n`` to every node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # rank unit = 1e-6


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Integer-exact PageRank over (src, dst) edges. Nodes = every id
    appearing as src or dst; initial rank = SCALE // n per node; k
    rounds of rank' = (100 - damping)·SCALE/100/n + damping·(Σ in-
    contributions + dangling share)/100, all in int64 micro-units.
    Returns (node, rank_micro) — deterministic across engines and
    partitionings, so it hash-gates against a chained-CTE twin."""
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "node long, rank_micro long")
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranked = nodes.withColumn("rank_micro", F.lit(SCALE // n).cast("long"))
    teleport = ((100 - damping_pct) * SCALE // 100) // n
    for _ in range(int(iterations)):
        with_deg = ranked.join(
            out_deg, ranked["node"] == out_deg["src"], "left"
        ).select("node", "rank_micro", "deg")
        dangling = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank_micro"), F.lit(0)).alias("s"))
            .collect()[0]["s"]
        )
        contrib = (
            e.join(
                with_deg.filter(F.col("deg").isNotNull()),
                e["src"] == with_deg["node"],
            )
            .select(
                "dst",
                F.expr("rank_micro div deg").alias("c"),  # true int64 division
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        share = int(dangling) // n
        ranked = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(int(teleport)).cast("long")
                    + F.expr(
                        f"({damping_pct} * (coalesce(in_sum, 0L) + {share})) div 100"
                    )
                ).alias("rank_micro"),
            )
            .localCheckpoint(eager=True)
        )
    return ranked
