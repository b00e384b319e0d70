"""Integer-exact PageRank vs a brute-force python replay."""

from gfw_raster_analysis_lambda_spark.operators.graphs import SCALE, pagerank


def _py_pagerank(edges, iterations=5, damping=85):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out = {}
    for s, d in set(edges):
        out.setdefault(s, set()).add(d)
    rank = {v: SCALE // n for v in nodes}
    tel = ((100 - damping) * SCALE // 100) // n
    for _ in range(iterations):
        dangling = sum(rank[v] for v in nodes if v not in out)
        in_sum = {v: 0 for v in nodes}
        for s, ds in out.items():
            c = rank[s] // len(ds)
            for d in ds:
                in_sum[d] += c
        share = dangling // n
        rank = {v: tel + (damping * (in_sum[v] + share)) // 100 for v in nodes}
    return rank


def test_pagerank_matches_python_replay(spark):
    # hub-and-spoke plus a dangling sink and a cycle
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3), (6, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank_micro for r in pagerank(df, iterations=5).collect()}
    assert got == _py_pagerank(edges, iterations=5)
    # the 1<->3 mass cycle dominates the spokes and the dangling pair
    assert set(sorted(got, key=got.get)[-2:]) == {1, 3}
    # mass approximately conserved (floor losses only shrink it)
    assert 0.9 * SCALE <= sum(got.values()) <= SCALE


def test_pagerank_duplicate_edges_and_empty(spark):
    df = spark.createDataFrame([(1, 2), (1, 2), (2, 1)], "src long, dst long")
    got = {r.node: r.rank_micro for r in pagerank(df, iterations=3).collect()}
    # duplicate edge deduped: symmetric 2-cycle -> equal ranks
    assert got[1] == got[2]
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty).count() == 0
