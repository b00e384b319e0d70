"""Round-5 operator tests: residual IVF-PQ (IVFADC, Jegou et al. 2011).

The residual variant quantizes x - centroid(x) instead of x, so the PQ
code budget spans only each coarse cell's residual cloud. Contract
points: candidates still come only from probed buckets; the closure and
distributed LUT paths score bit-identically; and on a corpus that is
actually clustered (the case residual coding exists for) recall@k
dominates the plain-PQ variant.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _emb_df(spark, n=200, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype(np.float32)
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ), vecs


def _clustered_df(spark, n_clusters=8, groups=5, twins=6, dim=16, seed=11):
    """The regime residual encoding is designed for, at three scales:
    clusters (scale 8, resolved by the IVF coarse quantizer), twin
    GROUPS inside each cluster (scale 1 — the residual cloud the PQ
    codebook must resolve), and near-duplicate members inside each group
    (scale 0.003, far below code resolution, so one group = one code).
    A member's exact top-(twins-1) are its twins; residual codes
    separate groups, plain-PQ codes (quantizing raw vectors at
    whole-space scale) cannot. Ids 0..n_clusters-1 are the exact
    centers (the default centroid seeding), groups are interleaved so
    the non-centroid PQ seeds span all blobs."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim).astype(np.float64) * 8.0
    offsets = rng.randn(n_clusters, groups, dim)
    rows = [centers[c] for c in range(n_clusters)]
    for g in range(groups):
        for c in range(n_clusters):
            for _ in range(twins):
                rows.append(centers[c] + offsets[c, g] + rng.randn(dim) * 0.003)
    vecs = np.asarray(rows, dtype=np.float32)
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    ), vecs


def test_ivf_pq_residual_scores_only_probed_buckets(spark):
    from gfw_raster_analysis_lambda_spark.operators import similarity

    df, vecs = _emb_df(spark, n=160, dim=16, seed=5)
    qs = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.ivf_pq_residual_topk(
        df, qs, k=5, n_centroids=8, n_probe=2, m=4, ksub=8
    ).collect()
    cents = df.orderBy("vec_id").limit(8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assign = {r["id"]: r["centroid_id"] for r in
              similarity.ivf_assign(df, cents).collect()}
    v = vecs.astype(np.float64)
    cvecs = v[:8]
    for qid in (0, 1):
        cos = (cvecs @ v[qid]) / (np.linalg.norm(cvecs, axis=1) * np.linalg.norm(v[qid]))
        probed = set(np.lexsort((np.arange(8), -cos))[:2])
        got_ids = [r["id"] for r in out if r["query_id"] == qid]
        assert len(got_ids) == 5
        assert all(assign[i] in probed for i in got_ids), qid


def test_ivf_pq_residual_distributed_lut_parity(spark):
    """Past max_closure_queries the per-(query, centroid) LUTs are built
    per Arrow batch from query vectors riding the join (centroid matrix
    stays closure-tiny); scores must be bit-identical to the closure
    path."""
    from gfw_raster_analysis_lambda_spark.operators import similarity

    df, _ = _emb_df(spark, n=160, dim=16, seed=5)
    qs = df.filter(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    kw = dict(k=5, n_centroids=8, n_probe=2, m=4, ksub=8)
    fast = similarity.ivf_pq_residual_topk(
        df, qs, **kw
    ).orderBy("query_id", "rank").collect()
    slow = similarity.ivf_pq_residual_topk(
        df, qs, max_closure_queries=1, **kw
    ).orderBy("query_id", "rank").collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in slow]
    assert len(fast) == 12 * 5


def test_residual_encoding_dominates_plain_on_clustered_corpus(spark):
    """The reason IVFADC encodes residuals: on blobs, x - centroid(x)
    has tiny variance vs x, so the same 4x8 code budget resolves
    neighbors plain PQ smears together. Mean recall@5 must strictly
    dominate and residual must be near-perfect."""
    from gfw_raster_analysis_lambda_spark.operators import similarity

    df, vecs = _clustered_df(spark)
    qs = df.filter(F.col("vec_id").isin([8, 57, 120, 201])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    kw = dict(k=5, n_centroids=8, n_probe=2, m=4, ksub=8)
    exact = similarity.cosine_topk(df, qs, k=5)

    def mean_recall(approx):
        rows = similarity.recall_at_k(exact, approx, k=5).collect()
        return float(np.mean([r["recall"] for r in rows]))

    r_res = mean_recall(similarity.ivf_pq_residual_topk(df, qs, **kw))
    r_plain = mean_recall(similarity.ivf_pq_topk(df, qs, **kw))
    assert r_res > r_plain, (r_res, r_plain)
    assert r_res >= 0.9, (r_res, r_plain)


def test_ivf_pq_residual_rejects_empty_queries(spark):
    from gfw_raster_analysis_lambda_spark.operators import similarity

    df, _ = _emb_df(spark, n=64, dim=16, seed=3)
    empty = df.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with pytest.raises(ValueError):
        similarity.ivf_pq_residual_topk(df, empty, n_centroids=8, m=4, ksub=8)
