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


def _src_tile(sx, sy, cs):
    j = np.arange(cs, dtype=np.int64)
    gx = (sx * cs + j)[None, :]
    gy = (sy * cs + j)[:, None]
    return ((3 * gx + 5 * gy) % 241).astype(np.uint8)


def _src_images(spark, cells, cs, grid):
    from gfw_raster_analysis_lambda_spark.functions import codecs
    from gfw_raster_analysis_lambda_spark.functions import grid as G

    rows = [
        (f"tcl_year/{int(G.cell_from_xy(grid, sx, sy)):016x}",
         codecs.encode_tile(_src_tile(sx, sy, cs), "png"), cs, cs, "png")
        for sx, sy in cells
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def test_reproject_nearest_matches_exact_rational_oracle(spark):
    """Every destination pixel equals the source formula sampled at the
    exact rational pixel-center mapping — the non-integer (128/125)
    pixel ratio means neighboring dst pixels sometimes repeat and
    sometimes skip src pixels; the mapping must never drift."""
    from gfw_raster_analysis_lambda_spark.functions import codecs
    from gfw_raster_analysis_lambda_spark.functions import grid as G
    from gfw_raster_analysis_lambda_spark.operators.reproject import (
        reproject_nearest,
    )

    src, dst = G.get_grid("4/1024"), G.get_grid("1/250")
    cs, cd = src.chunk_px, dst.chunk_px
    cells = [(sx, sy) for sy in range(320, 324) for sx in range(740, 748)]
    out = reproject_nearest(
        _src_images(spark, cells, cs, src), "4/1024", "1/250"
    ).collect()
    assert len(out) == 2  # two complete 1-deg cells (185, 80) and (186, 80)
    num, den = 1024, 2000
    for r in out:
        dx, dy = (int(v) for v in G.cell_to_xy(int(r["cell_id"])))
        arr = codecs.decode_tile(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
        jj = np.arange(cd, dtype=np.int64)
        sgx = (2 * (dx * cd + jj) + 1) * num // den
        sgy = (2 * (dy * cd + jj) + 1) * num // den
        want = ((3 * sgx[None, :] + 5 * sgy[:, None]) % 241).astype(np.uint8)
        assert np.array_equal(arr, want), (dx, dy)
        assert r["image_id"] == f"tcl_year/{int(r['cell_id']):016x}"
        assert (r["w"], r["h"], r["fmt"], r["layer"]) == (250, 250, "png", "tcl_year")


def test_reproject_missing_src_tile_fills(spark):
    """Missing-tile tolerance (reference S2 analog): a dst tile whose
    mosaic has a hole gets the fill value in exactly the hole's sampled
    footprint, and decodes everywhere else."""
    from gfw_raster_analysis_lambda_spark.functions import codecs
    from gfw_raster_analysis_lambda_spark.functions import grid as G
    from gfw_raster_analysis_lambda_spark.operators.reproject import (
        reproject_nearest,
    )

    src, dst = G.get_grid("4/1024"), G.get_grid("1/250")
    cs, cd = src.chunk_px, dst.chunk_px
    cells = [(sx, sy) for sy in range(320, 324) for sx in range(740, 744)]
    dropped = (741, 321)
    cells.remove(dropped)
    out = reproject_nearest(
        _src_images(spark, cells, cs, src), "4/1024", "1/250", fill=255
    ).collect()
    assert len(out) == 1
    r = out[0]
    arr = codecs.decode_tile(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
    num, den = 1024, 2000
    jj = np.arange(cd, dtype=np.int64)
    sgx = (2 * (185 * cd + jj) + 1) * num // den
    sgy = (2 * (80 * cd + jj) + 1) * num // den
    in_hole_x = (sgx >= dropped[0] * cs) & (sgx < (dropped[0] + 1) * cs)
    in_hole_y = (sgy >= dropped[1] * cs) & (sgy < (dropped[1] + 1) * cs)
    hole = in_hole_y[:, None] & in_hole_x[None, :]
    assert hole.any() and not hole.all()
    assert np.all(arr[hole] == 255)
    want = ((3 * sgx[None, :] + 5 * sgy[:, None]) % 241).astype(np.uint8)
    assert np.array_equal(arr[~hole], want[~hole])


def test_reproject_rejects_non_nesting_grids(spark):
    from gfw_raster_analysis_lambda_spark.operators.reproject import (
        reproject_nearest,
    )

    df = spark.createDataFrame(
        [], "image_id string, bytes binary, w int, h int, fmt string"
    )
    with pytest.raises(ValueError):
        reproject_nearest(df, "1/250", "4/1024")  # dst finer than src cells


def test_semantic_contamination_flags_leaks_and_paraphrases(spark):
    """Exact benchmark copies (cos 1.0) and near-paraphrases (small
    perturbation) flag with the right best-matching bench item; unrelated
    vectors pass. The kept set is exactly corpus minus flagged."""
    from gfw_raster_analysis_lambda_spark.operators import dedup

    rng = np.random.RandomState(7)
    b0, b1 = rng.randn(16), rng.randn(16)
    rows = {
        0: b0,                                   # exact leak of bench 100
        1: b0 + rng.randn(16) * 0.02,            # paraphrase of bench 100
        2: b1,                                   # exact leak of bench 101
        3: rng.randn(16) * 3.0,                  # unrelated
        4: -b0,                                  # anti-correlated: cos -1
    }
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows.items()],
        "vec_id long, embedding array<float>",
    )
    bench = spark.createDataFrame(
        [(100, [float(x) for x in b0]), (101, [float(x) for x in b1])],
        "bench_id long, embedding array<float>",
    )
    flagged = {r["id"]: (r["bench_id"], r["cosine"])
               for r in dedup.semantic_contamination(emb, bench, 0.9).collect()}
    assert set(flagged) == {0, 1, 2}
    assert flagged[0] == (100, 1.0)
    assert flagged[2] == (101, 1.0)
    assert flagged[1][0] == 100 and flagged[1][1] >= 0.9
    kept = sorted(r["vec_id"] for r in
                  dedup.semantic_decontaminate(emb, bench, 0.9).collect())
    assert kept == [3, 4]


def test_semantic_contamination_guards_benchmark_size(spark):
    from gfw_raster_analysis_lambda_spark.operators import dedup

    df, _ = _emb_df(spark, n=32, dim=16, seed=2)
    bench = df.select(F.col("vec_id").alias("bench_id"), "embedding")
    with pytest.raises(ValueError):
        dedup.semantic_contamination(df, bench, max_bench=8)
    with pytest.raises(ValueError):
        dedup.semantic_contamination(df, bench.filter(F.col("bench_id") < 0))


def _video_frames(spark):
    # 4 base classes; v//4 = offset copies; v >= 8 additionally corrupt
    # every 5th frame (unique junk hashes)
    rows = [
        (v, t,
         10_000_000 + v * 1000 + t if v >= 8 and t % 5 == 0
         else (v % 4) * 100_000 + t + v // 4)
        for v in range(12) for t in range(20)
    ]
    return spark.createDataFrame(rows, "media_id long, frame int, phash long")


def test_video_temporal_pairs_offsets_and_corruption(spark):
    """Offset copies match at high jaccard (trim robustness), corrupted
    copies still match above the floor, different base content never
    pairs — the content-ID contract."""
    from gfw_raster_analysis_lambda_spark.operators import dedup

    out = {(r["a"], r["b"]): (r["shared"], r["jaccard"])
           for r in dedup.video_temporal_pairs(
               _video_frames(spark), k=3, threshold=0.2).collect()}
    # per base class: (base, offset copy), (base, corrupt), (offset, corrupt)
    assert set(out) == {(c, c + d) for c in range(4) for d in (4, 8)} | {
        (c + 4, c + 8) for c in range(4)}
    for c in range(4):
        sh, j = out[(c, c + 4)]
        assert sh == 17 and abs(j - 17 / 19) < 1e-6  # 6dp-rounded jaccard
        sh8, j8 = out[(c, c + 8)]
        assert sh8 == 6 and abs(j8 - 0.2) < 1e-6  # knife-edge at threshold
    # different base classes share nothing
    assert (0, 1) not in out and (0, 5) not in out


def test_video_temporal_df_cap_drops_static_shingles(spark):
    """A shingle shared by every video (black-frame run) must be dropped
    by df_cap instead of exploding the candidate join."""
    from gfw_raster_analysis_lambda_spark.operators import dedup

    rows = []
    for v in range(6):
        for t in range(8):
            rows.append((v, t, 7 if t < 4 else v * 100 + t))  # shared intro
    df = spark.createDataFrame(rows, "media_id long, frame int, phash long")
    out = dedup.video_temporal_pairs(df, k=3, threshold=0.05, df_cap=4).collect()
    assert out == []  # only the intro is shared, and its df=6 > cap=4


def test_bigram_lm_scores_hand_computed(spark):
    """Tiny corpus with exactly computable smoothed probabilities:
    doc0 'a b a' -> avg nll = (log2(4/3) + log2(3/2)) / 2 = 0.5 exactly;
    doc2 has < 2 tokens -> unscored, tail bucket."""
    from gfw_raster_analysis_lambda_spark.operators import text

    d = spark.createDataFrame(
        [(0, "a b a"), (1, "a b"), (2, "c")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in text.perplexity_buckets(
        text.bigram_lm_scores(d), n_buckets=3).collect()}
    assert rows[0]["n_bigrams"] == 2 and abs(rows[0]["avg_nll"] - 0.5) < 1e-6
    assert rows[1]["n_bigrams"] == 1 and abs(
        rows[1]["avg_nll"] - 0.415037) < 1e-6  # log2(4/3) rounded
    assert rows[2]["n_bigrams"] == 0 and rows[2]["avg_nll"] is None
    assert (rows[1]["bucket"], rows[0]["bucket"], rows[2]["bucket"]) == (1, 2, 3)


def test_bigram_lm_separate_train_corpus_and_oov(spark):
    """Scoring against a SEPARATE trusted LM (the real CCNet shape):
    out-of-vocabulary bigrams get pure smoothing mass (0+k)/(0+kV)."""
    from gfw_raster_analysis_lambda_spark.operators import text

    train = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    score = spark.createDataFrame([(7, "z z")], "doc_id long, text string")
    r = text.bigram_lm_scores(score, train=train).collect()[0]
    # V = 2 ({x, y}); P(z|z) = (0+1)/(0+2) = 0.5 -> nll = 1.0
    assert r["doc_id"] == 7 and r["n_bigrams"] == 1
    assert abs(r["avg_nll"] - 1.0) < 1e-6


def test_perplexity_buckets_boilerplate_lands_in_head(spark):
    """Self-perplexity ranks highly repetitive docs lowest (head) and
    unique-vocabulary docs highest — the signal CCNet buckets exist for."""
    from gfw_raster_analysis_lambda_spark.operators import text

    docs = [(0, "spam spam spam spam spam spam spam spam")]
    docs += [(i, f"unique{i}a unique{i}b unique{i}c unique{i}d") for i in range(1, 9)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["bucket"] for r in text.perplexity_buckets(
        text.bigram_lm_scores(d), n_buckets=3).collect()}
    assert out[0] == 1  # the repetitive doc is the head of the head


def test_shard_pack_index_addresses_blobs_exactly(spark):
    """The relational index must address into the assembled blobs
    byte-for-byte: blob[offset : offset+length] == the item's payload,
    every shard's total_bytes == sum of member lengths, and every item
    appears exactly once across shards."""
    import hashlib

    from gfw_raster_analysis_lambda_spark.operators import multimodal

    rows = [(f"img/{i:06d}", bytes([i % 251]) * (64 + (i * 37) % 400))
            for i in range(120)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    idx = multimodal.shard_pack_index(df, n_shards=8).collect()
    blobs = {r["shard"]: r for r in
             multimodal.shard_pack_blobs(df, n_shards=8).collect()}
    payload = dict(rows)
    assert len(idx) == 120 and len({r["image_id"] for r in idx}) == 120
    for r in idx:
        blob = bytes(blobs[r["shard"]]["blob"])
        assert blob[r["offset"]: r["offset"] + r["length"]] == payload[r["image_id"]]
    for s, b in blobs.items():
        members = [r for r in idx if r["shard"] == s]
        assert b["n_items"] == len(members)
        assert b["total_bytes"] == sum(r["length"] for r in members)
        assert b["blob_md5"] == hashlib.md5(bytes(b["blob"])).hexdigest()


def test_shard_pack_assignment_is_growth_stable(spark):
    """Adding new items never moves an existing item to another shard
    (md5 on the id, not on position) — the rebuild-stability contract."""
    from gfw_raster_analysis_lambda_spark.operators import multimodal

    small = [(f"img/{i:06d}", b"x" * 10) for i in range(40)]
    big = small + [(f"img/{i:06d}", b"y" * 10) for i in range(40, 80)]
    a = {r["image_id"]: r["shard"] for r in multimodal.shard_pack_index(
        spark.createDataFrame(small, "image_id string, bytes binary"),
        n_shards=8).collect()}
    b = {r["image_id"]: r["shard"] for r in multimodal.shard_pack_index(
        spark.createDataFrame(big, "image_id string, bytes binary"),
        n_shards=8).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_mosaic_aoi_fills_missing_and_guards_size(spark):
    """A dropped tile inside the window exports as the fill value in
    exactly that cell's footprint; an AOI whose window exceeds max_px
    fails fast with the guard error, not an OOM."""
    from gfw_raster_analysis_lambda_spark.functions import codecs
    from gfw_raster_analysis_lambda_spark.functions import geometry as geo
    from gfw_raster_analysis_lambda_spark.functions import grid as G
    from gfw_raster_analysis_lambda_spark.operators import mosaic
    from gfw_raster_analysis_lambda_spark.sources import fixtures
    from gfw_raster_analysis_lambda_spark.sources.images import with_derived_keys

    images = with_derived_keys(spark.createDataFrame(
        fixtures.generate_images_rows(), fixtures.IMAGES_SCHEMA))
    # drop the (761, 277) tcl_year tile from the corpus
    drop_cell = int(G.cell_from_xy(G.GRID_FIXTURE, 761, 277))
    holey = images.filter(
        ~((F.col("layer") == "tcl_year") & (F.col("cell_id") == drop_cell)))
    aoi = spark.createDataFrame(
        [("m1", geo.wkb_dumps(geo.box(10.125, 20.375, 10.625, 20.875)))],
        fixtures.AOI_SCHEMA)
    r = mosaic.mosaic_aoi(holey, aoi, "tcl_year", "4/1024", fill=200).collect()[0]
    arr = codecs.decode_tile(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
    assert (r["w"], r["h"], r["gx0"], r["gy0"]) == (192, 192, 760 * 64, 276 * 64)
    hole = arr[64:128, 64:128]  # cell (761, 277) is at window position (1, 1)
    assert np.all(hole == 200)
    # the rest matches the fixture formula
    x = np.arange(760 * 64, 763 * 64)
    y = np.arange(276 * 64, 279 * 64)
    cx, jj = np.divmod(x, 64)
    cy, ii = np.divmod(y, 64)
    want = ((cx[None, :] * 7 + cy[:, None] * 11 + ii[:, None] * 13
             + jj[None, :] * 17) % 21).astype(arr.dtype)
    mask = np.ones_like(arr, dtype=bool)
    mask[64:128, 64:128] = False
    assert np.array_equal(arr[mask], want[mask])

    with pytest.raises(Exception, match="max_px"):
        mosaic.mosaic_aoi(images, aoi, "tcl_year", "4/1024", max_px=100).collect()


def test_image_quality_signals_blur_and_clipping(spark):
    """A constant tile has zero Laplacian variance; a checkerboard has
    the maximum; a clipped tile reports exact 0/255 fractions; tiny
    tiles (no interior) score NULL blur instead of crashing."""
    from gfw_raster_analysis_lambda_spark.functions import codecs
    from gfw_raster_analysis_lambda_spark.operators import multimodal

    flat = np.full((16, 16), 128, np.uint8)
    checker = (np.indices((16, 16)).sum(axis=0) % 2 * 255).astype(np.uint8)
    clipped = np.zeros((16, 16), np.uint8)
    clipped[:8] = 255  # half 0, half 255
    tiny = np.full((2, 2), 7, np.uint8)
    rows = [
        (name, codecs.encode_tile(a, "png"), a.shape[1], a.shape[0], "png")
        for name, a in [("flat", flat), ("checker", checker),
                        ("clip", clipped), ("tiny", tiny)]
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string")
    out = {r["image_id"]: r for r in
           multimodal.image_quality_signals(df).collect()}
    assert out["flat"]["lap_var"] == 0.0
    assert out["checker"]["lap_var"] > out["flat"]["lap_var"]
    # checkerboard interior: lap = 4*255 - 0 = +-1020, mean 0 -> var = 1020^2
    assert abs(out["checker"]["lap_var"] - 1020.0 ** 2) < 1e-3
    assert abs(out["clip"]["clip_lo"] - 0.5) < 1e-9
    assert abs(out["clip"]["clip_hi"] - 0.5) < 1e-9
    assert out["tiny"]["lap_var"] is None


def test_geo_distance_pairs_matches_bruteforce_and_crosses_cells(spark):
    """The neighbor-cell candidate join must find every pair the O(n^2)
    scan finds — including pairs straddling a cell boundary — and
    nothing else; each unordered pair exactly once."""
    from gfw_raster_analysis_lambda_spark.operators import spatial_join

    pts = [(i, 10.0 + (i * 13 % 40) / 64.0, 20.0 + (i * 29 % 40) / 64.0)
           for i in range(60)]
    # straddlers: two points 0.02 deg apart across the 10.25 cell edge
    pts += [(100, 10.24, 20.1), (101, 10.26, 20.1)]
    df = spark.createDataFrame(pts, "image_id long, lon double, lat double")
    got = {(r["a"], r["b"]) for r in
           spatial_join.geo_distance_pairs(df, 0.1, "4/1024").collect()}
    want = set()
    for i, (ia, lo_a, la_a) in enumerate(pts):
        for ib, lo_b, la_b in pts[i + 1:]:
            if (lo_a - lo_b) ** 2 + (la_a - la_b) ** 2 <= 0.01:
                want.add((min(ia, ib), max(ia, ib)))
    assert got == want
    assert (100, 101) in got  # the cross-cell pair
    rows = spatial_join.geo_distance_pairs(df, 0.1, "4/1024").collect()
    assert len(rows) == len(got)  # no duplicate emissions


def test_dbscan_labels_semantics(spark):
    """Two blobs cluster separately (labels = min member id), the border
    point attaches to blob A without becoming core, isolated points are
    noise with NULL label."""
    from gfw_raster_analysis_lambda_spark.operators import spatial_join

    pts = []
    for i in range(9):
        pts.append((i, 10.0 + (i % 3) / 128.0, 20.0 + (i // 3) / 128.0))
    for i in range(9, 18):
        pts.append((i, 10.5 + ((i - 9) % 3) / 128.0, 20.4 + ((i - 9) // 3) / 128.0))
    pts.append((18, 10.0 + 8.0 / 128.0, 20.0))
    for i in range(19, 22):
        pts.append((i, 12.0 + (i - 19), 25.0))
    df = spark.createDataFrame(pts, "image_id long, lon double, lat double")
    out = {r["id"]: (r["role"], r["label"]) for r in
           spatial_join.dbscan_labels(df, 0.05, 5, "4/1024").collect()}
    for i in range(9):
        assert out[i] == ("core", 0), i
    for i in range(9, 18):
        assert out[i] == ("core", 9), i
    assert out[18] == ("border", 0)
    for i in range(19, 22):
        assert out[i] == ("noise", None), i


def test_dbscan_chain_merges_through_shared_core(spark):
    """Transitivity: two blobs bridged by a chain of mutually-reachable
    core points collapse into ONE cluster — the property the
    pointer-jumping closure provides."""
    from gfw_raster_analysis_lambda_spark.operators import spatial_join

    pts = [(i, 10.0 + i * 0.02, 20.0) for i in range(10)]  # dense line
    df = spark.createDataFrame(pts, "image_id long, lon double, lat double")
    # eps 0.05 reaches 2 neighbors either side: interior points (2..7)
    # have degree 4+1 >= 5 and are core; chain ends (0,1,8,9) have too
    # few neighbors and become border points of the single cluster
    out = {r["id"]: (r["role"], r["label"]) for r in
           spatial_join.dbscan_labels(df, 0.05, 5, "4/1024").collect()}
    assert {i for i, v in out.items() if v[0] == "core"} == set(range(2, 8))
    assert all(out[i] == ("core", 2) for i in range(2, 8))
    assert all(out[i] == ("border", 2) for i in (0, 1, 8, 9))


def test_paragraph_dedup_first_occurrence_and_reassembly(spark):
    """Only the first corpus occurrence of a duplicated paragraph
    survives (lowest doc, then position); order within each doc is
    preserved; short/blank paragraphs pass through; a fully-duplicated
    document returns empty text with honest counts."""
    from gfw_raster_analysis_lambda_spark.operators import text

    docs = spark.createDataFrame([
        (0, "alpha\nshared line\nbeta"),
        (1, "shared line\ngamma\n\ndelta"),     # blank para passes through
        (2, "shared line"),                      # fully duplicated
        (3, "shared line\nshared line\nepsilon"),  # dup within one doc too
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.paragraph_dedup(docs).collect()}
    assert out[0]["text"] == "alpha\nshared line\nbeta"
    assert (out[0]["n_paragraphs"], out[0]["n_dropped"]) == (3, 0)
    assert out[1]["text"] == "gamma\n\ndelta"
    assert (out[1]["n_paragraphs"], out[1]["n_dropped"]) == (4, 1)
    assert out[2]["text"] == "" and out[2]["n_dropped"] == 1
    assert out[3]["text"] == "epsilon" and out[3]["n_dropped"] == 2


def test_reproject_plan_single_exchange(spark):
    """The reprojection plan must shuffle encoded tile bytes exactly
    ONCE (the dst-cell groupBy) — the dst-cell derivation is codegen bit
    arithmetic before the Exchange, never a UDF."""
    from gfw_raster_analysis_lambda_spark.operators.reproject import (
        reproject_nearest,
    )

    cells = [(sx, sy) for sy in range(320, 322) for sx in range(740, 742)]
    df = reproject_nearest(_src_images(spark, cells, 64,
                                       __import__("gfw_raster_analysis_lambda_spark.functions.grid",
                                                  fromlist=["grid"]).get_grid("4/1024")),
                           "4/1024", "1/250")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "FlatMapGroupsInPandas" in plan


def test_mosaic_plan_exchanges_bounded(spark):
    """The mosaic export shuffles grouped by aoi_id; the AOI-to-cell
    side rides broadcast (the planner's aoi_cells machinery), so the
    plan never exchanges tile bytes more than once."""
    from gfw_raster_analysis_lambda_spark.functions import geometry as geo
    from gfw_raster_analysis_lambda_spark.operators import mosaic
    from gfw_raster_analysis_lambda_spark.sources import fixtures
    from gfw_raster_analysis_lambda_spark.sources.images import with_derived_keys

    images = with_derived_keys(spark.createDataFrame(
        fixtures.generate_images_rows(), fixtures.IMAGES_SCHEMA))
    aoi = spark.createDataFrame(
        [("m1", geo.wkb_dumps(geo.box(10.125, 20.375, 10.625, 20.875)))],
        fixtures.AOI_SCHEMA)
    df = mosaic.mosaic_aoi(images, aoi, "tcl_year", "4/1024")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # tile BYTES shuffle exactly once (the aoi_id groupBy): candidates
    # attach via BroadcastExchange, and crucially there is NO cell_id
    # hash shuffle (the naive left-join plan shuffled the bytes twice —
    # cell-keyed SortMergeJoin plus the groupBy; this pins the fix).
    # The only other hash Exchange is the tiny bbox metadata aggregate.
    assert "hashpartitioning(cell_id" not in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


# ---------------------------------------------------------------------------
# Partial-pixel coverage zonal (operators/coverage.py)
# ---------------------------------------------------------------------------


def test_coverage_counts_box_closed_form():
    """A box whose edges fall strictly between subpixel columns: every
    pixel's count equals the product of its in-range subrows and
    subcolumns — computable independently from first principles."""
    from gfw_raster_analysis_lambda_spark.functions import geometry as geo

    k = 4
    x0, y0, ps, w, h = 0.0, 1.0, 0.125, 8, 8
    bx = (0.17, 0.23, 0.81, 0.77)  # fractional w.r.t. both grids
    cnt = geo.coverage_counts(geo.box(*bx), x0, y0, ps, w, h, k=k)
    fx = ps / k
    subx = x0 + (np.arange(w * k) + 0.5) * fx
    suby = y0 - (np.arange(h * k) + 0.5) * fx
    incol = ((subx > bx[0]) & (subx < bx[2])).reshape(w, k).sum(axis=1)
    inrow = ((suby > bx[1]) & (suby < bx[3])).reshape(h, k).sum(axis=1)
    exp = np.outer(inrow, incol)
    assert cnt.shape == (h, w) and (cnt == exp).all()
    assert cnt.max() == k * k
    assert ((cnt > 0) & (cnt < k * k)).any()  # fractional boundary pixels


def test_coverage_counts_matches_bruteforce_contains():
    """Arbitrary concave polygon: counts equal a brute-force
    contains_points over every subpixel center (independent of the
    reshape-sum path's indexing)."""
    from gfw_raster_analysis_lambda_spark.functions import geometry as geo

    poly = [[np.array([[0.1, 0.15], [0.9, 0.3], [0.55, 0.5],
                       [0.85, 0.9], [0.2, 0.8]])]]
    k, w, h, ps = 3, 6, 6, 1.0 / 6
    cnt = geo.coverage_counts(poly, 0.0, 1.0, ps, w, h, k=k)
    fx = ps / k
    sx = 0.0 + (np.arange(w * k) + 0.5) * fx
    sy = 1.0 - (np.arange(h * k) + 0.5) * fx
    gx, gy = np.meshgrid(sx, sy)
    inside = geo.contains_points(poly, gx.ravel(), gy.ravel()).reshape(h * k, w * k)
    exp = inside.reshape(h, k, w, k).sum(axis=(1, 3))
    assert (cnt == exp).all()


def test_coverage_zonal_beats_center_containment_on_thin_aoi(spark):
    """The reason this operator exists: a thin sliver AOI (sub-pixel
    width) has ZERO pixels by center containment on an unlucky offset,
    but its coverage-weighted area converges to the true geometric
    area. Also pins the exact-integer contract of cov_sub against a
    driver-side recomputation over the same tiles."""
    from gfw_raster_analysis_lambda_spark.functions import geometry as geo
    from gfw_raster_analysis_lambda_spark.operators import coverage
    from gfw_raster_analysis_lambda_spark.sources import fixtures
    from gfw_raster_analysis_lambda_spark.sources.images import with_derived_keys

    images = with_derived_keys(
        spark.createDataFrame(
            fixtures.generate_images_rows(), fixtures.IMAGES_SCHEMA
        )
    ).filter(F.col("layer") == "tcl_year")
    grid = fixtures.GRID
    ps = grid.pixel_size
    # a sliver 0.4 px wide x 40 px tall, horizontally BETWEEN two pixel
    # center columns (center column at 10 + (m+0.5)*ps; put the sliver
    # in (center, next center) so no center falls inside)
    x1 = 10.0 + 20.6 * ps
    x2 = x1 + 0.4 * ps
    y1, y2 = 20.1, 20.1 + 40 * ps
    aoi = spark.createDataFrame(
        [("sliver", geo.wkb_dumps(geo.box(x1, y1, x2, y2)))],
        fixtures.AOI_SCHEMA,
    )
    rows = coverage.coverage_zonal(images, aoi, grid.name, k=4).collect()
    assert len(rows) == 1
    r = rows[0]
    # center containment sees nothing; coverage sees ~0.4*40 = 16 px
    mask_px = 0
    for cell_row in images.collect():
        x0, y0t, _ = __import__(
            "gfw_raster_analysis_lambda_spark.functions.grid", fromlist=["g"]
        ).cell_affine(grid, cell_row["cell_id"])
        m = geo.rasterize_mask(
            geo.box(x1, y1, x2, y2), x0, y0t, ps, grid.chunk_px, grid.chunk_px
        )
        mask_px += int(m.sum())
    assert mask_px == 0
    true_px = (x2 - x1) * (y2 - y1) / (ps * ps)
    assert r["cov_px"] == pytest.approx(true_px, rel=0.3)
    assert r["n_full"] == 0 and r["n_any"] >= 40
    assert r["cov_px"] == r["cov_sub"] / 16.0  # the exact-integer core


# ---------------------------------------------------------------------------
# Bilinear reprojection (operators/reproject.py reproject_bilinear)
# ---------------------------------------------------------------------------


def _bilinear_reference(value_of, dx, dy, present):
    """Global-mosaic bilinear reference, independent indexing: dst cell
    (dx, dy) on 1/250 over src 4/1024. value_of(X, Y) gives the source
    pixel; present(X, Y) says whether its tile exists; absent corners
    clamp per axis into the dst cell's own range."""
    cd, num, den = 250, 1024, 2000
    out = np.zeros((cd, cd), dtype=np.float32)
    for i in range(cd):
        ay = (2 * (dy * cd + i) + 1) * num - den // 2
        p0y, wy1 = ay // den, ay % den
        for j in range(cd):
            ax = (2 * (dx * cd + j) + 1) * num - den // 2
            p0x, wx1 = ax // den, ax % den
            acc = 0
            for (X, Y, w) in (
                (p0x, p0y, (den - wy1) * (den - wx1)),
                (p0x + 1, p0y, (den - wy1) * wx1),
                (p0x, p0y + 1, wy1 * (den - wx1)),
                (p0x + 1, p0y + 1, wy1 * wx1),
            ):
                if present(X, Y):
                    v = value_of(X, Y)
                else:
                    Xc = min(max(X, dx * 256), dx * 256 + 255)
                    Yc = min(max(Y, dy * 256), dy * 256 + 255)
                    v = value_of(Xc, Yc)
                acc += v * w
            out[i, j] = np.float32(acc / float(den * den))
    return out


def _repro_images(spark, dst_cells):
    from gfw_raster_analysis_lambda_spark.functions import codecs, grid as G

    src = G.get_grid("4/1024")
    cs = src.chunk_px
    rows = []
    for ddx, ddy in dst_cells:
        for sy in range(ddy * 4, ddy * 4 + 4):
            for sx in range(ddx * 4, ddx * 4 + 4):
                j = np.arange(cs, dtype=np.int64)
                gx, gy = (sx * cs + j)[None, :], (sy * cs + j)[:, None]
                tile = ((3 * gx + 5 * gy) % 241).astype(np.uint8)
                cell = int(G.cell_from_xy(src, sx, sy))
                rows.append((f"tcl_year/{cell:016x}",
                             codecs.encode_tile(tile, "png"), cs, cs, "png"))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def test_reproject_bilinear_matches_global_reference(spark):
    """Two ADJACENT dst cells: every output pixel — including the seam
    column, whose right neighbors live in the other cell's source tiles
    — must equal the global bilinear reference. Proves the halo
    duplication actually ships the cross-seam pixels."""
    from gfw_raster_analysis_lambda_spark.functions import codecs, grid as G
    from gfw_raster_analysis_lambda_spark.operators.reproject import (
        reproject_bilinear,
    )

    cells = [(40, 9), (41, 9)]
    out = reproject_bilinear(_repro_images(spark, cells), "4/1024", "1/250")
    got = {
        tuple(int(v) for v in G.cell_to_xy(int(r["cell_id"]))):
            codecs.decode_tile(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
        for r in out.collect()
    }
    assert set(got) == set(cells)
    tile_set = {(sx, sy) for dx, dy in cells
                for sy in range(dy * 4, dy * 4 + 4)
                for sx in range(dx * 4, dx * 4 + 4)}

    def value_of(X, Y):
        return (3 * X + 5 * Y) % 241

    def present(X, Y):
        return (X // 64, Y // 64) in tile_set

    for dx, dy in cells:
        ref = _bilinear_reference(value_of, dx, dy, present)
        assert np.array_equal(got[(dx, dy)], ref), (dx, dy)
    # the equality above includes the left cell's LAST dst column, whose
    # right interpolation neighbors live in the other cell's source
    # tiles — with a fill/clamp seam instead of the halo it would differ by
    # up to a full source-pixel step, so exact equality IS the seam test


def test_reproject_bilinear_constant_field_and_halo_only_groups(spark):
    """Bilinear of a constant field is exactly the constant everywhere
    (weights sum to den^2), and halo-only destination groups (borders of
    the synthesized region) must produce NO output tiles."""
    from gfw_raster_analysis_lambda_spark.functions import codecs, grid as G
    from gfw_raster_analysis_lambda_spark.operators.reproject import (
        reproject_bilinear,
    )

    src = G.get_grid("4/1024")
    cs = src.chunk_px
    rows = []
    for sy in range(9 * 4, 9 * 4 + 4):
        for sx in range(40 * 4, 40 * 4 + 4):
            tile = np.full((cs, cs), 7, dtype=np.uint8)
            cell = int(G.cell_from_xy(src, sx, sy))
            rows.append((f"tcl_year/{cell:016x}",
                         codecs.encode_tile(tile, "png"), cs, cs, "png"))
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    out = reproject_bilinear(images, "4/1024", "1/250").collect()
    assert len(out) == 1  # neighbors got halo tiles but emit nothing
    arr = codecs.decode_tile(bytes(out[0]["bytes"]), 250, 250, "raw_f32")
    assert np.array_equal(arr, np.full((250, 250), 7.0, dtype=np.float32))


def test_reproject_bilinear_float_source_no_truncation(spark):
    """Float32 sources must interpolate on their REAL values: fractional
    pixels (previously truncated by an int64 cast) and pixels equal to
    -1.0 / fill=-1 (previously colliding with the unset-halo sentinel)
    both reproject to the exact global bilinear reference."""
    from gfw_raster_analysis_lambda_spark.functions import codecs, grid as G
    from gfw_raster_analysis_lambda_spark.operators.reproject import (
        reproject_bilinear,
    )

    src = G.get_grid("4/1024")
    cs = src.chunk_px
    cells = [(40, 9), (41, 9)]

    def value_of(X, Y):
        v = ((3 * X + 5 * Y) % 241) / 8.0 - 1.0  # fractional, hits -1.0
        return np.float64(np.float32(v))

    rows = []
    tile_set = {(sx, sy) for dx, dy in cells
                for sy in range(dy * 4, dy * 4 + 4)
                for sx in range(dx * 4, dx * 4 + 4)}
    for sx, sy in sorted(tile_set):
        j = np.arange(cs, dtype=np.int64)
        gx, gy = (sx * cs + j)[None, :], (sy * cs + j)[:, None]
        tile = ((((3 * gx + 5 * gy) % 241) / 8.0) - 1.0).astype(np.float32)
        cell = int(G.cell_from_xy(src, sx, sy))
        rows.append((f"emissions/{cell:016x}",
                     codecs.encode_tile(tile, "raw_f32"), cs, cs, "raw_f32"))
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    out = reproject_bilinear(images, "4/1024", "1/250", fill=-1)
    got = {
        tuple(int(v) for v in G.cell_to_xy(int(r["cell_id"]))):
            codecs.decode_tile(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
        for r in out.collect()
    }
    assert set(got) == set(cells)

    def present(X, Y):
        return (X // 64, Y // 64) in tile_set

    for dx, dy in cells:
        ref = _bilinear_reference(value_of, dx, dy, present)
        assert np.array_equal(got[(dx, dy)], ref), (dx, dy)
    # fractional values survive: truncation would floor every pixel
    assert not np.array_equal(got[cells[0]], np.floor(got[cells[0]]))


def test_paragraph_dedup_metachar_separator_is_literal(spark):
    """A regex-metacharacter separator ('||') must split LITERALLY —
    before the Pattern.quote fix F.split treated it as a regex matching
    the empty string, shredding every document into characters."""
    from gfw_raster_analysis_lambda_spark.operators import text

    docs = spark.createDataFrame(
        [("d1", "alpha||beta||gamma"), ("d2", "beta||delta")],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in
           text.paragraph_dedup(docs, sep="||").collect()}
    assert out["d1"]["text"] == "alpha||beta||gamma"
    assert out["d1"]["n_paragraphs"] == 3 and out["d1"]["n_dropped"] == 0
    assert out["d2"]["text"] == "delta"  # 'beta' first seen in d1
    assert out["d2"]["n_paragraphs"] == 2 and out["d2"]["n_dropped"] == 1


def test_hotspot_stats_random_world_fuzz(spark):
    """Seeded fuzz incl. a missing tile: Gi* hot/cold-pixel counts from
    the halo-exchange integral-image kernel must equal a direct
    per-pixel enumeration with exact python-int arithmetic (the squared
    inequality A^2*(N-1) >= t^2*B*C never touches a float on either
    side). A clustered world must flag hot spots; a constant world has
    B = 0 and must flag nothing."""
    from gfw_raster_analysis_lambda_spark.functions import codecs
    from gfw_raster_analysis_lambda_spark.operators import focal
    from gfw_raster_analysis_lambda_spark.sources import fixtures
    from gfw_raster_analysis_lambda_spark.functions import grid as G

    GRID = fixtures.GRID
    TILE = GRID.chunk_px
    X0, Y0, NX, NY = fixtures.X0, fixtures.Y0, fixtures.NX, fixtures.NY

    rng = np.random.default_rng(20260819)
    base = np.repeat(np.repeat(
        rng.integers(0, 200, size=(NY * 8, NX * 8)), 8, 0), 8, 1)
    worlds = {"clustered": base.astype(np.uint8),
              "constant": np.full_like(base, 7, dtype=np.uint8)}
    all_tiles = [(dx, dy) for dx in range(NX) for dy in range(NY)]
    drop = {all_tiles[int(rng.integers(len(all_tiles)))]}
    present = sorted(set(all_tiles) - drop)
    t = 2
    for name, world in worlds.items():
        valid = np.zeros(world.shape, dtype=bool)
        rows = []
        for dx, dy in present:
            valid[dy * TILE:(dy + 1) * TILE, dx * TILE:(dx + 1) * TILE] = True
            rows.append((
                int(G.cell_from_xy(GRID, X0 + dx, Y0 + dy)),
                codecs.encode_tile(
                    world[dy * TILE:(dy + 1) * TILE,
                          dx * TILE:(dx + 1) * TILE], "png"
                ), TILE, TILE, "png",
            ))
        df = spark.createDataFrame(
            rows, "cell_id long, bytes binary, w int, h int, fmt string"
        )
        got = {r["cell_id"]: r for r in
               focal.hotspot_stats(df, t=t).collect()}
        # brute-force oracle in python ints
        x = world.astype(object)
        n = int(valid.sum())
        s1 = int(world[valid].astype(np.int64).sum())
        s2 = int((world[valid].astype(np.int64) ** 2).sum())
        b_term = n * s2 - s1 * s1
        h, w = world.shape
        expect = {}
        for dx, dy in present:
            cell = int(G.cell_from_xy(GRID, X0 + dx, Y0 + dy))
            hot = cold = 0
            for i in range(dy * TILE, (dy + 1) * TILE):
                for j in range(dx * TILE, (dx + 1) * TILE):
                    ws = wn = 0
                    for ii in range(max(0, i - 1), min(h, i + 2)):
                        for jj in range(max(0, j - 1), min(w, j + 2)):
                            if valid[ii, jj]:
                                ws += int(x[ii, jj]); wn += 1
                    a = n * ws - s1 * wn
                    if a * a * (n - 1) >= t * t * b_term * (n * wn - wn * wn):
                        if a > 0:
                            hot += 1
                        elif a < 0:
                            cold += 1
            expect[cell] = (TILE * TILE, hot, cold)
        assert set(got) == set(expect), name
        for cell, (npx, hot, cold) in expect.items():
            r = got[cell]
            assert (r["n_px"], r["hot_px"], r["cold_px"]) == (npx, hot, cold), (
                name, cell)
        if name == "clustered":
            assert sum(v[1] for v in expect.values()) > 0
            assert sum(v[2] for v in expect.values()) > 0
        else:
            assert sum(v[1] + v[2] for v in expect.values()) == 0


def test_lisa_stats_random_world_fuzz(spark):
    """Seeded fuzz incl. a missing tile: LISA quadrant counts from the
    halo kernel must equal a per-pixel enumeration with exact integer
    sign tests (center EXCLUDED from the lag — w_ii = 0). A blocky
    clustered world must put most classified pixels in HH/LL cores;
    outliers (HL/LH) must exist but stay the minority."""
    from gfw_raster_analysis_lambda_spark.functions import codecs
    from gfw_raster_analysis_lambda_spark.operators import focal
    from gfw_raster_analysis_lambda_spark.sources import fixtures
    from gfw_raster_analysis_lambda_spark.functions import grid as G

    GRID = fixtures.GRID
    TILE = GRID.chunk_px
    X0, Y0, NX, NY = fixtures.X0, fixtures.Y0, fixtures.NX, fixtures.NY

    rng = np.random.default_rng(20260820)
    world = np.repeat(np.repeat(
        rng.integers(0, 200, size=(NY * 8, NX * 8)), 8, 0), 8, 1
    ).astype(np.uint8)
    all_tiles = [(dx, dy) for dx in range(NX) for dy in range(NY)]
    drop = {all_tiles[int(rng.integers(len(all_tiles)))]}
    present = sorted(set(all_tiles) - drop)
    valid = np.zeros(world.shape, dtype=bool)
    rows = []
    for dx, dy in present:
        valid[dy * TILE:(dy + 1) * TILE, dx * TILE:(dx + 1) * TILE] = True
        rows.append((
            int(G.cell_from_xy(GRID, X0 + dx, Y0 + dy)),
            codecs.encode_tile(
                world[dy * TILE:(dy + 1) * TILE,
                      dx * TILE:(dx + 1) * TILE], "png"
            ), TILE, TILE, "png",
        ))
    df = spark.createDataFrame(
        rows, "cell_id long, bytes binary, w int, h int, fmt string"
    )
    got = {r["cell_id"]: r for r in focal.lisa_stats(df).collect()}
    n = int(valid.sum())
    s1 = int(world[valid].astype(np.int64).sum())
    h, w = world.shape
    x = world.astype(object)
    expect = {}
    for dx, dy in present:
        cell = int(G.cell_from_xy(GRID, X0 + dx, Y0 + dy))
        hh = ll = hl = lh = 0
        for i in range(dy * TILE, (dy + 1) * TILE):
            for j in range(dx * TILE, (dx + 1) * TILE):
                nbs = nbn = 0
                for ii in range(max(0, i - 1), min(h, i + 2)):
                    for jj in range(max(0, j - 1), min(w, j + 2)):
                        if (ii, jj) != (i, j) and valid[ii, jj]:
                            nbs += int(x[ii, jj]); nbn += 1
                cd = n * int(x[i, j]) - s1
                lag = n * nbs - s1 * nbn
                if cd > 0 and lag > 0:
                    hh += 1
                elif cd < 0 and lag < 0:
                    ll += 1
                elif cd > 0 and lag < 0:
                    hl += 1
                elif cd < 0 and lag > 0:
                    lh += 1
        expect[cell] = (hh, ll, hl, lh)
    assert set(got) == set(expect)
    for cell, (hh, ll, hl, lh) in expect.items():
        r = got[cell]
        assert (r["hh_px"], r["ll_px"], r["hl_px"], r["lh_px"]) == (
            hh, ll, hl, lh), cell
        assert r["n_px"] == TILE * TILE
    tot = np.array([expect[c] for c in expect]).sum(axis=0)
    assert tot[0] + tot[1] > 4 * (tot[2] + tot[3])  # clustered: cores dominate
    assert tot[2] + tot[3] > 0                      # block edges yield outliers


def test_glcm_stats_brute_force_and_orientation(spark):
    """GLCM features must equal a hand-built symmetric co-occurrence
    count; a TRANSPOSED tile must change them (this is the family's
    orientation-pinning gate — isotropic window sums cannot see a
    transpose); and the plan must contain no Exchange at all."""
    from gfw_raster_analysis_lambda_spark.functions import codecs
    from gfw_raster_analysis_lambda_spark.operators import focal

    rng = np.random.default_rng(20260821)
    tile = rng.integers(0, 21, size=(16, 16)).astype(np.uint8)
    levels, bin_div = 7, 3
    big_l = 81770

    def brute(arr):
        q = np.minimum(arr.astype(int) // bin_div, levels - 1)
        c = np.zeros((levels, levels), dtype=int)
        for i in range(arr.shape[0]):
            for j in range(arr.shape[1] - 1):
                c[q[i, j], q[i, j + 1]] += 1
                c[q[i, j + 1], q[i, j]] += 1
        t = c.sum()
        d = np.arange(levels)
        dd2 = (d[:, None] - d[None, :]) ** 2
        return (int(t), int((c * dd2).sum()), int((c * c).sum()),
                int((c * (big_l // (1 + dd2))).sum()))

    def run(arr, cell):
        df = spark.createDataFrame(
            [(cell, codecs.encode_tile(arr, "png"),
              arr.shape[1], arr.shape[0], "png")],
            "cell_id long, bytes binary, w int, h int, fmt string",
        )
        out = focal.glcm_stats(df, bin_div=bin_div, levels=levels)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        (r,) = out.collect()
        return r

    r = run(tile, 1)
    t, con, eng, hom = brute(tile)
    assert (r["n_pairs"], r["contrast_num"], r["energy_num"],
            r["homog_num"]) == (t, con, eng, hom)
    assert r["contrast"] == round(con / t, 6) or abs(
        r["contrast"] - con / t) < 1e-6
    rt = run(tile.T.copy(), 2)
    tt, cont, engt, homt = brute(tile.T)
    assert (rt["n_pairs"], rt["contrast_num"], rt["energy_num"],
            rt["homog_num"]) == (tt, cont, engt, homt)
    assert (con, eng, hom) != (cont, engt, homt)  # orientation visible


def test_agreement_stats_known_kappa(spark):
    # hand-computed: 2x2 [[20,5],[10,15]] -> po=0.7, kappa=0.4;
    # 3x3 [[10,2,3],[1,15,4],[2,3,10]] -> kappa=900/1650=0.545455
    from gfw_raster_analysis_lambda_spark.operators import crosstab

    rows = []
    m2 = [[20, 5], [10, 15]]
    for a in range(2):
        for b in range(2):
            rows.append(("g2", a, b, m2[a][b]))
    m3 = [[10, 2, 3], [1, 15, 4], [2, 3, 10]]
    for a in range(3):
        for b in range(3):
            rows.append(("g3", a, b, m3[a][b]))
    rows.append(("g1", 7, 7, 42))  # degenerate single class -> kappa NULL
    df = spark.createDataFrame(rows, "aoi_id string, pred int, truth int, n long")
    got = {
        r["aoi_id"]: r
        for r in crosstab.agreement_stats(df).collect()
    }
    assert got["g2"]["n_px"] == 50 and got["g2"]["agree_px"] == 35
    assert got["g2"]["acc"] == 0.7 and got["g2"]["kappa"] == 0.4
    assert got["g3"]["kappa"] == round(900 / 1650, 6)
    assert got["g1"]["acc"] == 1.0 and got["g1"]["kappa"] is None


def test_agreement_stats_one_sided_class(spark):
    # a class present only in pred (row total, no col total) contributes
    # 0 to chance agreement: [[5,0],[5,0]] with truth always 0 ->
    # po=0.5, pe=(10*5 + 0*5)/100=0.5 -> kappa=0/50=0... compute:
    # N=10, agree=5, pe_num=r0*c0 + r1*c1 = 5*10 + 5*0 = 50
    # kappa = (10*5 - 50)/(100 - 50) = 0
    from gfw_raster_analysis_lambda_spark.operators import crosstab

    df = spark.createDataFrame(
        [("g", 0, 0, 5), ("g", 1, 0, 5)],
        "aoi_id string, pred int, truth int, n long",
    )
    r = crosstab.agreement_stats(df).collect()[0]
    assert r["n_px"] == 10 and r["agree_px"] == 5
    assert r["kappa"] == 0.0


def test_spatial_block_split_semantics(spark):
    """Block split: interior cells inherit their block's hash split;
    a cell at a boundary to a DIFFERENT-split block becomes 'buffer';
    grid-edge proximity alone never buffers; buffer_cells=0 disables."""
    import numpy as np

    from gfw_raster_analysis_lambda_spark.functions import grid as G
    from gfw_raster_analysis_lambda_spark.operators.sampling import (
        spatial_block_split,
    )

    g = G.GRID_FIXTURE
    b, r = 4, 1
    # a 12x12 cell patch INCLUDING the grid origin (x=0, y=0) so the
    # edge guards (no neighbor off-grid) are exercised
    xs, ys = np.meshgrid(np.arange(12), np.arange(12), indexing="ij")
    cells = [
        (int(G.cell_from_xy(g, int(x), int(y))),)
        for x, y in zip(xs.ravel(), ys.ravel())
    ]
    df = spark.createDataFrame(cells, "cell_id long")
    w = {"train": 0.5, "val": 0.25, "test": 0.25}
    got = {
        row["cell_id"]: row["split"]
        for row in spatial_block_split(df, w, block_cells=b, buffer_cells=r).collect()
    }

    # python oracle: same md5 math, independent control flow
    import hashlib

    def u(bx, by):
        h = hashlib.md5(f"spatial:{bx}/{by}".encode()).hexdigest()[:12]
        return int(h, 16) / float(1 << 48)

    def home(bx, by):
        v = u(bx, by)
        return "train" if v < 0.5 else ("val" if v < 0.75 else "test")

    n_buffer = 0
    for x, y in zip(xs.ravel().tolist(), ys.ravel().tolist()):
        bx, by, lx, ly = x // b, y // b, x % b, y % b
        h = home(bx, by)
        buffered = False
        for dx, dy in [(-1, 0), (1, 0), (0, -1), (0, 1),
                       (-1, -1), (-1, 1), (1, -1), (1, 1)]:
            nbx, nby = bx + dx, by + dy
            if nbx < 0 or nby < 0:
                continue  # off-grid: no split boundary there
            near_x = (lx < r and dx == -1) or (lx >= b - r and dx == 1) or dx == 0
            near_y = (ly < r and dy == -1) or (ly >= b - r and dy == 1) or dy == 0
            if dx != 0 and dy != 0:
                near = ((lx < r and dx == -1) or (lx >= b - r and dx == 1)) and \
                       ((ly < r and dy == -1) or (ly >= b - r and dy == 1))
            elif dx != 0:
                near = (lx < r and dx == -1) or (lx >= b - r and dx == 1)
            else:
                near = (ly < r and dy == -1) or (ly >= b - r and dy == 1)
            if near and home(nbx, nby) != h:
                buffered = True
                break
        want = "buffer" if buffered else h
        cell = int(G.cell_from_xy(g, x, y))
        assert got[cell] == want, (x, y, got[cell], want)
        n_buffer += want == "buffer"
    # the patch crosses 3x3 blocks of 3 splits: some buffer must exist
    assert 0 < n_buffer < len(cells)

    # buffer_cells=0: pure block assignment, no sentinel anywhere
    got0 = spatial_block_split(df, w, block_cells=b, buffer_cells=0)
    assert got0.filter("split = 'buffer'").count() == 0


def test_buffer_cells_ring_and_wrap(spark):
    """buffer_cells: ring = min chebyshev distance, x wraps at the
    antimeridian, y clips at the pole, radius 0 = identity cover."""
    from gfw_raster_analysis_lambda_spark.functions import grid as G
    from gfw_raster_analysis_lambda_spark.operators.cells import buffer_cells

    g = G.GRID_FIXTURE  # nx=1440, ny=720
    rows = [("w", int(G.cell_from_xy(g, 0, 719)))]  # NW corner cell
    df = spark.createDataFrame(rows, "aoi_id string, cell_id long")
    out = {
        tuple(map(int, G.cell_to_xy(r["cell_id"]))) + (r["ring"],)
        for r in buffer_cells(df, 1, g.name).collect()
    }
    # y=720 clipped; x=-1 wraps to 1439
    want = {
        (1439, 718, 1), (1439, 719, 1),
        (0, 718, 1), (0, 719, 0),
        (1, 718, 1), (1, 719, 1),
    }
    assert out == want

    # two nearby cover cells: overlapping shells keep the MIN ring
    rows2 = [
        ("a", int(G.cell_from_xy(g, 100, 100))),
        ("a", int(G.cell_from_xy(g, 102, 100))),
    ]
    df2 = spark.createDataFrame(rows2, "aoi_id string, cell_id long")
    got = {
        tuple(map(int, G.cell_to_xy(r["cell_id"]))): r["ring"]
        for r in buffer_cells(df2, 1, g.name).collect()
    }
    assert got[(101, 100)] == 1  # between the two, dist 1 to both
    assert got[(100, 100)] == 0 and got[(102, 100)] == 0
    assert got[(103, 100)] == 1
    assert len(got) == 5 * 3  # union of two 3x3 disks centered 2 apart

    # radius 0: identity with ring 0
    ident = buffer_cells(df2, 0, g.name).collect()
    assert sorted(r["ring"] for r in ident) == [0, 0]


def test_tile_moments_nodata_and_degenerate(spark):
    """tile_moments: NoData pixels weigh 0; all-NoData tile -> null
    centroid; moments match a direct numpy computation."""
    import numpy as np

    from gfw_raster_analysis_lambda_spark.functions import codecs
    from gfw_raster_analysis_lambda_spark.operators.multimodal import tile_moments

    a = np.arange(16, dtype=np.uint8).reshape(4, 4)
    a[1, 2] = 9  # duplicate a value so masking is value-based, not unique
    dead = np.full((4, 4), 7, dtype=np.uint8)  # all pixels == no_data
    rows = [
        ("t/a", codecs.encode_tile(a, "png"), 4, 4, "png", "", 0),
        ("t/dead", codecs.encode_tile(dead, "png"), 4, 4, "png", "", 0),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    )
    got = {r["image_id"]: r for r in tile_moments(df, no_data=7).collect()}

    v = a.astype(np.int64)
    v[v == 7] = 0
    i = np.arange(4)[:, None]
    j = np.arange(4)[None, :]
    r = got["t/a"]
    assert r["m00"] == int(v.sum())
    assert r["m10"] == int((i * v).sum()) and r["m01"] == int((j * v).sum())
    assert r["m11"] == int((i * j * v).sum())
    assert r["m20"] == int((i * i * v).sum()) and r["m02"] == int((j * j * v).sum())
    assert r["ci"] == (i * v).sum() / v.sum()

    d = got["t/dead"]
    assert d["m00"] == 0 and d["ci"] is None and d["cj"] is None

    # NaN-sentinel float layer: NaN contributes 0
    f = np.array([[1.0, float("nan")], [2.0, 3.0]], dtype=np.float32)
    rows_f = [("t/f", codecs.encode_tile(f, "raw_f32"), 2, 2, "raw_f32", "", 0)]
    dff = spark.createDataFrame(
        rows_f, "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    )
    rf = tile_moments(dff, no_data=float("nan")).collect()[0]
    assert rf["m00"] == 6 and rf["m10"] == 5 and rf["m01"] == 3


def test_adaptive_cell_cover_invariants(spark):
    """adaptive_cell_cover: emitted cells form a disjoint cover whose
    counts sum to the input size; every cell above the finest rung
    respects max_count; a hot cluster lands at the finest rung."""
    from pyspark.sql import functions as F

    from gfw_raster_analysis_lambda_spark.functions import grid as G
    from gfw_raster_analysis_lambda_spark.operators.cells import (
        adaptive_cell_cover,
    )

    i = F.col("id")
    hot = i % 5 < 3
    pts = spark.range(2000).select(
        F.when(hot, F.lit(-100.0) + (i % 16) / F.lit(128.0))
        .otherwise(F.lit(-180.0) + ((i * 7) % 80) / F.lit(8.0))
        .alias("lon"),
        F.when(hot, F.lit(10.0) - (i % 16) / F.lit(128.0))
        .otherwise(F.lit(90.0) - ((i * 13) % 40) / F.lit(8.0))
        .alias("lat"),
    )
    k = 6
    rows = adaptive_cell_cover(pts, ["4/512", "4/1024", "4/2048"], k).collect()
    total = sum(r["n_points"] for r in rows)
    assert total == 2000  # exact partition of the input

    fine_idx = G.get_grid("4/2048").index
    seen_fine_hot = False
    covered = set()
    for r in rows:
        g = G.grid_of_cell(r["cell_id"])
        if g.index != fine_idx:
            assert r["n_points"] <= k, (g.name, r["n_points"])
        x, y = map(int, G.cell_to_xy(r["cell_id"]))
        # expand to the fine-grid footprint; assert disjointness
        ratio = round(g.tile_deg / G.get_grid("4/2048").tile_deg)
        for dx in range(ratio):
            for dy in range(ratio):
                key = (x * ratio + dx, y * ratio + dy)
                assert key not in covered
                covered.add(key)
        if g.index == fine_idx and (x, y) == (640, 640):
            seen_fine_hot = True
            assert r["n_points"] == 1200  # > k: irreducible at finest
    assert seen_fine_hot  # the hot cluster surfaced at the finest rung


def test_trends_ols_and_mann_kendall(spark):
    """ols_trend recovers a known line exactly; degenerate groups go
    NULL; mann_kendall counts signed pairs with exact tie handling."""
    from gfw_raster_analysis_lambda_spark.operators import trends

    rows = (
        [("lin", x, 3.0 * x + 2.0) for x in range(5)]  # exact line
        + [("one", 7, 4.0)]                             # single point
        + [("flat", x, 5.0) for x in range(4)]          # zero y-variance
        + [("zig", 0, 1.0), ("zig", 1, 3.0), ("zig", 2, 2.0), ("zig", 3, 2.0)]
    )
    df = spark.createDataFrame(rows, "g string, x int, y double")
    t = {r["g"]: r for r in trends.ols_trend(df, "x", "y", ["g"]).collect()}
    assert t["lin"]["slope"] == 3.0 and t["lin"]["intercept"] == 2.0
    assert t["lin"]["r2"] == 1.0
    assert t["one"]["slope"] is None and t["one"]["r2"] is None
    assert t["flat"]["slope"] == 0.0 and t["flat"]["r2"] is None

    mk = {r["g"]: r for r in trends.mann_kendall(df, "x", "y", ["g"]).collect()}
    assert mk["lin"]["s"] == 10 and mk["lin"]["n_pairs"] == 10
    assert mk["flat"]["s"] == 0 and mk["flat"]["n_pairs"] == 6
    # zig pairs: (0,1)+1 (0,2)+1 (0,3)+1 (1,2)-1 (1,3)-1 (2,3)0 -> S=1
    assert mk["zig"]["s"] == 1 and mk["zig"]["n_pairs"] == 6
    assert "one" not in mk  # no pairs for a single point


def test_new_round5_plan_shapes(spark):
    """Plan-shape pins for the closing round-5 operators:
    spatial_block_split is one codegen projection (NO Exchange);
    buffer_cells shuffles exactly once (the min-ring groupBy);
    adaptive_cell_cover shuffles points once, then only count-table
    window exchanges (no second pass over points)."""
    from pyspark.sql import functions as F

    from gfw_raster_analysis_lambda_spark.functions import grid as G
    from gfw_raster_analysis_lambda_spark.operators.cells import (
        adaptive_cell_cover,
        buffer_cells,
    )
    from gfw_raster_analysis_lambda_spark.operators.sampling import (
        spatial_block_split,
    )

    g = G.GRID_FIXTURE
    cells = spark.createDataFrame(
        [("a", int(G.cell_from_xy(g, 700, 300)))], "aoi_id string, cell_id long"
    )
    plan = (
        spatial_block_split(cells, {"train": 0.8, "val": 0.2})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "Python" not in plan  # pure codegen, no UDF

    plan = buffer_cells(cells, 2, g.name)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan

    pts = spark.range(100).select(
        (F.col("id") / 10.0).alias("lon"), (F.col("id") / 20.0).alias("lat")
    )
    plan = (
        adaptive_cell_cover(pts, ["4/512", "4/1024", "4/2048"], 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exchanges: points->fine-cell groupBy, 2 ladder windows, final
    # regroup — all but the first carry O(distinct cells) rows
    assert plan.count("Exchange") <= 4, plan
    assert "Python" not in plan


def test_theil_sen_robust_to_outlier(spark):
    """Theil-Sen: exact median of pairwise slopes; one wild outlier
    year leaves the slope at the clean value while OLS swings."""
    from gfw_raster_analysis_lambda_spark.operators import trends

    clean = [("g", x, 2.0 * x) for x in range(9)]
    spiked = [("s", x, 2.0 * x if x != 8 else 500.0) for x in range(9)]
    df = spark.createDataFrame(clean + spiked, "g string, x int, y double")
    ts = {r["g"]: r for r in trends.theil_sen(df, "x", "y", ["g"]).collect()}
    assert ts["g"]["ts_slope"] == 2.0 and ts["g"]["n_pairs"] == 36
    assert ts["s"]["ts_slope"] == 2.0  # median unmoved by the spike
    ols = {r["g"]: r for r in trends.ols_trend(df, "x", "y", ["g"]).collect()}
    assert abs(ols["s"]["slope"] - 2.0) > 1.0  # OLS dragged by it


def test_adaptive_cover_balances_partitions(spark):
    """End-to-end use of adaptive_cell_cover as a partition map: keying
    a skewed point set by its adaptive cell bounds the largest
    hash-partition far below what the fixed fine grid gives (where the
    hot cell lands whole in one task)."""
    from pyspark.sql import functions as F

    from gfw_raster_analysis_lambda_spark.operators.cells import (
        adaptive_cell_cover,
    )
    from gfw_raster_analysis_lambda_spark.operators.spatial_join import cell_expr
    from gfw_raster_analysis_lambda_spark.functions import grid as G

    i = F.col("id")
    hot = i % 10 < 8  # 80% of points in one fine cell
    pts = spark.range(5000).select(
        F.when(hot, F.lit(-100.0)).otherwise(
            F.lit(-180.0) + ((i * 7) % 1000) / F.lit(8.0)
        ).alias("lon"),
        F.when(hot, F.lit(10.0)).otherwise(
            F.lit(90.0) - ((i * 13) % 600) / F.lit(8.0)
        ).alias("lat"),
    )
    fine = G.get_grid("4/2048")
    fixed = pts.groupBy(cell_expr(fine, F.col("lon"), F.col("lat"))).count()
    fixed_max = max(r["count"] for r in fixed.collect())
    assert fixed_max == 4000  # the hot cell IS one key at fixed resolution

    cover = adaptive_cell_cover(pts, ["4/512", "4/1024", "4/2048"], 50)
    counts = {r["cell_id"]: r["n_points"] for r in cover.collect()}
    # the hot cell is irreducible — but every OTHER region is bounded,
    # so the partition map isolates the skew into exactly one key that
    # downstream salting can split, instead of hiding it among 4k keys
    over = [n for n in counts.values() if n > 50]
    assert over == [4000]
    assert sum(counts.values()) == 5000


def test_chip_tiles_stats_windows(spark):
    """chip_tiles_stats: chip grid covers exactly the windows that fit;
    stride == chip_px tiles without overlap; stats match numpy."""
    import numpy as np

    from gfw_raster_analysis_lambda_spark.functions import codecs
    from gfw_raster_analysis_lambda_spark.operators.multimodal import (
        chip_tiles_stats,
    )

    a = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
    rows = [("t/a", codecs.encode_tile(a, "png"), 8, 8, "png", "", 0)]
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    got = {
        (r["chip_i"], r["chip_j"]): r
        for r in chip_tiles_stats(df, chip_px=4, stride=2).collect()
    }
    assert len(got) == 9  # (8-4)/2+1 = 3 per axis
    for (ci, cj), r in got.items():
        c = a[ci * 2:ci * 2 + 4, cj * 2:cj * 2 + 4].astype(np.int64)
        assert r["px_sum"] == int(c.sum())
        assert r["px_min"] == int(c.min()) and r["px_max"] == int(c.max())

    # non-overlapping tiling: 4 chips, sums partition the tile sum
    tiled = chip_tiles_stats(df, chip_px=4, stride=4).collect()
    assert len(tiled) == 4
    assert sum(r["px_sum"] for r in tiled) == int(a.astype(np.int64).sum())


def test_adaptive_cover_incremental_equals_rebuild(spark):
    """Incremental cover maintenance: merging stored fine-cell counts
    with an ingest wave's delta counts and re-running the relational
    tail gives EXACTLY the cover a full rebuild over all points gives
    — fine counts are additive, so the corpus is never re-scanned."""
    from pyspark.sql import functions as F

    from gfw_raster_analysis_lambda_spark.operators.cells import (
        adaptive_cell_cover,
        adaptive_cover_from_counts,
    )
    from gfw_raster_analysis_lambda_spark.operators.spatial_join import cell_expr
    from gfw_raster_analysis_lambda_spark.functions import grid as G

    ladder = ["4/512", "4/1024", "4/2048"]
    fine = G.get_grid(ladder[-1])

    def pts(lo, hi):
        i = F.col("id")
        return (
            spark.range(lo, hi)
            .select(
                (F.lit(-180.0) + ((i * 7) % 300) / F.lit(8.0)).alias("lon"),
                (F.lit(90.0) - ((i * 13) % 200) / F.lit(8.0)).alias("lat"),
            )
        )

    def counts(df):
        return df.groupBy(
            cell_expr(fine, F.col("lon"), F.col("lat")).alias("cell_id")
        ).agg(F.count("*").alias("n"))

    base, delta, full = pts(0, 900), pts(900, 1400), pts(0, 1400)
    merged = counts(base).unionByName(counts(delta))
    inc = {
        (r["cell_id"], r["n_points"])
        for r in adaptive_cover_from_counts(merged, ladder, 4).collect()
    }
    rebuild = {
        (r["cell_id"], r["n_points"])
        for r in adaptive_cell_cover(full, ladder, 4).collect()
    }
    assert inc == rebuild and len(inc) > 10


def test_join_points_to_cover_exactly_once(spark):
    """Every point joins the adaptive cover exactly once, and per-cell
    point counts equal the cover's recorded n_points."""
    from pyspark.sql import functions as F

    from gfw_raster_analysis_lambda_spark.operators.cells import (
        adaptive_cell_cover,
        join_points_to_cover,
    )

    ladder = ["4/512", "4/1024", "4/2048"]
    i = F.col("id")
    hot = i % 5 < 3
    pts = spark.range(2000).select(
        "id",
        F.when(hot, F.lit(-100.0) + (i % 16) / F.lit(128.0))
        .otherwise(F.lit(-180.0) + ((i * 7) % 80) / F.lit(8.0))
        .alias("lon"),
        F.when(hot, F.lit(10.0) - (i % 16) / F.lit(128.0))
        .otherwise(F.lit(90.0) - ((i * 13) % 40) / F.lit(8.0))
        .alias("lat"),
    )
    cover = adaptive_cell_cover(pts, ladder, 6)
    joined = join_points_to_cover(pts, cover, ladder)
    assert joined.count() == 2000  # every point exactly once
    assert joined.select("id").distinct().count() == 2000
    got = {
        r["cell_id"]: r["n"]
        for r in joined.groupBy("cell_id").agg(F.count("*").alias("n")).collect()
    }
    want = {r["cell_id"]: r["n_points"] for r in cover.collect()}
    assert got == want


def test_spatial_block_split_antimeridian_wrap(spark):
    """With grid_name set, block neighbors wrap at the antimeridian:
    a cell at x=0 is buffered when the block ACROSS the seam (block
    column nbx-1) holds a different split; the open-plane default
    cannot see that adjacency. y (poles) never wraps."""
    import hashlib

    from gfw_raster_analysis_lambda_spark.functions import grid as G
    from gfw_raster_analysis_lambda_spark.operators.sampling import (
        spatial_block_split,
    )

    g = G.GRID_FIXTURE  # nx=1440 -> 360 blocks of 4
    b, r, nbx = 4, 1, 360
    w = {"train": 0.5, "val": 0.25, "test": 0.25}

    def u(bx, by):
        h = hashlib.md5(f"spatial:{bx}/{by}".encode()).hexdigest()[:12]
        return int(h, 16) / float(1 << 48)

    def home(bx, by):
        v = u(bx, by)
        return "train" if v < 0.5 else ("val" if v < 0.75 else "test")

    # pick a row where the seam blocks DISAGREE and one where they agree
    disagree = agree = None
    for by in range(30, 200):
        if home(0, by) != home(nbx - 1, by) and disagree is None:
            disagree = by
        if home(0, by) == home(nbx - 1, by) and {home(0, k) for k in (by - 1, by, by + 1)} == {home(0, by)} and \
           {home(nbx - 1, k) for k in (by - 1, by, by + 1)} == {home(nbx - 1, by)} and \
           {home(1, k) for k in (by - 1, by, by + 1)} == {home(0, by)} and agree is None:
            agree = by
    assert disagree is not None

    y_d = disagree * b + 2  # block-interior row (not near a y boundary)
    cells = [
        (int(G.cell_from_xy(g, 0, y_d)),),        # west seam edge
        (int(G.cell_from_xy(g, 1439, y_d)),),     # east seam edge
        (int(G.cell_from_xy(g, 2, y_d)),),        # interior of block 0
    ]
    df = spark.createDataFrame(cells, "cell_id long")
    wrapped = {
        tuple(map(int, G.cell_to_xy(row["cell_id"]))): row["split"]
        for row in spatial_block_split(
            df, w, block_cells=b, buffer_cells=r, grid_name=g.name
        ).collect()
    }
    # both seam-edge cells buffer (their cross-seam neighbor disagrees)
    assert wrapped[(0, y_d)] == "buffer"
    assert wrapped[(1439, y_d)] == "buffer"
    # interior cell keeps its block's split
    assert wrapped[(2, y_d)] == home(0, disagree)

    # open-plane default: the west seam cell does NOT buffer (x=0 has
    # no west neighbor without wrap) unless its OTHER neighbors differ
    plain = {
        tuple(map(int, G.cell_to_xy(row["cell_id"]))): row["split"]
        for row in spatial_block_split(
            df, w, block_cells=b, buffer_cells=r
        ).collect()
    }
    if agree is not None:
        y_a = agree * b + 2
        df2 = spark.createDataFrame(
            [(int(G.cell_from_xy(g, 0, y_a)),)], "cell_id long"
        )
        row = spatial_block_split(
            df2, w, block_cells=b, buffer_cells=r, grid_name=g.name
        ).collect()[0]
        assert row["split"] == home(0, agree)  # seam agrees -> no buffer

    # uneven block tiling refuses wrap semantics loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        spatial_block_split(df, w, block_cells=7, buffer_cells=1,
                            grid_name=g.name)


def _otsu_fraction_oracle(arr):
    # independent exact oracle: argmax of A^2/B as a Fraction, smallest
    # t on ties — no code shared with the engine kernel
    from fractions import Fraction

    import numpy as _np

    hist = _np.bincount(arr.ravel(), minlength=256)
    n = int(hist.sum())
    s = int((hist * _np.arange(256, dtype=_np.int64)).sum())
    best_t, best = -1, Fraction(-1)
    n0 = s0 = 0
    for t in range(255):
        n0 += int(hist[t])
        s0 += t * int(hist[t])
        if n0 == 0 or n0 == n:
            continue
        score = Fraction((s0 * n - s * n0) ** 2, n0 * (n - n0))
        if score > best:
            best, best_t = score, t
    return best_t


def _otsu_corpus(spark, arrays):
    import pandas as _pd

    from gfw_raster_analysis_lambda_spark.functions.codecs import encode_tile

    rows = [
        (f"t/{k}", encode_tile(a, "raw_u8"), a.shape[1], a.shape[0], "raw_u8")
        for k, a in enumerate(arrays)
    ]
    return spark.createDataFrame(
        _pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"]),
        "image_id string, bytes binary, w int, h int, fmt string",
    )


def test_otsu_matches_fraction_oracle_on_random_tiles(spark):
    from gfw_raster_analysis_lambda_spark.operators import multimodal

    rng = np.random.default_rng(3)
    arrays = []
    for k in range(12):
        # mixtures of two gaussians at varying separation + uniform noise
        a = np.clip(
            np.concatenate([
                rng.normal(60 + 5 * k, 12, 600),
                rng.normal(180 - 3 * k, 20, 424),
            ]).reshape(32, 32), 0, 255
        ).astype(np.uint8)
        arrays.append(a)
    got = {
        r["image_id"]: (r["otsu_t"], r["n_fg"], r["sum_fg"])
        for r in multimodal.otsu_threshold(_otsu_corpus(spark, arrays)).collect()
    }
    for k, a in enumerate(arrays):
        t = _otsu_fraction_oracle(a)
        v = a.astype(np.int64)
        assert got[f"t/{k}"] == (
            t, int((v > t).sum()), int(v[v > t].sum())
        ), (k, t, got[f"t/{k}"])


def test_otsu_bimodal_tiebreak_and_constant(spark):
    from gfw_raster_analysis_lambda_spark.operators import multimodal

    two = np.full((16, 16), 200, dtype=np.uint8)
    two[:8] = 10  # exactly two values: every t in [10, 199] ties -> smallest
    const = np.full((16, 16), 42, dtype=np.uint8)
    got = {
        r["image_id"]: (r["otsu_t"], r["n_fg"], r["sum_fg"])
        for r in multimodal.otsu_threshold(
            _otsu_corpus(spark, [two, const])
        ).collect()
    }
    assert got["t/0"] == (10, 128, 128 * 200)
    assert got["t/1"] == (-1, 0, 0)


def test_hist_match_lut_matches_bruteforce_fraction(spark):
    from fractions import Fraction

    from gfw_raster_analysis_lambda_spark.functions.codecs import decode_tile
    from gfw_raster_analysis_lambda_spark.operators import multimodal

    rng = np.random.default_rng(5)
    src_tiles = [
        rng.integers(0, 60, (16, 16)).astype(np.uint8) for _ in range(4)
    ]
    ref_tiles = [
        (rng.integers(0, 128, (16, 16)) * 2).astype(np.uint8) for _ in range(3)
    ]
    hs = np.zeros(256, dtype=np.int64)
    for a in src_tiles:
        hs += np.bincount(a.ravel(), minlength=256)
    hr = np.zeros(256, dtype=np.int64)
    for a in ref_tiles:
        hr += np.bincount(a.ravel(), minlength=256)
    # brute-force exact LUT: smallest PRESENT ref value whose normalized
    # CDF reaches the source's, compared as Fractions (independent of the
    # engine's cross-multiplied two-pointer)
    cs, cr = hs.cumsum(), hr.cumsum()
    ns, nr = int(cs[-1]), int(cr[-1])
    expect_lut = {}
    for v in range(256):
        t = Fraction(int(cs[v]), ns)
        for u in range(256):
            if hr[u] > 0 and Fraction(int(cr[u]), nr) >= t:
                expect_lut[v] = u
                break
    corpus = _otsu_corpus(spark, src_tiles)  # reuse the raw-u8 builder
    corpus = corpus.withColumn("caption", F.lit("c")).withColumn(
        "phash", F.lit(0).cast("long")
    )
    out = multimodal.match_tiles_global(
        corpus, [int(c) for c in hs], [int(c) for c in hr]
    )
    got = {r["image_id"]: r for r in out.collect()}
    for k, a in enumerate(src_tiles):
        dec = decode_tile(bytes(got[f"t/{k}"]["bytes"]), 16, 16, "raw_u8")
        expect = np.vectorize(lambda v: expect_lut[int(v)])(a)
        assert (dec == expect).all()


def test_hist_match_to_self_is_identity_on_present_values(spark):
    from gfw_raster_analysis_lambda_spark.functions.codecs import decode_tile
    from gfw_raster_analysis_lambda_spark.operators import multimodal

    rng = np.random.default_rng(9)
    tiles = [rng.integers(0, 256, (16, 16)).astype(np.uint8) for _ in range(3)]
    h = np.zeros(256, dtype=np.int64)
    for a in tiles:
        h += np.bincount(a.ravel(), minlength=256)
    corpus = _otsu_corpus(spark, tiles).withColumn(
        "caption", F.lit("c")
    ).withColumn("phash", F.lit(0).cast("long"))
    out = multimodal.match_tiles_global(
        corpus, [int(c) for c in h], [int(c) for c in h]
    )
    for r in out.collect():
        k = int(r["image_id"].split("/")[1])
        dec = decode_tile(bytes(r["bytes"]), 16, 16, "raw_u8")
        assert (dec == tiles[k]).all()


def test_emerging_hotspots_composition_invariants(spark):
    # the composition gate's invariants: one row per fixture cell, the
    # full C(5,2) pair count everywhere, S bounded by it, and a genuine
    # mix of trend signs induced by the epoch drift term
    import __spark_entry__ as entry

    rows = entry.queries()["focal_emerging_hotspots"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 16
    assert all(r["n_pairs"] == 10 for r in rows)
    assert all(-10 <= r["s"] <= 10 for r in rows)
    assert any(r["s"] != 0 for r in rows)


def test_skyline_matches_bruteforce_dominance_oracle(spark):
    # independent O(n^2) dominance check, tie-heavy integer objectives,
    # many Arrow batches so phase-1 local frontiers actually fire
    from gfw_raster_analysis_lambda_spark.operators.skyline import skyline_2d

    rng = np.random.RandomState(3)
    rows = [
        (i, "g%d" % (i % 3), int(rng.randint(0, 40)), float(rng.randint(0, 25)))
        for i in range(400)
    ]
    rows += [  # exact duplicate points: mutually non-dominating, all kept
        (400, "g0", -1, 30.0),
        (401, "g0", -1, 30.0),
    ]
    df = spark.createDataFrame(
        rows, "id long, g string, cost int, score double"
    ).repartition(7)
    got = {r["id"] for r in skyline_2d(df, ["g"], "cost", "score").collect()}

    byg = {}
    for i, g, c, s in rows:
        byg.setdefault(g, []).append((i, c, s))
    want = {
        i
        for pts in byg.values()
        for i, c, s in pts
        if not any(
            c2 <= c and s2 >= s and (c2 < c or s2 > s) for _, c2, s2 in pts
        )
    }
    assert got == want and 400 in got and 401 in got


def test_skyline_excludes_null_objectives_and_single_shuffle(spark):
    from gfw_raster_analysis_lambda_spark.operators.skyline import skyline_2d

    df = spark.createDataFrame(
        [(1, "a", 5, 1.0), (2, "a", None, 9.0), (3, "a", 1, None),
         (4, "a", 9, 9.0)],
        "id long, g string, cost int, score double",
    )
    out = skyline_2d(df, ["g"], "cost", "score")
    assert {r["id"] for r in out.collect()} == {1, 4}
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes both plans
    # phase 1 is shuffle-free; the only Exchange is the grouped phase 2
    assert final.count("Exchange hashpartitioning") == 1, plan
