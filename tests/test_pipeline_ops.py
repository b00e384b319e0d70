"""Tests for training-data pipeline operators: text analysis, dedup
(exact/minhash/simhash/jaccard/embedding), similarity search, multimodal
plumbing. Oracles: DuckDB SQL twins (hash parity) or direct numpy."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gfw_raster_analysis_lambda_spark.operators import (
    dedup,
    multimodal,
    similarity,
    text,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_text_profile_vs_duckdb(spark, docs):
    got = text.text_profile(docs).orderBy("doc_id").toPandas()
    exp = duckdb.sql(
        f"""
        SELECT doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens_ws,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens_bpe,
               CAST(('0x' || substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 15)) AS BIGINT) AS fingerprint
        FROM read_parquet('{SF_DIR}/documents.parquet') ORDER BY doc_id
        """
    ).df()
    np.testing.assert_array_equal(got["n_tokens_ws"], exp["n_tokens_ws"])
    np.testing.assert_array_equal(got["n_tokens_bpe"], exp["n_tokens_bpe"])
    np.testing.assert_array_equal(got["fingerprint"], exp["fingerprint"])
    assert got["quality"].between(0, 1).all()
    assert set(got["lang_pred"]) <= {"en", "es", "de", "fr", "und"}


def test_exact_duplicates(spark):
    rows = [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma"), (4, "alpha beta "), (5, "delta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup.exact_duplicates(df).toPandas()
    assert len(got) == 1
    assert got.n_dups[0] == 3 and got.keeper[0] == 1  # trim folds row 4 in


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base.replace("today", "tonight")),  # near-dup of 1
        (3, "completely different words about spark shuffles and parquet files"),
        (4, base),  # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cand = dedup.minhash_lsh_candidates(df, n_hashes=8, bands=4).toPandas()
    pairs = set(zip(cand["a"], cand["b"]))
    assert (1, 4) in pairs  # exact dup always collides
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup collides in >=1 band
    assert (1, 3) not in pairs and (2, 3) not in pairs and (3, 4) not in pairs


def test_ngram_jaccard(spark):
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g x"),  # shares most 3-grams
        (3, "z y x w v u t s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.3).toPandas()
    assert set(zip(got["a"], got["b"])) == {(1, 2)}
    # oracle jaccard: 6 shingles each, 5 common -> 5/7
    assert got["jaccard"].iloc[0] == pytest.approx(5 / 7, abs=1e-6)


def test_simhash_groups(spark):
    rows = [(1, "same words here"), (2, "same words here"), (3, "other content entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dedup.simhash(df).toPandas().set_index("id")["simhash"]
    assert sh[1] == sh[2] != sh[3]
    groups = dedup.simhash_duplicate_groups(df).toPandas()
    assert len(groups) == 1 and groups.n[0] == 2


def test_embedding_near_dups(spark):
    v = np.random.default_rng(1).normal(size=8).tolist()
    v2 = (np.asarray(v) + 0.001).tolist()  # near-identical
    v3 = np.random.default_rng(2).normal(size=8).tolist()
    df = spark.createDataFrame(
        [(1, v), (2, v2), (3, v3)], "vec_id long, embedding array<double>"
    )
    got = dedup.embedding_near_dups(df, threshold=0.99).toPandas()
    assert set(zip(got["a"], got["b"])) == {(1, 2)}


def test_cosine_topk_vs_numpy(spark, emb):
    epd = emb.toPandas()
    mat = np.stack(epd["embedding"].to_numpy()).astype(np.float64)
    qv = mat[3]
    queries = spark.createDataFrame([("q0", [float(x) for x in qv])], "query_id string, embedding array<float>")
    got = similarity.cosine_topk(emb, queries, k=5).toPandas()
    cos = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    order = sorted(zip(np.round(-cos, 6), epd["vec_id"]))[:5]
    exp_ids = [vid for _, vid in order]
    assert got["id"].tolist() == exp_ids
    assert got["rank"].tolist() == [1, 2, 3, 4, 5]
    assert got["cosine"].iloc[0] == pytest.approx(1.0, abs=1e-6)


def test_ann_lsh_recall(spark, emb):
    epd = emb.limit(200).toPandas()
    emb200 = spark.createDataFrame(epd)
    mat = np.stack(epd["embedding"].to_numpy()).astype(np.float64)
    qv = mat[7]
    queries = spark.createDataFrame(
        [("q0", [float(x) for x in qv])], "query_id string, embedding array<float>"
    )
    got = similarity.ann_lsh(emb200, queries, k=5, n_planes=6).toPandas()
    # the query vector itself is in the corpus and shares its own bucket
    assert got["cosine"].iloc[0] == pytest.approx(1.0, abs=1e-6)
    exact = similarity.cosine_topk(emb200, queries, k=5).toPandas()
    recall = len(set(got["id"]) & set(exact["id"])) / 5
    assert recall >= 0.2  # approximate by construction; self-match guaranteed


def test_image_stats_and_psnr(spark, corpus):
    images = spark.read.parquet(corpus["images"])
    got = multimodal.image_stats(images, with_psnr=True).toPandas()
    assert len(got) == images.count()
    jp = got[got["image_id"].str.startswith("photo/")]
    assert len(jp) > 0 and (jp["psnr"] >= 40.0).all()  # input-hint invariant
    # default path skips the re-encode round trip entirely (psnr null)
    fast = multimodal.image_stats(images.limit(4)).toPandas()
    assert fast["psnr"].isna().all()
    # phash recomputed from decode matches the stored column
    stored = images.select("image_id", "phash").toPandas().set_index("image_id")["phash"]
    for _, r in got.iterrows():
        if not r["image_id"].startswith("photo/"):
            assert r["phash"] == stored[r["image_id"]]


def test_resize_tiles(spark, corpus):
    images = spark.read.parquet(corpus["images"]).filter(F.col("fmt") == "png").limit(4)
    out = multimodal.resize_tiles(images, factor=2).toPandas()
    assert (out["w"] == 32).all() and (out["h"] == 32).all()
    assert (out["caption"] == images.toPandas()["caption"]).all()  # byte-equal captions


def test_audio_video_stubs(spark):
    adf = spark.createDataFrame(
        [("m1", bytes(range(256)) * 4)], "media_id string, payload binary"
    )
    feats = multimodal.audio_features(adf, fake_codec=True).toPandas()
    assert feats["n_samples"][0] == 512 and feats["rms"][0] > 0
    frames = multimodal.video_frame_sample(adf, every_n=2, fake_codec=True).toPandas()
    assert len(frames) == 8 and (frames["w"] == 8).all()
    # the real (non-fake) path is an explicit stub
    with pytest.raises(Exception, match="NotImplementedError|audio decode"):
        multimodal.audio_features(adf, fake_codec=False).collect()


def test_minhash_keepers_consistent_with_pairs(spark):
    import pandas as pd

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumps over the lazy dog today"),
        (4, "completely different text about spark and parquet files"),
        (5, "another unrelated document mentioning zonal statistics"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    keep = dedup.minhash_dedup_keepers(df, n_hashes=8, bands=4).toPandas()
    pairs = dedup.minhash_lsh_candidates(df, n_hashes=8, bands=4).toPandas()
    # every assigned doc appears in some candidate pair with its keeper's
    # component, and keepers are strictly smaller ids
    assert (keep["keeper"] < keep["id"]).all()
    dup_ids = set(pairs["a"]) | set(pairs["b"])
    assert set(keep["id"]).issubset(dup_ids)
    assert 4 not in set(keep["id"]) and 5 not in set(keep["id"])


def test_phash_near_duplicates_exact_recall(spark):
    """Banding must find EVERY pair within max_hamming <= bands-1 (the
    pigeonhole regime) exactly once, and the keepers variant must stay
    O(images) on a hot bucket of identical hashes."""
    base = 0x1234_5678_9ABC_DEF0
    rows = [
        ("a0", base),
        ("a1", base ^ (1 << 3)),               # hamming 1 from a0
        ("a2", base ^ (1 << 3) ^ (1 << 40)),   # hamming 2 from a0
        ("b0", ~base & 0x7FFF_FFFF_FFFF_FFFF),  # far away
    ]
    # hot bucket: 50 tiles sharing ONE phash (the synthetic-corpus shape)
    rows += [(f"h{i:02d}", 0x0F0F_0F0F_0F0F_0F0F) for i in range(50)]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    pairs = dedup.phash_near_duplicates(df, max_hamming=3, bands=4).toPandas()
    got = {(r.a, r.b): r.hamming for r in pairs.itertuples()}
    # brute force oracle over the distinct-hash part
    assert got[("a0", "a1")] == 1 and got[("a0", "a2")] == 2 and got[("a1", "a2")] == 1
    assert not any("b0" in k for k in got)
    # no duplicate pair emission despite multi-band matches
    assert len(pairs) == len(pairs.drop_duplicates(["a", "b"]))
    keep = dedup.phash_dedup_keepers(df, max_hamming=3, bands=4).toPandas()
    # O(images): 49 hot-bucket members -> h00, a1/a2 -> a0; never pairs^2
    by_id = dict(zip(keep["id"], keep["keeper"]))
    assert by_id["a1"] == "a0" and by_id["a2"] == "a0"
    assert sum(1 for k in by_id if k.startswith("h")) == 49
    assert all(v == "h00" for k, v in by_id.items() if k.startswith("h"))
    assert len(keep) == 51
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.phash_near_duplicates(df, max_hamming=4, bands=4)


def test_ann_ivf_probes_subset_and_ranks(spark, emb):
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, qs, k=5).toPandas()
    ivf = similarity.ann_ivf(emb, qs, k=5, n_centroids=8, n_probe=8).toPandas()
    # probing ALL centroids == exact search (recall 1 by construction)
    for qid in exact["query_id"].unique():
        e = exact[exact.query_id == qid].sort_values("rank")["id"].tolist()
        g = ivf[ivf.query_id == qid].sort_values("rank")["id"].tolist()
        assert g == e
    # with a strict probe subset, results are a subset of the corpus and
    # ranked by cosine descending
    narrow = similarity.ann_ivf(emb, qs, k=5, n_centroids=8, n_probe=2).toPandas()
    for qid, grp in narrow.groupby("query_id"):
        cos = grp.sort_values("rank")["cosine"].tolist()
        assert cos == sorted(cos, reverse=True)


def test_lsh_bucket_builders_agree(spark, emb):
    """The mapInPandas matmul builder must produce bit-identical buckets to
    the relational (oracle-twin) builder."""
    rel = similarity.lsh_buckets(emb, n_planes=8).toPandas().set_index("id")["bucket"]
    fast = similarity.lsh_buckets_fast(emb, n_planes=8).toPandas().set_index("id")["bucket"]
    assert len(rel) == len(fast)
    pd.testing.assert_series_equal(rel.sort_index(), fast.sort_index(), check_names=False)


def test_ngram_df_cap_bounds_candidates(spark):
    """A planted universal shingle must not send the shared-shingle join
    quadratic: with df_cap the candidate pair count collapses to the pairs
    that share RARE shingles."""
    # "the quick brown" is one 3-gram shared by every filler doc
    rows = [(i, f"the quick brown unique{i} filler{i} tail{i}") for i in range(60)]
    rows.append((100, "alpha beta gamma delta one two"))
    rows.append((101, "alpha beta gamma delta one two"))  # true near-dups
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.0).toPandas()
    capped = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.0, df_cap=10).toPandas()
    # uncapped: the stop shingle alone creates 60*59/2 candidate pairs
    assert len(uncapped) >= 60 * 59 // 2
    # capped: only the genuine near-dup pair survives candidate generation
    assert set(zip(capped["a"], capped["b"])) == {(100, 101)}
    assert capped["jaccard"].iloc[0] == pytest.approx(1.0, abs=1e-6)


def test_kmeans_centroids_refine_and_deterministic(spark, emb):
    """Lloyd refinement must (a) be bit-deterministic across runs, (b) not
    worsen mean quantization error vs the lowest-id seed, and (c) plug
    into ann_ivf."""
    seed = (
        emb.orderBy(F.asc("vec_id")).limit(16)
        .selectExpr("CAST(vec_id AS LONG) AS centroid_id", "embedding")
    )
    ref1 = similarity.kmeans_centroids(emb, k=16, iters=2).toPandas()
    ref2 = similarity.kmeans_centroids(emb, k=16, iters=2).toPandas()
    a = ref1.sort_values("centroid_id").reset_index(drop=True)
    b = ref2.sort_values("centroid_id").reset_index(drop=True)
    assert a["centroid_id"].tolist() == b["centroid_id"].tolist()
    for va, vb in zip(a["embedding"], b["embedding"]):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    def mean_err(cdf):
        assign = similarity.ivf_assign(emb, cdf)
        joined = (
            emb.selectExpr("vec_id AS id", "embedding AS v").join(assign, "id")
            .join(cdf.selectExpr("centroid_id", "embedding AS cv"), "centroid_id")
        )
        from gfw_raster_analysis_lambda_spark.operators.similarity import _dot, _norm
        return (
            joined.select(
                (1 - _dot(F.col("v"), F.col("cv")) / (_norm(F.col("v")) * _norm(F.col("cv")))).alias("e")
            ).agg(F.avg("e")).collect()[0][0]
        )

    refined = similarity.kmeans_centroids(emb, k=16, iters=2)
    assert mean_err(refined) <= mean_err(seed) + 1e-12

    qs = emb.filter(F.col("vec_id") < 3).selectExpr("vec_id AS query_id", "embedding")
    got = similarity.ann_ivf(emb, qs, k=5, n_probe=4, centroids=refined).toPandas()
    assert set(got["query_id"]) == {0, 1, 2}
    # each query finds itself (cos 1.0 at rank 1)
    top = got[got["rank"] == 1]
    assert (top["cosine"] >= 0.999999).all()


def test_ivf_index_persisted_partition_pruned(spark, emb, tmp_path):
    """write_ivf_index + ann_ivf_indexed: identical results to the
    in-memory ann_ivf with the same quantizer, and the vectors scan is
    partition-pruned to the probed centroid directories."""
    path = str(tmp_path / "ivf")
    similarity.write_ivf_index(emb, path, n_centroids=8)
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got_df = similarity.ann_ivf_indexed(spark, path, qs, k=5, n_probe=2)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan
    got = got_df.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    exp = (
        similarity.ann_ivf(emb, qs, k=5, n_centroids=8, n_probe=2)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_augment_tiles_numpy_parity(spark, corpus):
    """Every augmentation op decodes back to the exact numpy transform of
    the source pixels; captions pass through byte-equal."""
    from gfw_raster_analysis_lambda_spark.functions import codecs

    images = spark.read.parquet(corpus["images"]).filter(F.col("fmt") == "png").limit(3)
    src = {
        r["image_id"]: codecs.decode_tile(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
        for r in images.collect()
    }
    for op, fn in [
        ("fliph", lambda a: a[:, ::-1]),
        ("flipv", lambda a: a[::-1, :]),
        ("rot90", lambda a: np.rot90(a, 1)),
        ("rot270", lambda a: np.rot90(a, 3)),
        ("crop", lambda a: a[4:20, 8:40]),
    ]:
        out = multimodal.augment_tiles(
            images, op=op, crop=(4, 8, 16, 32) if op == "crop" else None
        ).toPandas()
        for _, r in out.iterrows():
            got = codecs.decode_tile(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
            np.testing.assert_array_equal(got, fn(src[r["image_id"]]))
    cap = images.select("image_id", "caption").toPandas().set_index("image_id")["caption"]
    assert (out.set_index("image_id")["caption"] == cap).all()
    with pytest.raises(ValueError, match="crop"):
        multimodal.augment_tiles(images, op="crop")


def test_multiprobe_lsh_recall_dominates_single(spark, emb):
    """Multi-table LSH recall (vs exact top-k) must dominate single-table
    recall — every single-table candidate is also a multiprobe candidate
    (table 0 uses the same plane set) — and recall_at_k computes the
    containment correctly."""
    qs = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, qs, k=5)
    single = similarity.ann_lsh(emb, qs, k=5, n_planes=8)
    multi = similarity.ann_lsh_multiprobe(emb, qs, k=5, n_planes=8, n_tables=4)
    r1 = similarity.recall_at_k(exact, single, 5).toPandas().set_index("query_id")["recall"]
    r4 = similarity.recall_at_k(exact, multi, 5).toPandas().set_index("query_id")["recall"]
    assert (r4 >= r1.reindex(r4.index).fillna(0)).all()
    assert r4.mean() >= r1.mean()
    # self-match always collides in table 0 -> recall > 0 everywhere
    assert (r4 > 0).all()
    # exact-vs-exact recall is 1 by definition
    r_self = similarity.recall_at_k(exact, exact, 5).toPandas()
    assert (r_self["recall"] == 1.0).all()


def test_asof_join_semantics(spark):
    """Inclusive backward as-of: equal timestamps match, unmatched lefts
    keep nulls, tolerance voids stale matches."""
    from gfw_raster_analysis_lambda_spark.operators import asof

    left = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 5, 50.0)],
        "user_id long, ts long, amount double",
    ).select("user_id", F.col("ts").cast("timestamp").cast("long").alias("ts"), "amount")
    right = spark.createDataFrame(
        [(1, 10, 7), (1, 15, 8), (2, 9, 9)],
        "user_id long, ts long, tag int",
    )
    out = asof.asof_join(
        left, right, on="ts", by="user_id", right_cols=["tag"], prefix="m_"
    ).toPandas().sort_values(["user_id", "ts"]).reset_index(drop=True)
    # (1,10) matches equal-ts right (inclusive); (1,20) takes latest (15);
    # (2,5) has no preceding right row -> nulls
    assert out["m_tag"].tolist()[:2] == [7, 8]
    assert pd.isna(out["m_tag"].iloc[2])
    tol = asof.asof_join(
        left, right, on="ts", by="user_id", right_cols=["tag"], prefix="m_",
        tolerance_seconds=3,
    ).toPandas().sort_values(["user_id", "ts"]).reset_index(drop=True)
    assert tol["m_tag"].tolist()[0] == 7           # age 0 <= 3
    assert pd.isna(tol["m_tag"].iloc[1])           # age 5 > 3 -> voided


def test_asof_join_null_fields_stay_atomic(spark):
    """The matched right ROW is carried atomically: a NULL field in the
    true latest row must surface as NULL, never backfilled from an older
    row (the per-column last(ignorenulls) stitching bug)."""
    from gfw_raster_analysis_lambda_spark.operators import asof

    left = spark.createDataFrame([(1, 10)], "user_id long, ts long")
    right = spark.createDataFrame(
        [(1, 5, 100, 3.0), (1, 9, 200, None)],
        "user_id long, ts long, tag long, score double",
    )
    out = asof.asof_join(
        left, right, on="ts", by="user_id", right_cols=["tag", "score"], prefix="m_"
    ).toPandas()
    assert out["m_tag"].tolist() == [200]          # the ts=9 row matched
    assert pd.isna(out["m_score"].iloc[0])         # its NULL preserved


def test_deterministic_sampling_properties(spark, docs):
    """Nested subsamples, growth stability, stratified fractions, and
    exhaustive split assignment."""
    from gfw_raster_analysis_lambda_spark.operators import sampling

    s10 = set(sampling.deterministic_sample(docs, 0.10).toPandas()["doc_id"])
    s05 = set(sampling.deterministic_sample(docs, 0.05).toPandas()["doc_id"])
    assert s05 <= s10                       # nested under one salt
    n = docs.count()
    assert abs(len(s10) / n - 0.10) < 0.08  # ~fraction at small n
    # growth stability: sampling half the corpus keeps the same members
    half = docs.filter(F.col("doc_id") % 2 == 0)
    sh = set(sampling.deterministic_sample(half, 0.10).toPandas()["doc_id"])
    assert sh == {d for d in s10 if d % 2 == 0}
    # stratified: label fractions honored per stratum
    st = sampling.stratified_sample(
        docs, {"en": 0.5}, strata_col="lang", default_fraction=0.0
    ).toPandas()
    assert set(st["lang"]) <= {"en"}
    # split: every row assigned, splits disjoint, ~weights
    sp = sampling.split_assign(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}
    ).toPandas()
    assert len(sp) == n and set(sp["split"]) == {"train", "val", "test"}
    assert abs((sp["split"] == "train").mean() - 0.8) < 0.1


def test_ivf_assigners_agree(spark, emb):
    """ivf_assign_fast (zero-shuffle matmul) must be bit-identical to the
    relational DuckDB twin, unrounded and round-6 alike, and its plan must
    contain NO Exchange — the whole point is that a per-row argmax over a
    broadcast centroid set never shuffles."""
    cdf = (
        emb.orderBy(F.asc("vec_id")).limit(16)
        .selectExpr("CAST(vec_id AS LONG) AS centroid_id", "embedding")
    )
    rel = similarity.ivf_assign(emb, cdf).toPandas().sort_values("id").reset_index(drop=True)
    fast = similarity.ivf_assign_fast(emb, cdf).toPandas().sort_values("id").reset_index(drop=True)
    assert rel["id"].tolist() == fast["id"].tolist()
    assert rel["centroid_id"].tolist() == fast["centroid_id"].tolist()

    # round-6 variant (the kmeans-loop contract), with the vector carried
    carried = (
        similarity.ivf_assign_fast(emb, cdf, round_to=6, carry_vec=True)
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    assert carried["centroid_id"].tolist() == fast["centroid_id"].tolist()
    src = emb.orderBy("vec_id").toPandas()
    np.testing.assert_array_equal(
        np.stack(carried["v"].to_numpy()), np.stack(src["embedding"].to_numpy())
    )

    plan = similarity.ivf_assign_fast(emb, cdf)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_kmeans_assign_stage_has_no_exchange(spark, emb):
    """The Lloyd assign stage must not shuffle; the only Exchange in one
    kmeans iteration is the O(k x dims) re-center aggregate (partial-agg
    combine), never an N x k argmin shuffle."""
    one = similarity.kmeans_centroids(emb, k=8, iters=1)
    plan = one._jdf.queryExecution().executedPlan().toString()
    # re-center HashAggregate exchanges by (centroid_id, i) — tiny keys;
    # no Window/row_number over the corpus remains anywhere in the plan
    assert "Window" not in plan
    assert "row_number" not in plan


def test_interval_join_semantics_and_guard(spark):
    from gfw_raster_analysis_lambda_spark.operators import asof

    iv = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-01 03:00:00"),
         (2, "2024-01-01 02:30:00", "2024-01-01 04:00:00")],
        "iv_id long, start_s string, end_s string",
    ).select("iv_id", F.col("start_s").cast("timestamp").alias("start_ts"),
             F.col("end_s").cast("timestamp").alias("end_ts"))
    pts = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00"), (11, "2024-01-01 02:45:00"),
         (12, "2024-01-01 03:00:00"), (13, "2024-01-01 05:00:00")],
        "p_id long, ts_s string",
    ).select("p_id", F.col("ts_s").cast("timestamp").alias("ts"))

    got = asof.interval_join(pts, iv).select("p_id", "iv_id").toPandas()
    pairs = set(zip(got["p_id"], got["iv_id"]))
    # half-open [start, end): point 10 at start included; 12 at iv1 end
    # excluded but inside iv2; 13 outside everything
    assert pairs == {(10, 1), (11, 1), (11, 2), (12, 2)}

    # the guard must FIRE (not be pruned): inverted interval
    bad = spark.createDataFrame(
        [(9, "2024-01-02 00:00:00", "2024-01-01 00:00:00")],
        "iv_id long, start_s string, end_s string",
    ).select("iv_id", F.col("start_s").cast("timestamp").alias("start_ts"),
             F.col("end_s").cast("timestamp").alias("end_ts"))
    with pytest.raises(Exception, match="interval_join"):
        asof.interval_join(pts, bad).collect()

    # ... and for an open-ended sentinel blowing the bin cap
    sentinel = spark.createDataFrame(
        [(9, "2024-01-01 00:00:00", "9999-12-31 00:00:00")],
        "iv_id long, start_s string, end_s string",
    ).select("iv_id", F.col("start_s").cast("timestamp").alias("start_ts"),
             F.col("end_s").cast("timestamp").alias("end_ts"))
    with pytest.raises(Exception, match="interval_join"):
        asof.interval_join(pts, sentinel, max_bins_per_interval=1000).collect()


def test_audio_features_real_wav_decode(spark):
    """Real WAV path: PCM16 sines (incl. a stereo mixdown and an 8-bit
    payload) decode via stdlib wave and the features match numpy computed
    directly from the quantized samples."""
    import io
    import wave as wavemod

    sr, nf = 8000, 2048
    mono = multimodal.synthesize_wav_pcm16(440.0, 0.5, sr, nf, channels=1)
    stereo = multimodal.synthesize_wav_pcm16(440.0, 0.5, sr, nf, channels=2)
    # 8-bit unsigned WAV with a known ramp
    buf = io.BytesIO()
    with wavemod.open(buf, "wb") as wf:
        wf.setnchannels(1); wf.setsampwidth(1); wf.setframerate(sr)
        wf.writeframes(bytes(range(256)))
    adf = spark.createDataFrame(
        [("mono", mono), ("stereo", stereo), ("u8", buf.getvalue())],
        "media_id string, payload binary",
    )
    got = multimodal.audio_features(adf).toPandas().set_index("media_id")

    n = np.arange(nf, dtype=np.float64)
    s = np.floor(32767.0 * 0.5 * np.sin(2.0 * np.pi * 440.0 * n / sr) + 0.5) / 32768.0
    rms = float(np.floor(np.sqrt(np.mean(s * s)) * 1e6 + 0.5) / 1e6)
    for mid in ("mono", "stereo"):  # identical channels mix down to the same mono
        assert got.loc[mid, "n_samples"] == nf
        assert got.loc[mid, "sample_rate"] == sr
        assert got.loc[mid, "rms"] == rms
        assert got.loc[mid, "duration_s"] == nf / sr
    assert got.loc["stereo", "n_channels"] == 2
    u8 = (np.arange(256.0) - 128.0) / 128.0
    assert got.loc["u8", "rms"] == float(np.floor(np.sqrt(np.mean(u8 * u8)) * 1e6 + 0.5) / 1e6)
    assert got.loc["u8", "peak"] == 1.0


def test_video_frame_sample_real_y4m(spark):
    """Real Y4M decode: frame sampling + stats match the generating
    formula; entropy-coded payloads still raise the explicit stub."""
    w, h, nf, seed = 20, 14, 7, 3
    payload = multimodal.synthesize_y4m(w, h, nf, seed=seed)
    vdf = spark.createDataFrame(
        [("v1", payload)], "media_id string, payload binary"
    )
    frames = multimodal.video_frame_sample(vdf, every_n=3)
    got = multimodal.video_frame_stats(frames).toPandas().sort_values("frame")
    assert got["frame"].tolist() == [0, 3, 6]
    assert (got["w"] == w).all() and (got["h"] == h).all()
    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    for _, r in got.iterrows():
        y = (i + 2 * j + 7 * int(r["frame"]) + 11 * seed) % 256
        assert r["px_min"] == y.min() and r["px_max"] == y.max()
        assert r["px_mean"] == float(np.floor(y.mean() * 1e6 + 0.5) / 1e6)

    # direct decoder checks: cube shape + exact luma bytes
    cube = multimodal._decode_video(payload, fake=False)
    assert cube.shape == (nf, h, w)
    np.testing.assert_array_equal(cube[2], (i + 2 * j + 14 + 33) % 256)

    # mono colorspace (no chroma planes) decodes too
    mono = payload.replace(b"C420", b"Cmono", 1)
    # rebuild without chroma: header + frames of luma only
    head, rest = mono.split(b"\n", 1)
    frames_raw = rest.split(b"FRAME\n")[1:]
    uv = (h // 2) * (w // 2) * 2
    mono2 = head + b"\n" + b"".join(b"FRAME\n" + f[: len(f) - uv if k < nf - 1 else len(f) - uv] for k, f in enumerate(frames_raw))
    cube2 = multimodal._decode_video(mono2, fake=False)
    assert cube2.shape == (nf, h, w)
    np.testing.assert_array_equal(cube2, cube)

    with pytest.raises(Exception, match="NotImplementedError|entropy-coded"):
        multimodal.video_frame_sample(
            spark.createDataFrame([("x", b"\x00\x00\x01mp4!")],
                                  "media_id string, payload binary"),
            fake_codec=False,
        ).collect()


def test_kmeans_sampled_training(spark, emb):
    """train_fraction trains the quantizer on the deterministic hash
    sample: same result as running kmeans on the pre-sampled frame, and
    ann_ivf with the sampled quantizer still assigns the FULL corpus."""
    from gfw_raster_analysis_lambda_spark.operators.sampling import (
        deterministic_sample,
    )

    sampled = similarity.kmeans_centroids(emb, k=8, iters=1, train_fraction=0.5)
    manual = similarity.kmeans_centroids(
        deterministic_sample(emb, 0.5, "vec_id", salt="kmeans"), k=8, iters=1
    )
    a = sampled.toPandas().sort_values("centroid_id").reset_index(drop=True)
    b = manual.toPandas().sort_values("centroid_id").reset_index(drop=True)
    assert a["centroid_id"].tolist() == b["centroid_id"].tolist()
    for va, vb in zip(a["embedding"], b["embedding"]):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    qs = emb.filter(F.col("vec_id") < 3).selectExpr("vec_id AS query_id", "embedding")
    got = similarity.ann_ivf(emb, qs, k=5, n_probe=4, centroids=sampled).toPandas()
    top = got[got["rank"] == 1]
    assert (top["cosine"] >= 0.999999).all()  # full corpus searched


def test_cross_modal_dups_consensus(spark):
    """Visual near-dup pairs survive only when captions also agree; the
    jaccard value is the exact distinct-token ratio."""
    rows = [
        ("a", 0b1010, "red barn under snow"),
        ("b", 0b1011, "red barn under snow"),        # visual+caption dup of a
        ("c", 0b1010, "stock chart q3 revenue"),     # same image, alien caption
        ("d", 0b1010 ^ (1 << 40), "red barn under light snow"),  # partial caption
        ("e", 0xFFFFFFFF, "red barn under snow"),    # caption dup, visually far
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long, caption string")
    got = dedup.cross_modal_dups(df, max_hamming=3, bands=4, min_caption_jaccard=0.5)
    pairs = {(r["a"], r["b"]): r for r in got.collect()}
    assert ("a", "b") in pairs and pairs[("a", "b")]["caption_jaccard"] == 1.0
    # c collides visually with a AND b but its caption disagrees -> gone
    assert not any("c" in p for p in pairs)
    # e matches captions but is visually far -> never a candidate
    assert not any("e" in p for p in pairs)
    # d vs a: tokens {red,barn,under,snow} vs +{light}: jaccard 4/5
    assert pairs[("a", "d")]["caption_jaccard"] == 0.8


def test_cross_modal_dedup_clusters_transitive(spark):
    """A~B and B~C consensus pairs land A, B, C in ONE cluster even when
    A and C share no phash band (hamming(A,C)=6 > max_hamming); images
    failing either modality stay out."""
    base = 0b1010
    rows = [
        ("a", base, "red barn under snow"),
        ("b", base ^ (1 << 10) ^ (1 << 30) ^ (1 << 50), "red barn under snow"),
        ("c", base ^ (1 << 10) ^ (1 << 11) ^ (1 << 30)
              ^ (1 << 31) ^ (1 << 50) ^ (1 << 51), "red barn under snow"),
        ("d", base, "stock chart q3 revenue"),       # visual-only: excluded
        ("e", 0x5555AAAA, "red barn under snow"),    # caption-only: excluded
    ]
    # a-b hamming 3, b-c hamming 3, a-c hamming 6: transitive chain only
    df = spark.createDataFrame(rows, "image_id string, phash long, caption string")
    pairs = dedup.cross_modal_dups(df, max_hamming=3, bands=4,
                                   min_caption_jaccard=0.5)
    got_pairs = {(r["a"], r["b"]) for r in pairs.collect()}
    assert ("a", "c") not in got_pairs  # never a direct candidate
    got = dedup.cross_modal_dedup_clusters(
        df, max_hamming=3, bands=4, min_caption_jaccard=0.5
    ).toPandas()
    clusters = dict(zip(got["id"], got["cluster"]))
    assert clusters == {"a": "a", "b": "a", "c": "a"}  # d, e absent


def test_hash_to_min_string_ids_no_hash_injectivity(spark):
    """The closure runs natively on STRING node ids: correctness cannot
    depend on any string->int64 hash being injective, because no such
    mapping exists in the path (this pins the round-3 fix that removed
    the xxhash64 node-id step from phash_dedup_clusters — two reps whose
    64-bit hashes collide can no longer silently merge)."""
    from gfw_raster_analysis_lambda_spark.operators import components

    nodes = spark.createDataFrame(
        [("img~z",), ("img~y",), ("img~x",), ("lone",)], "id string"
    )
    e = [("img~z", "img~y"), ("img~y", "img~x")]
    edges = spark.createDataFrame(
        e + [(b, a) for a, b in e], "a string, b string"
    )
    got = components.hash_to_min(nodes, edges).toPandas()
    comp = dict(zip(got["id"], got["component"]))
    assert comp == {
        "img~z": "img~x", "img~y": "img~x", "img~x": "img~x", "lone": "lone"
    }
    # long ids still normalize to long (the original contract)
    lnodes = spark.createDataFrame([(1,), (2,)], "id int")
    ledges = spark.createDataFrame([(1, 2), (2, 1)], "a long, b long")
    lgot = components.hash_to_min(lnodes, ledges)
    assert dict(lgot.dtypes)["id"] == "bigint"
    assert {r["component"] for r in lgot.collect()} == {1}
    # and phash_dedup_clusters itself carries string reps end-to-end
    imgs = spark.createDataFrame(
        [("z9", 0b111), ("z8", 0b111), ("q1", 0b110), ("far", 1 << 60)],
        "image_id string, phash long",
    )
    pc = dedup.phash_dedup_clusters(imgs, max_hamming=1, bands=4).toPandas()
    got_c = dict(zip(pc["id"], pc["cluster"]))
    assert got_c == {"z9": "q1", "z8": "q1", "q1": "q1", "far": "far"}


def test_review_fixes_round3(spark, emb):
    """Regression pins for round-3 review findings: empty-input paths,
    HALF_UP rounding parity, truncated-chroma detection, captionless
    cross-modal pairs."""
    import io

    # empty query set: empty frame, not IndexError
    from gfw_raster_analysis_lambda_spark.operators import knn
    from gfw_raster_analysis_lambda_spark.sources import fixtures as fx
    from gfw_raster_analysis_lambda_spark.sources.images import with_derived_keys

    images = with_derived_keys(
        spark.createDataFrame(fx.generate_images_rows(), fx.IMAGES_SCHEMA)
    )
    empty_q = spark.createDataFrame([], "query_id string, phash long, cell_id long")
    assert knn.knn_phash_pruned_auto(
        images, empty_q, k=3, ring=1, max_ring=4, grid_name=fx.GRID.name
    ).count() == 0
    with pytest.raises(ValueError, match="ring"):
        knn.knn_phash_pruned_auto(images, empty_q, k=3, ring=0, grid_name=fx.GRID.name)

    # empty centroid frame: empty assignment, not np.stack crash
    no_cents = spark.createDataFrame([], "centroid_id long, embedding array<float>")
    assert similarity.ivf_assign_fast(emb, no_cents).count() == 0
    assert similarity.ivf_assign_fast(emb, no_cents, carry_vec=True).columns == [
        "id", "centroid_id", "v"
    ]

    # HALF_UP tie rounding matches Spark F.round (np.round would give .123456)
    one = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    import numpy as np2
    s = 10.0 ** 6
    assert np2.copysign(np2.floor(abs(0.1234565) * s + 0.5), 1.0) / s == 0.123457

    # truncated final chroma plane raises
    payload = multimodal.synthesize_y4m(8, 6, 2, seed=0)
    with pytest.raises(ValueError, match="truncated"):
        multimodal._decode_video(payload[:-4], fake=False)

    # captionless image keeps its visual pair at jaccard 0
    rows = [("a", 7, "same words"), ("b", 7, ""), ("c", 7, "same words")]
    df = spark.createDataFrame(rows, "image_id string, phash long, caption string")
    got = dedup.cross_modal_dups(df, min_caption_jaccard=0.0).toPandas()
    pairs = {(r.a, r.b): r.caption_jaccard for r in got.itertuples()}
    assert pairs[("a", "b")] == 0.0 and pairs[("b", "c")] == 0.0
    assert pairs[("a", "c")] == 1.0


def test_benchmark_contamination_semantics_and_broadcast(spark):
    """Hand-built corpus: doc 10 embeds ALL of bench 1's trigrams, doc 11
    embeds about half, doc 12 none. Coverage is over the BENCHMARK item's
    shingles (long docs don't dilute), and the plan broadcasts the
    benchmark side (corpus rows never shuffle for the join)."""
    bench_text = "alpha beta gamma delta epsilon zeta eta"  # 5 trigrams
    docs = spark.createDataFrame(
        [
            (10, "noise words here " + bench_text + " trailing tail"),
            (11, "alpha beta gamma delta filler filler filler"),  # 2/5 trigrams
            (12, "completely unrelated text with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(1, bench_text)], "bench_id long, text string")
    got = (
        text.benchmark_contamination(docs, bench, n=3, threshold=0.3)
        .orderBy("doc_id")
        .toPandas()
    )
    assert list(got["doc_id"]) == [10, 11]
    full = got[got.doc_id == 10].iloc[0]
    part = got[got.doc_id == 11].iloc[0]
    assert full["n_bench_shingles"] == 5 and full["n_overlap"] == 5
    assert full["overlap_frac"] == 1.0
    assert part["n_overlap"] == 2 and abs(part["overlap_frac"] - 0.4) < 1e-9
    # below-threshold doc is absent entirely (12 had zero shared shingles;
    # a doc sharing some-but-few shingles is filtered by the threshold)
    assert 12 not in set(got["doc_id"])

    plan = text.benchmark_contamination(docs, bench, n=3, threshold=0.3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    drop = (
        text.contaminated_doc_ids(docs, bench, n=3, threshold=0.3)
        .orderBy("doc_id")
        .toPandas()
    )
    assert list(drop["doc_id"]) == [10, 11]
    assert list(drop["n_bench_hits"]) == [1, 1]
    assert drop[drop.doc_id == 10]["max_overlap_frac"].iloc[0] == 1.0


def test_salted_grouped_topk_matches_plain_window(spark, docs):
    """The salted two-phase top-k is lossless: bit-identical rows to the
    naive single-window plan on a deliberately multi-partition input."""
    from pyspark.sql import Window

    d = docs.repartition(7)
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    got = (
        text.salted_grouped_topk(d, ["lang"], order, 5)
        .select("doc_id", "lang", "rank")
        .orderBy("lang", "rank")
        .toPandas()
    )
    w = Window.partitionBy("lang").orderBy(*order)
    exp = (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "lang", "rank")
        .orderBy("lang", "rank")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, exp)
    # quality_quota composes the same helper over the quality score
    qq = text.quality_quota(docs, k=3).toPandas()
    assert set(qq.columns) == {"doc_id", "lang", "quality", "rank"}
    assert (qq.groupby("lang")["rank"].max() <= 3).all()


def test_pq_encode_numpy_parity_and_no_exchange(spark, emb):
    """pq_encode codes match a direct numpy re-derivation bit-for-bit,
    and the encode plan contains no Exchange (zero shuffle)."""
    from gfw_raster_analysis_lambda_spark.operators.similarity import (
        _round_half_up,
        pq_encode,
        pq_init_codebooks,
    )

    cb = pq_init_codebooks(emb, m=8, ksub=16)
    enc = pq_encode(emb, cb)
    assert "Exchange" not in enc._jdf.queryExecution().executedPlan().toString()
    got = enc.orderBy("id").toPandas()
    rows = emb.orderBy("vec_id").select("vec_id", "embedding").collect()
    V = np.stack([np.asarray(r[1], np.float64) for r in rows])
    sub = V.reshape(len(V), 8, 8)
    dist = _round_half_up(((sub[:, :, None, :] - cb[None]) ** 2).sum(-1), 6)
    exp = dist.argmin(2)
    np.testing.assert_array_equal(np.stack(got["codes"].to_numpy()), exp)


def test_pq_adc_matches_numpy_and_train_improves(spark, emb):
    from gfw_raster_analysis_lambda_spark.operators.similarity import (
        _round_half_up,
        pq_adc_topk,
        pq_encode,
        pq_init_codebooks,
        pq_train,
    )

    cb = pq_init_codebooks(emb, m=8, ksub=16)
    enc = pq_encode(emb, cb)
    rows = emb.orderBy("vec_id").select("vec_id", "embedding").collect()
    ids = [int(r[0]) for r in rows]
    V = np.stack([np.asarray(r[1], np.float64) for r in rows])
    sub = V.reshape(len(V), 8, 8)
    codes = _round_half_up(((sub[:, :, None, :] - cb[None]) ** 2).sum(-1), 6).argmin(2)
    qs = [(ids[0], V[0]), (ids[5], V[5])]
    top = pq_adc_topk(enc, cb, qs, k=7).orderBy("query_id", "rank").toPandas()
    for qid, qv in qs:
        lut = _round_half_up(((qv.reshape(8, 1, 8) - cb) ** 2).sum(-1), 6)
        sc = np.round(lut[np.arange(8)[None, :], codes].sum(1), 6)
        order = sorted(range(len(ids)), key=lambda i: (sc[i], ids[i]))[:7]
        g = top[top.query_id == qid]
        assert list(g["id"]) == [ids[i] for i in order]
        np.testing.assert_allclose(g["adc_dist"], [sc[i] for i in order], atol=1e-9)

    # one Lloyd iteration must not worsen total quantization error
    def qerr(c):
        d = _round_half_up(((sub[:, :, None, :] - c[None]) ** 2).sum(-1), 6)
        return d.min(axis=2).sum()

    cb1 = pq_train(emb, m=8, ksub=16, iters=1)
    assert qerr(cb1) <= qerr(cb) + 1e-6
    assert cb1.shape == cb.shape


def test_pack_token_bins_properties(spark, docs):
    """Bins are contiguous in id order within each shard, every bin's
    pre-overshoot total stays under budget, and assignment is stable
    under corpus growth (packing uses only tokens BEFORE a doc)."""
    out = text.pack_token_bins(docs, budget=300, n_shards=4).toPandas()
    assert (out["doc_id"] % 4 == out["shard"]).all()
    for shard, g in out.sort_values("doc_id").groupby("shard"):
        bins = g["bin"].to_numpy()
        assert (np.diff(bins) >= 0).all()  # monotone in id order
        cum = np.concatenate([[0], g["n_tokens"].cumsum().to_numpy()[:-1]])
        np.testing.assert_array_equal(bins, cum // 300)
    # growth stability: packing the first half assigns identical bins
    half_ids = set(
        docs.orderBy("doc_id").limit(250).select("doc_id").toPandas()["doc_id"]
    )
    # drop a TAIL of each shard (ids are interleaved across shards, so a
    # doc's preceding-token sum within its shard is unchanged)
    sub = text.pack_token_bins(
        docs.filter(F.col("doc_id") < 250), budget=300, n_shards=4
    ).toPandas().set_index("doc_id")["bin"]
    full = out.set_index("doc_id")["bin"]
    for i in sub.index:
        assert sub[i] == full[i]


def test_pack_token_bins_default_is_partition_invariant(spark, docs):
    """The DEFAULT packing is part of the pipeline's bit-identical
    rebuild contract (ADVICE r4): it must not depend on how the corpus
    happened to be partitioned or read. Partition scaling is available
    behind the explicit n_shards="auto" sentinel."""
    wide = text.pack_token_bins(docs.repartition(96), budget=300).toPandas()
    narrow = text.pack_token_bins(docs.coalesce(2), budget=300).toPandas()
    assert (wide["doc_id"] % 64 == wide["shard"]).all()   # constant default
    assert (narrow["doc_id"] % 64 == narrow["shard"]).all()
    w = wide.sort_values("doc_id").reset_index(drop=True)
    n = narrow.sort_values("doc_id").reset_index(drop=True)
    assert w.equals(n)  # bit-identical across read layouts
    # "auto" opts into partition scaling: each shard ~ one input split
    auto = text.pack_token_bins(docs.repartition(96), budget=300, n_shards="auto").toPandas()
    assert (auto["doc_id"] % 96 == auto["shard"]).all()   # 96 > floor
    floor = text.pack_token_bins(docs.coalesce(2), budget=300, n_shards="auto").toPandas()
    assert (floor["doc_id"] % 64 == floor["shard"]).all()  # floor wins
    import pytest as _pytest
    with _pytest.raises(ValueError, match="auto"):
        text.pack_token_bins(docs, budget=300, n_shards="wide")


def test_rolling_features_semantics(spark):
    """Hand-checked rolling features: lag, integer-microsecond gaps,
    trailing mean over bounded window, cumulative count; ties on equal
    timestamps break by event_id."""
    from datetime import datetime

    from gfw_raster_analysis_lambda_spark.operators import asof

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 7, 10.0),
        (2, datetime(2024, 1, 1, 0, 0, 1), 7, 20.0),
        (3, datetime(2024, 1, 1, 0, 0, 1), 7, 30.0),  # tie with event 2
        (4, datetime(2024, 1, 1, 0, 0, 5), 7, 40.0),
        (5, datetime(2024, 1, 1, 0, 0, 2), 8, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double"
    )
    got = (
        asof.rolling_features(df, window=2)
        .orderBy("user_id", "ts", "event_id")
        .toPandas()
    )
    u7 = got[got.user_id == 7]
    assert list(u7["prev_value"].fillna(-1)) == [-1.0, 10.0, 20.0, 30.0]
    assert list(u7["delta_us"].fillna(-1)) == [-1, 1_000_000, 0, 4_000_000]
    assert list(u7["mov_avg"]) == [10.0, 15.0, 25.0, 35.0]
    assert list(u7["cum_n"]) == [1, 2, 3, 4]
    u8 = got[got.user_id == 8]
    assert list(u8["cum_n"]) == [1] and pd.isna(u8["prev_value"].iloc[0])


def test_mix_sources_proportions_and_determinism(spark, docs):
    from gfw_raster_analysis_lambda_spark.operators import sampling

    targets = {"src1": 0.5, "src2": 0.3, "src3": 0.2}
    out = sampling.mix_sources(docs, targets, source_col="source").toPandas()
    # only targeted sources survive
    assert set(out["source"]) <= set(targets)
    # the binding source keeps ~everything; proportions approach targets
    got = out.groupby("source").size()
    frac = (got / got.sum()).to_dict()
    for s, w in targets.items():
        if s in frac:
            assert abs(frac[s] - w) < 0.25  # small-sample tolerance
    # deterministic: identical membership on a rerun
    out2 = sampling.mix_sources(docs, targets, source_col="source").toPandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    with pytest.raises(ValueError, match="absent sources"):
        sampling.mix_sources(docs, {"nope": 1.0}, source_col="source")


def test_pq_recall_vs_exact_l2(spark, emb):
    """Evidence for the PQ claim: ADC top-10 recall against exact
    squared-L2 top-10 stays useful at 32x compression (m=8, ksub=16 on
    64-dim vectors), and a trained codebook never loses recall to the
    seed codebook on average."""
    from gfw_raster_analysis_lambda_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_init_codebooks,
        pq_train,
    )

    rows = emb.orderBy("vec_id").select("vec_id", "embedding").collect()
    ids = np.array([int(r[0]) for r in rows])
    V = np.stack([np.asarray(r[1], np.float64) for r in rows])
    qs = [(int(ids[i]), V[i]) for i in range(8)]

    def exact_top10(qv):
        d = ((V - qv) ** 2).sum(1)
        return set(ids[np.lexsort((ids, d))[:10]])

    def recall(cb):
        got = (
            pq_adc_topk(pq_encode(emb, cb), cb, qs, k=10)
            .toPandas().groupby("query_id")["id"].apply(set)
        )
        hits = [
            len(got[qid] & exact_top10(qv)) / 10.0 for qid, qv in qs
        ]
        return float(np.mean(hits))

    r_seed = recall(pq_init_codebooks(emb, m=8, ksub=16))
    r_trained = recall(pq_train(emb, m=8, ksub=16, iters=1))
    # floor is deliberately loose (tiny corpus, tiny codebook); the point
    # is "useful, and training does not hurt"
    assert r_seed >= 0.3, r_seed
    assert r_trained >= r_seed - 0.05, (r_trained, r_seed)


def test_equalize_tiles_numpy_parity(spark):
    """Histogram equalization matches a direct numpy re-derivation; a
    constant tile maps to zeros; non-uint8 tiles are rejected loudly."""
    from gfw_raster_analysis_lambda_spark.functions import codecs
    from gfw_raster_analysis_lambda_spark.operators.multimodal import equalize_tiles

    rng = np.random.RandomState(7)
    a = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    flat = np.full((8, 8), 42, np.uint8)
    rows = [
        ("a", codecs.encode_tile(a, "raw_u8"), 16, 16, "raw_u8", "", 0),
        ("flat", codecs.encode_tile(flat, "raw_u8"), 8, 8, "raw_u8", "", 0),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    )
    out = {
        r["image_id"]: codecs.decode_tile(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
        for r in equalize_tiles(df).collect()
    }
    hist = np.bincount(a.ravel(), minlength=256)
    cdf = hist.cumsum()
    cmin = cdf[np.nonzero(hist)[0][0]]
    lut = np.floor((cdf - cmin) * 255.0 / (cdf[-1] - cmin) + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(out["a"], lut[a])
    np.testing.assert_array_equal(out["flat"], np.zeros((8, 8), np.uint8))
    bad = spark.createDataFrame(
        [("u16", codecs.encode_tile(np.zeros((4, 4), np.uint16), "raw_u16"),
          4, 4, "raw_u16", "", 0)],
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    with pytest.raises(Exception, match="uint8"):
        equalize_tiles(bad).collect()


def test_minhash_clusters_transitive_closure(spark, docs):
    """Clusters are the FULL closure of the candidate graph: every
    keeper assignment (one union-find hop) is consistent with it — a doc
    and its keeper always land in the same cluster — and cluster labels
    equal the min member id."""
    clusters = dedup.minhash_dedup_clusters(docs, n_hashes=8, bands=4).toPandas()
    lab = dict(zip(clusters["id"], clusters["cluster"]))
    keep = dedup.minhash_dedup_keepers(docs, n_hashes=8, bands=4).toPandas()
    for _, r in keep.iterrows():
        assert lab[r["id"]] == lab[r["keeper"]]
    # label = min member of its cluster
    grp = clusters.groupby("cluster")["id"].min()
    assert (grp.index == grp.values).all()


def test_repetition_signals_known_values(spark):
    rows = [
        # 4 lines, one duplicated; 'spam spam' dominant bigram
        (0, "spam spam spam spam\nham eggs\nham eggs\nend"),
        (1, ""),                    # empty doc: all zeros
        (2, "one"),                 # single word: no bigrams
        (3, "a b a b a b"),         # alternating: 'a b' 3 of 5 bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in text.repetition_signals(df).collect()
    }
    assert got[0]["n_lines"] == 4 and got[0]["dup_line_frac"] == 0.25
    # words: spam x4, ham, eggs, ham, eggs, end = 9 words, 4 distinct
    assert got[0]["n_words"] == 9
    assert got[0]["dup_word_frac"] == round(1 - 4 / 9, 6)
    # bigrams: 8 total; 'spam spam' x3 is the top
    assert got[0]["top_bigram_frac"] == round(3 / 8, 6)
    assert got[1]["n_words"] == 0 and got[1]["top_bigram_frac"] == 0.0
    assert got[1]["dup_line_frac"] == 0.0 and got[1]["dup_word_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == 0.0
    assert got[3]["top_bigram_frac"] == 0.6  # 'a b' 3 of 5
    assert got[3]["dup_word_frac"] == round(1 - 2 / 6, 6)


def test_repetition_signals_plan_has_no_exchange(spark, docs):
    # per-row operator: the corpus must never shuffle BY KEY. A single
    # round-robin spread Exchange is allowed when the input scan is
    # narrower than the core count (spread_input, r6) — it disappears
    # for any at-least-core-parallel source; what must never appear is
    # a hash/range exchange (a keyed shuffle of corpus rows).
    plan = text.repetition_signals(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert plan.count("Exchange") <= 1


def test_semantic_dedup_keepers_known_case(spark):
    # two orthogonal semantic clusters; ids 0/1 duplicate each other in
    # cluster A, ids 2/3/4 mutually duplicate in cluster B, id 5 is a
    # B-cluster member far enough to survive
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0, 0.0]),     # near-dup of 0
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.002]),     # near-dup of 2
        (4, [0.0, 0.001, 1.0, 0.0]),     # near-dup of 2 and 3
        (5, [0.0, 0.0, 0.4, 0.9]),       # same bucket, below threshold
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])],
        "centroid_id long, embedding array<double>",
    )
    got = dedup.semantic_dedup_keepers(
        emb, threshold=0.99, centroids=cents
    ).orderBy("id").collect()
    assert [(r["id"], r["centroid_id"]) for r in got] == [(0, 0), (2, 1), (5, 1)]


def test_leakage_safe_split_moves_clusters_together(spark):
    from gfw_raster_analysis_lambda_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    # three clusters spanning many ids; the rest are singletons
    clusters = spark.createDataFrame(
        [(0, 0), (7, 0), (31, 0), (2, 2), (9, 2), (4, 4), (5, 4)],
        "id long, cluster long",
    )
    out = sampling.leakage_safe_split(
        docs, clusters, {"train": 0.8, "val": 0.1, "test": 0.1}
    ).collect()
    by_id = {r["doc_id"]: r["split"] for r in out}
    assert len(by_id) == 40
    # every cluster lands in exactly one split
    assert by_id[0] == by_id[7] == by_id[31]
    assert by_id[2] == by_id[9]
    assert by_id[4] == by_id[5]
    # singletons match plain split_assign exactly (growth-stability)
    plain = {
        r["doc_id"]: r["split"]
        for r in sampling.split_assign(
            docs, {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    clustered_ids = {0, 7, 31, 2, 9, 4, 5}
    for i in range(40):
        if i not in clustered_ids:
            assert by_id[i] == plain[i]


def test_chunk_documents_known_case(spark):
    docs = spark.createDataFrame(
        [
            (0, " ".join(str(i) for i in range(10))),  # 10 toks: chunks at 0,4,8
            (1, "a b"),                                 # one short chunk
            (2, ""),                                    # no chunks
        ],
        "doc_id long, text string",
    )
    got = (
        text.chunk_documents(docs, chunk_tokens=5, stride=4)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    rows = [(r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"]) for r in got]
    assert rows == [
        (0, 0, 5, "0 1 2 3 4"),
        (0, 1, 5, "4 5 6 7 8"),
        (0, 2, 2, "8 9"),
        (1, 0, 2, "a b"),
    ]
    # stride == chunk -> non-overlapping full cover
    got2 = text.chunk_documents(docs, chunk_tokens=4, stride=4).filter("doc_id = 0").collect()
    assert sorted(r["n_tokens"] for r in got2) == [2, 4, 4]
    plan = text.chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_semantic_dedup_fast_matches_relational(spark, emb):
    rel = dedup.semantic_dedup_keepers_rel(
        emb, n_clusters=8, threshold=0.3
    ).orderBy("id").collect()
    fast = dedup.semantic_dedup_keepers_fast(
        emb, n_clusters=8, threshold=0.3
    ).orderBy("id").collect()
    assert [(r["id"], r["centroid_id"]) for r in rel] == [
        (r["id"], r["centroid_id"]) for r in fast
    ]
    assert len(rel) > 0


def test_minhash_lsh_max_pairs_guard(spark):
    """A duplicate-saturated corpus must fail fast at the probe (before
    any pair is materialized) when past max_pairs, and run unchanged when
    under it — the diagnostic-path un-OOM-able guard (ADVICE r4 item 7)."""
    rows = [(i, "same text every row making one hot bucket") for i in range(40)]
    rows += [(100 + i, f"unique words number {i} salt {i*i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="max_pairs"):
        dedup.minhash_lsh_candidates(df, n_hashes=8, bands=4, max_pairs=100)
    # 40 identical docs = 780 true pairs; upper bound counts each band's
    # bucket, so the probe bound is bands * 780 = 3120
    out = dedup.minhash_lsh_candidates(df, n_hashes=8, bands=4, max_pairs=4000).toPandas()
    hot = out[(out["a"] < 100) & (out["b"] < 100)]
    assert len(hot) == 780  # the hot bucket's full pair set, exactly once each
    assert len(out.drop_duplicates(["a", "b"])) == len(out)


def test_bm25_matches_reference_formula(spark):
    # independent python twin: dict-loop BM25 with math.log
    import math

    from gfw_raster_analysis_lambda_spark.operators import text as T

    docs = [
        (0, "spark window merge spark spark"),
        (1, "window window table scan"),
        (2, "merge sort join spark"),
        (3, "the quick brown fox"),
        (4, "spark"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    terms = ["spark", "window", "merge"]
    got = (
        T.bm25_scores(df, terms)
        .toPandas().set_index("doc_id").sort_index()
    )
    n = len(docs)
    dls = {i: len(t.split()) for i, t in docs}
    avgdl = sum(dls.values()) / n
    tfs = {i: {t: txt.split().count(t) for t in terms} for i, txt in docs}
    dfreq = {t: sum(1 for i in tfs if tfs[i][t] > 0) for t in terms}
    k1, b = 1.2, 0.75
    for i, _ in docs:
        score = 0.0
        for t in terms:
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            tf = tfs[i][t]
            score += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * dls[i] / avgdl)
            )
        assert got.loc[i, "dl"] == dls[i]
        assert got.loc[i, "n_terms_hit"] == sum(
            1 for t in terms if tfs[i][t] > 0
        )
        assert abs(got.loc[i, "score"] - score) < 1e-6
    # ranking sanity: the spark-heavy doc outranks the no-hit doc
    assert got.loc[0, "score"] > got.loc[3, "score"] == 0.0


def _bpe_train_reference(texts, n_merges):
    # independent single-node BPE (Sennrich et al. 2016), same
    # (count desc, pair asc) tie-break and <2 stop rule
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                vocab[w] += 1
    words = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            for j in range(len(syms) - 1):
                pairs[(syms[j], syms[j + 1])] += vocab[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        for w, syms in words.items():
            j, out = 0, []
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[w] = out
    return merges, words, vocab


def test_bpe_train_matches_reference(spark):
    from gfw_raster_analysis_lambda_spark.operators import text as T

    rng = np.random.default_rng(7)
    vocab_words = ["lower", "lowest", "newer", "newest", "wider",
                   "widest", "low", "new", "wide", "slower"]
    texts = [
        " ".join(rng.choice(vocab_words, size=rng.integers(3, 12)))
        for _ in range(40)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges, words_df = T.bpe_train(df, 15)
    exp_merges, exp_words, exp_vocab = _bpe_train_reference(texts, 15)
    assert merges == exp_merges
    got = {
        r["w"]: (r["n"], list(r["symbols"]))
        for r in words_df.collect()
    }
    assert got == {
        w: (exp_vocab[w], syms) for w, syms in exp_words.items()
    }


def test_bpe_pair_counts_matches_bruteforce(spark):
    from collections import Counter

    from gfw_raster_analysis_lambda_spark.operators import text as T

    texts = ["Hello world", "hello hell", "a bc", "worldly words"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {
        r["pair"]: r["n"]
        for r in T.bpe_pair_counts(df, min_count=1).collect()
    }
    exp = Counter()
    for t in texts:
        for w in t.lower().split():
            if len(w) >= 2:
                for j in range(len(w) - 1):
                    exp[w[j:j + 2]] += 1
    assert got == dict(exp)
