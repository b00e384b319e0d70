#!/usr/bin/env python
"""Round-5 surfaces tour: media codecs, retrieval, curation, geospatial.

    python examples/curation_pipeline.py

Covers, end to end on synthetic data:
- real codecs: MDA1 perceptual audio and MDV1 inter-frame video round
  trips through the multimodal kernels;
- residual IVF-PQ retrieval with a recall readout vs exact cosine;
- corpus curation: embedding decontamination, CCNet-style LM perplexity
  buckets, video temporal near-dup, WebDataset shard packing;
- geospatial: cross-grid reprojection feeding zonal, a distance-band
  join, and exact DBSCAN.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gfw_raster_analysis_lambda_spark import get_spark, zonal_statistics  # noqa: E402
from gfw_raster_analysis_lambda_spark.operators import (  # noqa: E402
    dedup,
    multimodal,
    similarity,
    spatial_join,
    text,
)
from gfw_raster_analysis_lambda_spark.operators.reproject import (  # noqa: E402
    reproject_nearest,
)
from gfw_raster_analysis_lambda_spark.sources import fixtures  # noqa: E402
from gfw_raster_analysis_lambda_spark.sources.images import (  # noqa: E402
    with_derived_keys,
)


def main() -> None:
    spark = get_spark("round5_tour", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # -- real media codecs through the kernels ---------------------------
    audio = spark.createDataFrame(
        [(f"mda/{i}", multimodal.synthesize_mda_payload(10 + i, seed=i))
         for i in range(4)],
        "media_id string, payload binary",
    )
    print("MDA1 perceptual audio (quantized-domain stats):")
    multimodal.mda_coeff_stats(audio).show(4)

    video = spark.createDataFrame(
        [(f"mdv/{i}", multimodal.synthesize_mdv_video(48, 32, 5, seed=i))
         for i in range(2)],
        "media_id string, payload binary",
    )
    print("MDV1 inter-frame video, every 2nd frame sampled:")
    multimodal.video_frame_stats(
        multimodal.video_frame_sample(video, every_n=2)
    ).show(6)

    # -- retrieval: residual IVF-PQ + recall ------------------------------
    rng = np.random.RandomState(0)
    vecs = rng.randn(400, 16).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(400)],
        "vec_id long, embedding array<float>",
    )
    qs = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = similarity.ivf_pq_residual_topk(
        emb, qs, k=5, n_centroids=8, n_probe=2, m=4, ksub=8
    )
    exact = similarity.cosine_topk(emb, qs, k=5)
    print("residual IVF-PQ recall@5 vs exact cosine:")
    similarity.recall_at_k(exact, approx, k=5).show()

    # -- curation ----------------------------------------------------------
    docs = spark.createDataFrame(
        [(i, ("spam " * 8).strip() if i % 7 == 0
          else f"doc {i} body token{i % 13} tail{i % 5}", "en", "web")
         for i in range(64)],
        "doc_id long, text string, lang string, source string",
    )
    print("CCNet LM perplexity buckets (1 = head):")
    text.perplexity_buckets(text.bigram_lm_scores(docs)).groupBy(
        "bucket").count().orderBy("bucket").show()

    bench = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("bench_id"), "embedding"
    )
    flagged = dedup.semantic_contamination(emb, bench, threshold=0.9)
    print(f"embedding decontamination: {flagged.count()} corpus vectors "
          "flag against the benchmark")

    frames = spark.createDataFrame(
        [(v, t, (v % 2) * 100000 + t + v // 2)
         for v in range(4) for t in range(12)],
        "media_id long, frame int, phash long",
    )
    print("video temporal near-dups (offset copies match):")
    dedup.video_temporal_pairs(frames, k=3, threshold=0.2).show()

    shard_idx = multimodal.shard_pack_index(
        docs.select(F.col("doc_id").cast("string").alias("image_id"),
                    F.encode("text", "utf-8").alias("bytes")),
        n_shards=4,
    )
    print("WebDataset shard index (first rows):")
    shard_idx.orderBy("shard", "image_id").show(6)

    # -- geospatial --------------------------------------------------------
    images = with_derived_keys(spark.createDataFrame(
        fixtures.generate_images_rows(), fixtures.IMAGES_SCHEMA))
    re_images = reproject_nearest(
        images.filter(F.col("layer") == "tcl_year"), "4/1024", "1/250"
    )
    aoi = spark.createDataFrame(fixtures.fixture_aois(), fixtures.AOI_SCHEMA)
    env2 = fixtures.fixture_environment(grid="1/250")
    print("zonal over the REPROJECTED layer (1/250 grid):")
    zonal_statistics(
        spark, re_images, aoi.filter(F.col("aoi_id") == "aoi_box_offset"),
        "SELECT tcl_year, COUNT(*) AS n FROM tcl_year GROUP BY tcl_year",
        env2, "1/250",
    ).orderBy("tcl_year").show(5)

    pts = spark.createDataFrame(
        [(i, 10.0 + (i % 3) / 128.0, 20.0 + (i // 3) / 128.0) for i in range(9)]
        + [(100, 11.5, 21.5)],
        "image_id long, lon double, lat double",
    )
    print("DBSCAN (one blob + one noise point):")
    spatial_join.dbscan_labels(pts, 0.05, 5, "4/1024").orderBy("id").show()

    spark.stop()


if __name__ == "__main__":
    main()
