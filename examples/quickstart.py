#!/usr/bin/env python
"""Quickstart: build a tiny corpus, lay it out for zero-shuffle zonal
reads, and run the engine's main surfaces end-to-end.

    python examples/quickstart.py [workdir]

Covers: cell-sorted layout + auto strategy, Raster-SQL zonal statistics
(grouped sums, isoweek, percentile), a fused multi-query batch, GeoJSON
AOI ingest, tile-pyramid overviews with resolution-aware routing, image
near-dup keepers, and ANN search over the embeddings test table.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gfw_raster_analysis_lambda_spark import (  # noqa: E402
    get_spark,
    zonal_statistics,
    zonal_statistics_multi,
)
from gfw_raster_analysis_lambda_spark.functions import grid as G  # noqa: E402
from gfw_raster_analysis_lambda_spark.operators import (  # noqa: E402
    dedup,
    multimodal,
    pyramid,
    similarity,
    text,
)
from gfw_raster_analysis_lambda_spark.sources import fixtures  # noqa: E402
from gfw_raster_analysis_lambda_spark.sources.images import (  # noqa: E402
    read_images,
    write_images_cell_sorted,
)


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="quickstart_")
    spark = get_spark("quickstart", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    env = fixtures.fixture_environment()

    # 1. corpus: deterministic synthetic tiles, written CELL-SORTED so the
    #    planner auto-selects the zero-shuffle colocated scan
    raw = spark.createDataFrame(fixtures.generate_images_rows(), fixtures.IMAGES_SCHEMA)
    corpus = os.path.join(work, "images")
    write_images_cell_sorted(raw, corpus, n_files=4)  # derives layer/cell keys itself
    images = read_images(spark, corpus)
    aoi = spark.createDataFrame(fixtures.fixture_aois()[:2], fixtures.AOI_SCHEMA)

    # 2. Raster-SQL zonal statistics (strategy chosen automatically)
    print("== tree-cover loss by year ==")
    zonal_statistics(
        spark, images, aoi,
        "SELECT tcl_year, SUM(area__ha) AS loss_ha, COUNT(*) AS n "
        "FROM tcl_year WHERE tcd_threshold >= 25 GROUP BY tcl_year",
        env,
    ).show(5)

    print("== median emissions per AOI ==")
    zonal_statistics(
        spark, images, aoi,
        "SELECT median(emissions) AS med FROM tcl_year WHERE is_primary = 'true'",
        env,
    ).show()

    # 3. a whole analysis batch in ONE fused kernel pass
    print("== fused multi-query batch ==")
    results = zonal_statistics_multi(
        spark, images, aoi,
        {
            "alerts_by_week": "SELECT isoweek(alert_date), COUNT(*) AS n "
                              "FROM alert_date_conf GROUP BY 1",
            "area": "SELECT SUM(area__ha) AS ha FROM data",
        },
        env,
    )
    for name, df in results.items():
        print(f"-- {name}: {df.count()} rows")
    results.close()

    # 4. overview pyramid + resolution-aware routing
    level = pyramid.build_overviews(
        images, G.GRID_FIXTURE.name, G.GRID_FIXTURE_COARSE.name, method="mean"
    )
    print(f"== overview level {G.GRID_FIXTURE_COARSE.name}: {level.count()} tiles ==")
    routed = pyramid.choose_overview_grid(
        aoi, [G.GRID_FIXTURE.name, G.GRID_FIXTURE_COARSE.name], min_pixels=1000
    )
    print(f"routing for this AOI batch -> grid {routed}")

    # 5. image near-dup keepers by perceptual hash
    keep = dedup.phash_dedup_keepers(images.select("image_id", "phash"))
    print(f"== phash near-dup assignments: {keep.count()} ==")

    # 6. ANN over the embeddings test table (if present)
    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    if os.path.exists(emb_path):
        emb = spark.read.parquet(emb_path)
        qs = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
        topk = similarity.ann_lsh_multiprobe(emb, qs, k=3, n_tables=2)
        print("== ANN top-3 (multi-table LSH) ==")
        topk.show()

    # 7. real media decode: WAV audio features + Y4M video frame sampling
    adf = spark.createDataFrame(
        [("clip", multimodal.synthesize_wav_pcm16(440.0, 0.5, 8000, 4000))],
        "media_id string, payload binary",
    )
    print("== audio features (RIFF/WAVE PCM, stdlib decode) ==")
    multimodal.audio_features(adf).show()
    vdf = spark.createDataFrame(
        [("vid", multimodal.synthesize_y4m(16, 12, 6, seed=1))],
        "media_id string, payload binary",
    )
    frames = multimodal.video_frame_sample(vdf, every_n=2)
    print("== sampled video frame stats (YUV4MPEG2, numpy decode) ==")
    multimodal.video_frame_stats(frames).show()

    # 8. round-3 late additions: multi-layer map algebra, rollup suite,
    # decontamination, PQ search
    md = zonal_statistics(
        spark, images, aoi,
        "SELECT AVG(em_per_bio) AS epb_avg, SUM(loss_prim) AS lp_sum FROM data",
        env, G.GRID_FIXTURE.name,
    )
    print("== multi-layer map algebra (em_per_bio across grids) ==")
    md.show()
    suite = zonal_statistics(
        spark, images, aoi,
        "SELECT PERCENTILE(ttc_percent, 0.25) AS p25, MEDIAN(ttc_percent) AS p50, "
        "MODE(ttc_percent) AS common, COUNT(DISTINCT ttc_percent) AS nv "
        "FROM ttc_percent",
        env, G.GRID_FIXTURE.name,
    )
    print("== one-pass rollup suite (p25/median/mode/distinct) ==")
    suite.show()
    docs_path = "/root/testdata/sf0.001/documents.parquet"
    if os.path.exists(docs_path):
        docs = spark.read.parquet(docs_path)
        bench_side = docs.filter(F.col("doc_id") % 97 == 0).select(
            F.col("doc_id").alias("bench_id"), "text"
        )
        print("== benchmark decontamination (broadcast n-gram overlap) ==")
        text.benchmark_contamination(docs, bench_side, n=3, threshold=0.5).show(5)
        print("== token-budget sequence packing (sharded, deterministic) ==")
        text.pack_token_bins(docs, budget=500, n_shards=8).show(5)
    if os.path.exists(emb_path):
        cb = similarity.pq_init_codebooks(emb, m=8, ksub=16)
        enc = similarity.pq_encode(emb, cb)
        pq_q = [(int(r[0]), r[1]) for r in emb.limit(2).select("vec_id", "embedding").collect()]
        print("== product-quantization ADC top-3 (32x compressed index) ==")
        similarity.pq_adc_topk(enc, cb, pq_q, k=3).show()

    print("quickstart complete; outputs under", work)


if __name__ == "__main__":
    main()
