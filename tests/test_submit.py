"""End-to-end spark-submit --py-files deployment test (north rule: "jobs
run via spark-submit --py-files on multi-executor clusters").

Builds dist/gfw_raster_analysis_lambda_spark.zip, then launches a REAL
``spark-submit --master local[4] --py-files <zip> jobs/zonal_submit.py``
subprocess with an EMPTY PYTHONPATH for the package — every engine import
must resolve from the shipped zip, proving the artifact is self-contained.
The job's parquet output is compared against the in-process engine result.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_py_files(spark, corpus, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import build_dist

    zip_path = build_dist.build(str(tmp_path / "engine.zip"))
    out_dir = str(tmp_path / "out")
    sql = (
        "SELECT tcl_year, SUM(area__ha) AS loss_ha, COUNT(*) AS n "
        "FROM tcl_year WHERE tcd_threshold >= 30 GROUP BY tcl_year"
    )

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "zonal_submit.py"),
            "--images", corpus["images"],
            "--aoi", corpus["aoi"],
            "--sql", sql,
            "--env", corpus["layers"],
            "--grid", "4/1024",
            "--output", out_dir,
            "--format", "parquet",
            "--csv-output", str(tmp_path / "out_csv"),
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    got = spark.read.parquet(out_dir).toPandas().sort_values(
        ["aoi_id", "tcl_year"]).reset_index(drop=True)

    # S9 parity: csv floats at exactly 5 decimals (reference tiling.py:71)
    csv = spark.read.option("header", True).csv(str(tmp_path / "out_csv")).toPandas()
    assert len(csv) == len(got)
    assert all(
        len(v.split(".")[1]) == 5 for v in csv["loss_ha"].tolist()
    ), csv["loss_ha"].head()

    from gfw_raster_analysis_lambda_spark.api import zonal_statistics
    from gfw_raster_analysis_lambda_spark.sources.catalog import DataEnvironment
    from gfw_raster_analysis_lambda_spark.sources.images import read_images

    with open(corpus["layers"]) as f:
        denv = DataEnvironment.from_json(f.read())
    exp = zonal_statistics(
        spark, read_images(spark, corpus["images"]),
        spark.read.parquet(corpus["aoi"]), sql, denv, "4/1024",
    ).toPandas().sort_values(["aoi_id", "tcl_year"]).reset_index(drop=True)

    assert len(got) == len(exp) > 0
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    import numpy as np
    np.testing.assert_allclose(
        got["loss_ha"].to_numpy(), exp["loss_ha"].to_numpy(), rtol=1e-12
    )


def test_pyramid_submit_main_inprocess(spark, corpus, tmp_path):
    """jobs/pyramid_submit.py main() builds a cell-sorted overview level
    equal to a direct build_overviews call (reuses the test session via
    getOrCreate)."""
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    import pyramid_submit

    from gfw_raster_analysis_lambda_spark.functions import grid as G
    from gfw_raster_analysis_lambda_spark.operators.pyramid import build_overviews
    from gfw_raster_analysis_lambda_spark.sources.images import read_images

    out = str(tmp_path / "ov")
    pyramid_submit.main([
        "--images", corpus["images"], "--src-grid", G.GRID_FIXTURE.name,
        "--dst-grids", G.GRID_FIXTURE_COARSE.name, "--output", out,
        "--method", "nearest", "--cell-sorted",
    ])
    level_path = os.path.join(out, G.GRID_FIXTURE_COARSE.name.replace("/", "_"))
    got = read_images(spark, level_path).select("image_id", "bytes").toPandas()
    exp = build_overviews(
        read_images(spark, corpus["images"]),
        G.GRID_FIXTURE.name, G.GRID_FIXTURE_COARSE.name, method="nearest",
    ).select("image_id", "bytes").toPandas()
    g = got.sort_values("image_id").reset_index(drop=True)
    e = exp.sort_values("image_id").reset_index(drop=True)
    assert g["image_id"].tolist() == e["image_id"].tolist()
    assert all(bytes(a) == bytes(b) for a, b in zip(g["bytes"], e["bytes"]))


def test_curate_submit_main_inprocess(spark, tmp_path):
    """jobs/curate_submit.py runs the whole curation pipeline in one job:
    counts shrink monotonically through the drop stages, the output packs
    into token bins, and a re-run reproduces identical membership."""
    import json as _json

    sys.path.insert(0, os.path.join(REPO, "jobs"))
    import curate_submit

    docs_path = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(docs_path)
    # benchmark side: every 11th doc (planted contamination = the docs
    # themselves, so those must drop)
    bench_path = str(tmp_path / "bench")
    docs.filter((docs.doc_id % 11) == 0).selectExpr(
        "doc_id AS bench_id", "text"
    ).write.parquet(bench_path)
    out = str(tmp_path / "curated")
    curate_submit.main([
        "--documents", docs_path, "--output", out,
        "--benchmark", bench_path, "--contamination-threshold", "0.8",
        "--contamination-ngram", "3",
        "--near-dup", "--near-dup-hashes", "16", "--near-dup-bands", "2",
        "--paragraph-dedup",
        "--lm-buckets", "4", "--lm-keep-max", "3",
        "--strata-fractions", '{"en": 0.6}',
        "--mix-targets", '{"src1": 0.4, "src2": 0.3, "src3": 0.3}',
        "--quota-k", "50", "--pack-budget", "300", "--pack-shards", "4",
        "--max-dup-line-frac", "0.99", "--max-top-bigram-frac", "0.95",
        "--split-weights", '{"train": 0.9, "val": 0.1}',
        "--chunks-output", str(tmp_path / "chunks"),
        "--chunk-tokens", "32", "--chunk-stride", "32",
    ])
    man = _json.load(open(os.path.join(out, "_curation_manifest.json")))
    assert man["after_repetition_filter"] <= man["input"]
    assert man["after_decontaminate"] < man["input"]
    # paragraph dedup rewrites text but drops no rows (fixture docs have
    # no newlines, so it degrades to whole-text first-occurrence-wins:
    # duplicate docs' text becomes empty and exact dedup collapses them)
    assert man["after_paragraph_dedup"] == man["after_decontaminate"]
    assert man["after_exact_dedup"] <= man["after_paragraph_dedup"]
    assert man["after_near_dedup"] <= man["after_exact_dedup"]
    # LM filter keeps buckets 1..3 of 4: roughly three quarters survive
    assert man["after_lm_filter"] < man["after_near_dedup"]
    assert man["after_lm_filter"] >= (man["after_near_dedup"] * 3) // 4 - 1
    assert man["after_stratified_sample"] <= man["after_lm_filter"]
    assert man["after_mix"] <= man["after_stratified_sample"]
    assert man["output"] == man["after_quota"] > 0
    cur = spark.read.parquet(out).toPandas()
    assert {"shard", "bin", "n_tokens", "quality", "split"} <= set(cur.columns)
    assert set(cur["split"]) <= {"train", "val"}
    # every benchmark doc itself was dropped (self-contamination = 1.0)
    assert not (cur["doc_id"] % 11 == 0).any()
    # chunked companion output covers exactly the curated membership
    chunks = spark.read.parquet(str(tmp_path / "chunks")).toPandas()
    assert man["chunks"] == len(chunks) > 0
    assert set(chunks["doc_id"]) <= set(cur["doc_id"])
    assert (chunks["n_tokens"] <= 32).all()
    # deterministic rebuild: identical membership
    out2 = str(tmp_path / "curated2")
    curate_submit.main([
        "--documents", docs_path, "--output", out2,
        "--benchmark", bench_path, "--contamination-threshold", "0.8",
        "--contamination-ngram", "3",
        "--near-dup", "--near-dup-hashes", "16", "--near-dup-bands", "2",
        "--paragraph-dedup",
        "--lm-buckets", "4", "--lm-keep-max", "3",
        "--strata-fractions", '{"en": 0.6}',
        "--mix-targets", '{"src1": 0.4, "src2": 0.3, "src3": 0.3}',
        "--quota-k", "50", "--pack-budget", "300", "--pack-shards", "4",
        "--max-dup-line-frac", "0.99", "--max-top-bigram-frac", "0.95",
    ])
    cur2 = spark.read.parquet(out2).toPandas()
    assert sorted(cur["doc_id"]) == sorted(cur2["doc_id"])


@pytest.mark.slow
def test_spark_submit_reproject(spark, corpus, tmp_path):
    """reproject_submit.py through a real spark-submit --py-files run:
    the re-gridded output reads back through read_images and every
    sampled pixel matches the in-process operator."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import build_dist

    zip_path = build_dist.build(str(tmp_path / "engine.zip"))
    out_dir = str(tmp_path / "reproj")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "reproject_submit.py"),
            "--images", corpus["images"],
            "--src-grid", "4/1024",
            "--dst-grid", "1/250",
            "--layers", "tcl_year",
            "--output", out_dir,
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    from gfw_raster_analysis_lambda_spark.operators.reproject import (
        reproject_nearest,
    )
    from gfw_raster_analysis_lambda_spark.sources.images import read_images

    got = {
        r["cell_id"]: bytes(r["bytes"])
        for r in read_images(spark, out_dir).collect()
    }
    src = read_images(spark, corpus["images"]).filter("layer = 'tcl_year'")
    want = {
        r["cell_id"]: bytes(r["bytes"])
        for r in reproject_nearest(src, "4/1024", "1/250").collect()
    }
    assert got == want and len(got) > 0
