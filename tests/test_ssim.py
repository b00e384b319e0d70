"""SSIM pairs: exact 1.0 on identical tiles, float-reference parity,
degrade monotonicity, and shape guards."""

import numpy as np
import pytest

from gfw_raster_analysis_lambda_spark.functions import codecs
from gfw_raster_analysis_lambda_spark.operators.multimodal import ssim_pairs


def _df(spark, arrays):
    rows = [
        (f"img{i}", codecs.encode_tile(a, "raw_u8"), a.shape[1], a.shape[0], "raw_u8")
        for i, a in enumerate(arrays)
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def _ssim_float(x, y, block=8):
    """Independent float-arithmetic SSIM for parity (textbook formula)."""
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    bh, bw = x.shape[0] // block, x.shape[1] // block
    out = []
    for i in range(bh):
        for j in range(bw):
            a = x[i*block:(i+1)*block, j*block:(j+1)*block].astype(float)
            b = y[i*block:(i+1)*block, j*block:(j+1)*block].astype(float)
            mx, my = a.mean(), b.mean()
            vx, vy = a.var(), b.var()
            cov = ((a - mx) * (b - my)).mean()
            out.append(((2*mx*my + c1) * (2*cov + c2))
                       / ((mx*mx + my*my + c1) * (vx + vy + c2)))
    return np.array(out)


def test_identical_tiles_score_exactly_one(spark):
    a = np.random.RandomState(0).randint(0, 256, (32, 32)).astype(np.uint8)
    r = ssim_pairs(_df(spark, [a]), _df(spark, [a])).collect()[0]
    assert r.min_ssim == 1.0 and r.n_low == 0 and r.n_blocks == 16


def test_matches_float_reference(spark):
    rng = np.random.RandomState(1)
    a = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    b = np.clip(a.astype(int) + rng.randint(-25, 26, a.shape), 0, 255).astype(np.uint8)
    r = ssim_pairs(_df(spark, [a]), _df(spark, [b]), threshold=0.9).collect()[0]
    ref = _ssim_float(a, b)
    assert abs(r.min_ssim - ref.min()) < 1e-6
    assert r.n_low == int((ref < 0.9).sum())


def test_heavier_degrade_scores_lower(spark):
    a = np.random.RandomState(2).randint(0, 256, (64, 64)).astype(np.uint8)
    light = (a - a % 8).astype(np.uint8)
    heavy = (a - a % 64).astype(np.uint8)
    rl = ssim_pairs(_df(spark, [a]), _df(spark, [light])).collect()[0]
    rh = ssim_pairs(_df(spark, [a]), _df(spark, [heavy])).collect()[0]
    assert rh.min_ssim < rl.min_ssim <= 1.0


def test_shape_mismatch_raises(spark):
    a = np.zeros((16, 16), np.uint8)
    b = np.zeros((8, 8), np.uint8)
    df_b = _df(spark, [b])
    with pytest.raises(Exception):
        ssim_pairs(_df(spark, [a]), df_b).collect()


def test_tiny_tile_reports_zero_blocks(spark):
    a = np.ones((4, 4), np.uint8)
    r = ssim_pairs(_df(spark, [a]), _df(spark, [a])).collect()[0]
    assert r.n_blocks == 0 and r.min_ssim is None


def test_block_bound_guard(spark):
    a = np.ones((16, 16), np.uint8)
    with pytest.raises(ValueError):
        ssim_pairs(_df(spark, [a]), _df(spark, [a]), block=32)
