"""NCC template matching: exact-match detection, brightness/contrast
invariance, guards, and degenerate shapes."""

import numpy as np
import pytest

from gfw_raster_analysis_lambda_spark.functions import codecs
from gfw_raster_analysis_lambda_spark.operators.multimodal import template_match


def _img_df(spark, arrays):
    rows = []
    for i, a in enumerate(arrays):
        enc, fmt = codecs.encode_tile(a, "raw_u8"), "raw_u8"
        rows.append((f"img{i}", enc, a.shape[1], a.shape[0], fmt))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def _rng_tile(seed, h=32, w=32):
    return np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)


def test_planted_template_found_exactly(spark):
    base = _rng_tile(1)
    tpl = _rng_tile(2, 8, 8)
    planted = base.copy()
    planted[13:21, 5:13] = tpl
    out = {r.image_id: r for r in
           template_match(_img_df(spark, [planted]), tpl).collect()}
    r = out["img0"]
    assert (r.best_i, r.best_j) == (13, 5)
    assert r.best_ncc == 1.0
    assert r.n_match >= 1


def test_brightness_contrast_invariance(spark):
    # NCC is invariant to I -> a*I + b: plant 2*tpl+10 and still score 1.0
    tpl = (np.arange(64).reshape(8, 8) % 97).astype(np.uint8)
    base = _rng_tile(3)
    planted = base.copy()
    planted[4:12, 20:28] = (tpl.astype(np.int64) * 2 + 10).astype(np.uint8)
    r = template_match(_img_df(spark, [planted]), tpl).collect()[0]
    assert (r.best_i, r.best_j) == (4, 20)
    assert r.best_ncc == 1.0


def test_tile_smaller_than_template_yields_null(spark):
    tpl = _rng_tile(4, 8, 8)
    tiny = _rng_tile(5, 4, 4)
    r = template_match(_img_df(spark, [tiny]), tpl).collect()[0]
    assert r.best_ncc is None and r.n_match == 0


def test_flat_template_rejected(spark):
    with pytest.raises(ValueError):
        template_match(_img_df(spark, [_rng_tile(6)]), np.full((8, 8), 7))


def test_oversize_template_rejected(spark):
    with pytest.raises(ValueError):
        template_match(_img_df(spark, [_rng_tile(7)]), np.zeros((16, 16)))


def test_tie_break_is_row_major_first(spark):
    # two identical plants -> the earlier row-major position wins
    tpl = _rng_tile(8, 8, 8)
    img = _rng_tile(9, 32, 48)
    img[20:28, 30:38] = tpl
    img[2:10, 12:20] = tpl
    r = template_match(_img_df(spark, [img]), tpl).collect()[0]
    assert (r.best_i, r.best_j) == (2, 12)
    assert r.n_match >= 2
