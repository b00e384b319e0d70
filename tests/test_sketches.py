"""Heavy hitters: sketch-pruned but EXACT — equals plain groupBy/HAVING
under every partition layout, including adversarial tie regimes where
the Misra-Gries undercount bound is tight."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gfw_raster_analysis_lambda_spark.operators import sketches


def _exact(rows, k):
    from collections import Counter

    c = Counter(rows)
    n = len(rows)
    return {key: f for key, f in c.items() if f * k > n}


def _check(spark, rows, k, summary_size=None, layouts=(1, 3, 8, 32)):
    expect = _exact(rows, k)
    for n_part in layouts:
        df = spark.createDataFrame(
            [(r,) for r in rows], "key long"
        ).repartition(n_part)
        got = {
            r["key"]: r["freq"]
            for r in sketches.heavy_hitters(
                df, "key", k, summary_size=summary_size
            ).collect()
        }
        assert got == expect, (n_part, k, summary_size)


def test_heavy_hitters_zipf_matches_exact(spark):
    rng = np.random.default_rng(7)
    rows = [int(v) for v in rng.zipf(1.6, size=5000) if v < 10_000]
    _check(spark, rows, k=50)
    _check(spark, rows, k=10)


def test_heavy_hitters_uniform_none_qualify(spark):
    # 100 keys x 20 rows each: freq * 200 = 4000 > N=2000 -> ALL qualify
    # at k=200; at k=99 freq*99 = 1980 < 2000 -> none do
    rows = [i % 100 for i in range(2000)]
    _check(spark, rows, k=99, layouts=(1, 8))
    _check(spark, rows, k=200, layouts=(1, 8))


def test_heavy_hitters_tight_summary_no_false_negatives(spark):
    """summary_size == k (the minimum legal value) floods the summary
    with decrements; the rational candidate floor must still keep every
    true hitter."""
    rng = np.random.default_rng(11)
    heavy = [1] * 400 + [2] * 380
    noise = [int(v) for v in rng.integers(100, 2000, size=2200)]
    rows = heavy + noise
    rng.shuffle(rows)
    _check(spark, rows, k=5, summary_size=5)
    _check(spark, rows, k=5, summary_size=20)


def test_heavy_hitters_rejects_bad_params(spark):
    df = spark.createDataFrame([(1,)], "key long")
    with pytest.raises(ValueError):
        sketches.heavy_hitters(df, "key", 1)
    with pytest.raises(ValueError):
        sketches.heavy_hitters(df, "key", 10, summary_size=9)


def test_heavy_hitters_string_keys_and_empty(spark):
    rows = ["a"] * 30 + ["b"] * 3 + ["c"] * 2
    df = spark.createDataFrame([(r,) for r in rows], "key string")
    got = {r["key"]: r["freq"]
           for r in sketches.heavy_hitters(df, "key", 3).collect()}
    assert got == {"a": 30}
    empty = spark.createDataFrame([], "key string")
    assert sketches.heavy_hitters(empty, "key", 3).count() == 0


def test_heavy_hitters_null_keys_form_exact_group(spark):
    """GROUP BY keeps a NULL group; so must heavy_hitters — nulls are
    counted exactly in phase 1 (value_counts drops them from the MG
    summary, and an equi-join could never recount them)."""
    rows = [("a",)] * 30 + [(None,)] * 25 + [("b",)] * 3
    df = spark.createDataFrame(rows, "key string").repartition(4)
    got = {r["key"]: r["freq"]
           for r in sketches.heavy_hitters(df, "key", 3).collect()}
    assert got == {"a": 30, None: 25}
