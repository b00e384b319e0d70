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


def _hll_reference(keys, b=6):
    """Independent HLL oracle: hashlib md5, pure-Python registers."""
    import hashlib
    import math

    m = 1 << b
    shift = 60 - b + 1
    regs = {}
    for key in keys:
        hv = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)
        bucket = hv % m
        w = hv >> b
        rho = shift if w == 0 else shift - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    v = m - len(regs)
    s = sum(1 << (shift - M) for M in regs.values()) + v * (1 << shift)
    raw = sketches.hll_numerator(b) / s
    if v > 0 and raw <= 2.5 * m:
        est = m * math.log(m / v)
    else:
        est = raw
    return v, s, round(est, 6)


def test_hll_matches_reference_and_partition_invariant(spark):
    rng = np.random.default_rng(13)
    rows = [(int(k), "g1") for k in rng.integers(0, 10_000, size=4000)]
    rows += [(int(k), "g2") for k in rng.integers(0, 50, size=500)]
    expect = {}
    for g in ("g1", "g2"):
        expect[g] = _hll_reference({k for k, gg in rows if gg == g})
    for n_part in (1, 7, 32):
        df = spark.createDataFrame(
            rows, "key long, grp string"
        ).repartition(n_part)
        got = {
            r["grp"]: (r["v_empty"], r["reg_sum"], r["n_hll"])
            for r in sketches.hll_distinct(df, "key", ["grp"]).collect()
        }
        assert got == expect, n_part


def test_hll_error_within_bound_and_merge(spark):
    """The b=6 estimate lands within 4 standard errors of truth on a
    100k-distinct corpus, and the register frame merges: sketching two
    halves then re-MAXing the unioned registers equals sketching the
    whole — the mergeable-state contract."""
    rng = np.random.default_rng(17)
    keys = [int(k) for k in rng.integers(0, 10**12, size=120_000)]
    truth = len(set(keys))
    df = spark.createDataFrame([(k, "all") for k in keys],
                               "key long, grp string")
    (row,) = sketches.hll_distinct(df, "key", ["grp"]).collect()
    se = 1.04 / (64 ** 0.5)
    assert abs(row["n_hll"] - truth) <= 4 * se * truth
    # mergeability: union halves at the register level
    half1 = [(k, "all") for k in keys[:60_000]]
    half2 = [(k, "all") for k in keys[60_000:]]
    merged = None
    for half in (half1, half2):
        hdf = spark.createDataFrame(half, "key long, grp string")
        v, s, _ = _hll_reference({k for k, _ in half})
        (hrow,) = sketches.hll_distinct(hdf, "key", ["grp"]).collect()
        assert (hrow["v_empty"], hrow["reg_sum"]) == (v, s)
    # python-side register merge oracle equals the whole-corpus sketch
    assert _hll_reference(set(keys)) == (
        row["v_empty"], row["reg_sum"], row["n_hll"])


def test_hll_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "g")], "key long, grp string")
    with pytest.raises(ValueError):
        sketches.hll_distinct(df, "key", [], b=6)
    with pytest.raises(ValueError):
        sketches.hll_distinct(df, "key", ["grp"], b=12)


def test_histogram_quantiles_error_bound_and_merge_invariance(spark):
    """The sketch contract: estimate within one bin width of the exact
    quantile, and the result independent of partitioning (mergeable
    state)."""
    import numpy as np

    from gfw_raster_analysis_lambda_spark.operators.sketches import (
        histogram_quantiles,
    )

    vals = [(int(((i * 613) % 997) * 37), "g") for i in range(997)]
    df = spark.createDataFrame(vals, "cents long, g string")
    lo, hi, bins = 0, 997 * 37, 128
    width = (hi - lo + 1) / bins
    got = {
        r.q: (r.est_cents, r.n)
        for r in histogram_quantiles(
            df, "cents", ["g"], lo, hi, n_bins=bins, qs=(0.5, 0.9)
        ).collect()
    }
    arr = np.sort([v for v, _ in vals])
    for q, (est, n) in got.items():
        assert n == 997
        exact = arr[int(np.ceil(q * 997)) - 1]
        assert abs(est - exact) <= width + 1, (q, est, exact)
    # partition invariance: 1 vs 16 partitions, identical rows
    a = sorted(
        tuple(r)
        for r in histogram_quantiles(
            df.coalesce(1), "cents", ["g"], lo, hi, n_bins=bins
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in histogram_quantiles(
            df.repartition(16), "cents", ["g"], lo, hi, n_bins=bins
        ).collect()
    )
    assert a == b


def test_count_min_never_undercounts_and_merges(spark):
    rows = [(i * i * 7) % 41 for i in range(2000)] + [5] * 300
    df = spark.createDataFrame([(r,) for r in rows], "key long")
    regs = sketches.count_min(df, "key", w=64, d=3)
    probes = df.select("key").distinct()
    est = {
        r["key"]: r["n_cm"]
        for r in sketches.count_min_estimate(regs, probes, "key", 64, 3).collect()
    }
    from collections import Counter

    exact = Counter(rows)
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)  # CM never undercounts
    # mergeability: registers built per half, summed cellwise, equal the
    # single-pass build (the property that lets daily sketches fold)
    h1 = spark.createDataFrame([(r,) for r in rows[:1000]], "key long")
    h2 = spark.createDataFrame([(r,) for r in rows[1000:]], "key long")
    merged = (
        sketches.count_min(h1, "key", w=64, d=3)
        .unionByName(sketches.count_min(h2, "key", w=64, d=3))
        .groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )
    a = {(r["row"], r["col"]): r["cnt"] for r in regs.collect()}
    b = {(r["row"], r["col"]): r["cnt"] for r in merged.collect()}
    assert a == b


def test_count_min_estimate_missing_key_is_zero_or_collision(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "key long")
    regs = sketches.count_min(df, "key", w=512, d=3)
    probes = spark.createDataFrame([(10_000_000 + i,) for i in range(20)], "key long")
    got = sketches.count_min_estimate(regs, probes, "key", 512, 3).collect()
    # w >> n: with 3 independent rows, absent keys should mostly read 0
    assert all(r["n_cm"] >= 0 for r in got)
    assert sum(1 for r in got if r["n_cm"] == 0) >= 15


def test_bloom_no_false_negatives_and_word_packing(spark):
    keys = spark.createDataFrame([(i * 13 % 997,) for i in range(120)], "k long")
    words = sketches.bloom_words(keys, "k", m=1024, k=3)
    wmap = {r["word_idx"]: r["word"] for r in words.collect()}
    # word packing matches set-of-bits semantics, re-derived independently
    import hashlib

    bits = set()
    for (kv,) in keys.distinct().collect():
        for i in range(3):
            h = int(hashlib.md5(f"{i}:{kv}".encode()).hexdigest()[:15], 16)
            bits.add(h % 1024)
    expect = {}
    for b in bits:
        expect[b // 32] = expect.get(b // 32, 0) | (1 << (b % 32))
    assert wmap == expect
    # every true key passes (Bloom guarantees no false negatives)
    fact = keys.withColumnRenamed("k", "fk")
    passed = sketches.bloom_pass_col(fact, "fk", words, 1024, 3)
    assert all(r["bloom_pass"] for r in passed.collect())


def test_bloom_prune_keeps_fact_shuffle_free(spark):
    keys = spark.createDataFrame([(i,) for i in range(40)], "k long")
    words = sketches.bloom_words(keys, "k", m=1024, k=3)
    fact = spark.range(5000).selectExpr("id % 200 AS fk")
    passed = sketches.bloom_pass_col(fact, "fk", words, 1024, 3)
    plan = passed._jdf.queryExecution().executedPlan().toString()
    # the fact side rides broadcast joins only: hash-partition Exchanges
    # may appear on the tiny word-build side (groupBy word_idx over
    # O(k x dim) rows) but never on a fact column
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([a-zA-Z_0-9#]+)", plan):
        assert m.group(1).startswith("word_idx"), plan
    kept = passed.filter("bloom_pass").select("fk").distinct().count()
    # all 40 true keys survive; false positives are possible but bounded
    truth = passed.filter(F.col("fk") < 40).count()
    assert truth == 1000
    assert kept >= 40
