"""Round-5 additions: hierarchical cell compaction, BPE tokenizer
inference, hashed linear quality classifier, weighted Poisson sampling.

The compaction tests fuzz random cell sets against a brute-force pure-
python compactor (independent re-derivation — sets and dict counting,
no shared code with the Spark operator); the tokenizer tests pin the
replace-chain encoding against a reference left-to-right merge pass.
"""

import random

import pytest
from pyspark.sql import functions as F

from gfw_raster_analysis_lambda_spark.functions import grid as G
from gfw_raster_analysis_lambda_spark.operators import cells as C
from gfw_raster_analysis_lambda_spark.operators.sampling import weighted_sample
from gfw_raster_analysis_lambda_spark.operators.text import (
    bpe_encode,
    compile_bpe_aliases,
    quality_classifier_score,
)

LEVELS = ["4/1024", "4/512", "1/250"]
IDX = {"4/1024": 3, "4/512": 6, "1/250": 8}


def _pack(idx: int, x: int, y: int) -> int:
    return (idx << 54) | (x << 27) | y


def _compact_oracle(xys: "set[tuple[int, int]]") -> "set[int]":
    """Brute-force compactor: dict-count each rung, promote complete
    quads. Fine grid idx 3 -> idx 6 (r=2) -> idx 8 (r=2)."""
    out: "set[int]" = set()
    cur = set(xys)
    ladder = [(3, 6, 2), (6, 8, 2)]
    for fine_idx, coarse_idx, r in ladder:
        groups: "dict[tuple[int, int], list]" = {}
        for x, y in cur:
            groups.setdefault((x // r, y // r), []).append((x, y))
        nxt = set()
        for (px, py), kids in groups.items():
            if len(kids) == r * r:
                nxt.add((px, py))
            else:
                out.update(_pack(fine_idx, x, y) for x, y in kids)
        cur = nxt
        if not cur:
            break
    out.update(_pack(ladder[-1][1] if cur else 0, x, y) for x, y in cur)
    return out


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_compact_fuzz_vs_bruteforce(spark, seed):
    rng = random.Random(seed)
    xys = set()
    # clustered blobs make complete quads likely; lone points keep
    # incomplete groups in play
    for _ in range(rng.randint(2, 5)):
        cx, cy = rng.randrange(100, 1300), rng.randrange(100, 600)
        for dx in range(rng.randint(2, 8)):
            for dy in range(rng.randint(2, 8)):
                if rng.random() < 0.85:
                    xys.add((cx + dx, cy + dy))
    for _ in range(rng.randint(0, 20)):
        xys.add((rng.randrange(0, 1440), rng.randrange(0, 720)))
    g = G.get_grid("4/1024")
    df = spark.createDataFrame(
        [(_pack(3, x, y),) for x, y in sorted(xys)], "cell_id long"
    )
    got = {r.cell_id for r in C.compact_cells(df, LEVELS).collect()}
    assert got == _compact_oracle(xys)
    # roundtrip: uncompact restores the original fine set exactly
    back = {
        r.cell_id
        for r in C.uncompact_cells(
            spark.createDataFrame([(c,) for c in sorted(got)], "cell_id long"),
            "4/1024",
        ).collect()
    }
    assert back == {_pack(3, x, y) for x, y in xys}
    assert g.index == 3


def test_compact_full_box_promotes_to_top(spark):
    # a 4x4 fine box aligned to one 1-deg cell collapses to exactly it
    xys = [(x, y) for x in range(760, 764) for y in range(276, 280)]
    df = spark.createDataFrame([(_pack(3, x, y),) for x, y in xys], "cell_id long")
    got = [r.cell_id for r in C.compact_cells(df, LEVELS).collect()]
    assert got == [_pack(8, 190, 69)]


def test_uncompact_rejects_non_nesting_grid(spark):
    # grid index 5 (4/4096 bench grid) has the same 0.25-deg cells as the
    # target: no nesting arm, must raise loudly instead of dropping rows
    df = spark.createDataFrame([(_pack(5, 10, 10),)], "cell_id long")
    with pytest.raises(Exception, match="non-nesting"):
        C.uncompact_cells(df, "4/1024").collect()


def test_compile_bpe_aliases_validates_order():
    steps = compile_bpe_aliases([("a", "b"), ("ab", "c")])
    assert steps == [("ab", ""), ("c", "")]
    with pytest.raises(ValueError, match="earlier"):
        compile_bpe_aliases([("ab", "c")])


def _ref_bpe_token_count(text: str, merges) -> int:
    """Reference tokenizer: per word, repeatedly apply each merge in
    order with a left-to-right single pass (canonical BPE inference)."""
    import re

    norm = re.sub(" +", " ", re.sub("[^a-z0-9 ]+", "", text.lower())).strip()
    total = 0
    for word in norm.split(" "):
        if not word:
            continue
        syms = list(word)
        for a, b in merges:
            j, out = 0, []
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        total += len(syms)
    return total


def test_bpe_encode_matches_reference_pass(spark):
    merges = [("t", "a"), ("ta", "b"), ("a", "a"), ("l", "e")]
    texts = [
        "table tab tattle",
        "aaa aaaa aaaaa",  # overlap semantics: leftmost non-overlapping
        "le table! aale 42",
        "",
        "   ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_tokens for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _ref_bpe_token_count(t, merges), (i, t)


def test_quality_classifier_matches_hand_sum(spark):
    import hashlib

    weights = spark.createDataFrame(
        [(b, ((b * 37) % 201) - 100) for b in range(64)], "bucket int, w_milli long"
    )
    texts = {0: "alpha beta alpha", 1: "x", 2: ""}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.score_milli)
        for r in quality_classifier_score(df, weights, n_buckets=64).collect()
    }

    def w_of(tok: str) -> int:
        h = int(hashlib.md5(f"qc:{tok}".encode()).hexdigest()[:12], 16) % 64
        return ((h * 37) % 201) - 100

    assert got[0] == (3, 2 * w_of("alpha") + w_of("beta"))
    assert got[1] == (1, w_of("x"))
    assert got[2] == (0, 0)


def test_weighted_sample_deterministic_and_monotone(spark):
    rows = [(i, (i * 97) % 1000 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    lo = {r.doc_id for r in weighted_sample(df, "w", 0.0005).collect()}
    hi = {r.doc_id for r in weighted_sample(df, "w", 0.002).collect()}
    again = {r.doc_id for r in weighted_sample(df, "w", 0.0005).collect()}
    assert lo == again                      # reproducible
    assert lo <= hi                         # nested designs
    # rows with w*rate >= 1 are always kept
    sure = {i for i, w in rows if w * 0.002 >= 1.0}
    assert sure <= hi
    # selection is genuinely weight-biased: mean kept weight > corpus mean
    kept_w = dict(rows)
    assert sum(kept_w[i] for i in hi) / len(hi) > sum(w for _, w in rows) / len(rows)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_new_ops_plan_shapes(spark):
    """Pin the scale-critical plan claims from the docstrings: the
    tokenizer-inference, classifier, and sampler plans contain NO
    Exchange (pure codegen scans); compact_cells has exactly one
    Exchange per ladder rung; uncompact is shuffle-free."""
    from gfw_raster_analysis_lambda_spark.operators.sampling import weighted_sample
    from gfw_raster_analysis_lambda_spark.operators.text import (
        bpe_encode,
        quality_classifier_score,
    )

    docs = spark.createDataFrame(
        [(i, f"table value tab {i}") for i in range(50)],
        "doc_id long, text string",
    )
    assert "Exchange" not in _plan(bpe_encode(docs, [("t", "a"), ("ta", "b")]))
    weights = spark.createDataFrame(
        [(b, b % 7) for b in range(64)], "bucket int, w_milli long"
    )
    qc = quality_classifier_score(docs, weights, n_buckets=64)
    # the model-map broadcast is a BroadcastExchange; the CORPUS must not
    # shuffle: no shuffle-Exchange (hash/range partitioning) allowed
    plan = _plan(qc)
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "Exchange" not in _plan(weighted_sample(docs, "doc_id", 0.01))

    cells_df = spark.createDataFrame(
        [(_pack(3, x, y),) for x in range(8) for y in range(8)], "cell_id long"
    )
    # default: each rung materialized once (localCheckpoint), so the
    # FINAL plan is pure unions of checkpointed scans — no Exchange at
    # all downstream, and each rung's shuffle ran exactly once eagerly
    comp = C.compact_cells(cells_df, LEVELS)
    assert "Exchange" not in _plan(comp)
    # lazy mode keeps the rung groupBys in-plan (one per rung, with the
    # subtrees duplicated across union branches for AQE reuse to dedupe)
    lazy = C.compact_cells(cells_df, LEVELS, materialize_rungs=False)
    assert "Exchange hashpartitioning" in _plan(lazy)
    assert "Exchange" not in _plan(
        C.uncompact_cells(cells_df, "4/1024")
    )


def test_xyz_quadkey_vs_python_oracle(spark):
    """tile_xyz_expr/quadkey_expr vs the textbook slippy-map formula
    (math.asinh in pure python), plus the quadkey prefix-containment
    property: zoom-z quadkey is prefixed by the zoom-(z-1) one."""
    import math as m

    from gfw_raster_analysis_lambda_spark.operators.spatial_join import (
        quadkey_expr,
        tile_xyz_expr,
    )

    pts = [(i, -179.7 + (i * 257 % 3593) / 10.0, -84.3 + (i * 173 % 1687) / 10.0)
           for i in range(300)]
    # include pole/antimeridian clamps
    pts += [(900, -180.0, 89.999), (901, 179.999, -89.999), (902, 0.0, 0.1)]
    df = spark.createDataFrame(pts, "image_id long, lon double, lat double")
    got = {
        r.image_id: (r.xyz.x, r.xyz.y, r.qk7, r.qk8)
        for r in df.select(
            "image_id",
            tile_xyz_expr(F.col("lon"), F.col("lat"), 12).alias("xyz"),
            quadkey_expr(F.col("lon"), F.col("lat"), 7).alias("qk7"),
            quadkey_expr(F.col("lon"), F.col("lat"), 8).alias("qk8"),
        ).collect()
    }

    def ref(lon, lat, z):
        n = 1 << z
        x = int(m.floor((lon + 180.0) / 360.0 * n))
        y = int(m.floor((1.0 - m.asinh(m.tan(m.radians(lat))) / m.pi) / 2.0 * n))
        return max(0, min(x, n - 1)), max(0, min(y, n - 1))

    def ref_qk(lon, lat, z):
        x, y = ref(lon, lat, z)
        return "".join(
            str(((y >> (z - 1 - k) & 1) << 1) | (x >> (z - 1 - k) & 1))
            for k in range(z)
        )

    for i, lon, lat in pts:
        assert got[i][:2] == ref(lon, lat, 12), (i, lon, lat)
        assert got[i][2] == ref_qk(lon, lat, 7)
        assert got[i][3] == ref_qk(lon, lat, 8)
        assert got[i][3].startswith(got[i][2])  # ancestor prefix


def test_trajectory_plans_single_exchange(spark):
    """track_stats and stay_points each keep exactly ONE
    hashpartitioning Exchange (the track shuffle); every aggregation
    reuses the window's partitioning."""
    from gfw_raster_analysis_lambda_spark.operators.trajectories import (
        stay_points,
        track_stats,
    )

    df = spark.createDataFrame(
        [("t%d" % (i % 5), i, i, i * 3, i * 7) for i in range(100)],
        "track_id string, ts long, point_id long, x_micro long, y_micro long",
    )
    assert _plan(track_stats(df)).count("Exchange hashpartitioning") == 1
    assert _plan(stay_points(df, 100)).count("Exchange hashpartitioning") == 1
