"""Trajectory family vs a brute-force pure-python oracle (independent
re-derivation: lists and math.isqrt, no shared code with the operator)."""

import math
import random

import pytest

from gfw_raster_analysis_lambda_spark.operators.trajectories import (
    stay_points,
    track_stats,
)


def _mk_tracks(seed, n_tracks=6):
    rng = random.Random(seed)
    rows = []
    pid = 0
    for t in range(n_tracks):
        x = y = 0
        n = rng.randint(1, 40)
        for i in range(n):
            # mix of dwell bursts (tiny steps) and jumps
            if rng.random() < 0.4:
                x += rng.randint(-30, 30)
                y += rng.randint(-30, 30)
            else:
                x += rng.randint(-1500, 1500)
                y += rng.randint(-1500, 1500)
            rows.append((f"t{t}", i, pid, x, y))
            pid += 1
    return rows


def _oracle(rows, eps, min_run):
    by = {}
    for t, i, pid, x, y in rows:
        by.setdefault(t, []).append((i, pid, x, y))
    stats, stays = {}, {}
    for t, pts in by.items():
        pts.sort()
        segs = []
        for a, b in zip(pts, pts[1:]):
            d2 = (b[2] - a[2]) ** 2 + (b[3] - a[3]) ** 2
            segs.append(math.isqrt(d2))
        net = math.isqrt(
            (pts[-1][2] - pts[0][2]) ** 2 + (pts[-1][3] - pts[0][3]) ** 2
        )
        path = sum(segs)
        stats[t] = (
            len(pts), path, max(segs, default=0), net,
            round(net / path, 6) if path > 0 else 0.0,
        )
        # stay runs: consecutive slow points
        run, found = 0, []
        for a, b in zip(pts, pts[1:]):
            d2 = (b[2] - a[2]) ** 2 + (b[3] - a[3]) ** 2
            if d2 <= eps * eps:
                run += 1
            else:
                if run >= min_run:
                    found.append(run)
                run = 0
        if run >= min_run:
            found.append(run)
        stays[t] = (len(found), sum(found), max(found, default=0))
    return stats, stays


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_trajectories_fuzz_vs_bruteforce(spark, seed):
    rows = _mk_tracks(seed)
    df = spark.createDataFrame(
        rows, "track_id string, ts long, point_id long, x_micro long, y_micro long"
    )
    est, esty = _oracle(rows, eps=120, min_run=2)
    got = {
        r.track_id: (r.n_points, r.path_micro, r.max_seg_micro, r.net_micro,
                     r.straightness)
        for r in track_stats(df).collect()
    }
    assert got == est
    goty = {
        r.track_id: (r.n_stays, r.stay_points, r.longest_stay)
        for r in stay_points(df, eps_micro=120, min_run=2).collect()
    }
    assert goty == esty


def test_single_point_track(spark):
    df = spark.createDataFrame(
        [("t0", 0, 0, 5, 5)],
        "track_id string, ts long, point_id long, x_micro long, y_micro long",
    )
    r = track_stats(df).collect()[0]
    assert (r.n_points, r.path_micro, r.net_micro, r.straightness) == (1, 0, 0, 0.0)
    s = stay_points(df, eps_micro=10).collect()[0]
    assert (s.n_stays, s.stay_points, s.longest_stay) == (0, 0, 0)
