"""Property-based cross-check (hypothesis) for the fixed-point k-means —
the operator's deterministic contract (portable-hash init, packed-score
tie-breaks, exact integer distances, floor-of-double centroid updates,
empty clusters dropped) replayed by a pure-Python Lloyd model on
arbitrary small point sets: coincident points, coincident centroids
(lower id must win ties), clusters that empty out mid-run, k larger than
the number of distinct points."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gpu_mapreduce_spark.operators.kmeans import PACK, kmeans_2d

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _model(points, k, iters):
    order = sorted((_h60(f"km|{pid}"), pid) for pid, _x, _y in points)[:k]
    coords = {pid: (x, y) for pid, x, y in points}
    cents = [
        (ck, *coords[pid]) for ck, (_h, pid) in enumerate(order)
    ]
    final = []
    for _ in range(iters):
        groups: dict[int, list[int]] = {}
        for _pid, x, y in points:
            best = min(
                ((x - cx) ** 2 + (y - cy) ** 2) * PACK + ck for ck, cx, cy in cents
            )
            g = groups.setdefault(best % PACK, [0, 0, 0])
            g[0] += x
            g[1] += y
            g[2] += 1
        # floor(sum::double / n): float(sum) is exact below 2^53, and
        # Python's / is the same IEEE double division both engines use
        cents = sorted(
            (ck, math.floor(sx / n), math.floor(sy / n))
            for ck, (sx, sy, n) in groups.items()
        )
        final = sorted(
            (ck, math.floor(sx / n), math.floor(sy / n), n)
            for ck, (sx, sy, n) in groups.items()
        )
    return final


points_st = st.lists(
    st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
    min_size=1,
    max_size=16,
)


@given(pts=points_st, k=st.integers(1, 5), iters=st.integers(1, 3))
@settings(**_SETTINGS)
def test_kmeans_2d_matches_model(spark, pts, k, iters):
    points = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(points, "id long, xu long, yu long")
    got = [
        (r.k, r.x_u, r.y_u, r.n)
        for r in kmeans_2d(spark, df, k=min(k, len(points)), iters=iters)
        .orderBy("k")
        .collect()
    ]
    assert got == _model(points, min(k, len(points)), iters)
