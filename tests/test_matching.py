"""greedy_matching checks: the parallel Luby-round matching equals the
sequential greedy under the same total order (hand replay), maximality
holds by anti-join on the fixture (no unmatched edge with both
endpoints free), greedy's 1/2-approximation bound holds against brute
force on dense random graphs, and the packing envelope raises."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators.graph_iter import greedy_matching
from gpu_mapreduce_spark.queries.kcore_rmat import _canon_arcs
from gpu_mapreduce_spark.queries.matching import greedy_matching_rmat


def _seq_greedy(edges: list[tuple[int, int, int]]) -> set[tuple[int, int]]:
    """Sequential greedy under (wu DESC, src, dst) — the classical
    model the round-parallel local-best matching provably equals."""
    used: set[int] = set()
    out: set[tuple[int, int]] = set()
    for s, d, _w in sorted(edges, key=lambda e: (-e[2], e[0], e[1])):
        if s not in used and d not in used:
            used.update((s, d))
            out.add((s, d))
    return out


def _wdf(spark, edges):
    return spark.createDataFrame(
        edges, "src bigint, dst bigint, wu bigint"
    )


def test_equals_sequential_greedy_hand(spark):
    edges = [
        (0, 1, 9),
        (1, 2, 9),  # ties with (0,1): (src, dst) breaks to (0,1)
        (2, 3, 5),
        (3, 4, 7),
        (4, 5, 1),
        (0, 5, 3),
        (1, 4, 2),
    ]
    m, counts = greedy_matching(_wdf(spark, edges))
    got = {(r.src, r.dst) for r in m.collect()}
    assert got == _seq_greedy(edges) == {(0, 1), (3, 4)}
    assert sum(counts) == len(got)


@pytest.mark.parametrize("seed", [7, 19, 101])
def test_equals_sequential_greedy_random(spark, seed):
    rnd = __import__("random").Random(seed)
    n = 10
    edges = [
        (a, b, rnd.randrange(1, 50))
        for a, b in itertools.combinations(range(n), 2)
        if rnd.random() < 0.5
    ]
    m, _counts = greedy_matching(_wdf(spark, edges))
    assert {(r.src, r.dst) for r in m.collect()} == _seq_greedy(edges)


@pytest.mark.parametrize("seed", [3, 23])
def test_half_approximation_vs_bruteforce(spark, seed):
    rnd = __import__("random").Random(seed)
    n = 8
    edges = [
        (a, b, rnd.randrange(1, 30))
        for a, b in itertools.combinations(range(n), 2)
    ]
    m, _ = greedy_matching(_wdf(spark, edges))
    wgreedy = sum(r.wu for r in m.collect())
    wmap = {(s, d): w for s, d, w in edges}

    best = 0
    verts = list(range(n))

    def rec(avail: list[int], acc: int):
        nonlocal best
        best = max(best, acc)
        if len(avail) < 2:
            return
        v = avail[0]
        rest = avail[1:]
        rec(rest, acc)  # v unmatched
        for u in rest:
            w = wmap.get((min(v, u), max(v, u)))
            if w is not None:
                rec([x for x in rest if x != u], acc + w)

    rec(verts, 0)
    assert 2 * wgreedy >= best > 0


def test_fixture_maximality_and_counts(spark):
    edges, _arcs = _canon_arcs(spark)
    w = edges.select(
        "src",
        "dst",
        ((F.col("src") * 31 + F.col("dst")) % 97 + 1)
        .cast("bigint")
        .alias("wu"),
    )
    out = greedy_matching_rmat(spark, "-")
    rows = out.collect()
    assert len(rows) == 659
    assert sum(r.wu for r in rows) == 49579
    # matched edges form a matching: every vertex appears at most once
    verts = [v for r in rows for v in (r.src, r.dst)]
    assert len(verts) == len(set(verts))
    # MAXIMALITY by anti-join: no surviving edge has both endpoints free
    mv = (
        out.select(F.col("src").alias("v"))
        .unionAll(out.select(F.col("dst").alias("v")))
        .distinct()
    )
    free_free = (
        w.join(mv, w.src == mv.v, "left_anti")
        .join(mv, w.dst == mv.v, "left_anti")
    )
    assert free_free.isEmpty()


def test_packing_envelope_raises(spark):
    with pytest.raises(ValueError, match="packing envelope"):
        greedy_matching(_wdf(spark, [(0, 1 << 20, 5)]))
    with pytest.raises(ValueError, match="packing envelope"):
        greedy_matching(_wdf(spark, [(0, 1, 1 << 22)]))
