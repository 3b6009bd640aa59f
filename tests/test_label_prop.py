"""Label propagation (operators/graph_iter.label_propagation)."""

from collections import Counter

from gpu_mapreduce_spark.operators import graph_iter


def _reference_lpa(edges, rounds):
    """Pure-Python synchronous LPA: most frequent neighbor label, ties to
    the smallest label — the independent reference the operator must
    match."""
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    label = {v: v for v in nbrs}
    for _ in range(rounds):
        label = {
            v: min(
                (l for l in Counter(label[u] for u in vs).items()),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for v, vs in nbrs.items()
        }
    return label


def test_label_propagation_matches_reference_on_barbell(spark):
    """Two triangles joined by a bridge: every per-vertex label must equal
    the pure-Python reference at 1, 2 and 3 rounds, and after 2 rounds
    the two triangles must carry DISJOINT label sets (the community
    separation LPA exists to find; the bridge vertex legitimately
    perturbs the right triangle's internal agreement, so disjointness —
    not uniformity — is the structural claim)."""
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    for rounds in (1, 2, 3):
        got = {
            r.v: r.label
            for r in graph_iter.label_propagation(df, rounds=rounds).collect()
        }
        assert got == _reference_lpa(edges, rounds), rounds
    two = _reference_lpa(edges, 2)
    left = {two[v] for v in (1, 2, 3)}
    right = {two[v] for v in (4, 5, 6)}
    assert left == {1}  # the left triangle agrees on its minimum label
    assert left.isdisjoint(right), (left, right)
