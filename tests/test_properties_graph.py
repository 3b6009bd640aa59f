"""Property-based cross-checks (hypothesis) for the iterative graph layer
the first property suite doesn't model — pagerank (integer fixed-point),
label propagation, and k-core — against pure-Python reimplementations on
arbitrary small multigraphs (duplicate edges, self-loops, disconnected
vertices). The integer-unit semantics make exact equality meaningful:
every div/floor in the model mirrors the operator's BIGINT arithmetic, so
any drift — a changed teleport rounding, a tie broken the other way, an
off-by-one round — fails the test rather than hiding inside a float
tolerance."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gpu_mapreduce_spark.operators.graph_iter import (
    PR_SCALE,
    kcore,
    label_propagation,
    pagerank,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

edge_lists = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=1, max_size=14
)


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _arcs(edges):
    return edges + [(d, s) for s, d in edges]


@given(edges=edge_lists, num_iter=st.integers(1, 3))
@settings(**_SETTINGS)
def test_pagerank_matches_integer_model(spark, edges, num_iter):
    arcs = _arcs(edges)
    outdeg = Counter(s for s, _ in arcs)
    n = len(outdeg)
    teleport = (20 - 17) * PR_SCALE // (20 * n)
    r = {v: PR_SCALE // n for v in outdeg}
    for _ in range(num_iter):
        csum: Counter = Counter()
        for s, d in arcs:
            csum[d] += (17 * r[s]) // (20 * outdeg[s])
        r = {v: teleport + csum[v] for v in outdeg}
    got = {
        row.v: row.rank_units
        for row in pagerank(_edges_df(spark, edges), num_iter=num_iter).collect()
    }
    assert got == r


@given(edges=edge_lists, rounds=st.integers(1, 3))
@settings(**_SETTINGS)
def test_label_propagation_matches_model(spark, edges, rounds):
    arcs = _arcs(edges)
    lab = {v: v for v in {s for s, _ in arcs}}
    for _ in range(rounds):
        votes: Counter = Counter()
        for s, d in arcs:
            votes[(d, lab[s])] += 1
        new = {}
        for (d, label), cnt in votes.items():
            # most frequent neighbor label, ties toward the smallest label
            cur = new.get(d)
            if cur is None or (cnt, -label) > (cur[0], -cur[1]):
                new[d] = (cnt, label)
        lab = {v: l for v, (_c, l) in new.items()}
    got = {
        r.v: r.label
        for r in label_propagation(_edges_df(spark, edges), rounds=rounds).collect()
    }
    assert got == lab


@given(edges=edge_lists, k=st.integers(1, 4))
@settings(**_SETTINGS)
def test_kcore_matches_peel_model(spark, edges, k):
    """The k-core is the unique maximal induced subgraph with every vertex
    at induced (arc-multiplicity) degree >= k — schedule-independent, so
    any peel order models the operator's synchronous rounds."""
    arcs = _arcs(edges)
    s = {v for v, _ in arcs} | {v for _, v in arcs}
    while True:
        deg = Counter(d for a, d in arcs if a in s and d in s)
        new = {v for v in s if deg[v] >= k}
        if new == s:
            break
        s = new
    want = {v: deg[v] for v in s}
    core, _rounds = kcore(_edges_df(spark, edges), k=k)
    got = {r.v: r.core_deg for r in core.collect()}
    assert got == want
