"""Property-based cross-checks (hypothesis): the core algebra and graph
operators against independent pure-Python models on arbitrary small inputs.
The oracle-parity suite pins behavior on the driver's fixtures; these pin it
on adversarial shapes (empty-ish groups, duplicate rows, self-loops,
disconnected graphs) the fixtures may not produce."""

from __future__ import annotations

import heapq
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import core, graph, graph_iter

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

kv_lists = st.lists(
    st.tuples(st.sampled_from("abcde"), st.integers(-50, 50)), min_size=1, max_size=60
)

edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=40
)


def _kv_df(spark, data):
    return spark.createDataFrame(data, "k string, v int")


@given(data=kv_lists)
@settings(**_SETTINGS)
def test_collate_matches_model(spark, data):
    got = {
        r.k: list(r.vals) for r in core.collate(_kv_df(spark, data)).collect()
    }
    want: dict[str, list[int]] = defaultdict(list)
    for k, v in data:
        want[k].append(v)
    assert got == {k: sorted(vs) for k, vs in want.items()}


@given(data=kv_lists)
@settings(**_SETTINGS)
def test_compress_sum_matches_model(spark, data):
    got = {r.k: r["sum"] for r in core.compress(_kv_df(spark, data), agg="sum").collect()}
    want: Counter = Counter()
    for k, v in data:
        want[k] += v
    assert got == dict(want)


@given(data=kv_lists)
@settings(**_SETTINGS)
def test_histo_matches_model(spark, data):
    got = {r.cnt: r.nkeys for r in core.histo(_kv_df(spark, data)).collect()}
    key_counts = Counter(k for k, _ in data)
    want = Counter(key_counts.values())
    assert got == dict(want)


@given(data=kv_lists, k=st.integers(1, 10))
@settings(**_SETTINGS)
def test_topk_matches_model(spark, data, k):
    got = [(r.k, r.v) for r in core.topk(_kv_df(spark, data), [F.desc("v"), F.asc("k")], k).collect()]
    want = sorted(data, key=lambda t: (-t[1], t[0]))[:k]
    assert sorted(got) == sorted(want)


@given(raw=edge_lists)
@settings(**_SETTINGS)
def test_edge_upper_and_degree_match_model(spark, raw):
    df = spark.createDataFrame(raw, "src long, dst long")
    canon = {(min(s, d), max(s, d)) for s, d in raw if s != d}
    got_edges = {(r.src, r.dst) for r in graph.edge_upper(df).collect()}
    assert got_edges == canon

    if canon:
        cdf = spark.createDataFrame(sorted(canon), "src long, dst long")
        got_deg = {r.v: r.degree for r in graph.degree(cdf, duplicate=2).collect()}
        want_deg: Counter = Counter()
        for s, d in canon:
            want_deg[s] += 1
            want_deg[d] += 1
        assert got_deg == dict(want_deg)


@given(raw=edge_lists)
@settings(**_SETTINGS)
def test_tri_find_matches_model(spark, raw):
    canon = {(min(s, d), max(s, d)) for s, d in raw if s != d}
    if not canon:
        return
    cdf = spark.createDataFrame(sorted(canon), "src long, dst long")
    got = {(r.a, r.b, r.c) for r in graph.tri_find(cdf).collect()}
    adj = defaultdict(set)
    for s, d in canon:
        adj[s].add(d)
        adj[d].add(s)
    verts = sorted(adj)
    want = {
        (a, b, c)
        for i, a in enumerate(verts)
        for b in verts[i + 1 :]
        if b in adj[a]
        for c in verts
        if c > b and c in adj[a] and c in adj[b]
    }
    assert got == want


@given(raw=edge_lists)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
def test_sssp_matches_dijkstra(spark, raw):
    canon = {(min(s, d), max(s, d)) for s, d in raw if s != d}
    if not canon:
        return
    source = min(v for e in canon for v in e)
    wedges = [(s, d, (s * 31 + d) % 97 + 1) for s, d in sorted(canon)]
    wdf = spark.createDataFrame(wedges, "src long, dst long, wu long")
    got_df, _rounds = graph_iter.sssp(graph_iter.weighted_arcs(wdf), source, max_iter=100)
    got = {r.v: r.du for r in got_df.collect()}

    adj = defaultdict(list)
    for s, d, w in wedges:
        adj[s].append((d, w))
        adj[d].append((s, w))
    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for nv, w in adj[u]:
            nd = du + w
            if nd < dist.get(nv, float("inf")):
                dist[nv] = nd
                heapq.heappush(pq, (nd, nv))
    assert got == dist


@given(raw=edge_lists)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
def test_cc_find_matches_union_find(spark, raw):
    canon = {(min(s, d), max(s, d)) for s, d in raw if s != d}
    if not canon:
        return
    cdf = spark.createDataFrame(sorted(canon), "src long, dst long")
    got_df, _rounds = graph_iter.cc_find(cdf, max_iter=100)
    got = {r.v: r.zone for r in got_df.collect()}

    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in canon:
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    comp = defaultdict(list)
    for v in parent:
        comp[find(v)].append(v)
    want = {v: min(vs) for _r, vs in comp.items() for v in vs}
    assert got == want
