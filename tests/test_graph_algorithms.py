"""Independent cross-checks for the algorithms with no SQL oracle
(FIXTURES.md: luby_find is property-checked; rmat is invariant-checked and
its downstream cc is verified against a pure-Python union-find)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import graph, graph_iter, rmat
from gpu_mapreduce_spark.sources import fixtures
from tests.conftest import SF_DIR


def test_luby_invariants(spark):
    edges = fixtures.edges_materialized(spark, SF_DIR)
    mis, rounds = graph_iter.luby_find(edges, seed=12345)
    mis = mis.localCheckpoint(eager=True)
    assert rounds >= 1
    assert mis.count() > 0

    # independence: no edge has both endpoints in the MIS
    s = mis.select(F.col("v").alias("sv"))
    d = mis.select(F.col("v").alias("dv"))
    inside = edges.join(s, edges.src == s.sv).join(d, edges.dst == d.dv)
    assert inside.count() == 0

    # maximality: every non-member has at least one MIS neighbor
    arcs = graph.bidirect(edges)
    verts = graph.vertex_extract(edges)
    covered = (
        arcs.join(s, arcs.src == s.sv).select(F.col("dst").alias("v")).distinct()
    )
    uncovered = (
        verts.join(mis, "v", "left_anti").join(covered, "v", "left_anti")
    )
    assert uncovered.count() == 0


def test_luby_deterministic(spark):
    edges = fixtures.edges_materialized(spark, SF_DIR)
    a, _ = graph_iter.luby_find(edges, seed=7)
    b, _ = graph_iter.luby_find(edges, seed=7)
    assert sorted(r.v for r in a.collect()) == sorted(r.v for r in b.collect())


def test_rmat_exact_count_and_determinism(spark):
    e1, rounds1 = rmat.rmat_edges(spark, 10, 4, 0.57, 0.19, 0.19, seed=99)
    assert e1.count() == 4 << 10
    # no duplicates by construction
    assert e1.distinct().count() == 4 << 10
    e2, _ = rmat.rmat_edges(spark, 10, 4, 0.57, 0.19, 0.19, seed=99)
    fp = lambda df: sorted((r.src, r.dst) for r in df.collect())
    assert fp(e1) == fp(e2)
    # different seed -> different graph
    e3, _ = rmat.rmat_edges(spark, 10, 4, 0.57, 0.19, 0.19, seed=100)
    assert fp(e1) != fp(e3)


def test_rmat_cc_matches_union_find(spark):
    """cc_find on the skewed R-MAT graph vs a pure-Python union-find —
    the only engine-independent check possible for a generated graph."""
    gen, _ = rmat.rmat_edges(spark, 10, 4, 0.57, 0.19, 0.19, seed=99)
    edges = graph.edge_upper(gen).localCheckpoint(eager=True)
    cc, _rounds = graph_iter.cc_find(edges)
    got = {r.v: r.zone for r in cc.collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    pairs = [(r.src, r.dst) for r in edges.collect()]
    for s, d in pairs:
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    # canonical label = min vertex of each component
    comp: dict[int, int] = {}
    for v in parent:
        root = find(v)
        comp[root] = min(comp.get(root, v), v)
    want = {v: comp[find(v)] for v in parent}
    assert got == want


def test_neigh_tri_sink_one_dir_per_vertex(spark, tmp_path):
    """The sink's on-disk contract (oink/neigh_tri.cpp:39-60: one output
    file per vertex): write.partitionBy must produce exactly one v=<id>
    directory per input vertex, and the partitioned read-back must
    reproduce every row."""
    from pyspark.sql import functions as F

    from gpu_mapreduce_spark.operators import graph

    nt = spark.createDataFrame(
        [(v, f"n{v}", f"t{v}") for v in range(7)],
        "v bigint, neighbors string, tri_edges string",
    )
    path = str(tmp_path / "nt")
    graph.neigh_tri_sink(nt, path)

    dirs = sorted(p.name for p in (tmp_path / "nt").iterdir() if p.name.startswith("v="))
    assert dirs == [f"v={v}" for v in range(7)]

    back = spark.read.parquet(path).select(
        F.col("v").cast("bigint").alias("v"), "neighbors", "tri_edges"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nt.collect()))


def _exchange_above_arcs(plan: str) -> bool:
    """True if the formatted plan re-shuffles the bucketed arc scan — i.e.
    an Exchange whose child subtree contains the bucketed parquet scan."""
    import re

    # formatted explain: operator tree first; bucketed scans print
    # "Bucketed: true" in the scan details. We check the simple string
    # property that matters: some Exchange keyed on src would appear as
    # 'Exchange hashpartitioning(src'.
    return bool(re.search(r"Exchange hashpartitioning\(src", plan))


def test_cc_find_bucketed_shuffle_path_matches_broadcast(spark):
    """The beyond-broadcast-|V| path (bucketed-by-src arcs + SHUFFLE_HASH
    state join) must produce bit-identical components to the default
    broadcast path, with no broadcast of state and no arc-side shuffle in
    the per-round join."""
    edges = fixtures.edges_materialized(spark, SF_DIR)
    cc_b, rounds_b = graph_iter.cc_find(edges)
    barcs = graph_iter.prepare_arcs_bucketed(edges, tag="testgraph")
    cc_s, rounds_s = graph_iter.cc_find(
        edges, arcs=barcs, broadcast_state=False
    )
    assert rounds_b == rounds_s
    assert sorted(map(tuple, cc_b.collect())) == sorted(map(tuple, cc_s.collect()))
    # plan shape of one round: shuffle-hash join, no broadcast join of the
    # state, no exchange re-partitioning the bucketed arc side by src
    labels = barcs.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("label")
    )
    joined = (
        barcs.join(labels.hint("shuffle_hash"), barcs.src == labels.v)
        .groupBy(F.col("dst").alias("nv"))
        .agg(F.min("label").alias("ml"))
    )
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "Bucketed: true" in plan, plan
    assert not _exchange_above_arcs(plan), plan


def test_pagerank_bucketed_shuffle_path_matches_broadcast(spark):
    edges = fixtures.edges_materialized(spark, SF_DIR)
    pr_b = graph_iter.pagerank(edges, num_iter=3).collect()
    adn = graph_iter.prepare_arcs_deg_bucketed(edges, tag="testgraph")
    pr_s = graph_iter.pagerank(
        edges, num_iter=3, arcs_deg_n=adn, broadcast_state=False
    ).collect()
    assert sorted(map(tuple, pr_b)) == sorted(map(tuple, pr_s))


def test_luby_bucketed_shuffle_path_matches_broadcast(spark):
    edges = fixtures.edges_materialized(spark, SF_DIR)
    mis_b, rounds_b = graph_iter.luby_find(edges)
    barcs = graph_iter.prepare_arcs_bucketed(edges, tag="testgraph")
    mis_s, rounds_s = graph_iter.luby_find(
        edges, arcs=barcs, broadcast_state=False
    )
    assert rounds_b == rounds_s
    assert sorted(r.v for r in mis_b.collect()) == sorted(
        r.v for r in mis_s.collect()
    )


def test_sssp_bucketed_shuffle_path_matches_broadcast(spark):
    """sssp/sssp_multi were the last iterative algorithms without a
    beyond-broadcast path (VERDICT r04 'What's missing' #2): the frontier is
    tiny at the fringes but O(|V|) mid-BFS on a low-diameter graph. The
    bucketed-warcs + shuffle-hash frontier join must be bit-identical to the
    broadcast default, in the same number of rounds."""
    e = fixtures.edges_materialized(spark, SF_DIR)
    wu = e.select(
        "src",
        "dst",
        ((F.col("src") * 31 + F.col("dst")) % 97 + 1).cast("bigint").alias("wu"),
    )
    warcs = graph_iter.weighted_arcs(wu)
    d_b, rounds_b = graph_iter.sssp(warcs, 0)
    bwarcs = graph_iter.prepare_warcs_bucketed(warcs, tag="testgraph")
    d_s, rounds_s = graph_iter.sssp(
        warcs, 0, arcs=bwarcs, broadcast_state=False
    )
    assert rounds_b == rounds_s
    assert sorted(map(tuple, d_b.collect())) == sorted(map(tuple, d_s.collect()))
    # one frontier-relaxation round in the bucketed mode: shuffle-hash join,
    # no broadcast of the frontier, no exchange re-shuffling the bucketed
    # arc scan by src
    frontier = bwarcs.select(F.col("src").alias("v")).distinct().limit(50).select(
        "v", F.lit(0).cast("bigint").alias("du")
    )
    one = (
        bwarcs.join(frontier.hint("shuffle_hash"), frontier.v == bwarcs.src)
        .groupBy(F.col("dst").alias("cv"))
        .agg(F.min(F.col("du") + F.col("wu")).alias("nd"))
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert not _exchange_above_arcs(plan), plan

    m_b, mrounds_b = graph_iter.sssp_multi(warcs, [0, 1, 2])
    m_s, mrounds_s = graph_iter.sssp_multi(
        warcs, [0, 1, 2], arcs=bwarcs, broadcast_state=False
    )
    assert mrounds_b == mrounds_s
    assert sorted(map(tuple, m_b.collect())) == sorted(map(tuple, m_s.collect()))


def test_tri_count_no_broadcast_path_matches(spark):
    """The triangle adjacency probe's broadcast is now a parameter
    (VERDICT r04 'What's missing' #3): broadcast_adj=False must count the
    same triangles through a key-partitioned shuffle-hash lookup, with no
    broadcast join in the plan."""
    edges = fixtures.edges_materialized(spark, SF_DIR)
    adj = graph.oriented_adj(edges).localCheckpoint(eager=True)
    n_b = graph.tri_count(adj=adj).collect()[0].ntri
    shuffled = graph.tri_count(adj=adj, broadcast_adj=False)
    n_s = shuffled.collect()[0].ntri
    assert n_b == n_s and n_b > 0
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    t_b = sorted(map(tuple, graph.tri_find(adj=adj).collect()))
    t_s = sorted(
        map(tuple, graph.tri_find(adj=adj, broadcast_adj=False).collect())
    )
    assert t_b == t_s


def test_bucketed_arcs_memo_keyed_by_input(spark):
    """Regression (VERDICT r04 'What's wrong' #1): two DIFFERENT edge sets
    passing the same `tag` in one session must get two bucketed tables, not
    silently share whichever was written first."""
    e1 = spark.createDataFrame([(1, 2), (2, 3)], "src bigint, dst bigint")
    e2 = spark.createDataFrame([(10, 20)], "src bigint, dst bigint")
    b1 = graph_iter.prepare_arcs_bucketed(e1, tag="collide")
    b2 = graph_iter.prepare_arcs_bucketed(e2, tag="collide")
    assert sorted(map(tuple, b1.collect())) == [(1, 2), (2, 1), (2, 3), (3, 2)]
    assert sorted(map(tuple, b2.collect())) == [(10, 20), (20, 10)]
    # and the memo still hits for a repeated identical input
    b1_again = graph_iter.prepare_arcs_bucketed(e1, tag="collide")
    assert sorted(map(tuple, b1_again.collect())) == sorted(map(tuple, b1.collect()))


def test_neighbor_grouped_iterator_escape_matches(spark):
    """SCALE.md 'known caps': neighbor()'s collect_list needs each vertex's
    adjacency to fit one aggregation buffer; for celebrity vertices the
    documented escape is the grouped-iterator form (core.group_apply, the
    reference's multi-block KMV streaming analog). Prove the two forms are
    row-identical on a hub-skewed graph (hub adjacent to every vertex)."""
    import pandas as pd

    from gpu_mapreduce_spark.operators import core
    from gpu_mapreduce_spark.operators.graph import bidirect, neighbor

    hub_edges = spark.range(1, 400).select(
        F.lit(0).alias("src"), F.col("id").alias("dst")
    ).union(
        spark.range(1, 100).select(
            F.col("id").alias("src"), (F.col("id") + 100).alias("dst")
        )
    )
    base = neighbor(hub_edges).collect()

    def adj(pdf: pd.DataFrame) -> pd.DataFrame:
        # iterator-friendly shape: sorts one group's dsts; at true celebrity
        # scale this is the place a spill-capable external sort would live
        return pd.DataFrame(
            {"v": [pdf["src"].iloc[0]], "neighbors": [sorted(pdf["dst"])]}
        )

    escaped = core.group_apply(
        bidirect(hub_edges).select("src", "dst"),
        "src",
        adj,
        "v bigint, neighbors array<bigint>",
    ).collect()
    key = lambda r: r.v  # noqa: E731
    assert sorted(base, key=key) == sorted(escaped, key=key)


def test_kcore_invariants_and_paths(spark):
    """k-core output invariants on the edges fixture: every member's
    core-induced degree is >= k, the 25-nation clique (a 24-core by
    construction) is fully inside the 24-core, and degrees are consistent
    with a recomputation over the returned membership. The bucketed
    shuffle-hash state path must match the broadcast path bit-for-bit."""
    edges = fixtures.edges_materialized(spark, SF_DIR)
    core, rounds = graph_iter.kcore(edges, k=24)
    rows = {r.v: r.core_deg for r in core.collect()}
    assert rows, "24-core empty despite the embedded 25-clique"
    assert all(d >= 24 for d in rows.values())
    assert set(range(25)) <= set(rows), "nation-clique vertices missing"
    # recompute induced degrees over the returned membership
    member = set(rows)
    arcs = {(r.src, r.dst) for r in graph.bidirect(edges).collect()}
    for v in member:
        deg = sum(1 for (s, d) in arcs if s == v and d in member)
        assert deg == rows[v]
    barcs = graph_iter.prepare_arcs_bucketed(edges, tag="testgraph")
    core_s, rounds_s = graph_iter.kcore(
        edges, k=24, arcs=barcs, broadcast_state=False
    )
    assert rounds == rounds_s
    assert sorted(map(tuple, core.collect())) == sorted(
        map(tuple, core_s.collect())
    )
    # the bucketed path's per-round plan must not move the arc side: its
    # single arc join is keyed on src, which the at-rest bucketing already
    # provides (the dst-keyed groupBy exchanges only V-row partials). An
    # earlier kcore semi-joined arcs on BOTH endpoints — the dst-side join
    # re-shuffled the whole O(|E|) arc table every round; this pins the fix.
    surv = barcs.select(F.col("src").alias("v")).distinct().hint("shuffle_hash")
    one_round = (
        barcs.join(surv, barcs.src == surv.v, "left_semi")
        .groupBy(F.col("dst").alias("v"))
        .count()
    )
    plan = one_round._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(src" not in plan, plan


def test_ktruss_model(spark):
    """ktruss_edges on a hand graph: a K4 glued to a pendant triangle.
    k=3 keeps every triangle edge (support >= 1); k=4 keeps exactly the
    K4's 6 edges (support 2 each inside the clique); k=5 peels everything
    (the pendant-triangle edges' removal drops K4 support transitively...
    no — K4 alone is a 4-truss, not 5: every edge has support 2 < 3)."""
    from gpu_mapreduce_spark.operators import graph_iter

    # K4 on {0,1,2,3} + triangle {3,4,5}
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    tri = [(3, 4), (3, 5), (4, 5)]
    edges = spark.createDataFrame(k4 + tri, "src bigint, dst bigint")

    s3, r3 = graph_iter.ktruss_edges(edges, 3)
    got3 = {(r.src, r.dst): r.support for r in s3.collect()}
    assert set(got3) == set(k4 + tri)
    assert got3[(4, 5)] == 1 and got3[(0, 1)] == 2

    s4, _r4 = graph_iter.ktruss_edges(edges, 4)
    got4 = {(r.src, r.dst): r.support for r in s4.collect()}
    assert set(got4) == set(k4) and all(v == 2 for v in got4.values())

    s5, _r5 = graph_iter.ktruss_edges(edges, 5)
    assert s5.count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k >= 3"):
        graph_iter.ktruss_edges(edges, 2)


def test_betweenness_sources_model(spark):
    """betweenness_sources on a hand graph where sigma and delta are
    computable by hand: diamond 0-1-3 / 0-2-3 plus pendant path 3-4.

    From source 0: dist 0/1/1/2/3, sigma 1/1/1/2/2; fixed-point deltas
    (BC_SCALE units) delta_3 = (2*(1e4+0)) div 2 = 1e4, delta_1 = delta_2
    = (1*(1e4+1e4)) div 2 = 1e4, delta_4 = 0. From source 4 (symmetric
    chain): delta_3 = 3e4, delta_1 = delta_2 = 5000, delta_0 excluded
    (source) and 0's delta from source 4 is 0 anyway (leaf)."""
    from gpu_mapreduce_spark.operators import graph_iter

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)], "src bigint, dst bigint"
    )
    bc, depth = graph_iter.betweenness_sources(edges, [0])
    assert depth == 3
    got = {r.v: r.bc_u for r in bc.collect()}
    assert got == {1: 10000, 2: 10000, 3: 10000, 4: 0}

    bc2, depth2 = graph_iter.betweenness_sources(edges, [0, 4])
    assert depth2 == 3
    got2 = {r.v: r.bc_u for r in bc2.collect()}
    # sums over both sources; sources excluded from their own tree but
    # present as ordinary vertices of the other's
    assert got2 == {
        0: 0,  # leaf of source 4's tree
        1: 10000 + 5000,
        2: 10000 + 5000,
        3: 10000 + 30000,
        4: 0,  # leaf of source 0's tree
    }

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="max_depth"):
        graph_iter.betweenness_sources(edges, [0], max_depth=2)


def test_boruvka_msf_model(spark):
    """boruvka_msf on hand graphs. Two triangles joined by a bridge:
    round 1 hooks within each triangle (forest = both cheap pairs per
    triangle), round 2 crosses the bridge — 5 forest edges, weight 16,
    exactly 2 contraction rounds. An equal-weight 4-cycle pins the
    duplicate-weight determinism: the (wu, src, dst) total order picks
    {(0,1), (1,2), (0,3)} in ONE round."""
    from gpu_mapreduce_spark.operators import graph_iter

    tri2 = spark.createDataFrame(
        [
            (0, 1, 1), (1, 2, 2), (0, 2, 3),
            (3, 4, 1), (4, 5, 2), (3, 5, 3),
            (2, 3, 10),
        ],
        "src bigint, dst bigint, wu bigint",
    )
    forest, rounds, jumps = graph_iter.boruvka_msf(tri2)
    got = {(r.src, r.dst, r.wu) for r in forest.collect()}
    assert got == {(0, 1, 1), (1, 2, 2), (3, 4, 1), (4, 5, 2), (2, 3, 10)}
    assert rounds == 2

    cyc = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 5), (2, 3, 5), (0, 3, 5)],
        "src bigint, dst bigint, wu bigint",
    )
    forest2, rounds2, jumps2 = graph_iter.boruvka_msf(cyc)
    got2 = {(r.src, r.dst, r.wu) for r in forest2.collect()}
    assert got2 == {(0, 1, 5), (1, 2, 5), (0, 3, 5)}
    assert rounds2 == 1

    import pytest as _pytest

    big = spark.createDataFrame(
        [(0, 1 << 21, 1)], "src bigint, dst bigint, wu bigint"
    )
    with _pytest.raises(ValueError, match="packing envelope"):
        graph_iter.boruvka_msf(big)


def test_boruvka_msf_decodes_top_of_envelope_exactly(spark):
    """ADVICE r10: the packed-argmin decode used `/` (DOUBLE division in
    Spark), which loses bits for packed keys >= 2^53 — wu >= 2^13 under
    the 40-bit shift, deep INSIDE the documented wu < 2^22 envelope
    (wu=2^22-1 decoded to wu+1 with src=0). Pin the fix: the very top of
    the envelope (wu = 2^22-1, src/dst = 2^20-2 / 2^20-1, packed ~2^62)
    round-trips exactly through the integer-div decode."""
    from gpu_mapreduce_spark.operators import graph_iter

    wu, src, dst = (1 << 22) - 1, (1 << 20) - 2, (1 << 20) - 1
    one = spark.createDataFrame(
        [(src, dst, wu)], "src bigint, dst bigint, wu bigint"
    )
    forest, rounds, jumps = graph_iter.boruvka_msf(one)
    assert {(r.src, r.dst, r.wu) for r in forest.collect()} == {
        (src, dst, wu)
    }
    assert rounds == 1 and jumps == 0


def test_hyperball_fixed_point_is_reachable_set_sketch(spark):
    """hyperball_registers model check (staged r11 for the r12
    registration): at the fixed point each vertex's sparse registers must
    equal the HLL sketch of its ENTIRE reachable set, computed here by
    brute force (max-fold over the component's per-vertex (bucket, rho)
    pairs) — the register algebra's union law. Two components pin
    no-cross-contamination; the path component pins multi-round
    propagation (diameter 3 -> 3 effective rounds); the bound-exhaustion
    raise is the ktruss/betweenness loud-failure discipline."""
    import hashlib

    import pytest as _pytest

    from gpu_mapreduce_spark.operators import graph_iter

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "src bigint, dst bigint"
    )
    state, rounds = graph_iter.hyperball_registers(edges)
    # path 0-1-2-3 has diameter 3; vertex 0's ball stops growing after
    # round 3, the bridge pair after round 1 — global fixed point at 3
    assert rounds == 3

    def sketch(vs):
        regs = {}
        for v in vs:
            h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            b, tail = h % 64, h >> 6
            # F.bin(x) prints bit_length(x) digits: rho = 55 - bitlength
            rho = 55 if tail == 0 else 55 - tail.bit_length()
            regs[b] = max(regs.get(b, 0), rho)
        return regs

    comp = {0: [0, 1, 2, 3], 1: [0, 1, 2, 3], 2: [0, 1, 2, 3],
            3: [0, 1, 2, 3], 10: [10, 11], 11: [10, 11]}
    got: dict[int, dict[int, int]] = {}
    for r in state.collect():
        got.setdefault(r.v, {})[r.b] = r.reg
    assert set(got) == set(comp)
    for v, vs in comp.items():
        assert got[v] == sketch(vs), f"vertex {v} registers diverge"

    with _pytest.raises(RuntimeError, match="not converged"):
        graph_iter.hyperball_registers(edges, max_rounds=2)


def test_hyperball_rmat_round3_registers_equal_exact_ball_sketches(spark):
    """hyperball_rmat's estimator-honesty check, stronger than a recall
    tolerance: on the canonical R-MAT graph, the round-3 registers of the
    hub vertices {0,1,2,3} (betweenness_rmat's source set) must be
    REGISTER-IDENTICAL to the brute-force HLL sketch of their exact BFS
    radius-3 balls — the propagation computes precisely sketch(ball),
    never an approximation of it; the HLL error enters only at
    estimate-read-out time, which stays out of the gate."""
    import hashlib
    from collections import deque

    from gpu_mapreduce_spark.operators import graph_iter
    from gpu_mapreduce_spark.queries.kcore_rmat import _canon_arcs

    edges, _ = _canon_arcs(spark)
    states = graph_iter.hyperball_rounds(edges, 3)
    got: dict[int, dict[int, int]] = {}
    for r in states[3].collect():
        got.setdefault(r.v, {})[r.b] = r.reg

    adj: dict[int, set[int]] = {}
    for r in edges.collect():
        adj.setdefault(r.src, set()).add(r.dst)
        adj.setdefault(r.dst, set()).add(r.src)

    def ball(v: int, radius: int) -> set[int]:
        seen, q = {v}, deque([(v, 0)])
        while q:
            u, d = q.popleft()
            if d == radius:
                continue
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    q.append((w, d + 1))
        return seen

    def sketch(vs) -> dict[int, int]:
        regs: dict[int, int] = {}
        for v in vs:
            h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            b, tail = h % 64, h >> 6
            rho = 55 if tail == 0 else 55 - tail.bit_length()
            regs[b] = max(regs.get(b, 0), rho)
        return regs

    for hub in (0, 1, 2, 3):
        assert got[hub] == sketch(ball(hub, 3)), f"hub {hub} diverges"


def _jp_sim(pairs, seed=0):
    """Pure-Python Jones-Plassmann twin of graph_iter.jp_coloring: same
    packed (hash-priority, vertex) total order, same winners-per-round,
    same min-absent choice."""
    import hashlib
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in pairs:
        adj[s].add(d)
        adj[d].add(s)

    def p(v: int) -> int:
        h = int(
            hashlib.md5(f"jp{seed}|{v}".encode()).hexdigest()[:15], 16
        ) % (1 << 40)
        return h * (1 << 20) + v

    color: dict[int, int] = {}
    uncolored = set(adj)
    rounds = 0
    while uncolored:
        rounds += 1
        winners = [
            v
            for v in uncolored
            if all(p(v) > p(u) for u in adj[v] if u in uncolored)
        ]
        for v in winners:
            used = {color[u] for u in adj[v] if u in color}
            c = 0
            while c in used:
                c += 1
            color[v] = c
        uncolored -= set(winners)
    return color, rounds


def test_jp_coloring_matches_simulation_and_is_proper(spark):
    """jp_coloring model check (staged r11 for the r12 registration):
    exact color-for-color agreement with the pure-Python JP twin on the
    edges fixture AND a hand path graph; proper coloring (no
    monochromatic edge); the packing-envelope raise."""
    import pytest as _pytest

    from gpu_mapreduce_spark.operators import graph_iter

    for pairs in (
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)],  # path: 2 colors
        [(0, 1), (1, 2), (0, 2), (2, 3)],  # triangle + pendant: 3
    ):
        edges = spark.createDataFrame(pairs, "src bigint, dst bigint")
        colored, rounds = graph_iter.jp_coloring(edges)
        got = {r.v: r.color for r in colored.collect()}
        want, want_rounds = _jp_sim(pairs)
        assert got == want
        assert rounds == want_rounds
        for s, d in pairs:
            assert got[s] != got[d], f"monochromatic edge ({s},{d})"

    edges = fixtures.edges_materialized(spark, SF_DIR)
    colored, _rounds = graph_iter.jp_coloring(edges)
    got = {r.v: r.color for r in colored.collect()}
    pairs = [(r.src, r.dst) for r in edges.collect()]
    want, _ = _jp_sim(pairs)
    assert got == want

    big = spark.createDataFrame(
        [(0, 1 << 21)], "src bigint, dst bigint"
    )
    with _pytest.raises(ValueError, match="packing envelope"):
        graph_iter.jp_coloring(big)


def test_jp_coloring_bucketed_shuffle_path_matches_broadcast(spark):
    """The beyond-broadcast-|V| path for jp_coloring (r11 ADVICE: round 1's
    uncolored set is ALL of |V|, so the hard-coded state broadcast was the
    scale ceiling): bucketed-by-src arcs + SHUFFLE_HASH state hint must
    color bit-identically to the broadcast path in the same round count,
    and the per-round state ⋈ arcs join must be a ShuffledHashJoin with no
    broadcast and no arc-side exchange."""
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (1, 5)]
    edges = spark.createDataFrame(pairs, "src bigint, dst bigint")
    col_b, rounds_b = graph_iter.jp_coloring(edges)
    barcs = graph_iter.prepare_arcs_bucketed(edges, tag="jpgraph")
    col_s, rounds_s = graph_iter.jp_coloring(
        edges, arcs=barcs, broadcast_state=False
    )
    assert rounds_b == rounds_s
    assert sorted(map(tuple, col_b.collect())) == sorted(
        map(tuple, col_s.collect())
    )
    # plan shape of one jp round's local-max join (the operator's exact
    # join orientation: state on arcs.src, neighbors off dst)
    un_s = (
        barcs.select(F.col("src").alias("uv"))
        .distinct()
        .select("uv", F.col("uv").alias("up"))
    )
    joined = (
        barcs.join(un_s.hint("shuffle_hash"), barcs.src == un_s.uv)
        .groupBy(F.col("dst").alias("v"))
        .agg(F.max("up").alias("nmax"))
    )
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "Bucketed: true" in plan, plan
    assert not _exchange_above_arcs(plan), plan


def test_personalized_pagerank_matches_python_twin(spark):
    """personalized_pagerank model check: exact unit-for-unit agreement
    with a pure-Python twin of the integer convention on a hand path
    graph, source-proximity monotonicity along the path, and the
    empty-source guard."""
    import pytest as _pytest

    from gpu_mapreduce_spark.operators import graph_iter

    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    sources, iters, scale = [0], 6, graph_iter.PR_SCALE
    adj: dict[int, list[int]] = {}
    for s, d in pairs:
        adj.setdefault(s, []).append(d)
        adj.setdefault(d, []).append(s)
    tele = 3 * scale // (20 * len(sources))
    r = {v: (scale // len(sources) if v in sources else 0) for v in adj}
    for _ in range(iters):
        nxt = {}
        for v in adj:
            csum = sum((17 * r[u]) // (20 * len(adj[u])) for u in adj[v])
            nxt[v] = (tele if v in sources else 0) + csum
        r = nxt

    edges = spark.createDataFrame(pairs, "src bigint, dst bigint")
    got = {
        row.v: row.ppr_units
        for row in graph_iter.personalized_pagerank(
            edges, sources=sources, num_iter=iters
        ).collect()
    }
    assert got == r
    # damped-walk proximity: synchronous iteration oscillates on the
    # near-bipartite path (per-vertex monotonicity does NOT hold — the
    # degree-1 source sheds 85% of its mass each round), so the pinned
    # claims are the robust ones: the source holds the global max, the
    # far endpoint the global min, and the source half dominates
    assert got[0] == max(got.values())
    assert got[5] == min(got.values())
    assert got[0] + got[1] + got[2] > got[3] + got[4] + got[5]

    with _pytest.raises(ValueError, match="empty source set"):
        graph_iter.personalized_pagerank(edges, sources=[])
    # r12 ADVICE: a source absent from the vertex set would silently drop
    # its share of the initial mass and per-round teleport — raise loudly
    with _pytest.raises(ValueError, match="absent from the.*vertex set"):
        graph_iter.personalized_pagerank(edges, sources=[0, 99])


def test_forest_fire_matches_python_twin_and_burns_once(spark):
    """forest_fire_sample model check: exact arc-for-arc agreement with a
    pure-Python twin of the integer-threshold draw on a hand graph, plus
    the no-revisit law (a vertex appears as a newly-burned dst in at
    most one round) and seed-exclusion (seeds never re-burn)."""
    import hashlib

    from gpu_mapreduce_spark.operators import graph_iter

    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 5), (1, 5),
             (5, 6), (6, 7)]
    seeds, rounds, t_num, t_den = [0], 3, 7, 10  # p=0.7 spreads on a path
    thresh = t_num * (1 << 53) // t_den

    arcs = pairs + [(d, s) for s, d in pairs]
    burned, frontier = set(seeds), set(seeds)
    want = []
    for r in range(1, rounds + 1):
        new = set()
        for s, d in arcs:
            if s in frontier and d not in burned:
                h = int(
                    hashlib.md5(f"ff{r}|{s}|{d}".encode()).hexdigest()[:15],
                    16,
                )
                if (h >> 7) < thresh:
                    want.append((r, s, d))
                    new.add(d)
        burned |= new
        frontier = new
    assert want, "twin sampled nothing — pick a spreadier hand graph"

    edges = spark.createDataFrame(pairs, "src bigint, dst bigint")
    got = sorted(
        (row.r, row.src, row.dst)
        for row in graph_iter.forest_fire_sample(
            edges, seeds=seeds, rounds=rounds, t_num=t_num, t_den=t_den
        ).collect()
    )
    assert got == sorted(want)
    # no-revisit: each dst burns in exactly one round; seeds never appear
    first_round: dict[int, int] = {}
    for r, _s, d in got:
        assert d not in seeds
        first_round.setdefault(d, r)
        assert first_round[d] == r


def test_forest_fire_argument_guards(spark):
    """r12 ADVICE: rounds < 1 raises a descriptive ValueError (not an
    IndexError on sampled[0]), and a seed absent from the graph raises
    instead of silently burning without ever expanding."""
    import pytest as _pytest

    from gpu_mapreduce_spark.operators import graph_iter

    edges = spark.createDataFrame(
        [(0, 1), (1, 2)], "src bigint, dst bigint"
    )
    with _pytest.raises(ValueError, match="rounds must be >= 1"):
        graph_iter.forest_fire_sample(edges, seeds=[0], rounds=0)
    with _pytest.raises(ValueError, match="empty seed set"):
        graph_iter.forest_fire_sample(edges, seeds=[], rounds=2)
    with _pytest.raises(ValueError, match="absent from the graph"):
        graph_iter.forest_fire_sample(edges, seeds=[0, 42], rounds=2)
