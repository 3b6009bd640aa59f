"""Generator + MIS queries — ALL oracle-checked.

Every random draw in this module is the portable md5-hex-slice hash, so
the DuckDB oracles replay the exact computation in SQL:

  rmat*      the ENTIRE generate-and-cull trace — per-round batch ids,
             quadrant descent, global cull — as an unrolled CTE chain whose
             per-round batch size comes from scalar subqueries over the
             previous round's unique count (the trace is deterministic
             given the hash, so round boundaries agree by construction;
             rounds past convergence generate empty batches and are no-ops).
  luby_find  identical priorities + the same synchronous rounds unrolled
             (the cc_find/sssp oracle strategy — queries/graph_iter.py).

Invariants additionally enforced in-query for rmat (a violated invariant
yields zero rows) and cross-checked in tests/test_graph_algorithms.py
(union-find CC, independence/maximality anti-joins, determinism
fingerprints)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import graph, graph_iter, rmat
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources import fixtures

# Reference demo-script shape (examples/in.rmat uses N=16; we use N=12 to
# keep the driver round fast) with skewed probabilities for a power-law
# degree distribution — the case the reference's zone-splitting existed for.
_N, _NZ = 12, 4
_A, _B, _C = 0.57, 0.19, 0.19
_SEED = 12345


def _gen(spark: SparkSession):
    """Generated edge list, session-memoized: three registered queries share
    the same (N, Nz, seed) graph, so generate-and-cull runs once per driver
    round (the generator is sf-independent — keyed under a fixed tag)."""
    return fixtures.derived(
        spark,
        "-",
        "rmat_edges",
        lambda: rmat.rmat_edges(spark, _N, _NZ, _A, _B, _C, seed=_SEED),
    )


_GEN_STAGES = 8  # measured: 5 generate-and-cull rounds at (N=12, Nz=4); margin 3
_CC_STAGES_RMAT = 10  # measured: cc_find converges in 5 rounds; margin 5
_TARGET = _NZ << _N


def _rmat_edges_sql(
    k: int = _GEN_STAGES, n: int = _N, nz: int = _NZ, seed: int = _SEED
) -> str:
    """WITH-chain replaying the generate-and-cull loop: e{k} holds the final
    directed edge set. Round i draws `need` fresh attempt ids (scalar
    subqueries over round i-1's unique count), descends N quadrant levels
    per id with the portable hash, and re-culls globally — exactly
    operators/rmat.rmat_edges. Parameterized over (n, nz, seed) so other
    registrations can replay differently-sized instances (the r12 coloring
    query uses a smaller N=10/Nz=2 graph — the unroll is intrinsic to the
    priority chains, so the instance is sized to the oracle, not vice
    versa)."""
    ab, abc = _A + _B, _A + _B + _C
    target = nz << n
    u_expr = (
        f"(('0x' || substr(md5('{seed}|' || CAST(id AS VARCHAR) || '|' ||"
        f" CAST(l AS VARCHAR)), 1, 15))::BIGINT >> 7)::DOUBLE * {2.0 ** -53!r}"
    )
    parts = [
        f"""WITH lv AS (SELECT unnest(generate_series(0, {n - 1})) AS l),
        m0 AS (SELECT CAST(0 AS BIGINT) AS gtot, CAST({target} AS BIGINT) AS need)"""
    ]
    for i in range(1, k + 1):
        p = i - 1
        union = (
            f"SELECT src, dst FROM c{i}"
            if p == 0
            else f"SELECT src, dst FROM e{p} UNION ALL SELECT src, dst FROM c{i}"
        )
        parts.append(
            f""", g{i} AS MATERIALIZED (
                SELECT (SELECT gtot FROM m{p}) + gs.g AS id
                FROM generate_series(0, {target - 1}) gs(g)
                WHERE gs.g < (SELECT need FROM m{p})
            ), c{i} AS MATERIALIZED (
                SELECT id,
                       CAST(SUM(CASE WHEN u >= {ab!r} THEN b ELSE 0 END) AS BIGINT) AS src,
                       CAST(SUM(CASE WHEN (u >= {_A!r} AND u < {ab!r}) OR u >= {abc!r}
                                     THEN b ELSE 0 END) AS BIGINT) AS dst
                FROM (SELECT id, l, {u_expr} AS u,
                             (1::BIGINT << ({n} - 1 - l)) AS b
                      FROM g{i}, lv)
                GROUP BY id
            ), e{i} AS MATERIALIZED (
                SELECT DISTINCT src, dst FROM ({union})
            ), m{i} AS (
                SELECT (SELECT gtot FROM m{p}) + (SELECT need FROM m{p}) AS gtot,
                       {target} - (SELECT COUNT(*) FROM e{i}) AS need
            )"""
        )
    return "\n".join(parts)


def _rmat_canon_sql(
    k: int = _GEN_STAGES, n: int = _N, nz: int = _NZ, seed: int = _SEED
) -> str:
    """Extend the edge chain with the canonicalized (edge_upper) graph."""
    return (
        _rmat_edges_sql(k, n=n, nz=nz, seed=seed)
        + f""", canon AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
            FROM e{k} WHERE src <> dst
        )"""
    )


@register(
    "rmat",
    tags=("graph", "generator"),
    oracle=f"""
        {_rmat_edges_sql()}
        SELECT CAST({_TARGET} AS INTEGER) AS target,
               CAST(COUNT(*) AS BIGINT) AS nedges,
               CAST((SELECT COUNT(*) FROM (
                   SELECT DISTINCT least(src, dst), greatest(src, dst)
                   FROM e{_GEN_STAGES})) AS BIGINT) AS ncanon,
               CAST(SUM(CASE WHEN src = dst THEN 1 ELSE 0 END) AS BIGINT) AS nself,
               CAST(SUM(src * {1 << 13} + dst) AS BIGINT) AS fingerprint
        FROM e{_GEN_STAGES}
        HAVING COUNT(*) = {_TARGET}
    """,
)
def rmat_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One stats row for the generated graph; the row only survives if the
    generator's defining invariant holds (exactly Nz·2^N unique edges —
    oink/rmat.cpp:66-68 prints the same counters). The fingerprint is a
    content checksum the determinism test reruns against — and the oracle
    recomputes it over DuckDB's independently generated copy of the graph."""
    edges, _rounds = _gen(spark)
    target = _NZ << _N
    stats = edges.agg(
        F.count(F.lit(1)).alias("nedges"),
        F.countDistinct(F.least("src", "dst"), F.greatest("src", "dst")).alias(
            "ncanon"
        ),
        F.sum((F.col("src") == F.col("dst")).cast("int")).alias("nself"),
        F.sum(F.col("src") * F.lit(1 << 13) + F.col("dst")).alias("fingerprint"),
    )
    return stats.filter(F.col("nedges") == target).select(
        F.lit(target).alias("target"), "nedges", "ncanon", "nself", "fingerprint"
    )


@register(
    "rmat_degree_stats",
    tags=("graph", "generator"),
    oracle=f"""
        {_rmat_canon_sql()}
        SELECT degree, CAST(COUNT(*) AS BIGINT) AS nverts
        FROM (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS degree
            FROM (SELECT src AS v FROM canon UNION ALL SELECT dst AS v FROM canon)
            GROUP BY v
        )
        GROUP BY degree
        ORDER BY degree DESC
    """,
)
def rmat_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the canonicalized R-MAT graph (examples/rmat.cpp
    degree/histo postlude :279-…) — skewed params make this the power-law
    witness: a handful of huge-degree vertices, a long tail of degree-1."""
    edges, _rounds = _gen(spark)
    return graph.degree_stats(graph.edge_upper(edges), duplicate=2)


def _rmat_cc_sql(k: int = _CC_STAGES_RMAT) -> str:
    """Min-label propagation over the canonicalized generated graph,
    unrolled (the queries/graph_iter.py cc oracle strategy)."""
    parts = [
        _rmat_canon_sql(),
        ", arcs AS MATERIALIZED (SELECT src, dst FROM canon"
        " UNION ALL SELECT dst AS src, src AS dst FROM canon)",
        ", l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS label FROM arcs)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""", l{i} AS MATERIALIZED (
                SELECT cur.v, LEAST(cur.label, COALESCE(mn.ml, cur.label)) AS label
                FROM l{i - 1} cur LEFT JOIN (
                    SELECT a.dst AS v, MIN(l.label) AS ml
                    FROM arcs a JOIN l{i - 1} l ON a.src = l.v GROUP BY a.dst
                ) mn ON cur.v = mn.v
            )"""
        )
    return "\n".join(parts)


@register(
    "rmat_cc_stats",
    tags=("graph", "generator", "iterative"),
    oracle=f"""
        {_rmat_cc_sql()}
        SELECT csize, CAST(COUNT(*) AS BIGINT) AS ncomp
        FROM (SELECT label, CAST(COUNT(*) AS BIGINT) AS csize
              FROM l{_CC_STAGES_RMAT} GROUP BY label)
        GROUP BY csize
        ORDER BY csize DESC
    """,
)
def rmat_cc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference demo pipeline (examples/in.cc: rmat → edge_upper →
    cc_find → cc_stats) on the skewed generator output — the skew-handling
    evidence for cc_find: the hot quadrant vertex's component dominates, and
    min-label propagation's map-side combine absorbs it."""
    edges, _rounds = _gen(spark)
    cc, _ = graph_iter.cc_find(graph.edge_upper(edges).localCheckpoint(eager=True))
    return graph_iter.cc_stats(cc)


_LUBY_STAGES = 12  # measured convergence: 4 (sf0.001) / 7 (sf0.01); margin 5


def _luby_oracle(k: int = _LUBY_STAGES, seed: int = _SEED) -> str:
    """Unrolled K synchronous Luby rounds. Each round over the undecided
    subgraph: winners are strict (pri, v) minima of their closed undecided
    neighborhood, their neighbors drop out. Extra rounds past convergence
    are no-ops (the undecided set is empty), so overshoot is harmless."""
    parts = [
        fixtures.duckdb_with("edges"),
        ", arcs AS MATERIALIZED (SELECT src, dst FROM edges"
        " UNION ALL SELECT dst AS src, src AS dst FROM edges)",
        f""", s0 AS MATERIALIZED (
            SELECT v,
                   ('0x' || substr(md5('{seed}|' || CAST(v AS VARCHAR)), 1, 15))::BIGINT AS pri,
                   'u' AS status
            FROM (SELECT DISTINCT src AS v FROM arcs)
        )""",
    ]
    for i in range(1, k + 1):
        p = i - 1
        parts.append(
            f""", w{i} AS MATERIALIZED (
                SELECT u.v FROM (SELECT v, pri FROM s{p} WHERE status = 'u') u
                LEFT JOIN (
                    SELECT a.dst AS v, MIN({{'p': s.pri, 'q': s.v}}) AS mn
                    FROM arcs a
                    JOIN (SELECT v, pri FROM s{p} WHERE status = 'u') s ON a.src = s.v
                    JOIN (SELECT v FROM s{p} WHERE status = 'u') d ON a.dst = d.v
                    GROUP BY a.dst
                ) n ON u.v = n.v
                WHERE n.v IS NULL OR {{'p': u.pri, 'q': u.v}} < n.mn
            ), l{i} AS MATERIALIZED (
                SELECT DISTINCT a.dst AS v FROM arcs a JOIN w{i} w ON a.src = w.v
            ), s{i} AS MATERIALIZED (
                SELECT s.v, s.pri,
                       CASE WHEN s.status <> 'u' THEN s.status
                            WHEN w.v IS NOT NULL THEN 'i'
                            WHEN l.v IS NOT NULL THEN 'o'
                            ELSE 'u' END AS status
                FROM s{p} s
                LEFT JOIN w{i} w ON s.v = w.v
                LEFT JOIN l{i} l ON s.v = l.v
            )"""
        )
    parts.append(f"SELECT v FROM s{k} WHERE status = 'i'")
    return "\n".join(parts)


@register(
    "luby_find", tags=("graph", "iterative"), oracle=_luby_oracle(), bench=True
)
def luby_find(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIS members on the edges fixture (examples/in.luby pipeline).
    Deterministic given the seed (portable md5-derived priorities — the
    oracle replays identical rounds in SQL); independence + maximality are
    additionally asserted via anti-joins in tests/test_graph_algorithms.py."""
    arcs = fixtures.derived(
        spark,
        sf_dir,
        "arcs_by_dst",
        lambda: graph_iter.prepare_arcs(fixtures.edges_materialized(spark, sf_dir)),
    )
    mis, _rounds = graph_iter.luby_find(
        fixtures.edges_materialized(spark, sf_dir), seed=_SEED, arcs=arcs
    )
    return mis
