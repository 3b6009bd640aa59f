"""Generator + MIS queries.

The rmat entries are rows-only (the generator's generate-and-cull loop is
data-dependent iteration with no SQL analog) — invariants are enforced
in-query (a violated invariant yields zero rows, failing the driver's
rows-only check) and cross-checked independently in
tests/test_graph_algorithms.py (union-find CC, independence/maximality
anti-joins, determinism fingerprints).

luby_find IS oracle-checked: its priorities use the portable md5-hex-slice
hash, so the DuckDB oracle assigns identical priorities and replays the
same synchronous rounds as an unrolled CTE chain (the cc_find/sssp oracle
strategy — queries/graph_iter.py)."""

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
    return rmat.rmat_edges(spark, _N, _NZ, _A, _B, _C, seed=_SEED)


@register("rmat", tags=("graph", "generator"))
def rmat_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One stats row for the generated graph; the row only survives if the
    generator's defining invariant holds (exactly Nz·2^N unique edges —
    oink/rmat.cpp:66-68 prints the same counters). The fingerprint is a
    content checksum the determinism test reruns against."""
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


@register("rmat_degree_stats", tags=("graph", "generator"))
def rmat_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the canonicalized R-MAT graph (examples/rmat.cpp
    degree/histo postlude :279-…) — skewed params make this the power-law
    witness: a handful of huge-degree vertices, a long tail of degree-1."""
    edges, _rounds = _gen(spark)
    return graph.degree_stats(graph.edge_upper(edges), duplicate=2)


@register("rmat_cc_stats", tags=("graph", "generator", "iterative"))
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


@register("luby_find", tags=("graph", "iterative"), oracle=_luby_oracle())
def luby_find(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIS members on the edges fixture (examples/in.luby pipeline).
    Deterministic given the seed (portable md5-derived priorities — the
    oracle replays identical rounds in SQL); independence + maximality are
    additionally asserted via anti-joins in tests/test_graph_algorithms.py."""
    mis, _rounds = graph_iter.luby_find(
        fixtures.edges_materialized(spark, sf_dir), seed=_SEED
    )
    return mis
