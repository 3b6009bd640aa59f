"""K-core on the seeded R-MAT power-law graph — the bench entry that
exercises the peel LOOP (VERDICT r04 #6). Registered from the r05 tail
block so it queues behind the staleness window (SURVEY §2.6).

Why a second kcore query: the fixture graph's density scales with sf, so
no fixed K peels multi-round at every scale — at sf0.1 its min degree is
233 and K=24 converges in one round, while any K that peels at sf0.1
empties the sf0.01 graph entirely (measured: K>=25 at sf0.01 and K>=260
at sf0.1 peel to nothing — the degree band is too tight for a gradual
core). The generated R-MAT graph is the complement: deterministic, the
SAME at every sf, and power-law — K=12 peels over 7 rounds down to a
422-vertex core (N=12, Nz=4, seed 12345), so the benched number times
the iterative loop (7 state joins + degree aggregates + convergence
probes), not a one-round fixpoint. This is also the reference's own
pipeline shape: examples/in.cc generates R-MAT then runs the iterative
command on it."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gpu_mapreduce_spark.operators import graph, graph_iter
from gpu_mapreduce_spark.queries.rmat_gen import _gen, _rmat_canon_sql
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources import fixtures

_K = 12
_STAGES = 11  # measured convergence: 7 rounds; margin 4


def _kcore_rmat_oracle(k: int = _K, stages: int = _STAGES) -> str:
    """rmat generate-and-cull replay + canonicalization + unrolled peel
    (the queries/kcore.py chain over the queries/rmat_gen.py prefix)."""
    parts = [
        _rmat_canon_sql(),
        ", karcs AS MATERIALIZED (SELECT src, dst FROM canon"
        " UNION ALL SELECT dst AS src, src AS dst FROM canon)",
        ", kr0 AS MATERIALIZED (SELECT src AS v,"
        " CAST(COUNT(*) AS BIGINT) AS core_deg FROM karcs GROUP BY src)",
    ]
    for i in range(1, stages + 1):
        parts.append(
            f""", kc{i - 1} AS MATERIALIZED (
                SELECT v FROM kr{i - 1} WHERE core_deg >= {k}
            ), kr{i} AS MATERIALIZED (
                SELECT a.src AS v, CAST(COUNT(*) AS BIGINT) AS core_deg
                FROM karcs a
                JOIN kc{i - 1} s ON a.src = s.v
                JOIN kc{i - 1} t ON a.dst = t.v
                GROUP BY a.src
            )"""
        )
    parts.append(f"SELECT v, core_deg FROM kr{stages} ORDER BY v")
    return "\n".join(parts)


def _canon_arcs(spark: SparkSession):
    """Session-memoized (canonical rmat edges, prepared arcs) — shared
    across bench warm-up and timed runs like every other derived input."""
    return fixtures.derived(
        spark,
        "-",
        "rmat_canon_arcs",
        lambda: _build_canon_arcs(spark),
    )


def _build_canon_arcs(spark: SparkSession):
    edges = graph.edge_upper(_gen(spark)[0]).localCheckpoint(eager=True)
    return edges, graph_iter.prepare_arcs(edges)


@register(
    "kcore_rmat",
    bench=True,
    tags=("graph", "iterative", "generator"),
    oracle=_kcore_rmat_oracle(),
)
def kcore_rmat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_K}-core of the canonicalized R-MAT graph with core-induced degrees
    (operators/graph_iter.kcore). Multi-round by construction — see module
    docstring; the same loud unroll guard as queries/kcore.py."""
    edges, arcs = _canon_arcs(spark)
    core, _rounds = graph_iter.kcore(edges, k=_K, arcs=arcs)
    if _rounds > _STAGES:
        raise AssertionError(
            f"kcore_rmat converged in {_rounds} rounds > oracle unroll"
            f" {_STAGES}; raise _STAGES (oracle shortfall, not an operator"
            " bug)"
        )
    return core.orderBy("v")
