"""k-truss decomposition on the seeded R-MAT power-law graph — the r10
registration of the staged `operators/graph_iter.ktruss_edges` (SCALE.md
r10 design; VERDICT r09 #1).

Why the R-MAT graph and this k: the kcore_rmat lesson — the parquet
fixture graph's degree band is too tight for a gradual peel, while the
generated R-MAT graph is deterministic, IDENTICAL at every sf, and
power-law. k=5 peels over 6 rounds (15,528 canonical edges -> 8,016
survivors, measured), so the registered number exercises the iterative
loop (6 triangle recounts + batched peels + convergence probes), not a
one-round fixpoint.

Oracle: the cc_find/kcore recursive-oracle strategy — the peel unrolled
as a bounded CTE chain over the SAME generate-and-cull replay prefix
(`queries/rmat_gen._rmat_canon_sql`). Each round enumerates triangles
with the canonical ascending-id triple join (a<b<c appears exactly once),
explodes each into its three edges, counts per-edge support, and keeps
edges with support >= k-2. Rounds past convergence are identity no-ops,
so the unroll carries margin. The loud in-query guard raises if the
operator ever needs more rounds than the oracle unrolls (an oracle
shortfall, not an operator bug — the kcore discipline).

Reference parity: the truss peel is the edge-granularity sibling of the
reference's per-edge triangle machinery (oink/tri_find.cpp:43-82 wedge
join); each Spark round reuses graph.tri_find's degree-oriented wedge
join verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gpu_mapreduce_spark.operators import graph_iter
from gpu_mapreduce_spark.queries.kcore_rmat import _canon_arcs
from gpu_mapreduce_spark.queries.rmat_gen import _rmat_canon_sql
from gpu_mapreduce_spark.registry import register

_K = 5
_STAGES = 9  # measured convergence: 6 rounds at k=5; margin 3


def _ktruss_oracle(k: int = _K, stages: int = _STAGES) -> str:
    """rmat generate-and-cull replay + canonicalization + unrolled peel.

    Per round: triangles once each as ascending-id triples (e1=(a,b),
    e2=(b,c), e3=(a,c) with a<b<c by canonical orientation), support =
    per-edge count of incident triangles, survivors = support >= k-2.
    Edges in no triangle are simply absent from the support table, which
    drops them exactly like the operator's coalesce(support, 0) filter
    (k-2 >= 1 is enforced by the operator)."""
    parts = [_rmat_canon_sql(), ", kt0 AS MATERIALIZED (SELECT src, dst FROM canon)"]
    for i in range(1, stages + 1):
        parts.append(
            f""", ktri{i} AS MATERIALIZED (
                SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                FROM kt{i - 1} e1
                JOIN kt{i - 1} e2 ON e1.dst = e2.src
                JOIN kt{i - 1} e3 ON e3.src = e1.src AND e3.dst = e2.dst
            ), kt{i} AS MATERIALIZED (
                SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS support
                FROM (
                    SELECT a AS src, b AS dst FROM ktri{i}
                    UNION ALL SELECT a AS src, c AS dst FROM ktri{i}
                    UNION ALL SELECT b AS src, c AS dst FROM ktri{i}
                )
                GROUP BY src, dst
                HAVING COUNT(*) >= {k - 2}
            )"""
        )
    parts.append(
        f"SELECT src, dst, support FROM kt{stages} ORDER BY src, dst"
    )
    return "\n".join(parts)


@register(
    "ktruss_decomposition",
    bench=True,
    tags=("graph", "iterative", "generator"),
    oracle=_ktruss_oracle(),
)
def ktruss_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_K}-truss of the canonicalized R-MAT graph with final-subgraph
    support (operators/graph_iter.ktruss_edges). Multi-round by
    construction — see module docstring. The operator raises on a
    max_rounds bail-out (never a silently-truncated set), and the unroll
    guard here keeps the oracle honest on the other side."""
    edges, _arcs = _canon_arcs(spark)
    surv, rounds = graph_iter.ktruss_edges(edges, k=_K, max_rounds=_STAGES + 1)
    if rounds > _STAGES:
        raise AssertionError(
            f"ktruss_decomposition converged in {rounds} rounds >"
            f" oracle unroll {_STAGES}; raise _STAGES (oracle shortfall,"
            " not an operator bug)"
        )
    return surv.orderBy("src", "dst")
