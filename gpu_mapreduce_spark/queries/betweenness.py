"""K-source partial betweenness centrality on the seeded R-MAT graph —
the r11 design 2 registration (SCALE.md), landed in r10 with the staged
`operators/graph_iter.betweenness_sources` (Brandes 2001 restricted to a
fixed source set, the standard estimator at scale: exact betweenness is
O(V·E) — all-sources — while the K-source partial sum is the quantity
production graph stacks actually compute and rank by).

Sources {0,1,2,3} are hub vertices of the R-MAT quadrant skew (low ids
are hubs at a=0.57), so the BFS forest reaches 2,615 of the graph's
vertices in 5 depth layers (measured; unroll carries margin 2). The
registered quantity is the suite's exact fixed-point estimator: BIGINT
shortest-path counts sigma, dependencies in BC_SCALE=1e4 units with a
deterministic per-term floor division — both engines replay the
arithmetic verbatim, so the hash gate pins the full (v, bc_u) vector.
Overflow envelope (documented, not silent): each backward term is
sigma_u * (1e4 + delta_w) with delta_w <= 1e4 * |descendants|, so the
product stays under 2^63 while sigma_max * |V| < ~9e14 — the R-MAT
fixture is ~6 orders inside it, and DuckDB errors (never wraps) on
BIGINT overflow, so a violated envelope fails the parity gate loudly.

Oracle: the cc_find/kcore bounded-unroll strategy run TWICE in opposite
directions over the generate-and-cull replay prefix — forward layers
bl1..blD (per-layer sigma sums with an anti-join against the visited
set), then backward layers bbD..bb1 folding successor (sigma, delta)
pairs through the dependency rule; layers past BFS exhaustion are empty
and fold as no-ops. The loud in-query guard raises if the operator ever
needs more depth than the oracle unrolls (the kcore discipline).

100 TB: forward rounds shuffle only (s, v, sigma) BIGINT rows with the
frontier keyed by source (the sssp_multi amortization: one arc-table
scan per round for ALL sources); backward rounds only (s, v, delta).
Depth is the graph diameter, not a function of K or V.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gpu_mapreduce_spark.operators import graph_iter
from gpu_mapreduce_spark.operators.graph_iter import BC_SCALE
from gpu_mapreduce_spark.queries.kcore_rmat import _canon_arcs
from gpu_mapreduce_spark.queries.rmat_gen import _rmat_canon_sql
from gpu_mapreduce_spark.registry import register

_SOURCES = [0, 1, 2, 3]
_DEPTH = 7  # measured BFS exhaustion: 5 layers; margin 2


def _bc_oracle(sources: list[int] = _SOURCES, stages: int = _DEPTH) -> str:
    src_vals = ", ".join(
        f"({s}::BIGINT, {s}::BIGINT, 1::BIGINT)" for s in sources
    )
    parts = [
        _rmat_canon_sql(),
        """, bkarcs AS MATERIALIZED (SELECT src, dst FROM canon
            UNION ALL SELECT dst AS src, src AS dst FROM canon)""",
        f""", bl0 AS MATERIALIZED (
            SELECT * FROM (VALUES {src_vals}) AS t(s, v, sigma)
        ), bvis0 AS MATERIALIZED (SELECT s, v FROM bl0)""",
    ]
    for d in range(1, stages + 1):
        parts.append(
            f""", bl{d} AS MATERIALIZED (
                SELECT l.s, a.dst AS v, CAST(SUM(l.sigma) AS BIGINT) AS sigma
                FROM bl{d - 1} l
                JOIN bkarcs a ON a.src = l.v
                LEFT JOIN bvis{d - 1} t ON t.s = l.s AND t.v = a.dst
                WHERE t.v IS NULL
                GROUP BY l.s, a.dst
            ), bvis{d} AS MATERIALIZED (
                SELECT s, v FROM bvis{d - 1}
                UNION ALL SELECT s, v FROM bl{d}
            )"""
        )
    parts.append(
        f""", bb{stages} AS MATERIALIZED (
            SELECT s, v, sigma, 0::BIGINT AS delta FROM bl{stages}
        )"""
    )
    for d in range(stages - 1, 0, -1):
        parts.append(
            f""", bb{d} AS MATERIALIZED (
                SELECT u.s, u.v, u.sigma,
                       CAST(COALESCE(SUM(
                           (u.sigma * ({BC_SCALE} + w.delta)) // w.sigma
                       ), 0) AS BIGINT) AS delta
                FROM bl{d} u
                LEFT JOIN bkarcs a ON a.src = u.v
                LEFT JOIN bb{d + 1} w ON w.s = u.s AND w.v = a.dst
                GROUP BY u.s, u.v, u.sigma
            )"""
        )
    union = " UNION ALL ".join(
        f"SELECT v, delta FROM bb{d}" for d in range(1, stages + 1)
    )
    parts.append(
        f"SELECT v, CAST(SUM(delta) AS BIGINT) AS bc_u"
        f" FROM ({union}) GROUP BY v ORDER BY v"
    )
    return "\n".join(parts)


@register(
    "betweenness_rmat",
    tags=("graph", "iterative", "generator"),
    oracle=_bc_oracle(),
)
def betweenness_rmat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial betweenness (v, bc_u) from sources {_SOURCES} on the
    canonicalized R-MAT graph — see module docstring. The operator raises
    on max_depth exhaustion (never a silently-truncated tree); the unroll
    guard here keeps the oracle honest on the other side."""
    edges, arcs = _canon_arcs(spark)
    bc, depth = graph_iter.betweenness_sources(
        edges, _SOURCES, max_depth=_DEPTH + 1, arcs=arcs
    )
    if depth > _DEPTH:
        raise AssertionError(
            f"betweenness_rmat exhausted BFS at depth {depth} > oracle"
            f" unroll {_DEPTH}; raise _DEPTH (oracle shortfall, not an"
            " operator bug)"
        )
    return bc
