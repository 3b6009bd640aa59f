"""Harmonic closeness centrality from the HyperBall trajectory (r12 tail
registration; the SCALE.md r12 hyperball_harmonic design) — Boldi &
Vigna's actual application of HyperBall (*In-Core Computation of
Geometric Centralities with HyperBall*, 2013): per vertex,
H(v) = sum over r >= 1 of (|ball_r(v)| - |ball_{r-1}(v)|) / r — the
distance-discounted count of reachable vertices, THE centrality that
stays well-defined on disconnected graphs (unreached vertices simply
contribute nothing).

Estimator convention: ball sizes come from the fixed-point HLL read-out
written ONCE in functions/hllest.py (the draft's risk note) — integer
D = sum 2^(RHO_MAX - reg) over all m buckets, est_fp4 = NUMER div D in
DECIMAL(38,0)/HUGEINT, truncation-identical on both engines, and
MONOTONE in the registers, so consecutive ball estimates difference to
non-negative deltas. The registered quantity is exact fixed-point units
at every step (delta_r div r floor-divides per round, then sums — the
betweenness integer-delta discipline), so the gate needs no estimator
tolerance; the REGISTERS' own exactness (sketch(ball) precisely, never
an approximation of it) is pinned register-for-register in
tests/test_graph_algorithms.py, and the read-out convention's Python
twin in tests/test_hll_estimate.py.

Spark plan: the _R checkpointed register states from
graph_iter.hyperball_rounds (shared derivation with hyperball_rmat),
unioned with a round tag — ONE aggregate to per-(v, r) D (map-side
combinable: COUNT + SUM of shifted registers), the est projection, then
ONE pivot-style aggregate to per-vertex (est_0..est_R) and the harmonic
fold in a single projection. Two shuffles total beyond the ball
propagation itself. 100 TB: the read-out touches only the (v, b, reg)
sketch rows — |V| * 64 BIGINTs regardless of graph size — never the
graph; the propagation cost is hyperball_rmat's, already measured.

Oracle: hyperball_rmat's unroll VERBATIM (queries/hyperball.py's
_hyperball_cte_sql) + per-round D/est CTEs using the same functions/
hllest.py fragments + the identical harmonic fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.functions import hllest
from gpu_mapreduce_spark.operators import graph_iter
from gpu_mapreduce_spark.queries.hyperball import _R, _hyperball_cte_sql
from gpu_mapreduce_spark.queries.kcore_rmat import _canon_arcs
from gpu_mapreduce_spark.registry import register


def _harmonic_oracle(rounds: int = _R) -> str:
    parts = [_hyperball_cte_sql(rounds)]
    for r in range(rounds + 1):
        parts.append(
            f""", hd{r} AS MATERIALIZED (
                SELECT v, {hllest.duckdb_d_from_regs()} AS d
                FROM hb{r} GROUP BY v
            ), he{r} AS MATERIALIZED (
                SELECT v, {hllest.duckdb_est_fp4('d')} AS est FROM hd{r}
            )"""
        )
    deltas = " + ".join(
        f"(e{r}.est - e{r - 1}.est) // {r}" for r in range(1, rounds + 1)
    )
    joins = " ".join(
        f"JOIN he{r} e{r} ON e{r}.v = e0.v" for r in range(1, rounds + 1)
    )
    parts.append(
        f"""SELECT e0.v, e{rounds}.est AS ball_fp4,
               CAST({deltas} AS BIGINT) AS harmonic_fp4
        FROM he0 e0 {joins}
        ORDER BY e0.v"""
    )
    return "\n".join(parts)


@register(
    "hyperball_harmonic",
    bench=True,
    tags=("graph", "iterative", "sketch", "generator"),
    oracle=_harmonic_oracle(),
)
def hyperball_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex (v, ball_fp4, harmonic_fp4) on the canonical R-MAT
    graph at radius {_R}: the radius-{_R} ball estimate and the harmonic
    fold over the per-round estimate deltas, all in exact fixed-point
    units — see module docstring."""
    edges, _arcs = _canon_arcs(spark)
    states = graph_iter.hyperball_rounds(edges, _R)
    tagged = states[0].select(F.lit(0).alias("r"), "v", "reg")
    for r in range(1, _R + 1):
        tagged = tagged.unionAll(
            states[r].select(F.lit(r).alias("r"), "v", "reg")
        )
    ests = (
        tagged.groupBy("v", "r")
        .agg(hllest.d_from_regs().alias("d"))
        .select("v", "r", F.expr(hllest.spark_est_fp4("d")).alias("est"))
    )
    wide = ests.groupBy("v").agg(
        *[
            F.max(F.when(F.col("r") == r, F.col("est"))).alias(f"est{r}")
            for r in range(_R + 1)
        ]
    )
    deltas = " + ".join(
        f"(est{r} - est{r - 1}) div {r}" for r in range(1, _R + 1)
    )
    return wide.select(
        "v",
        F.col(f"est{_R}").alias("ball_fp4"),
        F.expr(f"CAST({deltas} AS BIGINT)").alias("harmonic_fp4"),
    ).orderBy("v")
