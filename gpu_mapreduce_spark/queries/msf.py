"""Minimum spanning forest on the seeded R-MAT graph (r10 landing of the
SCALE.md r11 boruvka_msf design) — the classic batch-parallel graph op
the suite lacked; Boruvka is THE shuffle-friendly MSF (per round one
edge⋈components join, one map-side-combinable argmin, one bounded
contraction — no priority queue, no sequential union-find).

Weights are the scale harness's deterministic convention wu =
(src*31 + dst) % 97 + 1 (tools/scale_evidence.py's graph tier), so both
engines derive identical weights with no stored table. Duplicate weights
abound (97 values over 15,528 edges) — the forest is still UNIQUE
because the argmin orders by the packed strict total order
(wu, src, dst), which is the determinism requirement of the hash gate.
Measured on the fixture: 4 hooking rounds, inner pointer-jump counts
4/3/4/1, forest = 2,618 edges = |V| − #components (2,623 − 5, the
cc_find cross-check in tests), total weight 67,408.

Oracle: Boruvka unrolled — OUTER rounds 6 (measured 4 + margin 2), each
carrying the relabel ⋈ cross-edges ⋈ arg_min chain, the 2-cycle break,
and a FIXED 7 pointer-jump doublings (depth 2^7 = 128 covers the
measured ≤16 with margin; extra jumps and extra rounds are no-ops at the
fixed point, the kcore-unroll property). The operator raises on
max_rounds/max_jumps exhaustion and the in-query guard raises if rounds
ever exceed the oracle unroll — loud on both sides.

100 TB: see operators/graph_iter.boruvka_msf — per round the edge list
never moves more than once, state is |components| rows shrinking
geometrically, and the argmin is one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import graph_iter
from gpu_mapreduce_spark.queries.kcore_rmat import _canon_arcs
from gpu_mapreduce_spark.queries.rmat_gen import _rmat_canon_sql
from gpu_mapreduce_spark.registry import register

_ROUNDS = 6  # measured contraction: 4 rounds; margin 2
_JUMPS = 7  # measured pointer depth <= 16 (4 doublings); 2^7 margin
_VS = 1 << 20
_WSHIFT = 1 << 40


def _msf_oracle(rounds: int = _ROUNDS, jumps: int = _JUMPS) -> str:
    parts = [
        _rmat_canon_sql(),
        f""", wcanon AS MATERIALIZED (
            SELECT src, dst, (src * 31 + dst) % 97 + 1 AS wu FROM canon
        ), mcomp0 AS MATERIALIZED (
            SELECT v, v AS c FROM (
                SELECT src AS v FROM wcanon
                UNION SELECT dst AS v FROM wcanon)
        )""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""", mec{r} AS MATERIALIZED (
                SELECT e.src, e.dst, e.wu, a.c AS cs, b.c AS cd
                FROM wcanon e
                JOIN mcomp{r - 1} a ON a.v = e.src
                JOIN mcomp{r - 1} b ON b.v = e.dst
                WHERE a.c <> b.c
            ), mm{r} AS MATERIALIZED (
                SELECT mc, MIN(pk) AS mpk, arg_min(oc, pk) AS oc FROM (
                    SELECT cs AS mc, cd AS oc,
                           wu * {_WSHIFT} + src * {_VS} + dst AS pk
                    FROM mec{r}
                    UNION ALL
                    SELECT cd AS mc, cs AS oc,
                           wu * {_WSHIFT} + src * {_VS} + dst AS pk
                    FROM mec{r}
                ) GROUP BY mc
            ), mp{r}_0 AS MATERIALIZED (
                SELECT ac.c,
                       COALESCE(
                           CASE WHEN b.mc IS NOT NULL AND ac.c < a.oc
                                THEN ac.c ELSE a.oc END,
                           ac.c) AS p
                FROM (SELECT DISTINCT c FROM mcomp{r - 1}) ac
                LEFT JOIN mm{r} a ON a.mc = ac.c
                LEFT JOIN mm{r} b ON b.mc = a.oc AND b.oc = a.mc
            )"""
        )
        for j in range(1, jumps + 1):
            parts.append(
                f""", mp{r}_{j} AS MATERIALIZED (
                    SELECT x.c, y.p FROM mp{r}_{j - 1} x
                    JOIN mp{r}_{j - 1} y ON y.c = x.p
                )"""
            )
        parts.append(
            f""", mcomp{r} AS MATERIALIZED (
                SELECT cm.v, pj.p AS c
                FROM mcomp{r - 1} cm JOIN mp{r}_{jumps} pj ON pj.c = cm.c
            )"""
        )
    union = " UNION ALL ".join(
        f"SELECT mpk FROM mm{r}" for r in range(1, rounds + 1)
    )
    parts.append(
        f"""SELECT DISTINCT
               CAST((mpk // {_VS}) % {_VS} AS BIGINT) AS src,
               CAST(mpk % {_VS} AS BIGINT) AS dst,
               CAST(mpk // {_WSHIFT} AS BIGINT) AS wu
        FROM ({union}) ORDER BY src, dst"""
    )
    return "\n".join(parts)


@register(
    "msf_rmat",
    tags=("graph", "iterative", "generator"),
    oracle=_msf_oracle(),
)
def msf_rmat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unique minimum spanning forest (src, dst, wu) of the canonicalized
    R-MAT graph under deterministic weights — see module docstring."""
    edges, _arcs = _canon_arcs(spark)
    w = edges.select(
        "src",
        "dst",
        ((F.col("src") * 31 + F.col("dst")) % 97 + 1)
        .cast("bigint")
        .alias("wu"),
    )
    forest, rounds, jumps_used = graph_iter.boruvka_msf(
        w, max_rounds=_ROUNDS + 1, max_jumps=16
    )
    if rounds > _ROUNDS:
        raise AssertionError(
            f"msf_rmat contracted in {rounds} rounds > oracle unroll"
            f" {_ROUNDS}; raise _ROUNDS (oracle shortfall, not an operator"
            " bug)"
        )
    # the oracle unrolls a FIXED _JUMPS pointer-jump doublings per round;
    # the operator admits up to 16 — a deeper hook chain on a future
    # fixture must fail HERE, loudly, not as an opaque row mismatch
    # downstream (ADVICE r10, mirroring the rounds guard above)
    if jumps_used > _JUMPS:
        raise AssertionError(
            f"msf_rmat pointer-jumped {jumps_used} times in a round >"
            f" oracle unroll {_JUMPS}; raise _JUMPS (oracle shortfall,"
            " not an operator bug)"
        )
    return forest
