"""Label-propagation community detection (r05 tail registration per
SURVEY §2.6).

The community-structure primitive on top of the iterative graph layer:
synchronous LPA with a FIXED round count (operators/graph_iter.
label_propagation — fixed rounds because synchronous LPA can oscillate,
so 'exactly R rounds' is the portable spec both engines replay; the
oracle unrolls the same R stages, the cc_find CTE-chain discipline).

Runs on the seeded R-MAT power-law graph (the kcore_rmat rationale: the
sf-scaled fixture graph is a dense near-clique whose LPA collapses to
ONE community by round 4 at sf0.1 — power-law structure is where
community detection means something, and the generated graph is
identical at every sf, so the oracle replays generation + rounds
bit-identically; reference pipeline analog examples/in.cc: generate
R-MAT, then run the iterative command).

Output is the community-size histogram (csize, ncomp) — cc_stats'
shape, so connectivity (cc), coreness (kcore_rmat) and density
communities (this) are directly comparable views of the same graph."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import graph_iter
from gpu_mapreduce_spark.queries.kcore_rmat import _canon_arcs
from gpu_mapreduce_spark.queries.rmat_gen import _rmat_canon_sql
from gpu_mapreduce_spark.registry import register

_ROUNDS = 2  # measured structure per round on the R-MAT graph: 529 / 67 /
#   16 / 10 communities after 1/2/3/4 rounds — synchronous LPA on a
#   power-law graph collapses to a giant component fast, and round 2 is
#   where the histogram still shows graded community sizes (2370, 86, 38,
#   17, 16, ...) while the loop machinery (two chained state joins +
#   vote/argmax aggregations) is genuinely exercised


def _lpa_oracle_prefix(k: int = _ROUNDS) -> str:
    """R-MAT generation replay + WITH-chain of k synchronous LPA rounds
    over its bidirected arcs; final labels in p{k}(v, label). Most
    frequent neighbor label, ties toward the smallest label — the
    row_number ORDER BY mirrors the operator's max(struct(cnt, -label))."""
    parts = [
        _rmat_canon_sql(),
        ", arcs AS MATERIALIZED (SELECT src, dst FROM canon"
        " UNION ALL SELECT dst AS src, src AS dst FROM canon)",
        ", p0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS label"
        " FROM arcs)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""", p{i} AS MATERIALIZED (
                SELECT v, label FROM (
                    SELECT a.dst AS v, l.label,
                           row_number() OVER (PARTITION BY a.dst
                               ORDER BY COUNT(*) DESC, l.label) AS rn
                    FROM arcs a JOIN p{i - 1} l ON a.src = l.v
                    GROUP BY a.dst, l.label
                ) WHERE rn = 1
            )"""
        )
    return "\n".join(parts)


@register(
    "label_prop_communities",
    bench=True,
    tags=("graph", "iterative", "generator"),
    oracle=f"""
        {_lpa_oracle_prefix()}
        SELECT csize, CAST(COUNT(*) AS BIGINT) AS ncomp
        FROM (SELECT label, CAST(COUNT(*) AS BIGINT) AS csize
              FROM p{_ROUNDS} GROUP BY label)
        GROUP BY csize
        ORDER BY csize DESC
    """,
)
def label_prop_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community-size histogram after exactly {_ROUNDS} synchronous LPA
    rounds on the seeded R-MAT graph: (csize, ncomp)."""
    edges, arcs = _canon_arcs(spark)
    lab = graph_iter.label_propagation(edges, rounds=_ROUNDS, arcs=arcs)
    return (
        lab.groupBy("label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("csize"))
        .groupBy("csize")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ncomp"))
        .orderBy(F.desc("csize"))
    )
