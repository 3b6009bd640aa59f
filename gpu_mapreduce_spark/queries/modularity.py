"""Modularity report (r09 tail registration; SCALE.md r10 design 3, landed
early) — the partition-quality number a community detection publishes to
justify its labels, over the same seeded R-MAT graph and synchronous-LPA
labels label_prop_communities registers.

Modularity Q = sum_c (e_c/m - (d_c/2m)^2) cleared to EXACT integers:
    num_c = 4*m*e_c - d_c^2          (BIGINT; can be negative)
    Q     = sum_c num_c / (4*m^2)
Per-community contributions and the pooled Q are emitted in fixed-point
units via an explicit FLOOR division with a sign split — Spark's `div`
truncates toward zero while DuckDB's `//` floors, so negative numerators
are routed through -((-a + den - 1) div den) on BOTH engines, making the
two divisions identical everywhere (the registry's sign-split discipline).
All terms are counts: m (undirected edges), e_c (intra-community edges),
d_c (degree mass). Exactness bound: |num_c| itself can reach 4*m^2 (one
community holding the whole graph), so the premultiplied 10000*num_c
stays under 2^63 only while 40000*m^2 < 2^63, i.e. m < ~1.5e7 edges per
report (ADVICE r09 corrected the earlier m < ~1.5e9 figure, which was
~100x past the real envelope) — at larger m, report per-shard and
combine the exact (num, den) rationals, or derive contrib_u from num_c
as 10000*quotient + (10000*remainder) div den so the premultiply never
forms.

Topology: degrees are one arc-keyed count, community rollups one
label-keyed aggregate, intra-edges one edges ⋈ labels ⋈ labels equi-join
chain (labels checkpointed once, broadcast while V ≪ E — the cc_find
state-side discipline); m crosses the driver as ONE scalar. Output =
per-community ('comm', label, n_nodes, e_in, d_sum, contrib_u) rows plus
the pooled ('all', -1, |V|, m, 2m, Q_u) row, so the hash gate pins the
whole decomposition, not just the scalar.

Oracle: the label_prop LPA-unroll prefix (R-MAT generation + R rounds)
plus the same integer algebra."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import graph_iter
from gpu_mapreduce_spark.queries.kcore_rmat import _canon_arcs
from gpu_mapreduce_spark.queries.label_prop import _ROUNDS, _lpa_oracle_prefix
from gpu_mapreduce_spark.registry import register


def _floor_div_sql(num: str, den: str) -> str:
    """Mathematical floor(num/den) for den > 0 in DuckDB (`//` floors on
    positives = truncation; negatives routed through the positive form)."""
    return (
        f"CASE WHEN {num} >= 0 THEN ({num}) // ({den})"
        f" ELSE -(((-({num})) + ({den}) - 1) // ({den})) END"
    )


@register(
    "modularity_report",
    tags=("graph", "iterative", "generator"),
    oracle=f"""
        {_lpa_oracle_prefix()},
        deg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d
                FROM arcs GROUP BY src),
        mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM canon),
        comm AS (
            SELECT l.label, CAST(COUNT(*) AS BIGINT) AS n_nodes,
                   CAST(SUM(d.d) AS BIGINT) AS d_sum
            FROM p{_ROUNDS} l JOIN deg d ON d.v = l.v
            GROUP BY l.label
        ),
        ein AS (
            SELECT la.label, CAST(COUNT(*) AS BIGINT) AS e_in
            FROM canon c
            JOIN p{_ROUNDS} la ON c.src = la.v
            JOIN p{_ROUNDS} lb ON c.dst = lb.v
            WHERE la.label = lb.label
            GROUP BY la.label
        ),
        rows AS (
            SELECT c.label, c.n_nodes,
                   CAST(coalesce(e.e_in, 0) AS BIGINT) AS e_in, c.d_sum,
                   4 * (SELECT m FROM mm) * coalesce(e.e_in, 0)
                       - c.d_sum * c.d_sum AS num,
                   4 * (SELECT m FROM mm) * (SELECT m FROM mm) AS den
            FROM comm c LEFT JOIN ein e USING (label)
        )
        SELECT 'comm' AS kind, CAST(label AS BIGINT) AS id,
               n_nodes, e_in, d_sum,
               CAST({_floor_div_sql("10000 * num", "den")} AS BIGINT)
                   AS contrib_u
        FROM rows
        UNION ALL
        SELECT 'all', CAST(-1 AS BIGINT),
               CAST(SUM(n_nodes) AS BIGINT),
               (SELECT m FROM mm),
               CAST(2 * (SELECT m FROM mm) AS BIGINT),
               CAST({_floor_div_sql("10000 * SUM(num)", "MAX(den)")}
                    AS BIGINT)
        FROM rows
    """,
)
def modularity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """('comm', label, n_nodes, e_in, d_sum, contrib_u) per community plus
    the pooled ('all', -1, |V|, m, 2m, Q_u) row — exact-integer modularity
    of the round-{_ROUNDS} LPA partition on the seeded R-MAT graph."""
    edges, arcs = _canon_arcs(spark)
    lab = graph_iter.label_propagation(
        edges, rounds=_ROUNDS, arcs=arcs
    ).localCheckpoint(eager=True)
    m = edges.count()  # ONE driver scalar (the pagerank discipline)
    den = 4 * m * m
    deg = arcs.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    comm = (
        lab.join(deg, "v")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("d").cast("bigint").alias("d_sum"),
        )
    )
    la = lab.select(F.col("v").alias("src"), F.col("label").alias("la"))
    lb = lab.select(F.col("v").alias("dst"), F.col("label").alias("lb"))
    # bcast-audit: bounded (label state ≪ arcs, the cc_find discipline)
    ein = (
        edges.join(F.broadcast(la), "src")
        .join(F.broadcast(lb), "dst")
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_in"))
    )
    rows = (
        comm.join(ein, "label", "left")
        .select(
            "label",
            "n_nodes",
            F.coalesce("e_in", F.lit(0)).cast("bigint").alias("e_in"),
            "d_sum",
            (
                F.lit(4 * m).cast("bigint") * F.coalesce("e_in", F.lit(0))
                - F.col("d_sum") * F.col("d_sum")
            ).alias("num"),
        )
        .localCheckpoint(eager=True)
    )

    def floor_div(num: F.Column, d: int) -> F.Column:
        return (
            F.when(num >= 0, F.expr(f"(10000 * num) div {d}"))
            .otherwise(-F.expr(f"((-(10000 * num)) + {d} - 1) div {d}"))
            .cast("bigint")
        )

    comm_rows = rows.select(
        F.lit("comm").alias("kind"),
        F.col("label").cast("bigint").alias("id"),
        "n_nodes",
        "e_in",
        "d_sum",
        floor_div(F.col("num"), den).alias("contrib_u"),
    )
    all_row = rows.agg(
        F.sum("n_nodes").cast("bigint").alias("n_nodes"),
        F.sum("num").alias("num"),
    ).select(
        F.lit("all").alias("kind"),
        F.lit(-1).cast("bigint").alias("id"),
        "n_nodes",
        F.lit(m).cast("bigint").alias("e_in"),
        F.lit(2 * m).cast("bigint").alias("d_sum"),
        floor_div(F.col("num"), den).alias("contrib_u"),
    )
    return comm_rows.unionByName(all_row)
