"""Skew-stress queries for the salting operators (operators/skew.py).

Workload: the hub-skewed fixture graph (`edges_skew`, ~6.5% of all arcs
touch vertex 0 — sources/fixtures.py) — the deterministic stand-in for the
power-law graphs the reference's zone splitting existed for
(oink/cc_find.cpp:43-55). Both queries put the hot key on the SHUFFLE axis
(join key / collect key), which is exactly where an unsalted plan
serializes on one reducer; the salted plans spread the hub over 8 buckets
and re-combine. Results are salt-invariant, so the oracles are the plain
equivalent SQL with no salting at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import skew
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources import fixtures

_NUM_SALTS = 8

_ARCS_SQL = """
    , arcs AS MATERIALIZED (SELECT src, dst FROM edges_skew
       UNION ALL SELECT dst AS src, src AS dst FROM edges_skew)
"""


def _skew_arcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fixtures.derived(
        spark,
        sf_dir,
        "edges_skew_mat",
        lambda: fixtures.edges_skew(spark, sf_dir)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True),
    )
    return e.select("src", "dst").unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


@register(
    "skew_join_salted",
    bench=True,
    tags=("skew", "join"),
    oracle=f"""
        {fixtures.duckdb_with("edges_skew")}
        {_ARCS_SQL}
        , deg AS (SELECT src AS v, COUNT(*) AS d FROM arcs GROUP BY src)
        SELECT a.src AS v,
               CAST(COUNT(*) AS BIGINT) AS n_nbrs,
               CAST(SUM(d.d) AS BIGINT) AS nbr_degree_sum
        FROM arcs a JOIN deg d ON a.dst = d.v
        GROUP BY a.src
    """,
)
def skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sum-of-neighbor-degrees per vertex, with the arc→degree join salted:
    the join key (dst) is the hub axis — vertex 0 is ~13% of all arc rows —
    so an unsalted shuffle-hash join lands all of them on one reducer.
    salted_join spreads them over 8 (dst, salt) buckets (salt hashed from
    src, which varies within the hub's rows) and replicates the 4k-row
    degree dim 8x — the classic fact-side-salt / dim-side-explode trade.
    force_shuffle pins the shuffle-hash plan salting exists for; without it
    the planner would broadcast the tiny dim at test scale and the query
    would demonstrate nothing."""
    arcs = _skew_arcs(spark, sf_dir)
    deg = (
        arcs.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .select(F.col("src").alias("dst"), "d")
    )
    joined = skew.salted_join(
        arcs,
        deg,
        on=["dst"],
        num_salts=_NUM_SALTS,
        salt_src=["src"],
        force_shuffle=True,
    )
    return joined.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nbrs"),
        F.sum("d").cast("bigint").alias("nbr_degree_sum"),
    ).select(F.col("src").alias("v"), "n_nbrs", "nbr_degree_sum")


@register(
    "skew_collect_digest",
    tags=("skew", "aggregate"),
    oracle=f"""
        {fixtures.duckdb_with("edges_skew")}
        {_ARCS_SQL}
        SELECT src AS v,
               CAST(COUNT(*) AS BIGINT) AS n_nbrs,
               md5(string_agg(CAST(dst AS VARCHAR), ',' ORDER BY dst)) AS digest
        FROM arcs GROUP BY src
    """,
)
def skew_collect_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sorted neighbor-list digest per vertex via the two-stage salted
    collect. collect_list is the aggregation map-side combine can NOT save
    (its state is the whole group), so the hub key is a genuine one-task
    funnel without salting; stage 1 bounds any reducer at ~1/8 of the hub's
    rows, stage 2 merges 8 pre-sorted partials per key. The md5-of-joined
    digest keeps driver-compared output narrow while still proving the full
    list content byte-for-byte."""
    arcs = _skew_arcs(spark, sf_dir)
    col = skew.salted_collect_sorted(
        arcs, ["src"], "dst", num_salts=_NUM_SALTS, alias="nbrs"
    )
    return col.select(
        F.col("src").alias("v"),
        F.size("nbrs").cast("bigint").alias("n_nbrs"),
        F.md5(F.concat_ws(",", F.col("nbrs").cast("array<string>"))).alias(
            "digest"
        ),
    )
