"""Generator + MIS queries (rows-only driver entries: the graphs are
self-generated or the algorithm output is set-valued, so there is no SQL
oracle — invariants are enforced in-query (a violated invariant yields zero
rows, failing the driver's rows-only check) and cross-checked independently
in tests/test_graph_algorithms.py (union-find CC, independence/maximality
anti-joins, determinism fingerprints)."""

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


@register("luby_find", tags=("graph", "iterative"))
def luby_find(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIS members on the edges fixture (examples/in.luby pipeline).
    Deterministic given the seed; independence + maximality are asserted via
    anti-joins in tests/test_graph_algorithms.py."""
    mis, _rounds = graph_iter.luby_find(
        fixtures.edges_materialized(spark, sf_dir), seed=_SEED
    )
    return mis
