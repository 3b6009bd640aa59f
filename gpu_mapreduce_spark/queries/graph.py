"""Oracle-checked queries for the non-iterative graph layer (SURVEY.md §2.4),
over the derived `edges` fixture (canonical src < dst simple graph on
NUM_VERTICES vertices with a guaranteed 25-clique — sources/fixtures.py).

Array outputs are emitted as canonical space-joined strings so the driver's
value-hash is engine-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import graph
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources import fixtures

_E = fixtures.duckdb_with("edges")

_DEG2_SQL = """
    SELECT v, COUNT(*) AS degree
    FROM (SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)
    GROUP BY v
"""


@register(
    "edge_upper",
    tags=("graph",),
    oracle=f"""
        {_E}
        SELECT src, dst FROM edges
    """,
)
def edge_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize the raw multigraph (dupes + self-loops) — the operator
    whose semantics the `edges` fixture itself is defined by, applied to
    `edges_raw` so the operator, not the fixture, is what's under test."""
    return graph.edge_upper(fixtures.edges_raw(spark, sf_dir))


@register(
    "vertex_extract",
    tags=("graph",),
    oracle=f"""
        {_E}
        SELECT DISTINCT v
        FROM (SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)
    """,
)
def vertex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.vertex_extract(fixtures.edges_materialized(spark, sf_dir))


@register(
    "degree_out",
    tags=("graph",),
    oracle=f"""
        {_E}
        SELECT src AS v, COUNT(*) AS degree FROM edges GROUP BY src
    """,
)
def degree_out(spark: SparkSession, sf_dir: str) -> DataFrame:
    """degree with duplicate=1 (src endpoints only, oink/degree.cpp)."""
    return graph.degree(fixtures.edges_materialized(spark, sf_dir), duplicate=1)


@register(
    "degree",
    tags=("graph",),
    oracle=f"""
        {_E}
        {_DEG2_SQL}
    """,
)
def degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """degree with duplicate=2 (both endpoints — undirected degree)."""
    return graph.degree(fixtures.edges_materialized(spark, sf_dir), duplicate=2)


@register(
    "degree_stats",
    bench=True,
    tags=("graph",),
    oracle=f"""
        {_E}
        SELECT degree, COUNT(*) AS nverts
        FROM ({_DEG2_SQL})
        GROUP BY degree
        ORDER BY degree DESC
    """,
)
def degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.degree_stats(fixtures.edges_materialized(spark, sf_dir), duplicate=2)


@register(
    "degree_weight",
    tags=("graph",),
    oracle=f"""
        {_E}
        SELECT e.src, e.dst, CAST(1.0 AS DOUBLE) / d.degree AS weight
        FROM (SELECT src, dst FROM edges
              UNION ALL SELECT dst AS src, src AS dst FROM edges) e
        JOIN ({_DEG2_SQL}) d ON e.src = d.v
    """,
)
def degree_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First real join of the suite (the reference fakes it with
    add+collate+tag-dispatch, oink/degree_weight.cpp:48-51)."""
    return graph.degree_weight(fixtures.edges_materialized(spark, sf_dir), duplicate=2)


@register(
    "neighbor",
    tags=("graph",),
    oracle=f"""
        {_E}
        SELECT v, array_to_string(list_sort(list(dst)), ' ') AS neighbors
        FROM (SELECT src AS v, dst FROM edges
              UNION ALL SELECT dst AS v, src AS dst FROM edges)
        GROUP BY v
    """,
)
def neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    adj = graph.neighbor(fixtures.edges_materialized(spark, sf_dir))
    return adj.select(
        "v",
        F.array_join(
            F.transform("neighbors", lambda x: x.cast("string")), " "
        ).alias("neighbors"),
    )


_TRI_SQL = """
    SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
    FROM edges e1
    JOIN edges e2 ON e2.src = e1.dst
    JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
"""

_ADJ_CACHE: dict[tuple[str, str], DataFrame] = {}


def _oriented_adj_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-oriented out-adjacency of the canonical edge fixture,
    materialized once per (session, sf_dir) — the CSR-like artifact all
    triangle queries probe (see fixtures.edges_materialized for the
    rationale; at cluster scale this is a persisted table derived once,
    alongside the edge list itself)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    adj = _ADJ_CACHE.get(key)
    if adj is None:
        adj = graph.oriented_adj(
            fixtures.edges_materialized(spark, sf_dir)
        ).localCheckpoint(eager=True)
        _ADJ_CACHE[key] = adj
    return adj


@register(
    "tri_find",
    tags=("graph",),
    oracle=f"""
        {_E}
        {_TRI_SQL}
    """,
)
def tri_find(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full triangle listing; the 25-clique fixture guarantees ≥ C(25,3) =
    2300 rows at every sf. Oracle is the naive 3-way self-join (fine for
    DuckDB at oracle scale; our plan is the degree-oriented 2-join form)."""
    return graph.tri_find(adj=_oriented_adj_materialized(spark, sf_dir))


@register(
    "tri_count",
    bench=True,
    tags=("graph",),
    oracle=f"""
        {_E}
        SELECT CAST(COUNT(*) AS BIGINT) AS ntri FROM ({_TRI_SQL})
    """,
)
def tri_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join-planning stress test for the bench set (triangle row counts
    grow superlinearly with sf, so the full listing stays out of bench)."""
    return graph.tri_count(adj=_oriented_adj_materialized(spark, sf_dir))


@register(
    "neigh_tri",
    tags=("graph",),
    oracle=f"""
        {_E},
        tri AS ({_TRI_SQL}),
        tv AS (
            SELECT a AS v, b || '-' || c AS te FROM tri
            UNION ALL SELECT b AS v, a || '-' || c AS te FROM tri
            UNION ALL SELECT c AS v, a || '-' || b AS te FROM tri
        ),
        tl AS (SELECT v, array_to_string(list_sort(list(te)), ' ') AS tri_edges
               FROM tv GROUP BY v),
        adj AS (
            SELECT v, array_to_string(list_sort(list(dst)), ' ') AS neighbors
            FROM (SELECT src AS v, dst FROM edges
                  UNION ALL SELECT dst AS v, src AS dst FROM edges)
            GROUP BY v
        )
        SELECT adj.v, adj.neighbors, COALESCE(tl.tri_edges, '') AS tri_edges
        FROM adj LEFT JOIN tl ON adj.v = tl.v
    """,
)
def neigh_tri(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fixtures.edges_materialized(spark, sf_dir)
    out = graph.neigh_tri(
        e, graph.tri_find(adj=_oriented_adj_materialized(spark, sf_dir))
    )
    return out.select(
        "v",
        F.array_join(
            F.transform("neighbors", lambda x: x.cast("string")), " "
        ).alias("neighbors"),
        F.array_join("tri_edges", " ").alias("tri_edges"),
    )


@register(
    "neigh_tri_files",
    tags=("graph", "sources"),
    oracle=f"""
        {_E},
        tri AS ({_TRI_SQL}),
        tv AS (
            SELECT a AS v, b || '-' || c AS te FROM tri
            UNION ALL SELECT b AS v, a || '-' || c AS te FROM tri
            UNION ALL SELECT c AS v, a || '-' || b AS te FROM tri
        ),
        tl AS (SELECT v, array_to_string(list_sort(list(te)), ' ') AS tri_edges
               FROM tv GROUP BY v),
        adj AS (
            SELECT v, array_to_string(list_sort(list(dst)), ' ') AS neighbors
            FROM (SELECT src AS v, dst FROM edges
                  UNION ALL SELECT dst AS v, src AS dst FROM edges)
            GROUP BY v
        )
        SELECT adj.v, adj.neighbors, COALESCE(tl.tri_edges, '') AS tri_edges
        FROM adj LEFT JOIN tl ON adj.v = tl.v
        WHERE adj.v < 25
    """,
)
def neigh_tri_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """neigh_tri's per-vertex FILE output contract (oink/neigh_tri.cpp:39-60
    writes one `dirname/V` file per vertex), demonstrated end-to-end:
    the clique vertices' reports are written through
    graph.neigh_tri_sink (write.partitionBy("v") — one Hive directory per
    vertex) and read BACK from the partitioned layout; the oracle checks
    the read-back content, so a vertex lost or garbled by the sink
    hash-mismatches. Restricted to the 25-clique so the driver-run query
    creates 25 directories, not |V|."""
    from gpu_mapreduce_spark.plans.scratch import sink_roundtrip

    e = fixtures.edges_materialized(spark, sf_dir)
    nt = graph.neigh_tri(
        e, graph.tri_find(adj=_oriented_adj_materialized(spark, sf_dir))
    )
    sub = nt.filter(F.col("v") < 25).select(
        "v",
        F.array_join(
            F.transform("neighbors", lambda x: x.cast("string")), " "
        ).alias("neighbors"),
        F.array_join("tri_edges", " ").alias("tri_edges"),
    )

    def build(path: str) -> DataFrame:
        graph.neigh_tri_sink(sub, path)
        back = spark.read.parquet(path)
        return back.select(
            F.col("v").cast("bigint").alias("v"), "neighbors", "tri_edges"
        )

    return sink_roundtrip("neigh_tri_sink_", build)
