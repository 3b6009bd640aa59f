"""Semantic (cluster-bounded) embedding dedup — SemDeDup re-expressed
Spark-first (r05 tail registration per SURVEY §2.6).

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) deduplicates web-scale
corpora by clustering embeddings and comparing pairs ONLY within a
cluster. This registers that exact shape on the IVF cell assignment the
ANN suite already proves (operators/similarity.ivf_build — deterministic
md5-hex-slice centroid sampling, so DuckDB replays the clustering
bit-identically): candidates = within-cell pairs (equi-join on cid, never
corpus^2), verification = exact quantized cosine, threshold shared with
the dedup_embedding family.

Scale notes (100 TB): one assignment pass (broadcast of n_centroids
vectors), one checkpoint, one cid equi-join; candidate volume is
sum_cells |cell|^2, tuned by n_centroids ~ sqrt(N) exactly as the paper
runs ~1e5 clusters at LAION scale. Cross-cell pairs are missed BY DESIGN
(SemDeDup's stated approximation); the oracle replays the same algorithm,
and tests/test_similarity.py pins soundness (output ⊆ the exact pair set)
plus measured recall vs dedup_embedding."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gpu_mapreduce_spark.operators import similarity
from gpu_mapreduce_spark.queries.similarity import (
    _AT_REST_SCHEMA,
    _IVF_CENTROIDS,
    _IVF_SEED,
    DUP_T_E6,
    IVF_ASSIGN_CTES,
    _ivf_at_rest,
    _qsim_sql,
)
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table


@register(
    "dedup_semantic",
    bench=True,
    tags=("llm", "dedup", "similarity", "clustering"),
    oracle=f"""
        WITH {IVF_ASSIGN_CTES}
        SELECT cid, a, b, sim_e6 FROM (
            SELECT sa.cid, sa.vec_id AS a, sb.vec_id AS b,
                   {_qsim_sql("sa.embedding", "sb.embedding")} AS sim_e6
            FROM assigned sa JOIN assigned sb USING (cid)
            WHERE sa.vec_id < sb.vec_id
        ) WHERE sim_e6 >= {DUP_T_E6}
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-IVF-cell near-duplicate pairs at the shared {DUP_T_E6}/1e6
    cosine threshold: (cid, a, b, sim_e6). The cluster-bounded candidate
    topology of SemDeDup — density-following where LSH bands are random —
    implemented as one cid equi-join over the AT-REST cell assignment
    (queries/similarity._ivf_at_rest): the candidate join's two sides read
    the cid-partitioned parquet index, so the query's steady-state cost is
    read+join regardless of which IVF consumer ran first (the r05
    order-dependent-baseline fix — previously it was only inside its bench
    band when another query had populated the in-session memo)."""
    _, path = _ivf_at_rest(spark, sf_dir)
    cells = spark.read.schema(_AT_REST_SCHEMA).parquet(path)
    return similarity.dup_pairs_semantic(
        table(spark, sf_dir, "embeddings"),
        threshold_e6=DUP_T_E6,
        n_centroids=_IVF_CENTROIDS,
        seed=_IVF_SEED,
        cells=cells,
    )
