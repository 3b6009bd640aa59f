"""Cross-encoder-style rerank of IVF candidates (r08 tail registration,
SCALE.md r08 design 2).

Stage 1 (retrieval): ann_ivf_topk's probe path against the at-rest
cid-partitioned index, widened to RERANK_M candidates per query — the
bounded candidate harvest (|Q| x m rows, candidates ∝ queries, never
all-pairs). Stage 2 (rerank): candidates re-fetch both embedding sides by
equi-join (the ann_at_rest fetch discipline) and re-score with a richer
EXACT function than the retrieval cosine — fixed-point integer dot product
plus a hot-dimension overlap count (operators/similarity.crossscore_rerank)
— standing in for the cross-encoder forward pass; a real model swaps into
the same scoring projection as an Arrow-batched pandas UDF without
changing the plan.

100 TB: stage-1 cost is the IVF probe (nprobe/n_centroids of the corpus by
directory pruning); stage-2 cost is |Q| x m score evaluations after two
key-joins whose small sides broadcast. The oracle replays both stages in
SQL — candidate selection via the shared IVF assignment CTEs, the score in
exact integer arithmetic.

Reference parity: beyond-reference similarity axis (builder brief); the
reference has no vector search."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gpu_mapreduce_spark.operators import similarity
from gpu_mapreduce_spark.queries.ann_at_rest import _probe_pruned
from gpu_mapreduce_spark.queries.similarity import (
    _IVF_NPROBE,
    _ivf_at_rest,
    _qsim_sql,
    IVF_ASSIGN_CTES,
    N_QUERIES,
    TOP_K,
    _queries,
)
from gpu_mapreduce_spark.registry import register

RERANK_M = 30  # stage-1 candidates per query handed to the reranker

_DIM = similarity.EMB_DIM
_FLOOR = similarity.CROSS_MAG_FLOOR
_W = similarity.CROSS_OVERLAP_W
_EU = f"CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * {similarity.CROSS_SCALE}) AS BIGINT)"
_QU = f"CAST(FLOOR(CAST(q.qe[i] AS DOUBLE) * {similarity.CROSS_SCALE}) AS BIGINT)"


@register(
    "ann_rerank_crossscore",
    bench=True,
    tags=("llm", "similarity"),
    oracle=f"""
        WITH {IVF_ASSIGN_CTES},
        q AS (SELECT vec_id AS qid, embedding AS qe
              FROM embeddings WHERE vec_id < {N_QUERIES}),
        probes AS (
            SELECT qid, qe, cid FROM (
                SELECT q.qid, q.qe, c.cid,
                       row_number() OVER (PARTITION BY q.qid
                           ORDER BY {_qsim_sql("q.qe", "c.ce")} DESC, c.cid) AS rn
                FROM q, centroids c
            ) WHERE rn <= {_IVF_NPROBE}
        ),
        cand AS (
            SELECT qid, vec_id FROM (
                SELECT p.qid, a.vec_id,
                       {_qsim_sql("a.embedding", "p.qe")} AS sim_e6
                FROM assigned a JOIN probes p USING (cid)
                WHERE a.vec_id <> p.qid
            )
            QUALIFY row_number() OVER (PARTITION BY qid
                ORDER BY sim_e6 DESC, vec_id) <= {RERANK_M}
        ),
        scored AS (
            SELECT c.qid, c.vec_id,
                   CAST(list_sum(list_transform(generate_series(1, {_DIM}),
                        i -> {_EU} * {_QU})) AS BIGINT) AS dot_u,
                   CAST(len(list_filter(generate_series(1, {_DIM}),
                        i -> abs({_EU}) >= {_FLOOR}
                         AND abs({_QU}) >= {_FLOOR})) AS INT) AS n_overlap
            FROM cand c
            JOIN embeddings e ON c.vec_id = e.vec_id
            JOIN q ON c.qid = q.qid
        )
        SELECT qid, vec_id, dot_u, n_overlap,
               dot_u + CAST({_W} AS BIGINT) * n_overlap AS rerank_score
        FROM scored
        QUALIFY row_number() OVER (PARTITION BY qid
            ORDER BY dot_u + CAST({_W} AS BIGINT) * n_overlap DESC, vec_id)
            <= {TOP_K}
    """,
)
def ann_rerank_crossscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: IVF probe (at-rest index, directory-pruned)
    harvests RERANK_M candidates per query; crossscore_rerank re-scores
    each (query, candidate) pair with the exact integer cross-score and
    keeps the top-{TOP_K} by (rerank_score DESC, vec_id)."""
    centroids, path = _ivf_at_rest(spark, sf_dir)
    cand = _probe_pruned(spark, sf_dir, centroids, path, k=RERANK_M).select(
        "qid", "vec_id"
    )
    from gpu_mapreduce_spark.sources.tables import table

    return similarity.crossscore_rerank(
        cand, table(spark, sf_dir, "embeddings"), _queries(spark, sf_dir),
        k=TOP_K,
    )
