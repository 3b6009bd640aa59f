"""Matryoshka truncation evaluation (r09 tail registration; SCALE.md r10
fresh design 2, landed early) — the embedding-tier dual of ann_pq_recall
on the DIMENSION axis: matryoshka-trained embeddings promise that a
prefix of the vector is a usable cheaper embedding, and the deployment
question is how much recall the prefix keeps. This registration makes
that a hash-gated number: recall@k of cosine top-k on the FIRST
16 of 64 dims against the full-dimension exact top-k, per
query plus pooled (operators/similarity.recall_at_k, the shared
recall_tail oracle skeleton).

Both sides are the sanctioned brute-force scan over the bounded query
set; the truncated side slices inside the scan projection (slice(...) on
both the corpus and query vectors before the same zip_with fold), so the
plan reads the embedding column once and the 4x-narrower arithmetic is
visible in the fold length, not in a second pass. All integers past the
sim_e6 quantization floor — DuckDB replays the sliced fold with
generate_series(1, 16).

100 TB: the evaluation is |Q|-bounded like every recall report here; the
OPERATIONAL consequence of a good prefix recall is that the at-rest
index stores the prefix (4x less IO per probe) — which is a storage
layout choice this report justifies, not a new operator."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import similarity
from gpu_mapreduce_spark.operators.similarity import EMB_DIM
from gpu_mapreduce_spark.queries.ann_pq import recall_tail
from gpu_mapreduce_spark.queries.similarity import (
    _qsim_sql,
    _queries,
    N_QUERIES,
    TOP_K,
)
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_TRUNC = 16  # evaluated prefix length (the 4x-cheaper deployment tier)
assert _TRUNC < EMB_DIM  # a prefix, never the whole vector


def _qsim_trunc_sql(a: str, b: str, d: int) -> str:
    """Quantized cosine over the first d dims — the _qsim_sql fold with
    generate_series(1, d) everywhere (dot AND both norms), matching the
    Spark side's slice-then-fold exactly."""
    dot = (
        f"list_sum(list_transform(generate_series(1, {d}),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )
    na = (
        f"sqrt(list_sum(list_transform(generate_series(1, {d}),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )
    nb = (
        f"sqrt(list_sum(list_transform(generate_series(1, {d}),"
        f" i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))"
    )
    return f"CAST(FLOOR(1e6 * ({dot} / ({na} * {nb}))) AS BIGINT)"


@register(
    "mrl_truncation_recall",
    tags=("llm", "similarity"),
    oracle=f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe
                   FROM embeddings WHERE vec_id < {N_QUERIES}),
        approx AS (
            SELECT qid, vec_id FROM (
                SELECT q.qid, e.vec_id,
                       {_qsim_trunc_sql("e.embedding", "q.qe", _TRUNC)}
                           AS sim_e6
                FROM embeddings e, q
                WHERE e.vec_id <> q.qid
            )
            QUALIFY row_number() OVER (PARTITION BY qid
                                       ORDER BY sim_e6 DESC, vec_id)
                    <= {TOP_K}
        ),
        exact AS (
            SELECT qid, vec_id FROM (
                SELECT q.qid, e.vec_id,
                       {_qsim_sql("e.embedding", "q.qe")} AS sim_e6
                FROM embeddings e, q
                WHERE e.vec_id <> q.qid
            )
            QUALIFY row_number() OVER (PARTITION BY qid
                                       ORDER BY sim_e6 DESC, vec_id)
                    <= {TOP_K}
        ),
        {recall_tail(TOP_K).lstrip()}
    """,
)
def mrl_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@{TOP_K} of the {_TRUNC}-dim prefix vs the full {EMB_DIM}-dim
    exact top-k: per-query rows (qid, n_hits, recall_u) plus the pooled
    qid = -1 row — the matryoshka deployment report."""
    emb = table(spark, sf_dir, "embeddings")
    q = _queries(spark, sf_dir)
    emb_t = emb.select(
        "vec_id", F.slice("embedding", 1, _TRUNC).alias("embedding")
    )
    q_t = q.select("qid", F.slice("qe", 1, _TRUNC).alias("qe"))
    approx = similarity.cosine_topk(emb_t, q_t, k=TOP_K)
    exact = similarity.cosine_topk(emb, q, k=TOP_K)
    return similarity.recall_report(approx, exact, TOP_K)
