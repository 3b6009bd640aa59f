"""Similarity-search queries over the `embeddings` base table.

ann_bruteforce_topk is the oracle-checked correctness baseline (the DuckDB
oracle is the same brute-force scan); ann_lsh_topk registers rows-only
(xxhash64-derived hyperplanes) with recall asserted in
tests/test_similarity.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import similarity
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

N_QUERIES = 5  # query set = vec_id 0..4
TOP_K = 10


def _queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )


_DOT = (
    "list_sum(list_transform(generate_series(1, len(e.embedding)),"
    " i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))"
)
_NORM_E = (
    "sqrt(list_sum(list_transform(e.embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)
_NORM_Q = (
    "sqrt(list_sum(list_transform(q.qe,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


@register(
    "ann_bruteforce_topk",
    bench=True,
    tags=("llm", "similarity"),
    oracle=f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe
                   FROM embeddings WHERE vec_id < {N_QUERIES})
        SELECT qid, vec_id, sim_e6 FROM (
            SELECT q.qid, e.vec_id,
                   CAST(FLOOR(1e6 * ({_DOT} / ({_NORM_E} * {_NORM_Q}))) AS BIGINT)
                       AS sim_e6
            FROM embeddings e, q
            WHERE e.vec_id <> q.qid
        )
        QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim_e6 DESC, vec_id)
                <= {TOP_K}
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-{TOP_K} for {N_QUERIES} query vectors — one corpus
    pass, query side broadcast, similarity quantized to sim_e6 so ranking
    ties are impossible across engines."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, _queries(spark, sf_dir), k=TOP_K)


@register("ann_lsh_topk", tags=("llm", "similarity"))
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed approximate top-k (the scale path: corpus
    bucketed once, queries probe their buckets). Rows-only; recall@k vs the
    brute-force baseline asserted in tests."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(emb, _queries(spark, sf_dir), k=TOP_K)


@register("ann_ivf_topk", tags=("llm", "similarity"))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat approximate top-k: hash-sampled centroid cells assigned
    once, each query exhaustively re-ranks only its nprobe nearest cells.
    Rows-only (centroid choice is xxhash64-seeded); recall@k vs the
    brute-force baseline asserted in tests."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, _queries(spark, sf_dir), k=TOP_K, n_centroids=16, nprobe=4
    )


DUP_T_E6 = 400_000  # cosine >= 0.4 — the synthetic embeddings are near-random,
#                     so higher (realistic) thresholds would select zero pairs


@register(
    "dedup_embedding",
    tags=("llm", "dedup", "similarity"),
    oracle=f"""
        SELECT * FROM (
            SELECT a.vec_id AS a, b.vec_id AS b,
                   CAST(FLOOR(1e6 * (
                       list_sum(list_transform(generate_series(1, len(a.embedding)),
                           i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                          * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                   )) AS BIGINT) AS sim_e6
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ) WHERE sim_e6 >= {DUP_T_E6}
    """,
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact baseline): all (a < b)
    with quantized cosine >= {DUP_T_E6}/1e6. The oracle is the same
    all-pairs scan; the corpus^2-free path is dedup_embedding_lsh."""
    return similarity.dup_pairs(
        table(spark, sf_dir, "embeddings"), threshold_e6=DUP_T_E6
    )


@register(
    "dedup_embedding_lsh",
    tags=("llm", "dedup", "similarity"),
    oracle=f"""
        SELECT * FROM (
            SELECT a.vec_id AS a, b.vec_id AS b,
                   CAST(FLOOR(1e6 * (
                       list_sum(list_transform(generate_series(1, len(a.embedding)),
                           i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                          * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                   )) AS BIGINT) AS sim_e6
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ) WHERE sim_e6 >= {DUP_T_E6}
    """,
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH banded candidates + exact cosine verification — the
    scale path for embedding near-dup.

    Oracle = the EXACT all-pairs scan (same SQL as dedup_embedding):
    verification makes output == exact set iff LSH recall is 1, and the
    seeded hyperplanes are deterministic, so equality either holds for the
    fixed fixture (verified at sf0.001/sf0.01) or the driver hash-mismatches
    — a recall regression is what this gate exists to catch."""
    return similarity.dup_pairs_lsh(
        table(spark, sf_dir, "embeddings"), threshold_e6=DUP_T_E6
    )
