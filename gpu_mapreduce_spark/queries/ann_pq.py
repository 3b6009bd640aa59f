"""Product-quantization serving tier (r09 tail registrations; SCALE.md r10
design set 2): the corpus PQ-encoded to PQ_M one-byte codes per vector and
served by ADC lookup-table scans — the compression layout every production
vector store (FAISS IVFPQ, ScaNN) keeps its billion-vector tier in.

Two registrations:
  ann_pq_topk    the serving path: top-k per query by asymmetric
                 inner-product score over the CODES table (the embedding
                 payload appears nowhere in the plan — it is 32x smaller
                 at rest, the whole point at 100 TB).
  ann_pq_recall  the honesty metric: recall@k of the PQ path against the
                 exact brute-force top-k via operators/similarity.
                 recall_at_k — PQ is deliberately lossier than IVF-flat
                 (codes approximate the vector itself, not just its cell),
                 so its recall is the number a store publishes to justify
                 the compression.

Determinism: codebook training is two portable md5-rank picks (corpus ->
bounded train sample -> per-subspace codewords; operators/similarity.
pq_codebooks), encoding is argmin quantized squared-L2 with ties to the
lower code, scores are sums of floor(1e6 * <q_sub, codeword>) BIGINTs —
every stage replays verbatim in DuckDB (same hash, same fold order, same
tie-breaks), so both registrations carry full hash-gate oracles even
though the PATH is approximate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import similarity
from gpu_mapreduce_spark.operators.similarity import (
    PQ_KS,
    PQ_M,
    PQ_SEED,
    PQ_SUB,
    PQ_TRAIN,
)
from gpu_mapreduce_spark.queries.similarity import (
    _qsim_sql,
    _queries,
    N_QUERIES,
    TOP_K,
)
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources import fixtures
from gpu_mapreduce_spark.sources.tables import table


def _pq_index(
    spark: SparkSession, sf_dir: str
) -> tuple[dict[int, list[tuple[int, list[float]]]], DataFrame]:
    """Session-memoized PQ index: (codebooks as driver-side literals —
    PQ_M * PQ_KS rows, the centroid bounded-scalar discipline — and the
    eagerly checkpointed codes table). Built once per (session, sf_dir);
    every PQ consumer scans the same at-rest artifact, the _ivf_index
    amortization."""

    def build() -> tuple[dict[int, list[tuple[int, list[float]]]], DataFrame]:
        emb = table(spark, sf_dir, "embeddings")
        books = similarity._books_rows(similarity.pq_codebooks(emb))
        codes = similarity.pq_encode(emb, books).localCheckpoint(eager=True)
        return books, codes

    return fixtures.derived(spark, sf_dir, "pq_index", build)


def _qsq_sql(p: str) -> str:
    """Quantized squared-L2 fragment for the {p}books join (replays
    operators/similarity._qsq_e6's fold order)."""
    return (
        f"CAST(FLOOR(1e6 * list_sum(list_transform(generate_series(1, {PQ_SUB}),"
        f" i -> (CAST(e.embedding[b.m * {PQ_SUB} + i] AS DOUBLE) - CAST(b.cw[i] AS DOUBLE))"
        f" * (CAST(e.embedding[b.m * {PQ_SUB} + i] AS DOUBLE) - CAST(b.cw[i] AS DOUBLE)))))"
        " AS BIGINT)"
    )


def pq_ctes(prefix: str = "", train_where: str = "", source: str = "embeddings") -> str:
    """SQL replay of pq_codebooks + pq_encode: CTEs {prefix}pq_train /
    {prefix}pq_books / {prefix}pq_assigned (per-vector-per-subspace winning
    code). `prefix` + `train_where` follow the ivf_assign_ctes discipline
    (lifted here for SCALE.md's r10 ann_ivfpq_append design: codebooks
    trained on the EXISTING split stay frozen while the full corpus
    encodes under them); `source` lets the chain run over a derived
    (vec_id, embedding) CTE instead of the base table — the residual
    projection of ann_pq_residual trains and encodes over residuals
    through the exact same replay. The unprefixed instance is
    module-level PQ_CTES."""
    p = prefix
    return f"""
        {p}pq_train AS (
            SELECT vec_id, embedding FROM (
                SELECT vec_id, embedding,
                       row_number() OVER (ORDER BY
                           ('0x' || substr(md5('{PQ_SEED}' || '|' ||
                               CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
                           vec_id) AS trn
                FROM {source} {train_where}
            ) WHERE trn <= {PQ_TRAIN}
        ),
        {p}pq_books AS (
            SELECT m, code, cw FROM (
                SELECT m.m, t.vec_id,
                       row_number() OVER (PARTITION BY m.m ORDER BY
                           ('0x' || substr(md5('{PQ_SEED}' || '|' ||
                               CAST(m.m AS VARCHAR) || '|' ||
                               CAST(t.vec_id AS VARCHAR)), 1, 15))::BIGINT,
                           t.vec_id) AS code,
                       list_transform(generate_series(1, {PQ_SUB}),
                                      i -> t.embedding[m.m * {PQ_SUB} + i])
                           AS cw
                FROM {p}pq_train t, (SELECT unnest(range(0, {PQ_M})) AS m) m
            ) WHERE code <= {PQ_KS}
        ),
        {p}pq_assigned AS (
            SELECT vec_id, m, code FROM (
                SELECT e.vec_id, b.m, b.code,
                       row_number() OVER (PARTITION BY e.vec_id, b.m
                           ORDER BY {_qsq_sql(p)} ASC, b.code) AS rn
                FROM {source} e, {p}pq_books b
            ) WHERE rn = 1
        )"""


PQ_CTES = pq_ctes()

_PQ_TOPK_SELECT = f"""
        pq_q AS (SELECT vec_id AS qid, embedding AS qe
                 FROM embeddings WHERE vec_id < {N_QUERIES}),
        pq_lut AS (
            SELECT q.qid, b.m, b.code,
                   CAST(FLOOR(1e6 * list_sum(list_transform(
                       generate_series(1, {PQ_SUB}),
                       i -> CAST(q.qe[b.m * {PQ_SUB} + i] AS DOUBLE)
                          * CAST(b.cw[i] AS DOUBLE)))) AS BIGINT) AS l_e6
            FROM pq_q q, pq_books b
        ),
        pq_scored AS (
            SELECT l.qid, a.vec_id, CAST(SUM(l.l_e6) AS BIGINT) AS score_e6
            FROM pq_assigned a
            JOIN pq_lut l ON a.m = l.m AND a.code = l.code
            WHERE a.vec_id <> l.qid
            GROUP BY l.qid, a.vec_id
        ),
        pq_topk AS (
            SELECT qid, vec_id, score_e6 FROM pq_scored
            QUALIFY row_number() OVER (PARTITION BY qid
                                       ORDER BY score_e6 DESC, vec_id)
                    <= {TOP_K}
        )"""


@register(
    "ann_pq_topk",
    bench=True,
    tags=("llm", "similarity"),
    oracle=f"""
        WITH {PQ_CTES.lstrip()},
        {_PQ_TOPK_SELECT.lstrip()}
        SELECT qid, vec_id, score_e6 FROM pq_topk
    """,
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC approximate top-{TOP_K}: one scan over the 8-int-per-vector
    codes table per query batch, scores = summed LUT lookups, rank
    (score_e6 DESC, vec_id). The plan touches codes only — no embedding
    column anywhere past the one-time session-memoized build."""
    books, codes = _pq_index(spark, sf_dir)
    return similarity.pq_adc_topk(
        codes, _queries(spark, sf_dir), books, k=TOP_K
    )


def recall_tail(k: int) -> str:
    """Shared recall@k oracle tail: expects CTEs `approx` and `exact`
    (qid, vec_id) to be in scope; emits per-query rows + the pooled
    qid = -1 row (the operators/similarity.recall_at_k contract,
    dedup-before-intersect included). Used by ann_recall_report (IVF) and
    ann_pq_recall (PQ)."""
    return f"""
        hits AS (
            SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM (SELECT DISTINCT qid, vec_id FROM approx) a
            JOIN (SELECT DISTINCT qid, vec_id FROM exact) e
                 USING (qid, vec_id)
            GROUP BY qid
        ),
        per AS (
            SELECT b.qid,
                   CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                   CAST((10000 * coalesce(h.n_hits, 0)) // {k}
                        AS BIGINT) AS recall_u
            FROM (SELECT DISTINCT qid FROM exact) b
            LEFT JOIN hits h USING (qid)
        )
        SELECT qid, n_hits, recall_u FROM per
        UNION ALL
        SELECT CAST(-1 AS BIGINT),
               CAST(SUM(n_hits) AS BIGINT),
               CAST((10000 * SUM(n_hits)) // (COUNT(*) * {k}) AS BIGINT)
        FROM per"""


@register(
    "ann_pq_recall",
    tags=("llm", "similarity"),
    oracle=f"""
        WITH {PQ_CTES.lstrip()},
        {_PQ_TOPK_SELECT.lstrip()},
        approx AS (SELECT qid, vec_id FROM pq_topk),
        exact AS (
            SELECT qid, vec_id FROM (
                SELECT q.qid, e.vec_id,
                       {_qsim_sql("e.embedding", "q.qe")} AS sim_e6
                FROM embeddings e, pq_q q
                WHERE e.vec_id <> q.qid
            )
            QUALIFY row_number() OVER (PARTITION BY qid
                                       ORDER BY sim_e6 DESC, vec_id)
                    <= {TOP_K}
        ),
        {recall_tail(TOP_K).lstrip()}
    """,
)
def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@{TOP_K} of the PQ-ADC path vs exact brute force — the
    compression-honesty report (per-query rows + pooled qid = -1 row,
    the ann_recall_report shape). Expected to trail IVF-flat's recall:
    ADC approximates the candidate vectors themselves, and the report is
    exactly where that loss becomes a published number."""
    books, codes = _pq_index(spark, sf_dir)
    approx = similarity.pq_adc_topk(
        codes, _queries(spark, sf_dir), books, k=TOP_K
    )
    exact = similarity.cosine_topk(
        table(spark, sf_dir, "embeddings"), _queries(spark, sf_dir), k=TOP_K
    )
    return similarity.recall_report(approx, exact, TOP_K)
