"""Index-quality evaluation: recall@k of the at-rest IVF index against the
exact brute-force top-k (r09 tail registration; SCALE.md r10 design 1,
landed early) — the metric a vector store publishes per index build/retrain
to tune nprobe and decide when ivf_index_swap is due.

Both sides are already-oracled machinery: the approximate path is the
directory-pruned probe of the persisted cid-partitioned index
(queries/ann_at_rest._probe_pruned — partition pruning asserted in
tests/test_plan_audit.py) and the exact path is the one brute-force pass
the evaluation schedules (operators/similarity.cosine_topk, the
ann_bruteforce_topk plan). recall@k intersects them on (qid, vec_id) with
both projections deduplicated first — a multi-probe union may repeat a
candidate, and a repeat must count ONE hit, never multiply through the
join past n_hits > k (operators/similarity.recall_at_k).

Output: one row per query (qid, n_hits, recall_u) in exact fixed-point
units recall_u = (10000 * hits) div k, plus ONE aggregate row qid = -1
with the pooled recall over all queries — exact integers end to end, so
the oracle replays verbatim.

100 TB posture: this is an evaluation harness over the bounded standard
query set (|Q| small by construction), not a serving path — the report
costs one directory-pruned probe per query plus one exact scan for the
SAME bounded set; every downstream stage is |Q|·k-sized. A store runs it
per retrain; the exact side is the only corpus-sized pass and it is the
one the evaluation deliberately schedules.

Reference parity: the reference ships no vector index; the evaluate-
against-exact shape mirrors its test strategy of replaying a reference
implementation beside the optimized path (SURVEY §5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import similarity
from gpu_mapreduce_spark.queries.ann_at_rest import _probe_pruned
from gpu_mapreduce_spark.queries.similarity import (
    _IVF_NPROBE,
    _ivf_at_rest,
    _qsim_sql,
    _queries,
    IVF_ASSIGN_CTES,
    N_QUERIES,
    TOP_K,
)
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_RECALL_ORACLE = f"""
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
        approx AS (
            SELECT qid, vec_id FROM (
                SELECT p.qid, a.vec_id,
                       {_qsim_sql("a.embedding", "p.qe")} AS sim_e6
                FROM assigned a JOIN probes p USING (cid)
                WHERE a.vec_id <> p.qid
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
                   CAST((10000 * coalesce(h.n_hits, 0)) // {TOP_K}
                        AS BIGINT) AS recall_u
            FROM (SELECT DISTINCT qid FROM exact) b
            LEFT JOIN hits h USING (qid)
        )
        SELECT qid, n_hits, recall_u FROM per
        UNION ALL
        SELECT CAST(-1 AS BIGINT),
               CAST(SUM(n_hits) AS BIGINT),
               CAST((10000 * SUM(n_hits)) // (COUNT(*) * {TOP_K}) AS BIGINT)
        FROM per
    """


@register(
    "ann_recall_report",
    bench=True,
    tags=("llm", "similarity", "pushdown"),
    oracle=_RECALL_ORACLE,
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@{TOP_K} of the persisted IVF index vs exact brute force:
    per-query rows (qid, n_hits, recall_u) from
    operators/similarity.recall_at_k plus the pooled qid = -1 row
    ((10000 * total hits) div (|Q| * k)). Probes the session-memoized
    at-rest index (the one-time build amortized across the round); the
    exact side is one deliberate brute-force pass over the same bounded
    query set."""
    centroids, path = _ivf_at_rest(spark, sf_dir)
    approx = _probe_pruned(spark, sf_dir, centroids, path)
    exact = similarity.cosine_topk(
        table(spark, sf_dir, "embeddings"), _queries(spark, sf_dir), k=TOP_K
    )
    return similarity.recall_report(approx, exact, TOP_K)
