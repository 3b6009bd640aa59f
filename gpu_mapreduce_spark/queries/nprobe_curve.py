"""IVF nprobe tuning curve (r09 tail registration; SCALE.md r10 third
slate, design 2, landed early) — the recall/cost frontier a vector store
publishes to pick its operating point, where ann_recall_report stops at
one point: for nprobe in {1, 2, 4, 8}, pooled recall@k of the at-rest IVF
probe against the exact brute-force top-k AND the probed-candidate count
(the cost axis: how many (query, candidate) pairs the probe actually
scored).

Output: one row per operating point — (nprobe, n_probed, n_hits,
recall_u) with recall_u = (10000 * n_hits) div (|Q| * k). The whole curve
is |Q|-bounded work: ONE exact pass shared across all points, one
directory-pruned probe per nprobe. The per-point hit and candidate counts
cross the driver as bounded scalars (eight numbers — the pagerank scalar
discipline; the assembled 4-row report is a createDataFrame of driver
integers, exactly like bpe_merge_steps' merge table), and the driver-side
recall division is the same non-negative integer floor division the
oracle runs.

100 TB: each point's probe touches nprobe/n_centroids of the corpus via
directory pruning (the ann_ivf_at_rest plan); the exact side is the one
deliberate brute-force pass every recall evaluation schedules. A store
runs this curve per retrain and picks the knee."""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import similarity
from gpu_mapreduce_spark.queries.similarity import (
    _ivf_at_rest,
    _qsim_sql,
    _queries,
    IVF_ASSIGN_CTES,
    N_QUERIES,
    TOP_K,
)
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_POINTS = (1, 2, 4, 8)
_AT_REST_SCHEMA = "vec_id bigint, embedding array<float>, cid int"


def _point_ctes(np: int) -> str:
    return f"""
        probes{np} AS (
            SELECT qid, qe, cid FROM (
                SELECT q.qid, q.qe, c.cid,
                       row_number() OVER (PARTITION BY q.qid
                           ORDER BY {_qsim_sql("q.qe", "c.ce")} DESC, c.cid)
                           AS rn
                FROM q, centroids c
            ) WHERE rn <= {np}
        ),
        cand{np} AS (
            SELECT p.qid, a.vec_id,
                   {_qsim_sql("a.embedding", "p.qe")} AS sim_e6
            FROM assigned a JOIN probes{np} p USING (cid)
            WHERE a.vec_id <> p.qid
        ),
        topk{np} AS (
            SELECT qid, vec_id FROM cand{np}
            QUALIFY row_number() OVER (PARTITION BY qid
                                       ORDER BY sim_e6 DESC, vec_id)
                    <= {TOP_K}
        )"""


def _point_select(np: int) -> str:
    return f"""
        SELECT CAST({np} AS BIGINT) AS nprobe,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM cand{np}) AS n_probed,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM topk{np} t JOIN exact e USING (qid, vec_id)) AS n_hits,
               (SELECT CAST((10000 * COUNT(*)) // ({N_QUERIES} * {TOP_K})
                            AS BIGINT)
                FROM topk{np} t JOIN exact e USING (qid, vec_id))
                   AS recall_u"""


@register(
    "nprobe_tuning_curve",
    tags=("llm", "similarity", "pushdown"),
    oracle=f"""
        WITH {IVF_ASSIGN_CTES.lstrip()},
        q AS (SELECT vec_id AS qid, embedding AS qe
              FROM embeddings WHERE vec_id < {N_QUERIES}),
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
        {",".join(_point_ctes(np).lstrip() for np in _POINTS)}
        {" UNION ALL ".join(_point_select(np) for np in _POINTS)}
    """,
)
def nprobe_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nprobe, n_probed, n_hits, recall_u) for nprobe in {_POINTS} over
    the session-memoized at-rest IVF index vs one shared exact pass."""
    centroids, path = _ivf_at_rest(spark, sf_dir)
    queries = _queries(spark, sf_dir).localCheckpoint(eager=True)
    exact = (
        similarity.cosine_topk(
            table(spark, sf_dir, "embeddings"), queries, k=TOP_K
        )
        .select("qid", "vec_id")
        .localCheckpoint(eager=True)
    )
    rows = []
    for np in _POINTS:
        probes = similarity.ivf_probes(
            queries, centroids, nprobe=np
        ).localCheckpoint(eager=True)
        cids = sorted({r.cid for r in probes.select("cid").collect()})
        cells = (
            spark.read.schema(_AT_REST_SCHEMA)
            .parquet(path)
            .filter(F.col("cid").isin(cids))
        )
        # n_probed is observed on the rerank's OWN candidate stream (r15;
        # guide §2.4): the old cand.count() was a second full scan of the
        # probed cells per curve point just for one scalar
        obs = Observation()
        cand = similarity.ivf_candidates(cells, probes).observe(
            obs, F.count(F.lit(1)).alias("n")
        )
        topk = similarity.ivf_rerank(
            cells, probes, k=TOP_K, cand=cand
        ).select("qid", "vec_id")
        n_hits = topk.join(exact, ["qid", "vec_id"]).count()  # bounded
        n_probed = obs.get["n"]
        rows.append(
            (
                np,
                n_probed,
                n_hits,
                (10000 * n_hits) // (N_QUERIES * TOP_K),
            )
        )
    return spark.createDataFrame(
        rows, schema="nprobe bigint, n_probed bigint, n_hits bigint, recall_u bigint"
    )
