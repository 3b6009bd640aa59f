"""Filtered vector search (r12 tail registration; the SCALE.md r13
ann_filtered_topk design, landed in-round) — top-k under a metadata
predicate, THE production ANN shape the serving tier lacked: "nearest
{TOP_K} among vectors with label = {_LABEL}". The design axis is
pre-filter vs post-filter — post-filtering an unfiltered top-k
UNDER-FILLS when the predicate is selective (a top-10 with ~10%
selectivity keeps ~1 row); the honest plan pushes the predicate INTO
the probe: the cid-partitioned at-rest index is directory-pruned to the
probed cells (ann_ivf_at_rest's scan), the survivors semi-join the
predicate's id set BEFORE scoring, and the exact top-k runs among
survivors only — full k results, never an under-filled page.

The at-rest layout deliberately carries NO metadata columns
(vec_id, embedding, cid — one index serves every predicate), so the
predicate arrives as an id-set join, broadcast at fixture scale; at
cluster scale a selective predicate ships as a bloom filter or
sort-merge semi-join against the cid-partitioned layout — the plan
shape is unchanged, only the join strategy moves (documented, not
hidden). Selectivity multiplies effective nprobe, so the registration
also reports CANDIDATES-PER-QUERY as (qid, -1, n) rows — the
nprobe_curve cost story extended to the filtered case: at label
selectivity ~1/10, each query exact-scores ~1/10 of its probed cells'
rows.

Oracle: the IVF serving plan is deterministic (portable-hash centroid
sampling, integer quantized cosine, packed tie-breaks), so DuckDB
replays probe + filter + top-k + the candidate counts exactly —
IVF_ORACLE's CTEs with the label join added. Recall vs FILTERED brute
force and the all-results-satisfy-the-predicate soundness law are
pinned in tests/test_ann_filtered.py, outside the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import similarity
from gpu_mapreduce_spark.queries.similarity import (
    _AT_REST_SCHEMA,
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

_LABEL = 7  # the registered predicate: label = 7 (~10% selectivity)


@register(
    "ann_filtered_topk",
    tags=("llm", "similarity", "pushdown"),
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
            SELECT p.qid, a.vec_id,
                   {_qsim_sql("a.embedding", "p.qe")} AS sim_e6
            FROM assigned a
            JOIN probes p USING (cid)
            JOIN embeddings e ON e.vec_id = a.vec_id
            WHERE a.vec_id <> p.qid AND e.label = {_LABEL}
        )
        SELECT qid, vec_id, sim_e6 FROM (
            SELECT qid, vec_id, sim_e6 FROM cand
            QUALIFY row_number() OVER (PARTITION BY qid
                        ORDER BY sim_e6 DESC, vec_id) <= {TOP_K}
            UNION ALL
            SELECT qid, CAST(-1 AS BIGINT) AS vec_id,
                   CAST(COUNT(*) AS BIGINT) AS sim_e6
            FROM cand GROUP BY qid
        ) ORDER BY qid, vec_id
    """,
)
def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-pushed IVF search against the at-rest index: top-{TOP_K}
    per query among label-{_LABEL} vectors in the probed cells, plus
    per-query candidate counts as (qid, -1, n) — see module docstring."""
    centroids, path = _ivf_at_rest(spark, sf_dir)
    probes = similarity.ivf_probes(
        _queries(spark, sf_dir), centroids, nprobe=_IVF_NPROBE
    ).localCheckpoint(eager=True)
    probe_cids = sorted({r.cid for r in probes.select("cid").collect()})
    cells = spark.read.schema(_AT_REST_SCHEMA).parquet(path).filter(
        F.col("cid").isin(probe_cids)
    )
    # the predicate's id set joins BEFORE scoring (pre-filter); broadcast
    # at this scale — at 100 TB a bloom or sort-merge semi, same plan shape
    # bcast-audit: bounded (selectivity * |corpus| id rows, ids only)
    allowed = F.broadcast(
        table(spark, sf_dir, "embeddings")
        .filter(F.col("label") == _LABEL)
        .select("vec_id")
    )
    survivors = cells.join(allowed, "vec_id", "left_semi").localCheckpoint(
        eager=True
    )
    topk = similarity.ivf_rerank(survivors, probes, k=TOP_K)
    counts = (
        # bcast-audit: bounded (probe list ∝ query set)
        survivors.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("sim_e6"))
        .select("qid", F.lit(-1).cast("bigint").alias("vec_id"), "sim_e6")
    )
    return topk.unionByName(counts).orderBy("qid", "vec_id")
