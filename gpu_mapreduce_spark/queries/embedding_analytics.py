"""Embedding-matrix analytics (beyond-reference LLM-pipeline layer):
dominant principal direction by power iteration. Tail-registered per the
SURVEY §2.6 discipline.

Oracle strategy: the iteration is round-bounded (like pagerank), so the
oracle unrolls the exact recurrence as a generated CTE chain in ROW form —
the direction state is 64 (j, vu) rows, each round two joins against the
embeddings table and two integer aggregates. Every arithmetic step matches
the Spark operator bit-for-bit (see
operators/similarity.power_iteration_top_direction's exactness
discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gpu_mapreduce_spark.operators import similarity
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_DIM = 64
_ROUNDS = 6
_VSCALE = 1_000_000


def _pi_oracle(dim: int = _DIM, rounds: int = _ROUNDS, vscale: int = _VSCALE) -> str:
    parts = [
        f"""WITH idx AS MATERIALIZED (
            SELECT CAST(j AS INT) AS j FROM generate_series(0, {dim - 1}) t(j)
        ),
        v0 AS MATERIALIZED (
            SELECT j, CAST({vscale} AS BIGINT) AS vu FROM idx
        )"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""", d{i} AS MATERIALIZED (
                SELECT e.vec_id,
                       SUM(CAST(FLOOR(CAST(e.embedding[v.j + 1] AS DOUBLE)
                                      * v.vu) AS BIGINT))
                           AS dot_u
                FROM embeddings e JOIN v{i - 1} v ON true
                GROUP BY e.vec_id
            ), w{i} AS MATERIALIZED (
                SELECT t.j,
                       SUM(CAST(FLOOR(d.dot_u *
                                CAST(e.embedding[t.j + 1] AS DOUBLE))
                                AS BIGINT)) AS wu
                FROM embeddings e
                JOIN d{i} d ON d.vec_id = e.vec_id
                JOIN idx t ON true
                GROUP BY t.j
            ), m{i} AS MATERIALIZED (
                -- the 1-floor mirrors the Spark side's `or 1`: on a
                -- degenerate all-zero round both engines emit zeros
                -- instead of one erroring on divide-by-zero
                SELECT CASE WHEN COALESCE(MAX(ABS(wu)), 0) = 0 THEN 1
                            ELSE MAX(ABS(wu)) END AS m FROM w{i}
            ), v{i} AS MATERIALIZED (
                SELECT j,
                       CAST(CASE WHEN wu < 0
                                 THEN -(((-wu) * {vscale}) // m)
                                 ELSE ((wu * {vscale}) // m)
                            END AS BIGINT) AS vu
                FROM w{i}, m{i}
            )"""
        )
    parts.append(f"SELECT j, vu FROM v{rounds} ORDER BY j")
    return "\n".join(parts)


@register(
    "embedding_top_direction",
    tags=("llm", "embedding", "iterative"),
    oracle=_pi_oracle(),
)
def embedding_top_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding matrix's dominant principal direction (top right
    singular vector / first uncentered-PCA component) in {_VSCALE} units —
    the drift/whitening diagnostic a vector pipeline runs over its corpus.
    {_ROUNDS} power-iteration rounds, exact integer state; per round one
    corpus scan + a 64-group partial aggregate, only the 64-row direction
    crossing the driver (the kmeans/MLlib iterative-state shape)."""
    return similarity.power_iteration_top_direction(
        table(spark, sf_dir, "embeddings"),
        dim=_DIM,
        rounds=_ROUNDS,
        vscale=_VSCALE,
    )
