"""Embedding storage/compression queries (beyond-reference LLM-pipeline
layer): int8 quantization of the `embeddings` base table.

Registered LAST (registry.load_all import order) deliberately: a brand-new
query carries only local-parity evidence, so under the staleness-ordered
driver window (SURVEY §2.6) it must not displace a query that has never
had a driver row — it queues behind the current round's 50-slot window and
enters the next round's window automatically."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gpu_mapreduce_spark.operators import similarity
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table


@register(
    "embedding_quantize_int8",
    tags=("llm", "similarity", "compression"),
    oracle="""
        WITH s AS (
            SELECT vec_id, embedding,
                   list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
            FROM embeddings
        ),
        qz AS (
            SELECT vec_id, embedding, scale,
                   CASE WHEN scale > 0
                        THEN list_transform(embedding,
                             x -> CAST(FLOOR(CAST(x AS DOUBLE) / scale + 0.5)
                                       AS INTEGER))
                        ELSE list_transform(embedding, x -> 0) END AS q
            FROM s
        )
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS n_dims,
               scale,
               CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1,
               CAST(list_max(list_transform(q, x -> abs(x))) AS INT) AS q_max,
               list_max(list_transform(generate_series(1, len(embedding)),
                   i -> abs(CAST(embedding[i] AS DOUBLE) - q[i] * scale)))
                   AS max_abs_err
        FROM qz
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization + reconstruction-error report
    (operators/similarity.quantize_int8): scale, L1 mass and max magnitude
    of the quantized vector, max absolute reconstruction error — all from
    one scan-shaped projection. The DuckDB oracle replays the identical
    per-element IEEE arithmetic, so even the double-typed outputs
    hash-match."""
    return similarity.quantize_int8(table(spark, sf_dir, "embeddings"))
