"""Training-pipeline table maintenance ops (beyond-reference layer):
CDC-style merge/upsert, deterministic dataset split assignment, and the
hopping-window streaming dual (registered here, not in streaming_batch,
ONLY for tail registration order — SURVEY §2.6 discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.functions.numeric import sql_dsum
from gpu_mapreduce_spark.functions.portable import hash60
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table
from gpu_mapreduce_spark.streaming import pipeline as streaming_pipeline

# The delta batch is DERIVED from orders itself by disjoint key-residue
# classes, so both engines build the identical batch at every scale:
#   deletes  : o_orderkey % 131 == 7
#   updates  : o_orderkey % 7 == 3 (minus the delete class) — status 'U',
#              price bumped by 50.0000 fixed-point units
#   inserts  : o_orderkey % 97 == 5, re-keyed to key + 10^10 (disjoint from
#              every base key), status 'N'
_INS_SHIFT = 10_000_000_000


# not benched: the query's OUTPUT is the full merged table (the point of a
# MERGE), so a bench run would time the driver collect of ~165k rows at
# sf0.1, not the engine (bench discipline: headline results are small by
# construction)
@register(
    "orders_merge_upsert",
    tags=("pipeline", "cdc", "join"),
    oracle=f"""
        WITH base AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CAST(FLOOR(o_totalprice * 10000) AS BIGINT) AS price_u
            FROM orders
        ),
        delta AS (
            SELECT o_orderkey AS k, o_custkey AS d_custkey,
                   CAST(NULL AS VARCHAR) AS d_status,
                   CAST(NULL AS BIGINT) AS d_price_u, 'D' AS op
            FROM base WHERE o_orderkey % 131 = 7
            UNION ALL
            SELECT o_orderkey, o_custkey, 'U', price_u + 500000, 'U'
            FROM base WHERE o_orderkey % 131 <> 7 AND o_orderkey % 7 = 3
            UNION ALL
            SELECT o_orderkey + {_INS_SHIFT}, o_custkey, 'N', price_u, 'I'
            FROM base WHERE o_orderkey % 97 = 5
        )
        SELECT COALESCE(d.k, b.o_orderkey) AS o_orderkey,
               COALESCE(d.d_custkey, b.o_custkey) AS o_custkey,
               COALESCE(d.d_status, b.o_orderstatus) AS o_orderstatus,
               COALESCE(d.d_price_u, b.price_u) AS price_u
        FROM base b FULL OUTER JOIN delta d ON b.o_orderkey = d.k
        WHERE COALESCE(d.op, '') <> 'D'
        ORDER BY o_orderkey
    """,
)
def orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (upsert + delete) of a CDC delta batch into the orders table —
    the table-maintenance primitive every incremental corpus/warehouse
    pipeline needs and the reference's append-only KV model cannot express
    (its `add`, src/mapreduce.cpp:348-383, only unions). Semantics match
    MERGE INTO ... WHEN MATCHED UPDATE / WHEN MATCHED DELETE / WHEN NOT
    MATCHED INSERT (what Delta/Iceberg run); engine-agnostic plan: ONE
    full-outer sort-merge join on the primary key + coalesce projection.

    Scale shape: both sides hash-partition on o_orderkey — the join is the
    single shuffle, sized by base + delta; with the base bucketed by key at
    rest (the q3_bucketed layout) the base side would not move at all. No
    broadcast of the base, no row-at-a-time path; deletes/updates cost is
    proportional to the delta, never the table."""
    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 10000).cast("bigint").alias("price_u"),
    )
    k = F.col("o_orderkey")
    deletes = base.filter(k % 131 == 7).select(
        k.alias("k"),
        F.col("o_custkey").alias("d_custkey"),
        F.lit(None).cast("string").alias("d_status"),
        F.lit(None).cast("bigint").alias("d_price_u"),
        F.lit("D").alias("op"),
    )
    updates = base.filter((k % 131 != 7) & (k % 7 == 3)).select(
        k.alias("k"),
        F.col("o_custkey").alias("d_custkey"),
        F.lit("U").alias("d_status"),
        (F.col("price_u") + 500000).alias("d_price_u"),
        F.lit("U").alias("op"),
    )
    inserts = base.filter(k % 97 == 5).select(
        (k + _INS_SHIFT).alias("k"),
        F.col("o_custkey").alias("d_custkey"),
        F.lit("N").alias("d_status"),
        F.col("price_u").alias("d_price_u"),
        F.lit("I").alias("op"),
    )
    delta = deletes.unionAll(updates).unionAll(inserts)
    merged = (
        base.join(delta, base.o_orderkey == delta.k, "full_outer")
        .filter(F.coalesce(F.col("op"), F.lit("")) != "D")
        .select(
            F.coalesce(delta.k, base.o_orderkey).alias("o_orderkey"),
            F.coalesce(delta.d_custkey, base.o_custkey).alias("o_custkey"),
            F.coalesce(delta.d_status, base.o_orderstatus).alias(
                "o_orderstatus"
            ),
            F.coalesce(delta.d_price_u, base.price_u).alias("price_u"),
        )
    )
    return merged.orderBy("o_orderkey")


# train/val/test fractions in hash buckets of 100
_SPLIT_CASE = (
    "CASE WHEN b < 95 THEN 'train' WHEN b < 99 THEN 'val' ELSE 'test' END"
)


@register(
    "dataset_split_report",
    tags=("pipeline", "llm", "sampling"),
    oracle=f"""
        WITH b AS (
            SELECT ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)),
                                   1, 15))::BIGINT % 100 AS b,
                   n_chars
            FROM documents
        )
        SELECT {_SPLIT_CASE} AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS chars_u
        FROM b GROUP BY 1 ORDER BY split
    """,
)
def dataset_split_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test (95/4/1) split assignment over the
    documents table with per-split document and character accounting — the
    reproducible-split primitive of a training-data pipeline. Assignment is
    the portable 60-bit md5 hash (functions/portable.py) of 'split|doc_id'
    mod 100: partitioning-, retry- and engine-independent (the same doc
    lands in the same split on a laptop, a 1000-executor cluster, and in
    the oracle), and independent of the `smp` sampling tag namespace so
    composing sampling with splitting never correlates. Plan: one scan
    projecting (bucket, n_chars), one 3-group partial-aggregated groupBy —
    no shuffle wider than 3 rows per partition, no Python."""
    b = table(spark, sf_dir, "documents").select(
        (
            hash60(
                F.concat_ws("|", F.lit("split"), F.col("doc_id").cast("string"))
            )
            % 100
        ).alias("b"),
        "n_chars",
    )
    return (
        b.select(F.expr(_SPLIT_CASE).alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_u"),
        )
        .orderBy("split")
    )


_HOP_MS = 15 * 60 * 1000  # slide
_HOPS_PER_WINDOW = 4  # 1-hour window / 15-min slide


@register(
    "events_hopping",
    bench=True,
    tags=("streaming",),
    oracle=f"""
        SELECT ((epoch_ms(ts) // {_HOP_MS}) - g.i) * {_HOP_MS} AS window_ms,
               event_type,
               COUNT(*) AS n,
               {sql_dsum('value')} AS sum_value
        FROM events, generate_series(0, {_HOPS_PER_WINDOW - 1}) g(i)
        GROUP BY 1, event_type
    """,
)
def events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping 1-hour/15-minute event counts + exact sums — the batch half
    of the overlapping-window streaming aggregation
    (streaming/pipeline.hopping_counts; the streaming half with its 2-hour
    watermark is equality-tested in tests/test_streaming.py). The oracle
    replays Spark's window assignment from first principles: an event at t
    belongs to the {_HOPS_PER_WINDOW} slide-aligned windows whose start is
    in (t - 1h, t], i.e. starts (floor(t/slide) - i) * slide for
    i in 0..{_HOPS_PER_WINDOW - 1}."""
    return streaming_pipeline.hopping_counts(
        table(spark, sf_dir, "events")
    )
