"""Batch halves of the stream/batch dual pipelines over `events`
(streaming/pipeline.py): the oracle-checked truth that the streaming runs
must reproduce (asserted in tests/test_streaming.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gpu_mapreduce_spark.functions.numeric import sql_dsum
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table
from gpu_mapreduce_spark.streaming import pipeline

_GAP_MS = pipeline.SESSION_GAP_MIN * 60 * 1000


@register(
    "events_windowed",
    bench=True,
    tags=("streaming",),
    oracle=f"""
        SELECT epoch_ms(date_trunc('hour', ts)) AS window_ms,
               event_type,
               COUNT(*) AS n,
               {sql_dsum('value')} AS sum_value
        FROM events
        GROUP BY epoch_ms(date_trunc('hour', ts)), event_type
    """,
)
def events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event counts + exact sums — the batch half of the
    watermarked streaming aggregation."""
    return pipeline.windowed_counts(table(spark, sf_dir, "events"))


@register(
    "events_enriched",
    tags=("streaming", "join"),
    oracle=f"""
        SELECT c_mktsegment, event_type,
               COUNT(*) AS n,
               {sql_dsum('value')} AS sum_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c_mktsegment, event_type
    """,
)
def events_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment (batch half): events joined to
    the broadcast customer dim, aggregated per (segment, type). The
    streaming half runs the identical transform over the file-source stream
    (tests/test_streaming.py asserts equality)."""
    return pipeline.enriched_type_counts(
        table(spark, sf_dir, "events"), table(spark, sf_dir, "customer")
    )


@register(
    "events_sessionized",
    tags=("streaming",),
    oracle=f"""
        WITH marked AS (
            SELECT user_id, ts, value,
                   CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER
                            (PARTITION BY user_id ORDER BY ts)) > {_GAP_MS}
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        ),
        sess AS (
            SELECT user_id, ts, value,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
            FROM marked
        )
        SELECT user_id, session_no,
               epoch_ms(MIN(ts)) AS session_start_ms,
               epoch_ms(MAX(ts)) AS session_end_ms,
               COUNT(*) AS n_events,
               {sql_dsum('value')} AS sum_value
        FROM sess
        GROUP BY user_id, session_no
    """,
)
def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization via window functions (a capability class
    the reference lacks entirely) — the batch half of the
    applyInPandasWithState streaming sessionizer."""
    return pipeline.sessionize_batch(table(spark, sf_dir, "events"))


@register(
    "events_deduped",
    tags=("streaming", "dedup"),
    oracle=f"""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids,
               {sql_dsum('value')} AS sum_value
        FROM events
        GROUP BY event_type
    """,
)
def events_deduped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once repair (batch half): redeliver every 3rd event, dedup on
    event_id, aggregate. event_id is unique in the source, so the dedup must
    restore the original table EXACTLY — the oracle is the plain events
    aggregate, and any surviving duplicate breaks both n and sum_value. The
    streaming half runs dropDuplicatesWithinWatermark over the same
    redelivered stream (tests/test_streaming.py asserts row-set equality)."""
    from pyspark.sql import functions as F

    from gpu_mapreduce_spark.functions.numeric import dsum

    deduped = pipeline.dedup_events(
        pipeline.with_redelivery(table(spark, sf_dir, "events"))
    )
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("event_id").cast("bigint").alias("n_ids"),
        dsum(F.col("value")).alias("sum_value"),
    )


@register(
    "events_attributed",
    tags=("streaming", "join"),
    oracle="""
        SELECT p.event_id AS purchase_id,
               v.event_id AS view_id,
               p.user_id,
               epoch_ms(p.ts) - epoch_ms(v.ts) AS lag_ms
        FROM events p JOIN events v
          ON p.user_id = v.user_id
         AND p.event_type = 'purchase' AND v.event_type = 'view'
         AND v.ts > p.ts - INTERVAL 30 MINUTE AND v.ts <= p.ts
    """,
)
def events_attributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel attribution (batch half of the stream-stream join dual):
    (purchase, view) pairs from the same user within a 30-minute window.
    The streaming half is a watermarked stream-stream inner join whose
    buffered state is evicted at watermark + window
    (tests/test_streaming.py asserts row-set equality)."""
    return pipeline.attributed_purchases(table(spark, sf_dir, "events"))


def write_events_bydate(
    spark: SparkSession, sf_dir: str, path: str
) -> tuple[DataFrame, DataFrame]:
    """Events written date-partitioned to `path` (the standard
    time-partitioned at-rest layout) and read back. Shared scaffolding of
    the two partition-pruning probes (partitioned_week_counts here,
    queries/formats.dpp_day_counts). Returns (original-with-event_date,
    read-back)."""
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.partitionBy("event_date").mode("overwrite").parquet(path)
    return ev, spark.read.parquet(path)


def partitioned_week_counts(spark: SparkSession, sf_dir: str, path: str) -> DataFrame:
    """Write events date-partitioned, read back with a one-week predicate,
    aggregate. Split from the registered query so tests/test_plan_audit.py
    can assert the read-back scan carries PartitionFilters (directory
    pruning: the other ~23 day partitions are never opened) before the
    result is materialized."""
    from pyspark.sql import functions as F

    _ev, back = write_events_bydate(spark, sf_dir, path)
    from gpu_mapreduce_spark.functions.numeric import dsum

    return (
        back.filter(
            (F.col("event_date") >= "2024-01-08") & (F.col("event_date") < "2024-01-15")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value")).alias("sum_value"),
        )
    )


@register(
    "events_partitioned_scan",
    tags=("sources", "pushdown"),
    oracle=f"""
        SELECT event_type,
               COUNT(*) AS n,
               {sql_dsum('value')} AS sum_value
        FROM events
        WHERE strftime(ts, '%Y-%m-%d') >= '2024-01-08'
          AND strftime(ts, '%Y-%m-%d') < '2024-01-15'
        GROUP BY event_type
    """,
)
def events_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-partitioned layout roundtrip: events written
    `partitionBy(event_date)` — the at-rest layout every 100-TB event table
    uses — then read back with a one-week filter that prunes to 7 of ~30 day
    directories (PartitionFilters, asserted mechanically in
    tests/test_plan_audit.py). The oracle aggregates the same week from the
    ORIGINAL table, so a row lost or duplicated by the partitioned write
    hash-mismatches."""
    from gpu_mapreduce_spark.plans.scratch import sink_roundtrip

    return sink_roundtrip(
        "events_bydate_", lambda path: partitioned_week_counts(spark, sf_dir, path)
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "events_pivot",
    tags=("relational", "semistructured"),
    oracle=f"""
        SELECT strftime(ts, '%Y-%m-%d') AS d,
               {", ".join(
                   f"CAST(COUNT(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}"
                   for t in _EVENT_TYPES
               )}
        FROM events
        GROUP BY strftime(ts, '%Y-%m-%d')
    """,
)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide report): daily event counts, one column per event
    type. The value list is passed EXPLICITLY — without it Spark first runs
    a distinct-collect job over the pivot column to discover values (an
    extra full scan, and a failure mode when cardinality is unbounded);
    with it the pivot compiles straight to per-value conditional aggregates,
    map-side combinable like any groupBy. Missing combinations surface as
    NULL from pivot-count; coalesced to 0 to match the SQL FILTER
    semantics."""
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events")
    wide = (
        ev.withColumn("d", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("d")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
    )
    return wide.select(
        "d", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


@register(
    "events_props_parsed",
    tags=("streaming", "semistructured"),
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
                   AS sum_k,
               CAST(COUNT(DISTINCT CAST(json_extract(props, '$.k') AS INTEGER))
                   AS BIGINT) AS n_distinct_k
        FROM events
        GROUP BY event_type
    """,
)
def events_props_parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload handling: the events table carries a JSON
    `props` string; from_json parses it against a declared schema INSIDE the
    scan projection (JVM-side Jackson, no Python), and the parsed field
    aggregates like any typed column. The schema-on-read shape every event
    pipeline needs; at scale prefer extracting hot JSON fields to typed
    columns at ingest so the parse cost is paid once."""
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events")
    k = F.from_json("props", "k int").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.countDistinct("k").cast("bigint").alias("n_distinct_k"),
        )
    )
