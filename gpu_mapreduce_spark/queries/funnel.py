"""Event-sequence analytics: ordered funnel + cohort retention (r05 tail
registration per SURVEY §2.6).

Two classic product-analytics shapes over the events table that the
repo's windowing/sessionization layer did not yet cover:

  event_funnel      strictly-ordered per-user funnel view -> click ->
                    purchase. A user converts at stage k only with an
                    event AFTER their earliest stage-(k-1) completion —
                    the ordered-sequence semantics a flat event_type
                    count cannot express.
  cohort_retention  users grouped by first-seen week (the cohort), then
                    distinct-active counts per (cohort, week offset) —
                    the retention triangle.

Scale notes (100 TB): the funnel is three user-keyed partial-aggregated
min-reductions chained by user equi-joins (each stage's state is ONE
timestamp per user, never the event list; no window over a user's
events, so a bot user with 1e9 events costs its partitions nothing
beyond the min). Retention is one min-reduction plus one
(cohort, offset)-keyed distinct count — the distinct shuffles (user_id,
cohort, offset) pairs, already deduplicated map-side by partial
aggregation. All epoch arithmetic is integer milliseconds."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_WEEK_MS = 7 * 24 * 3600 * 1000
# stage names + conversion window live in streaming/pipeline.py (the
# side-effect-free module) so the batch queries, both oracles, and the
# streaming dual share ONE definition — rationale at the definition site
from gpu_mapreduce_spark.streaming.pipeline import (  # noqa: E402
    FUNNEL_CONV_MS as _CONV_MS,
    FUNNEL_STAGES as _STAGES,
)


@register(
    "event_funnel",
    bench=True,
    tags=("analytics", "events"),
    oracle=f"""
        WITH s1 AS (
            SELECT user_id, epoch_ms(MIN(ts)) AS t1 FROM events
            WHERE event_type = '{_STAGES[0]}' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, epoch_ms(MIN(e.ts)) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = '{_STAGES[1]}'
              AND epoch_ms(e.ts) > s1.t1
              AND epoch_ms(e.ts) <= s1.t1 + {_CONV_MS}
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, epoch_ms(MIN(e.ts)) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = '{_STAGES[2]}'
              AND epoch_ms(e.ts) > s2.t2
              AND epoch_ms(e.ts) <= s2.t2 + {_CONV_MS}
            GROUP BY e.user_id
        )
        SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_view,
               CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_click,
               CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_purchase,
               CAST((SELECT COUNT(*) FROM s3) * 10000
                    // (SELECT COUNT(*) FROM s1) AS BIGINT) AS conv_bp
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel counts with a 24 h conversion window per stage:
    users with a view, users clicking within 24 h AFTER their first view,
    users purchasing within 24 h after their first qualifying click, plus
    end-to-end conversion in basis points. One row."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("tms")
    )
    # s1 feeds both s2 and the final union (and s2 feeds s3 and the union):
    # without materialization the events scan + min-aggregate subtree
    # recomputes once per consumer (~6 scans per run). Eager checkpoints
    # keep each stage computed once — the repo's multi-consumer reuse
    # discipline (quality_gate's scored projection, the IVF index).
    s1 = (
        ev.filter(F.col("event_type") == _STAGES[0])
        .groupBy("user_id")
        .agg(F.min("tms").alias("t1"))
        .localCheckpoint(eager=True)
    )
    s2 = (
        ev.filter(F.col("event_type") == _STAGES[1])
        .join(s1, "user_id")
        .filter(
            (F.col("tms") > F.col("t1"))
            & (F.col("tms") <= F.col("t1") + _CONV_MS)
        )
        .groupBy("user_id")
        .agg(F.min("tms").alias("t2"))
        .localCheckpoint(eager=True)
    )
    s3 = (
        ev.filter(F.col("event_type") == _STAGES[2])
        .join(s2, "user_id")
        .filter(
            (F.col("tms") > F.col("t2"))
            & (F.col("tms") <= F.col("t2") + _CONV_MS)
        )
        .groupBy("user_id")
        .agg(F.min("tms").alias("t3"))
    )
    # tagged union + ONE global conditional aggregate — no scalar joins
    # (a 1x1 crossJoin folds to the BroadcastNestedLoopJoin the plan audit
    # forbids), and partial aggregation keeps the union's shuffle at one
    # 3-counter row per partition
    tagged = (
        s1.select(F.lit(1).alias("v"), F.lit(0).alias("c"), F.lit(0).alias("p"))
        .unionAll(
            s2.select(
                F.lit(0).alias("v"), F.lit(1).alias("c"), F.lit(0).alias("p")
            )
        )
        .unionAll(
            s3.select(
                F.lit(0).alias("v"), F.lit(0).alias("c"), F.lit(1).alias("p")
            )
        )
    )
    return tagged.agg(
        F.sum("v").cast("bigint").alias("n_view"),
        F.sum("c").cast("bigint").alias("n_click"),
        F.sum("p").cast("bigint").alias("n_purchase"),
    ).select(
        "n_view",
        "n_click",
        "n_purchase",
        F.expr("n_purchase * 10000 div n_view").cast("bigint").alias("conv_bp"),
    )


@register(
    "cohort_retention",
    tags=("analytics", "events"),
    oracle=f"""
        WITH first_seen AS (
            SELECT user_id,
                   epoch_ms(MIN(ts)) // {_WEEK_MS} AS cohort_w
            FROM events GROUP BY user_id
        )
        SELECT f.cohort_w * {_WEEK_MS} AS cohort_ms,
               CAST(epoch_ms(e.ts) // {_WEEK_MS} - f.cohort_w AS BIGINT)
                   AS week_offset,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: (cohort_ms, week_offset, n_active) where a
    user's cohort is their first-seen epoch week and n_active counts
    distinct cohort members active in that offset week."""
    ev = table(spark, sf_dir, "events")
    wk = F.unix_millis(F.col("ts")) - (
        F.unix_millis(F.col("ts")) % _WEEK_MS
    )
    first = ev.groupBy("user_id").agg(
        (
            F.min(F.unix_millis("ts"))
            - F.min(F.unix_millis("ts")) % _WEEK_MS
        ).alias("cohort_ms")
    )
    return (
        ev.select("user_id", wk.alias("wk_ms"))
        .join(first, "user_id")
        .groupBy(
            "cohort_ms",
            (
                (F.col("wk_ms") - F.col("cohort_ms")) / _WEEK_MS
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_active"))
        .orderBy("cohort_ms", "week_offset")
    )
