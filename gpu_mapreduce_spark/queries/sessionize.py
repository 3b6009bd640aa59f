"""Gap-based event sessionization (r11 tail registration; the SCALE.md
r12 sessionize_events design, landed in-round) — the canonical
event-analytics op the suite routed around: funnel_user_stages /
cohort_retention / events_windowed all key on FIXED windows; none on
ACTIVITY GAPS, which is how product analytics actually defines a
session (GA4, Amplitude, Snowplow: a session ends after G minutes of
inactivity).

Semantics: per user, events ordered by the unique total order
(ts_ms, event_id); a new session starts at the first event or whenever
the gap from the previous event exceeds G = 30 min. session_id is the
running count of session starts (1-based within user) — the
hist_rollup cumulative-sum discipline at user grain. Output one row per
session: (user_id, session_id, n_events, t_start_ms, t_end_ms, dur_s)
with timestamps as epoch ms and dur_s an integer floor division (the
registry's timestamp/exactness conventions).

Plan shape: ONE shuffle on user_id, then two window passes over the
SAME partitioning (lag -> new-session flag, running sum -> session id)
that Spark stacks without a second exchange, then one aggregate already
co-partitioned on (user_id, session_id). The windows are partitioned by
user_id and bounded by per-user event volume (~100 events/user at
every sf) — never a global sort. 100 TB: per-user state after one
shuffle is the whole cost; the documented cap is whale users (a
single user's history must fit a task — millions of events per user is
fine, and beyond that product analytics caps session lookback anyway;
salting is inapplicable to an order-dependent fold and honesty beats a
wrong trick; the cap is QUANTIFIED in SCALE.md's r12 event-tier decade:
a 1/10-of-all-rows whale is free, the bend starts ~10^6 events on one
user at +35% wall, zero spill). The streaming dual landed r12:
queries/sessionize_stream.py drains the same events through
applyInPandasWithState and proves stream ≡ batch through this
registration's VERBATIM oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_GAP_MS = 30 * 60 * 1000  # 30-minute inactivity gap


@register(
    "sessionize_events",
    # bench=False deliberately: the result is one row PER SESSION (95k
    # rows at sf0.1), so a timed full collect would measure driver-side
    # row shipping, not the plan — the bench set keeps to small-output
    # queries by construction (bench.py docstring); msf_rmat precedent
    tags=("analytics", "events", "order"),
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events
        ),
        l AS (
            SELECT user_id, event_id, ts_ms,
                   CASE WHEN lag(ts_ms) OVER w IS NULL
                             OR ts_ms - lag(ts_ms) OVER w > {_GAP_MS}
                        THEN 1 ELSE 0 END AS nf
            FROM e WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts_ms, event_id)
        ),
        s AS (
            SELECT user_id, ts_ms,
                   SUM(nf) OVER (PARTITION BY user_id
                                 ORDER BY ts_ms, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
            FROM l
        )
        SELECT user_id, CAST(sid AS BIGINT) AS session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MIN(ts_ms) AS BIGINT) AS t_start_ms,
               CAST(MAX(ts_ms) AS BIGINT) AS t_end_ms,
               CAST((MAX(ts_ms) - MIN(ts_ms)) // 1000 AS BIGINT) AS dur_s
        FROM s GROUP BY user_id, sid
        ORDER BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (user, gap-delimited session): (user_id, session_id,
    n_events, t_start_ms, t_end_ms, dur_s) under the 30-minute
    inactivity rule — see module docstring."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_millis("ts").alias("ts_ms")
    )
    return _sessionize(ev)


def _sessionize(ev: DataFrame) -> DataFrame:
    """The registered transform over a (user_id, event_id, ts_ms) frame —
    shared with queries/sessionize_inc.py, which applies it to the base
    half of the time split (the same code path the oracle gates, so the
    incremental fold's baseline cannot drift)."""
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    flagged = ev.select(
        "user_id",
        "ts_ms",
        F.when(
            F.lag("ts_ms").over(w).isNull()
            | (F.col("ts_ms") - F.lag("ts_ms").over(w) > _GAP_MS),
            1,
        )
        .otherwise(0)
        .alias("nf"),
        "event_id",
    )
    sid = flagged.select(
        "user_id",
        "ts_ms",
        F.sum("nf")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts_ms", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("bigint")
        .alias("session_id"),
    )
    return (
        sid.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("ts_ms").cast("bigint").alias("t_start_ms"),
            F.max("ts_ms").cast("bigint").alias("t_end_ms"),
            F.expr("CAST((max(ts_ms) - min(ts_ms)) div 1000 AS BIGINT)")
            .alias("dur_s"),
        )
        .orderBy("user_id", "session_id")
    )
