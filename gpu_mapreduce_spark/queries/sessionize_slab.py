"""Whale-safe two-stage sessionization (r13 landing of the VERDICT r12
#5 brief): sessionize_events' one-shuffle-two-windows plan is exactly
right until ONE user's whole history becomes one task's window sort —
the measured bend at ~1e6 events/user (SCALE.md r12 event-tier decade:
+35% wall at the 9/10 whale, every other task idle). An order-dependent
fold cannot salt, but it CAN be segmented: gap-sessionization is a
run-length structure over time, so per-(user, time-slab) PARTIAL
sessions compose exactly.

Two stages, both engine-exact:
  1. Slab partials: slab = ts_ms div SLAB_MS (1-day slabs); the
     lag/running-sum pair runs PARTITION BY (user_id, slab) — the
     whale's 1e6-event history now spreads across as many tasks as it
     spans days. Output: (user_id, slab, psid, n, t_start, t_end).
  2. Boundary merge: per user, partial sessions ordered by t_start (a
     total order: slabs partition the time axis and within-slab
     partials are > GAP apart); a partial starts a NEW session iff the
     gap from the previous partial's t_end exceeds GAP — the same
     flag/running-sum pair over SESSION rows, then an algebraic
     re-aggregate (sum n, min start, max end).

Equivalence is structural: every within-slab boundary has gap > GAP by
construction, every cross-slab false split has gap <= GAP and is the
exact pair stage 2 rejoins — so the output is row-identical to
sessionize_events, and the registration proves it through that
query's VERBATIM oracle (the stream ≡ batch gate discipline of
sessionize_stream).

100 TB / whale posture: the uncuttable per-user unit shrinks from
EVENTS per user to PARTIAL SESSIONS per user — bounded by
sessions + slabs-touched (a >= GAP-spaced decade is <= ~175k sessions
at the 30-min gap; 1-day slabs add <= 3650 splits), a >= 10x lift of
the measured 1e6-event bend with zero change to the gap semantics.
Cost: one extra shuffle (user_id, slab) -> (user_id) — but the second
shuffle moves SESSION rows, not events (~1-2% of the input at the
fixture's events-per-session). The stage-2 window remains the honest
residual cap; product analytics caps session lookback far below it.
Measured on the r13 decade harness (SCALE.md): the 9/10-whale point
runs at even-growth wall, the +35% straggler gone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_mapreduce_spark.queries.sessionize import _GAP_MS
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

SLAB_MS = 24 * 60 * 60 * 1000  # 1-day slabs


def sessionize_slabbed_frame(ev: DataFrame) -> DataFrame:
    """The two-stage transform over a (user_id, event_id, ts_ms) frame —
    output schema identical to sessionize.py's _sessionize."""
    # integer floor division, matching the ts arithmetic everywhere else
    # (ADVICE r13: float divide-then-truncate was the one float in an
    # otherwise all-integer path — safe at epoch-ms magnitudes, but the
    # exact-integer discipline should not carry exceptions)
    slab = F.expr(f"CAST(ts_ms div {SLAB_MS} AS BIGINT)").alias("slab")
    w1 = Window.partitionBy("user_id", "slab").orderBy("ts_ms", "event_id")
    flagged = ev.select("user_id", "ts_ms", "event_id", slab).select(
        "user_id",
        "slab",
        "ts_ms",
        "event_id",
        F.when(
            F.lag("ts_ms").over(w1).isNull()
            | (F.col("ts_ms") - F.lag("ts_ms").over(w1) > _GAP_MS),
            1,
        )
        .otherwise(0)
        .alias("nf"),
    )
    psid = flagged.select(
        "user_id",
        "slab",
        "ts_ms",
        F.sum("nf")
        .over(
            Window.partitionBy("user_id", "slab")
            .orderBy("ts_ms", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("psid"),
    )
    partials = psid.groupBy("user_id", "slab", "psid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("ts_ms").cast("bigint").alias("t_start"),
        F.max("ts_ms").cast("bigint").alias("t_end"),
    )
    # stage 2: merge across slab boundaries — SESSION rows only
    w2 = Window.partitionBy("user_id").orderBy("t_start", "t_end")
    merged = partials.select(
        "user_id",
        "n",
        "t_start",
        "t_end",
        F.when(
            F.lag("t_end").over(w2).isNull()
            | (F.col("t_start") - F.lag("t_end").over(w2) > _GAP_MS),
            1,
        )
        .otherwise(0)
        .alias("nf"),
    ).select(
        "user_id",
        "n",
        "t_start",
        "t_end",
        F.sum("nf")
        .over(
            Window.partitionBy("user_id")
            .orderBy("t_start", "t_end")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("bigint")
        .alias("session_id"),
    )
    return (
        merged.groupBy("user_id", "session_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.min("t_start").cast("bigint").alias("t_start_ms"),
            F.max("t_end").cast("bigint").alias("t_end_ms"),
            F.expr(
                "CAST((max(t_end) - min(t_start)) div 1000 AS BIGINT)"
            ).alias("dur_s"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "sessionize_slabbed",
    # bench=False: one row per session (the sessionize_events rationale)
    tags=("analytics", "events", "order"),
    # sessionize_events' VERBATIM oracle: the registration's claim IS
    # row-identity with the single-window plan
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
def sessionize_slabbed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whale-safe sessionization: per-(user, 1-day slab) partials +
    boundary merge, row-identical to sessionize_events — see module
    docstring."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_millis("ts").alias("ts_ms")
    )
    return sessionize_slabbed_frame(ev)
