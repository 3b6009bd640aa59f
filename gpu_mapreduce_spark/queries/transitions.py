"""Per-user event-type transition matrix (r13 landing of the SCALE.md
r14 session_transitions draft, landed in-round) — the user-journey
primitive product analytics derives from the same user_id shuffle the
sessionizer already pays: which event types follow which, within a
session, corpus-wide.

Semantics (one convention, written here, replayed verbatim): per user,
events in the (ts_ms, event_id) total order; each consecutive pair
whose gap is <= G = 30 min (sessionize's rule — a gap > G breaks the
chain, so session-boundary pairs are EXCLUDED by construction) emits
one (from_type, to_type) transition. Output per ordered type pair:
the global transition count n_ab, the from-type row total n_a, and the
row-normalized probability in exact basis points
p_bp = (10000 * n_ab) div n_a — integer floor division, no float path.

Plan shape: ONE shuffle on user_id, the sessionize lag window extended
with lag(event_type), then a bounded aggregate (<= |types|^2 = 25
cells) that partial-aggregates map-side after the window; the row
totals join back over the 25-row table. Whale posture: inherits
sessionize_events' documented per-user window cap, and the
sessionize_slab two-stage segmentation applies verbatim if a whale
appears (a transition never crosses a gap > G, so slab-boundary
rejoins affect only the boundary pair — the same case the slab merge
already handles).

100 TB: the output is |types|^2 cells regardless of corpus size; the
one shuffle is the event tier's standard cost, and the lag window adds
one column to a pass the sessionizer already makes — in production the
two ship as one job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_mapreduce_spark.queries.sessionize import _GAP_MS
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table


@register(
    "session_transitions",
    # bench=False: the 67-query stdout line is at its tail-capture
    # ceiling (test_bench_stdout_line_fits_driver_tail_capture) — the
    # per-rotation driver run covers this query's cost instead
    tags=("analytics", "events", "order"),
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id, event_type,
                   epoch_ms(ts) AS ts_ms
            FROM events
        ),
        lagged AS (
            SELECT event_type AS to_type,
                   lag(event_type) OVER w AS from_type,
                   ts_ms - lag(ts_ms) OVER w AS gap
            FROM e WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts_ms, event_id)
        ),
        trans AS (
            SELECT from_type, to_type,
                   CAST(COUNT(*) AS BIGINT) AS n_ab
            FROM lagged
            WHERE from_type IS NOT NULL AND gap <= {_GAP_MS}
            GROUP BY from_type, to_type
        ),
        totals AS (
            SELECT from_type, CAST(SUM(n_ab) AS BIGINT) AS n_a
            FROM trans GROUP BY from_type
        )
        SELECT t.from_type, t.to_type, t.n_ab, o.n_a,
               CAST((10000 * t.n_ab) // o.n_a AS BIGINT) AS p_bp
        FROM trans t JOIN totals o USING (from_type)
        ORDER BY from_type, to_type
    """,
)
def session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session (from_type, to_type) transition counts + exact
    basis-point row probabilities — see module docstring."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis("ts").alias("ts_ms"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    lagged = ev.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
        (F.col("ts_ms") - F.lag("ts_ms").over(w)).alias("gap"),
    )
    trans = (
        lagged.filter(
            F.col("from_type").isNotNull() & (F.col("gap") <= _GAP_MS)
        )
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    totals = trans.groupBy("from_type").agg(
        F.sum("n_ab").cast("bigint").alias("n_a")
    )
    return (
        trans.join(totals, "from_type")
        .select(
            "from_type",
            "to_type",
            "n_ab",
            "n_a",
            F.expr("CAST((10000 * n_ab) div n_a AS BIGINT)").alias("p_bp"),
        )
        .orderBy("from_type", "to_type")
    )
