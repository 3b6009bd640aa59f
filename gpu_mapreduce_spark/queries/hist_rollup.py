"""Fixed-boundary histogram grain rollup + quantile-cut extraction (r11
tail registration; the SCALE.md histogram-quantile-rollup design) — the
THIRD mergeable-sketch leg the tier needed: HLL proves distinct-count
mergeability (queries/hll_rollup.py), count-min proves frequency, this
proves DISTRIBUTION. A fixed-boundary equi-width histogram is the
simplest mergeable quantile sketch there is: per-bin counts FOLD by
integer addition — associative, commutative, retry-safe — so a warehouse
stores tiny per-hour bin tables and answers per-day (or weekly, monthly)
quantile questions by summing them, never re-touching the raw events.

Physical-path proof (hll_merge_rollup's discipline exactly): the Spark
side computes the TWO-LEVEL path — per-(day, hour, bin) counts, then
per-(day, bin) sums over the 24 hourly partials — while the DuckDB
oracle bins the raw events straight to the daily grain. Hash equality of
the full (d, bin, n, cum_n, q_sum) table across engines IS the
mergeability law, exercised on 30 days x 24 hours of real grouping keys.

Quantile extraction at the coarse grain rides the same gate: for q in
{50, 90, 99}% the cut rank is ceil(q * n_day / 10000) — order_stats.py's
exact integer arithmetic — and q's cut falls in bin b iff
cum_n(b) >= rank > cum_n(b) - n(b). Each row carries q_sum = the sum of
q_bp values whose cut lands in it (subset sums of {5000, 9000, 9900} are
all distinct, so q_sum identifies the exact hit set); the histogram
answers quantiles at BIN resolution, and tests/test_hist_rollup.py
cross-checks that resolution claim against the two-phase EXACT global
rank (operators/prefix.global_ranks_and_count): the exact rank-r value
lands inside the reported bin's [lo, hi) for every (day, q) probed.

Binning is bin = floor(value / 16) over events.value in [0, ~490] — the
divisor is a power of two, so the double division is EXACT in IEEE
arithmetic and both engines bin identically; all downstream arithmetic
is integer. The cumulative-sum windows run on the AGGREGATED table
(<= 31 bins per day-partition — bounded by the bin count, never by data
volume), not on raw events; the raw stream is touched once, at the
finest grain, in one map-side-combinable count.

100 TB: the fine grain is the only full scan; every coarser grain folds
B-row bin tables per group (B = 32 here), shuffling kilobytes. Late or
replayed hours fold in idempotently per (d, hh) partition; day
boundaries agree across engines via the session-UTC convention
(sources/tables.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_W = 16  # bin width: power of two, so value / _W is exact in IEEE double
_Q_BP = (5000, 9000, 9900)  # p50 / p90 / p99 in basis points


def _q_sum_sql() -> str:
    """q_sum cases for the oracle — same integer arithmetic as Spark."""
    cases = [
        f"CASE WHEN cum_n >= ({q} * n_day + 9999) // 10000"
        f" AND cum_n - n < ({q} * n_day + 9999) // 10000"
        f" THEN {q} ELSE 0 END"
        for q in _Q_BP
    ]
    return " + ".join(cases)


@register(
    "hist_quantile_rollup",
    bench=True,
    tags=("analytics", "sketch", "incremental", "events", "order"),
    # the oracle bins raw events DIRECTLY to the daily grain; the Spark
    # side folds hourly partials — one result, two physical paths (the
    # hll_merge_rollup mergeability-law pattern)
    oracle=f"""
        WITH b AS (
            SELECT strftime(ts, '%Y-%m-%d') AS d,
                   CAST(FLOOR(value / {_W}.0) AS INT) AS bin
            FROM events
        ),
        db AS (
            SELECT d, bin, CAST(COUNT(*) AS BIGINT) AS n
            FROM b GROUP BY d, bin
        ),
        c AS (
            SELECT d, bin, n,
                   SUM(n) OVER (PARTITION BY d ORDER BY bin
                                ROWS UNBOUNDED PRECEDING) AS cum_n,
                   SUM(n) OVER (PARTITION BY d) AS n_day
            FROM db
        )
        SELECT d, bin, n, CAST(cum_n AS BIGINT) AS cum_n,
               CAST({_q_sum_sql()} AS BIGINT) AS q_sum
        FROM c ORDER BY d, bin
    """,
)
def hist_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(day, bin) histogram of events.value computed as a SUM-fold of
    per-(day, hour) partial histograms, with cumulative counts and the
    p50/p90/p99 cut bins marked (q_sum = sum of q_bp landing in the row)
    — hash-equal to the oracle's direct daily binning."""
    ev = table(spark, sf_dir, "events")
    fine = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
        F.date_format("ts", "HH").alias("hh"),
        F.floor(F.col("value") / _W).cast("int").alias("bin"),
    )
    hourly = fine.groupBy("d", "hh", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h")
    )
    daily = hourly.groupBy("d", "bin").agg(
        F.sum("n_h").cast("bigint").alias("n")
    )
    return daily_to_output(daily)


def daily_to_output(daily: DataFrame) -> DataFrame:
    """(d, bin, n) daily bin counts -> the registered output shape
    (d, bin, n, cum_n, q_sum) — shared by the batch rollup above and the
    streaming ingest dual (stream_hist_ingest), so 'one oracle, many
    physical paths' compares the identical final projection."""
    # ONE window over the AGGREGATED table (<= 31 rows per day-partition,
    # partitioned by d and ordered by bin — never a global sort); the
    # per-day totals come from a broadcast-joined aggregate instead of a
    # second partition-only window (30-row build side)
    w_cum = (
        Window.partitionBy("d")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dtot = daily.groupBy("d").agg(F.sum("n").cast("bigint").alias("n_day"))
    c = daily.join(F.broadcast(dtot), "d").select(
        "d",
        "bin",
        "n",
        F.sum("n").over(w_cum).cast("bigint").alias("cum_n"),
        "n_day",
    )
    hits = [
        F.when(
            (F.col("cum_n") >= F.expr(f"({q} * n_day + 9999) div 10000"))
            & (
                F.col("cum_n") - F.col("n")
                < F.expr(f"({q} * n_day + 9999) div 10000")
            ),
            F.lit(q),
        ).otherwise(F.lit(0))
        for q in _Q_BP
    ]
    q_sum = hits[0]
    for h in hits[1:]:
        q_sum = q_sum + h
    return c.select(
        "d", "bin", "n", "cum_n", q_sum.cast("bigint").alias("q_sum")
    ).orderBy("d", "bin")
