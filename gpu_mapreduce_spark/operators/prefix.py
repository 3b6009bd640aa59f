"""Exact global order statistics without a single-partition window.

The one total-order primitive the suite deliberately avoided everywhere
else (quality_gate's percentile goes through a bounded histogram,
training_sink's cumsum is per-shard) is sometimes genuinely required:
exact global rank / CDF position / cut documents. The naive
`Window.orderBy(...)` with no partition spec collapses the whole dataset
into ONE partition — the canonical Spark scale killer (`Exchange
SinglePartition` feeding a `Window`; at 100 TB that is a single task).

This module implements the TeraSort-shaped two-phase alternative:

  1. `repartitionByRange(P, keys)` — one range exchange; partition i holds
     keys strictly ≤ partition i+1's (the RangePartitioner contract), so
     global order = (partition id, within-partition order).
  2. `localCheckpoint(eager=True)` — pins the partition identity so the
     count job and the rank job see the SAME physical partitions (range
     boundaries come from a sampling pass; re-planning between jobs could
     legally re-draw them).
  3. A ≤P-row per-partition count aggregate, collected driver-side
     (constant traffic — the pagerank scalar discipline) and turned into
     exclusive prefix offsets.
  4. `row_number()` over (partition-id, keys) plus the broadcast offset —
     every partition ranks independently; no stage ever sees more than
     ~N/P rows.

Cost: one range exchange + one hash exchange (the _pid window) — two full
shuffles instead of the naive plan's one, but both run at full cluster
parallelism; the naive plan's second "stage" is one task doing all the
work. At 100 TB the checkpoint step becomes the persisted range-bucketed
write the sink layer already does (training_sink's shard layout) or a
boundaries-from-table-stats plan; the operator's structure is unchanged.

Reference parity: the reference's sort machinery (`mrmpi` sort_keys /
sort_values, oink `viewer.cpp` ordered scans) is a single-node qsort over
spooled pages — a total order it gets "for free" at one-node scale. This
is the distributed equivalent with the same observable semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "_gr_pid"
_OFF = "_gr_off"


def global_ranks_and_count(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rk",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact global 1-based row rank by `order_cols` (which must form a
    unique total order — pass a tie-breaking key last) as BIGINT
    `rank_col`, computed with NO single-partition stage, plus the exact
    total row count N (the sum of the already-collected per-partition
    counts — free). The count job's per-partition totals are collected
    driver-side (≤ num_partitions rows).

    Null ordering is pinned EXPLICITLY to ascending NULLS FIRST on both
    the range exchange and the window (Spark's asc default, but DuckDB /
    ANSI default to NULLS LAST): a nullable order column would otherwise
    silently desync the rank against any SQL oracle replay. Oracles over
    nullable keys must spell `ASC NULLS FIRST`; the registered consumers
    rank on non-null keys (doc_id / token counts), where the two defaults
    coincide."""
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    order = [F.col(c).asc_nulls_first() for c in order_cols]
    d = (
        df.repartitionByRange(p, *order)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    cnts = {
        r[_PID]: r["n"]
        for r in d.groupBy(_PID).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offs, acc = [], 0
    for pid in range(p):
        offs.append((pid, acc))
        acc += cnts.get(pid, 0)
    off_df = spark.createDataFrame(offs, f"{_PID} int, {_OFF} bigint")
    w = Window.partitionBy(_PID).orderBy(*order)
    ranked = (
        d.join(F.broadcast(off_df), _PID)
        .withColumn(rank_col, (F.row_number().over(w) + F.col(_OFF)).cast("bigint"))
        .drop(_PID, _OFF)
    )
    return ranked, acc


def global_ranks(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rk",
    num_partitions: int | None = None,
) -> DataFrame:
    """`global_ranks_and_count` when only the ranked frame is needed."""
    return global_ranks_and_count(df, order_cols, rank_col, num_partitions)[0]
