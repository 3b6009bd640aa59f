"""As-of and range joins — join classes the reference lacks entirely (its
only join shape is the add+collate+tag-dispatch equi-join, SURVEY.md §2.1
note; oink/degree_weight.cpp:35-125) and Spark's DataFrame API lacks as
built-in operators. Both are expressed as compositions of existing
operators, chosen for their 100-TB shuffle shape:

  asof_join         union + keyed window scan ("last value carry forward"):
                    ONE shuffle on the key, no join node at all. This is the
                    sort-merge as-of algorithm expressed declaratively —
                    per-key ordered scan, O(|left| + |right|) after the
                    shuffle, skew bounded by per-key cardinality.
  range_join_points point-in-interval join via BANDING: both sides bucket by
                    floor(epoch/width); an interval spanning w bands joins w
                    band keys, a point exactly one — so the band equi-join is
                    a complete candidate generator (each true pair collides
                    in exactly the point's band: no duplicates, no misses)
                    and the precise containment predicate filters within
                    buckets. Never the quadratic cross-product a naive
                    theta-join plans (Spark falls back to
                    BroadcastNestedLoopJoin for pure inequality joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: list[str],
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach the payload of the most recent right row
    with the same `key` and right.ts <= left.ts (or < when strict).

    Output: all left columns + `r_<ts>` (matching right timestamp) +
    `r_<c>` for each payload column — NULL when no right row precedes.

    Right rows are first reduced to one per (key, ts) (deterministic MAX per
    payload column), so the as-of match is a function of the data, not of
    row order — the property every oracle here depends on.
    """
    r = right.groupBy(key, ts).agg(*[F.max(c).alias(c) for c in payload])
    # side marker orders a right row before (inclusive) or after (strict)
    # left rows carrying the identical timestamp
    r_side, l_side = (0, 1) if not strict else (2, 1)
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(l_side).alias("_side"),
        F.struct(*left.columns).alias("_lrow"),
        # type taken from the left's ts column (LTZ or NTZ both work) — a
        # hard-coded cast would poison the union when the inputs are NTZ
        F.lit(None).cast(left.schema[ts].dataType).alias("_rts"),
        *[F.lit(None).cast(r.schema[c].dataType).alias(f"_r_{c}") for c in payload],
    )
    rt = r.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(r_side).alias("_side"),
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
        F.col(ts).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def carry(c: str) -> Column:
        return F.last(F.col(c), ignorenulls=True).over(w)

    return (
        lt.unionByName(rt)
        .select(
            "_side",
            "_lrow",
            carry("_rts").alias(f"r_{ts}"),
            *[carry(f"_r_{c}").alias(f"r_{c}") for c in payload],
        )
        .filter(F.col("_side") == l_side)
        .select("_lrow.*", f"r_{ts}", *[f"r_{c}" for c in payload])
    )


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    pt: str,
    start: str,
    end: str,
    band_ms: int,
) -> DataFrame:
    """Inner join of point rows to every interval row with
    start <= point < end (half-open), via band bucketing.

    `band_ms` is the bucket width in milliseconds — pick it near the typical
    interval length: an interval generates ceil(len/band)+1 band keys, a
    point exactly one, so shuffle volume is O(|points| + |intervals| *
    bands_per_interval), never |points| x |intervals|.

    Output: all interval columns + all point columns (names must not clash).
    """
    p_band = F.floor(F.unix_millis(F.col(pt)) / band_ms)
    i_bands = F.sequence(
        F.floor(F.unix_millis(F.col(start)) / band_ms),
        F.floor(F.unix_millis(F.col(end)) / band_ms),
    )
    pb = points.withColumn("_band", p_band)
    ib = intervals.withColumn("_band", F.explode(i_bands))
    return (
        ib.join(pb, "_band")
        .filter((F.col(pt) >= F.col(start)) & (F.col(pt) < F.col(end)))
        .drop("_band")
    )
