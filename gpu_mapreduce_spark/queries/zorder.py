"""Z-order (Morton) clustered layout (r10 tail registration) — the
multi-dimensional data-layout op every lakehouse table format schedules
(Delta OPTIMIZE ZORDER, Iceberg sort-order rewrite): rewrite events so
that ONE derived partition key gives locality in TWO query dimensions
(user and time) at once.

Why it matters at 100 TB: a table laid out by time alone answers
time-range scans with tight pruning but user-keyed scans touch every
file; laid out by user alone, the reverse. Interleaving the bits of the
two dimensions (z = a5 b5 a4 b4 ... a0 b0) makes every prefix of the
z-value a RECTANGLE in (user, time) space, so coarse z-cells are tight
in BOTH dimensions — a 2-D range predicate maps to a small set of cells
(computable from the cell spans this query publishes), and either
1-D predicate alone still prunes ~sqrt-tightly. The layout is REAL: the
rows are written cid-style `partitionBy(zcell)` to disk and read back;
the registered output is the per-cell inventory of the at-rest result.

Dimensions (fixture envelope, documented not silent): au = user_id mod
64 (6 bits; user_id is uniform at every sf) and tb = hour-of-January
div 12 (6 bits; the events fixture spans exactly 2024-01, 720 h, at
every sf — re-anchor `_ANCHOR_H`/`_TB_DIV` for other ranges, the
interleave drops bits past the 6th so an out-of-envelope tb would
alias, widening spans but never corrupting rows — the digest still
gates content). The interleave is pure non-negative div/mod arithmetic,
replayed bit-identically by the DuckDB oracle (no engine bit-op
dialect).

Output: (zcell, n_events, au_lo, au_hi, tb_lo, tb_hi, ev_digest) — the
digest (md5 over the sorted event_id list) pins CONTENT IDENTITY of the
rewritten table (the compaction discipline: a layout op must prove it
moved every row and invented none), and the published spans are the
pruning metadata a reader uses to map a 2-D range to cells. The
locality claim itself (a z-cell spans 8/64 of EACH dimension; a
centered 8x8 2-D range intersects <= 4 of 64 cells) is pinned in
tests/test_zorder.py against a time-sorted layout's full-width user
spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.plans.scratch import sink_roundtrip
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_BITS = 6  # per-dimension bits: 64 buckets each, 12-bit z
_CELL_SHIFT = 64  # z div 64 -> 64 cells (top 3 bits of each dimension)
_ANCHOR_H = 473352  # epoch hours of 2024-01-01T00:00:00Z
_TB_DIV = 12  # 720 fixture hours / 12 = 60 time buckets (6 bits)


def z_interleave_sql(a: str, b: str, div: str, bits: int = _BITS) -> str:
    """Morton interleave of two non-negative `bits`-bit integer
    expressions as ONE arithmetic SQL expression — `a`'s bits land at odd
    positions, `b`'s at even. Pure div/mod (pass 'div' for Spark, '//'
    for DuckDB), so both engines compute it bit-identically without any
    bitwise-operator dialect."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a}) {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((({b}) {div} {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def _dims(div: str) -> tuple[str, str]:
    au = "user_id % 64"
    if div == "div":
        tb = f"(unix_millis(ts) {div} 3600000 - {_ANCHOR_H}) {div} {_TB_DIV}"
    else:
        tb = f"(epoch_ms(ts) {div} 3600000 - {_ANCHOR_H}) {div} {_TB_DIV}"
    return au, tb


_ORACLE_AU, _ORACLE_TB = _dims("//")


def zed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events annotated with (au, tb, zcell) — the z-clustering
    projection shared by the full rewrite and the incremental path."""
    au_sql, tb_sql = _dims("div")
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        F.expr(au_sql).cast("bigint").alias("au"),
        F.expr(tb_sql).cast("bigint").alias("tb"),
    )
    return ev.select(
        "*",
        F.expr(
            f"({z_interleave_sql('au', 'tb', 'div')}) div {_CELL_SHIFT}"
        )
        .cast("bigint")
        .alias("zcell"),
    )


@register(
    "zorder_layout",
    tags=("sources", "events", "pushdown", "incremental"),
    oracle=f"""
        WITH e AS (
            SELECT event_id,
                   CAST({_ORACLE_AU} AS BIGINT) AS au,
                   CAST({_ORACLE_TB} AS BIGINT) AS tb
            FROM events
        ),
        z AS (
            SELECT event_id, au, tb,
                   CAST(({z_interleave_sql("au", "tb", "//")}) AS BIGINT)
                       // {_CELL_SHIFT} AS zcell
            FROM e
        )
        SELECT zcell,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MIN(au) AS BIGINT) AS au_lo,
               CAST(MAX(au) AS BIGINT) AS au_hi,
               CAST(MIN(tb) AS BIGINT) AS tb_lo,
               CAST(MAX(tb) AS BIGINT) AS tb_hi,
               md5(string_agg(CAST(event_id AS VARCHAR), ','
                              ORDER BY event_id)) AS ev_digest
        FROM z GROUP BY zcell ORDER BY zcell
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rewrite events z-clustered on (user bucket, time bucket), read the
    at-rest result back, and publish the per-cell inventory: content
    digest + both-dimension spans (the pruning metadata)."""
    zed = zed_events(spark, sf_dir)

    def build(path: str) -> DataFrame:
        # the layout op itself: co-locate each cell's rows (repartition on
        # the cell key), then one directory per cell at rest
        zed.repartition(F.col("zcell")).write.mode("overwrite").partitionBy(
            "zcell"
        ).parquet(path)
        back = spark.read.parquet(path)
        return (
            back.groupBy(F.col("zcell").cast("bigint").alias("zcell"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.min("au").cast("bigint").alias("au_lo"),
                F.max("au").cast("bigint").alias("au_hi"),
                F.min("tb").cast("bigint").alias("tb_lo"),
                F.max("tb").cast("bigint").alias("tb_hi"),
                F.md5(
                    F.concat_ws(
                        ",",
                        F.array_sort(F.collect_list("event_id")).cast(
                            "array<string>"
                        ),
                    )
                ).alias("ev_digest"),
            )
            .orderBy("zcell")
        )

    return sink_roundtrip("zorder_", build)
