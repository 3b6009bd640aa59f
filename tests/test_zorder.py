"""Z-order layout locality: the pruning claim behind queries/zorder.py.

The oracle gate proves content identity and span accounting; this pins the
reason the layout exists — z-cells are tight in BOTH dimensions, so range
predicates map to few cells, while a 1-D (time-sorted) layout is tight in
one dimension and full-width in the other."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_mapreduce_spark.queries.zorder import (
    _CELL_SHIFT,
    _dims,
    z_interleave_sql,
    zorder_layout,
)
from gpu_mapreduce_spark.sources.tables import table

# sf0.01: every au bucket (64) and tb bucket (60) is populated, so the
# cell census and span bounds are exercised at full width (sf0.001 has
# only 15 users and leaves most au buckets empty)
_SF = "/root/testdata/sf0.01"


def _cells(spark):
    au_sql, tb_sql = _dims("div")
    ev = table(spark, _SF, "events").select(
        F.expr(au_sql).cast("bigint").alias("au"),
        F.expr(tb_sql).cast("bigint").alias("tb"),
    )
    return ev.select(
        "au",
        "tb",
        F.expr(
            f"({z_interleave_sql('au', 'tb', 'div')}) div {_CELL_SHIFT}"
        ).alias("zcell"),
    )


def test_zorder_cells_are_tight_in_both_dimensions(spark):
    inv = zorder_layout(spark, _SF).collect()
    assert len(inv) == 64  # 3 high bits per dimension -> 8x8 cell grid
    for r in inv:
        # a cell fixes the top 3 bits of each dimension: span <= 8 of 64
        assert r.au_hi - r.au_lo <= 7, r
        assert r.tb_hi - r.tb_lo <= 7, r
        assert r.n_events > 0


def test_zorder_range_predicates_prune_to_few_cells(spark):
    zed = _cells(spark)

    def ncells(cond) -> int:
        return zed.filter(cond).select("zcell").distinct().count()

    # cell-aligned 2-D range (one au bucket x one tb bucket): ONE cell
    aligned = (
        F.col("au").between(16, 23) & F.col("tb").between(24, 31)
    )
    assert ncells(aligned) == 1
    # unaligned 2-D range straddling two buckets per dimension: <= 4 cells
    unaligned = (
        F.col("au").between(20, 27) & F.col("tb").between(20, 27)
    )
    assert ncells(unaligned) <= 4
    # 1-D user-only range: one au bucket -> its 8 cells (of 64)
    assert ncells(F.col("au").between(16, 23)) == 8
    # the comparison that motivates z-order: under a TIME-SORTED layout
    # (files = tb slices) the same user-only predicate touches every
    # populated time slice — a full scan
    n_tb_total = zed.select("tb").distinct().count()
    n_tb_touched = (
        zed.filter(F.col("au").between(16, 23))
        .select("tb")
        .distinct()
        .count()
    )
    assert n_tb_touched == n_tb_total
