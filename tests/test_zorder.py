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


def test_zorder_partial_compaction_preserves_untouched_files(spark, tmp_path):
    """zorder_incremental's novelty over the digest gate: untouched cell
    directories survive partial compaction BYTE-IDENTICAL (the
    manifest-repoint analog), and every touched cell compacts to exactly
    one data file. A row digest cannot see file bytes, so this is pinned
    from the listing."""
    import filecmp
    import os

    from gpu_mapreduce_spark.queries.zorder import zed_events
    from gpu_mapreduce_spark.queries.zorder_inc import (
        _MOD,
        _REM,
        partial_compact,
    )

    zed = zed_events(spark, _SF)
    base_root = str(tmp_path / "base")
    (
        zed.filter(F.col("event_id") % _MOD != _REM)
        .repartition(F.col("zcell"))
        .write.partitionBy("zcell")
        .parquet(base_root)
    )
    # restrict the delta to a band of cells so the untouched set is
    # non-empty (the natural sf0.01 delta touches all 64)
    delta = zed.filter(
        (F.col("event_id") % _MOD == _REM) & (F.col("zcell") < 8)
    )
    out_root = str(tmp_path / "compact")
    touched, untouched = partial_compact(spark, base_root, delta, out_root)
    assert touched and untouched

    for c in untouched:
        a, b = f"{base_root}/zcell={c}", f"{out_root}/zcell={c}"
        fa, fb = sorted(os.listdir(a)), sorted(os.listdir(b))
        assert fa == fb, c
        for f in fa:
            assert filecmp.cmp(f"{a}/{f}", f"{b}/{f}", shallow=False), (c, f)
    for c in touched:
        parts = [
            f
            for f in os.listdir(f"{out_root}/zcell={c}")
            if f.endswith(".parquet")
        ]
        assert len(parts) == 1, (c, parts)
    # row-content identity of the whole compacted root
    back = spark.read.parquet(out_root)
    want = zed.filter(
        (F.col("event_id") % _MOD != _REM)
        | ((F.col("event_id") % _MOD == _REM) & (F.col("zcell") < 8))
    )
    assert back.count() == want.count()
    assert (
        back.select(F.sum("event_id")).first()[0]
        == want.select(F.sum("event_id")).first()[0]
    )
