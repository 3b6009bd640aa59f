"""session_transitions model checks: the boundary convention on a hand
feed (a gap > G breaks the chain — the session-boundary pair is
excluded), exact basis-point normalization, and row-total consistency
on the fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_mapreduce_spark.queries.sessionize import _GAP_MS
from gpu_mapreduce_spark.queries.transitions import session_transitions
from tests.conftest import SF_DIR


def test_hand_feed_boundary_convention(spark):
    """u1: A->B (5 min), B->C (gap G exactly: kept — the rule is > G),
    C->A (gap G+1: EXCLUDED); u2 contributes one more A->B."""
    g = _GAP_MS
    rows = [
        (1, 1, "A", 0),
        (1, 2, "B", 5 * 60_000),
        (1, 3, "C", 5 * 60_000 + g),
        (1, 4, "A", 5 * 60_000 + 2 * g + 1),
        (2, 5, "A", 0),
        (2, 6, "B", 60_000),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, event_type string, ts_ms bigint"
    ).select(
        "user_id",
        "event_id",
        "event_type",
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
    )
    import tempfile

    import glob
    import shutil

    with tempfile.TemporaryDirectory(prefix="trans_hand_") as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/_w")
        (part,) = glob.glob(f"{d}/_w/part-*.parquet")
        shutil.move(part, f"{d}/events.parquet")
        got = {
            (r.from_type, r.to_type): (r.n_ab, r.n_a, r.p_bp)
            for r in session_transitions(spark, d).collect()
        }
    assert got == {
        ("A", "B"): (2, 2, 10000),
        ("B", "C"): (1, 1, 10000),
    }


def test_fixture_totals_and_probabilities_consistent(spark):
    out = session_transitions(spark, SF_DIR).collect()
    assert out
    by_from: dict[str, list] = {}
    for r in out:
        by_from.setdefault(r.from_type, []).append(r)
    for ft, rows in by_from.items():
        n_a = rows[0].n_a
        assert all(r.n_a == n_a for r in rows), ft
        assert sum(r.n_ab for r in rows) == n_a, ft
        for r in rows:
            assert r.p_bp == (10000 * r.n_ab) // n_a


def test_slab_boundary_pairs_row_identical(spark):
    """r14 slabbed form: a pair crossing midnight with gap <= G is kept
    (the boundary join), a crossing pair with gap > G is excluded, and
    a pair separated by an entire empty slab never appears."""
    from gpu_mapreduce_spark.queries.sessionize_slab import SLAB_MS

    day = SLAB_MS
    rows = [
        # u1: 1 min before midnight -> 10 min after: kept (gap 11 min)
        (1, 1, "A", day - 60_000),
        (1, 2, "B", day + 10 * 60_000),
        # u2: 1 min before midnight -> G+2min after: excluded (gap > G)
        (2, 3, "A", 2 * day - 60_000),
        (2, 4, "B", 2 * day + _GAP_MS + 60_000),
        # u3: last event slab 0, next event slab 2 (empty slab 1)
        (3, 5, "C", day - 1),
        (3, 6, "A", 2 * day + 1),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, event_type string, ts_ms bigint"
    ).select(
        "user_id",
        "event_id",
        "event_type",
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
    )
    import glob
    import shutil
    import tempfile

    with tempfile.TemporaryDirectory(prefix="trans_slab_") as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/_w")
        (part,) = glob.glob(f"{d}/_w/part-*.parquet")
        shutil.move(part, f"{d}/events.parquet")
        got = {
            (r.from_type, r.to_type): r.n_ab
            for r in session_transitions(spark, d).collect()
        }
    assert got == {("A", "B"): 1}
