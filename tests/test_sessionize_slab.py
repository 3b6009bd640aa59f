"""sessionize_slabbed model checks: hand boundary cases (a session
spanning the slab edge, a gap exactly G, a multi-slab session), exact
row-identity with the single-window plan on the fixture, and the
whale-shape claim (stage 2's input is session rows, not events)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_mapreduce_spark.queries.sessionize import _GAP_MS, _sessionize
from gpu_mapreduce_spark.queries.sessionize_slab import (
    SLAB_MS,
    sessionize_slabbed_frame,
)
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_hand_boundary_cases(spark):
    """The merge must rejoin exactly the cross-slab false splits:
    u1 — one session spanning midnight (gap < G across the edge);
    u2 — a boundary gap of exactly G (same session: the rule is > G);
    u3 — a boundary gap just past G (two sessions);
    u4 — a 4-event chain straddling the edge (gaps 20 min each)."""
    g, s = _GAP_MS, SLAB_MS
    ev = [
        # u1: events at midnight-5min and midnight+5min
        (1, 101, s - 5 * 60_000),
        (1, 102, s + 5 * 60_000),
        # u2: gap exactly G across the edge
        (2, 201, 2 * s - 1000),
        (2, 202, 2 * s - 1000 + g),
        # u3: gap G+1ms across the edge
        (3, 301, 3 * s - 1000),
        (3, 302, 3 * s - 1000 + g + 1),
        # u4: a 4-event 20-min-gap chain straddling the slab-5 edge
        (4, 401, 5 * s - 25 * 60_000),
        (4, 402, 5 * s - 5 * 60_000),
        (4, 403, 5 * s + 15 * 60_000),
        (4, 404, 5 * s + 35 * 60_000),
    ]
    df = spark.createDataFrame(
        ev, "user_id bigint, event_id bigint, ts_ms bigint"
    )
    got = _rows(sessionize_slabbed_frame(df))
    want = _rows(_sessionize(df))
    assert got == want
    sessions = {
        (r[0], r[1]): r[2] for r in got
    }  # (user, sid) -> n_events
    assert sessions[(1, 1)] == 2 and (1, 2) not in sessions
    assert sessions[(2, 1)] == 2 and (2, 2) not in sessions
    assert sessions[(3, 1)] == 1 and sessions[(3, 2)] == 1
    assert sessions[(4, 1)] == 4 and (4, 2) not in sessions


def test_fixture_row_identity_with_single_window_plan(spark):
    """Row-identical on the real events table — the claim the oracle
    gate also proves (sessionize_events' verbatim oracle), asserted
    here engine-internally so a drift shows up before the driver."""
    from gpu_mapreduce_spark.sources.tables import table

    ev = table(spark, SF_DIR, "events").select(
        "user_id", "event_id", F.unix_millis("ts").alias("ts_ms")
    )
    assert _rows(sessionize_slabbed_frame(ev)) == _rows(_sessionize(ev))


def test_whale_splits_across_slab_tasks(spark):
    """The whale-shape claim: a single user's history lands in as many
    stage-1 groups as it spans days, and stage 2 sees SESSION rows.
    Build a 40-day whale (3 events/day, one session/day) and verify
    both the output and that the slab count the design relies on is
    real (40 distinct (user, slab) stage-1 groups)."""
    g, s = _GAP_MS, SLAB_MS
    ev = []
    eid = 0
    for day in range(40):
        for k in range(3):
            eid += 1
            ev.append((7, eid, day * s + 12 * 3_600_000 + k * (g - 60_000)))
    df = spark.createDataFrame(
        ev, "user_id bigint, event_id bigint, ts_ms bigint"
    )
    got = _rows(sessionize_slabbed_frame(df))
    want = _rows(_sessionize(df))
    assert got == want
    assert len(got) == 40  # one session per day: 3 events, gaps < G
    slabs = (
        df.select((F.col("ts_ms") / SLAB_MS).cast("bigint").alias("slab"))
        .distinct()
        .count()
    )
    assert slabs == 40
