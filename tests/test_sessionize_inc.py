"""sessionize_incremental's fold semantics on hand feeds — the edges the
oracle's bulk hash can't isolate: the seed row's gap test must behave
EXACTLY like the batch lag (strict > gap), ids must continue
arithmetically, untouched base sessions must pass through byte-equal."""

from __future__ import annotations

from gpu_mapreduce_spark.queries.sessionize import _GAP_MS
from gpu_mapreduce_spark.queries.sessionize_inc import fold_delta_sessions

_SESS = (
    "user_id bigint, session_id bigint, n_events bigint,"
    " t_start_ms bigint, t_end_ms bigint, dur_s bigint"
)
_EV = "user_id bigint, event_id bigint, ts_ms bigint"


def test_fold_delta_sessions_edges(spark):
    base = spark.createDataFrame(
        [
            (1, 1, 2, 0, 1_000, 1),
            (1, 2, 3, 3_000_000, 3_001_000, 1),
            (2, 1, 1, 500, 500, 0),  # untouched by the delta
        ],
        _SESS,
    )
    delta = spark.createDataFrame(
        [
            # gap EXACTLY _GAP_MS from u1's carried t_end: the rule is
            # strict >, so this EXTENDS session 2 (the boundary case a
            # wrong >= would silently split)
            (1, 10, 3_001_000 + _GAP_MS),
            # one ms past the gap from the previous event: opens session 3
            (1, 11, 3_001_000 + 2 * _GAP_MS + 1),
            # first-ever-seen user: sessions start at 1
            (3, 12, 7_000),
            (3, 13, 8_000),
        ],
        _EV,
    )
    got = sorted(
        tuple(r) for r in fold_delta_sessions(base, delta).collect()
    )
    assert got == [
        (1, 1, 2, 0, 1_000, 1),
        (1, 2, 4, 3_000_000, 3_001_000 + _GAP_MS, (1_000 + _GAP_MS) // 1000),
        (
            1,
            3,
            1,
            3_001_000 + 2 * _GAP_MS + 1,
            3_001_000 + 2 * _GAP_MS + 1,
            0,
        ),
        (2, 1, 1, 500, 500, 0),
        (3, 1, 2, 7_000, 8_000, 1),
    ]


def test_fold_empty_delta_is_identity(spark):
    base = spark.createDataFrame(
        [(1, 1, 2, 0, 1_000, 1), (2, 1, 1, 500, 500, 0)], _SESS
    )
    delta = spark.createDataFrame([], _EV)
    got = sorted(tuple(r) for r in fold_delta_sessions(base, delta).collect())
    assert got == [(1, 1, 2, 0, 1_000, 1), (2, 1, 1, 500, 500, 0)]
