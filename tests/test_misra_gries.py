"""misra_gries_topk model checks: the truncation/merge conventions on
hand inputs, the sandwich law (count_lo <= true <= count_lo + err)
against exact counts on the fixture — the guarantee the hash gate
cannot state — and the top-(k+1) sufficiency of the collected rows."""

from __future__ import annotations

import duckdb
import pytest

from gpu_mapreduce_spark.queries import misra_gries as mg
from tests.conftest import SF_DIR


def test_truncate_hand_case_and_no_truncation_below_k():
    counts = {10: 100, 20: 80, 30: 60, 40: 40}
    out, d = mg.mg_truncate(counts, k=3)
    assert d == 40
    assert out == {10: 60, 20: 40, 30: 20}
    # fewer than k+1 keys: no decrement
    out2, d2 = mg.mg_truncate({1: 5, 2: 3}, k=3)
    assert d2 == 0 and out2 == {1: 5, 2: 3}
    # ties rank by key ASC: key 5 beats key 7 at equal count
    out3, d3 = mg.mg_truncate({7: 10, 5: 10, 9: 10}, k=2)
    assert d3 == 10 and out3 == {5: 0, 7: 0}


def test_merge_is_counter_add_then_truncate():
    a = ({1: 10, 2: 5}, 2)
    b = ({2: 7, 3: 4}, 1)
    out, err = mg.mg_merge(a, b, k=2)
    # summed: {1:10, 2:12, 3:4}; d = 4; keep 2:8, 1:6
    assert out == {2: 8, 1: 6}
    assert err == 2 + 1 + 4
    with pytest.raises(ValueError, match="empty summary list"):
        mg.mg_fold([])


def test_topk1_rows_suffice_for_truncation():
    """mg_truncate over the top-(k+1) rows equals mg_truncate over the
    full counts — the property that lets the Spark side collect only
    S * (k+1) rows."""
    full = {i: 1000 - i for i in range(100)}
    ranked = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))
    top = dict(ranked[: mg.MG_K + 1])
    assert mg.mg_truncate(full) == mg.mg_truncate(top)


def test_fixture_sandwich_law_and_heavy_key_surfacing(spark):
    out = mg.misra_gries_topk(spark, SF_DIR).collect()
    final = {r.a: r.b for r in out if r.sec == "final"}
    err = next(r.b for r in out if r.sec == "err")
    assert len(final) == mg.MG_K
    con = duckdb.connect()
    true = dict(
        con.execute(
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) FROM read_parquet("
            f"'{SF_DIR}/events.parquet') GROUP BY user_id"
        ).fetchall()
    )
    con.close()
    for k, lo in final.items():
        assert 0 <= lo <= true[k] <= lo + err, (k, lo, true[k], err)
    # every key whose true count clears the err floor MUST be surfaced
    # (the MG guarantee: missing a key implies true <= err)
    for k, t in true.items():
        if t > err:
            assert k in final, (k, t, err)
