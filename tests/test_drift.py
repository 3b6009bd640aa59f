"""Model checks for the staged drift-statistic core (functions/drift.py
— the r14 score_drift_monitor convention): identical distributions
score zero, sensitivity grows with separation, the DuckDB twin replays
the integer algebra bit-for-bit, and the envelope guard raises."""

from __future__ import annotations

import duckdb
import pytest

from gpu_mapreduce_spark.functions import drift


def test_identical_shares_score_zero():
    a = {0: 100, 1: 300, 2: 600}
    b = {0: 200, 1: 600, 2: 1200}  # same shares, doubled mass
    stat, contribs = drift.drift_stat(a, b)
    assert stat == 0 and all(c == 0 for c in contribs.values())


def test_sensitivity_grows_with_separation():
    base = {0: 500, 1: 500}
    mild = {0: 550, 1: 450}
    strong = {0: 800, 1: 200}
    s_mild, _ = drift.drift_stat(base, mild)
    s_strong, _ = drift.drift_stat(base, strong)
    assert 0 < s_mild < s_strong


def test_one_sided_empty_bins_contribute():
    stat, contribs = drift.drift_stat({0: 10, 1: 0}, {0: 0, 1: 10})
    assert contribs[0] == contribs[1] == 100  # diff = 100, den = 100
    assert stat == 200
    # empty on BOTH sides: zero by convention
    assert drift.drift_contrib(0, 0, 10, 10) == 0


def test_duckdb_twin_replays_bitwise():
    a = {i: (i * 37) % 97 + 1 for i in range(16)}
    b = {i: (i * 53) % 89 + 3 for i in range(16)}
    stat, contribs = drift.drift_stat(a, b)
    n_tot, m_tot = sum(a.values()), sum(b.values())
    con = duckdb.connect()
    con.execute("CREATE TABLE bins (i INT, n BIGINT, m BIGINT)")
    con.executemany(
        "INSERT INTO bins VALUES (?, ?, ?)",
        [(i, a[i], b[i]) for i in a],
    )
    rows = con.execute(
        f"""
        SELECT i,
               CASE WHEN n = 0 AND m = 0 THEN 0
                    ELSE ((n * {m_tot} - m * {n_tot})
                          * (n * {m_tot} - m * {n_tot}))
                         // (n * {m_tot} + m * {n_tot}) END AS c
        FROM bins ORDER BY i
        """
    ).fetchall()
    con.close()
    assert {i: c for i, c in rows} == contribs
    assert sum(c for _i, c in rows) == stat


def test_envelope_guard_raises():
    big = {0: 4_000_000_000}
    with pytest.raises(ValueError, match="BIGINT square envelope"):
        drift.drift_stat(big, big)
