"""score_drift_monitor checks: the parity split of one corpus is
same-distribution (flag stays 0 at every fixture scale), a hand-built
corpus with a REAL parity-correlated quality shift trips the flag, the
emitted contributions replay the staged functions/drift.py core
exactly, and the sf0.01 driver scale hash-matches the oracle."""

from __future__ import annotations

import glob
import shutil
import tempfile

import duckdb

from gpu_mapreduce_spark.functions.drift import drift_stat
from gpu_mapreduce_spark.queries.drift_monitor import (
    _K_CHI2,
    score_drift_monitor,
)
from gpu_mapreduce_spark.registry import load_all
from tests.conftest import SF001_DIR, SF_DIR, compare_frames


def test_fixture_parity_split_does_not_drift(spark):
    out = score_drift_monitor(spark, SF_DIR).collect()
    assert out
    r0 = out[0]
    # parity halves of one corpus: statistic is noise, flag must be 0
    assert r0.flag_drift == 0
    assert r0.n_tot == sum(r.n_i for r in out)
    assert r0.m_tot == sum(r.m_i for r in out)
    # every row repeats the same monitor scalars
    assert {(r.stat, r.n_tot, r.m_tot, r.flag_drift) for r in out} == {
        (r0.stat, r0.n_tot, r0.m_tot, r0.flag_drift)
    }


def test_contributions_replay_the_staged_core(spark):
    out = score_drift_monitor(spark, SF_DIR).collect()
    a = {r.bin_id: r.n_i for r in out}
    b = {r.bin_id: r.m_i for r in out}
    stat, contribs = drift_stat(a, b)
    assert stat == out[0].stat
    assert {r.bin_id: r.contrib for r in out} == contribs
    # the flag convention, scale-free chi-square units, exact integers
    n, m = out[0].n_tot, out[0].m_tot
    assert out[0].flag_drift == (1 if stat * (n + m) >= _K_CHI2 * n * m else 0)


def test_real_shift_trips_the_flag(spark):
    """Even-parity docs are repetitive junk, odd-parity docs are clean
    prose — a genuine week-over-week quality collapse must flag."""
    junk = "spam " * 40  # one repeated token: top_u/dup2_u saturate
    prose = (
        "the quick brown fox jumps over a lazy dog while many other "
        "animals watch from the forest edge with great interest today"
    )
    rows = [(i, junk if i % 2 == 0 else prose) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    with tempfile.TemporaryDirectory(prefix="drift_hand_") as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/_w")
        (part,) = glob.glob(f"{d}/_w/part-*.parquet")
        shutil.move(part, f"{d}/documents.parquet")
        out = score_drift_monitor(spark, d).collect()
    r0 = out[0]
    assert r0.flag_drift == 1
    assert r0.stat * (r0.n_tot + r0.m_tot) >= _K_CHI2 * r0.n_tot * r0.m_tot
    # the two populations land in disjoint bins: every occupied bin is
    # one-sided
    assert all((r.n_i == 0) != (r.m_i == 0) for r in out)


def test_driver_scale_parity_sf001(spark):
    """The driver's correctness scale (sf0.01), independent of the
    default-harness SF_DIR override."""
    q = load_all()["score_drift_monitor"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM"
            f" read_parquet('{SF001_DIR}/documents.parquet')"
        )
        compare_frames(q.fn(spark, SF001_DIR), con.sql(q.oracle))
    finally:
        con.close()
