"""The fixed-point HLL estimator convention (functions/hllest.py): one
formula, three engines — the Spark fragments, the DuckDB mirrors and the
Python twin must agree to the BIT, because hyperball_harmonic's hash
gate differences these estimates across rounds."""

from __future__ import annotations

import duckdb

from gpu_mapreduce_spark.functions import hllest

# hand sketches: boundary registers (1 and RHO_MAX), a dense sketch
# filling many buckets, and a near-empty one
_SKETCHES = {
    0: {(0, 1)},  # single bucket at the minimum rho
    1: {(0, hllest.RHO_MAX), (63, 1)},  # max rho + min rho
    2: {(b, (b % hllest.RHO_MAX) + 1) for b in range(hllest.M)},  # full
    3: {(b, 3) for b in range(17)},
}


def _d_py(regs: set[tuple[int, int]]) -> int:
    filled = sum(1 << (hllest.RHO_MAX - r) for _, r in regs)
    return (hllest.M - len(regs)) * (1 << hllest.RHO_MAX) + filled


def test_est_fp4_three_engines_agree(spark):
    rows = [(sk, b, r) for sk, regs in _SKETCHES.items() for b, r in regs]
    df = spark.createDataFrame(rows, "sk int, b int, reg int")
    got_spark = {
        row.sk: (row.d, row.est)
        for row in df.groupBy("sk")
        .agg(hllest.d_from_regs().alias("d"))
        .selectExpr("sk", "d", hllest.spark_est_fp4("d") + " AS est")
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE regs (sk INT, b INT, reg INT)")
    con.executemany("INSERT INTO regs VALUES (?, ?, ?)", rows)
    got_duck = {
        sk: (d, est)
        for sk, d, est in con.execute(
            f"""SELECT sk, {hllest.duckdb_d_from_regs()} AS d,
                   {hllest.duckdb_est_fp4(hllest.duckdb_d_from_regs())} AS est
            FROM regs GROUP BY sk"""
        ).fetchall()
    }
    for sk, regs in _SKETCHES.items():
        d = _d_py(regs)
        want = (d, hllest.est_fp4_py(d))
        assert got_spark[sk] == want, f"spark diverges on sketch {sk}"
        assert got_duck[sk] == want, f"duckdb diverges on sketch {sk}"


def test_est_fp4_monotone_in_registers():
    """Raising any register (or filling a bucket) strictly shrinks D and
    never shrinks the estimate — the property that makes the harmonic
    fold's per-round deltas non-negative without sign handling."""
    base = {(b, 2) for b in range(10)}
    d0 = _d_py(base)
    raised = {(0, 3)} | {(b, 2) for b in range(1, 10)}
    filled = base | {(10, 1)}
    for variant in (raised, filled):
        d1 = _d_py(variant)
        assert d1 < d0
        assert hllest.est_fp4_py(d1) >= hllest.est_fp4_py(d0)


def test_est_fp4_accuracy_on_real_sketches():
    """The convention's estimate tracks true cardinality within HLL's
    standard error band on sketches of real sets (m=64 → ~13% relative
    error; assert 3 sigma) — the honesty check the exact gate can't
    give. Empty-set read-out documents the known raw-estimator floor
    (alpha*m ~ 45.4) rather than hiding it."""
    import hashlib

    def sketch(vals):
        regs: dict[int, int] = {}
        for v in vals:
            h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            b, tail = h % hllest.M, h >> 6
            rho = (
                hllest.RHO_MAX
                if tail == 0
                else hllest.RHO_MAX - tail.bit_length()
            )
            regs[b] = max(regs.get(b, 0), rho)
        return {(b, r) for b, r in regs.items()}

    for n in (500, 2000, 10000):
        est = hllest.est_fp4_py(_d_py(sketch(range(n)))) / 10000.0
        assert abs(est - n) / n < 0.39, f"n={n}: est {est}"
    empty_floor = hllest.est_fp4_py(hllest.M * (1 << hllest.RHO_MAX))
    assert empty_floor == hllest.ALPHA_M2_FP4 // hllest.M  # 45.376 raw


def test_est_fp4_envelope_guard_raises_loudly(spark):
    """Below the D floor (est >= 2^63) all three engines RAISE instead of
    silently nulling/wrapping (r12 ADVICE: Spark's non-ANSI cast would
    otherwise diverge from DuckDB's HUGEINT error). The floor itself is
    the exact boundary: D_MIN_SAFE - 1 must raise, D_MIN_SAFE must fit."""
    import duckdb as _duckdb

    import pytest as _pytest

    floor = hllest.D_MIN_SAFE
    assert hllest.NUMER // floor < 2**63
    assert hllest.NUMER // (floor - 1) >= 2**63

    assert hllest.est_fp4_py(floor) == hllest.NUMER // floor
    with _pytest.raises(ValueError, match="envelope floor"):
        hllest.est_fp4_py(floor - 1)

    df = spark.createDataFrame([(floor,), (floor - 1,)], "d bigint")
    ok = df.filter(f"d = {floor}").selectExpr(
        hllest.spark_est_fp4("d") + " AS est"
    )
    assert ok.collect()[0].est == hllest.NUMER // floor
    bad = df.filter(f"d = {floor - 1}").selectExpr(
        hllest.spark_est_fp4("d") + " AS est"
    )
    with _pytest.raises(Exception, match="envelope floor"):
        bad.collect()

    con = _duckdb.connect()
    assert con.execute(
        f"SELECT {hllest.duckdb_est_fp4(str(floor))}"
    ).fetchone()[0] == hllest.NUMER // floor
    with _pytest.raises(Exception, match="envelope floor"):
        con.execute(f"SELECT {hllest.duckdb_est_fp4(str(floor - 1))}")
