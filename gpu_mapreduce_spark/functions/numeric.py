"""Numeric helpers shared by oracle-checked queries.

Cross-engine float determinism: plain SUM(double) depends on partial-agg
order, and even double→DECIMAL casts round differently between engines
(DuckDB's cast is not exact-decimal rounding). The portable discipline used
by every aggregate in this repo:

    per-row:  q = FLOOR(expr * 10000)  — expr is computed in IEEE doubles,
              bit-identical in Spark and DuckDB; FLOOR is exact; q is an
              integer-valued double, cast to BIGINT losslessly.
    sum:      SUM(q) in integer arithmetic — exact, order-independent.
    output:   SUM(q)/10000.0 as DOUBLE (one deterministic division).

This fixed-point (4 implied decimals) quantization is also the right call at
100 TB: a billion-row float sum is otherwise not reproducible run-to-run,
while integer sums are exact at any scale (BIGINT holds |sum| < 9.2e14 in
value terms — beyond that widen the scale factor or use DECIMAL sums).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 10000  # 4 implied decimal places


def dsum(col: Column) -> Column:
    """Order-independent, engine-portable sum of a double expression."""
    return (
        F.sum(F.floor(col * SCALE).cast("bigint")).cast("double") / SCALE
    ).alias("dsum")


def davg(col: Column) -> Column:
    """Exact-sum average of a double expression, returned as DOUBLE."""
    return (
        F.sum(F.floor(col * SCALE).cast("bigint")).cast("double")
        / SCALE
        / F.count(col)
    ).alias("davg")


# DuckDB-side mirrors, for splicing into oracle SQL strings.
def sql_dsum(expr: str) -> str:
    return f"(CAST(SUM(CAST(FLOOR(({expr}) * {SCALE}) AS BIGINT)) AS DOUBLE) / {SCALE})"


def sql_davg(expr: str) -> str:
    return f"(CAST(SUM(CAST(FLOOR(({expr}) * {SCALE}) AS BIGINT)) AS DOUBLE) / {SCALE} / COUNT({expr}))"
