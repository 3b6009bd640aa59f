"""Cross-engine parity of the portable md5-hex-slice hash — the foundation
under every hash-reproducing oracle (simhash signatures, luby priorities,
the rmat generator trace). A drift here would break five oracles at once,
so it gets its own fast-failing check: Spark's
conv(substring(md5(s),1,15),16,10) must equal DuckDB's
('0x'||substr(md5(s),1,15))::BIGINT for the same input string, and the
derived uniform double (top 53 bits · 2^-53) must be bit-identical."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

SAMPLES = [
    "",
    "a",
    "12345|678",
    "7|token",
    "12345|4095|11",
    "seed|%s|level" % (2**62),
    "unicode-émoji-☃",
    " leading and trailing ",
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _spark_vals(spark, expr_builder):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    return [r.v for r in df.select(expr_builder(F.col("s")).alias("v")).collect()]


def test_hash60_parity(spark, duck):
    got = _spark_vals(
        spark,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
    )
    want = [
        duck.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
        ).fetchone()[0]
        for s in SAMPLES
    ]
    assert got == want


def test_hash60_second_slice_parity(spark, duck):
    """Chars 16-30 (the simhash high-bit source) agree too."""
    got = _spark_vals(
        spark,
        lambda s: F.conv(F.substring(F.md5(s), 16, 15), 16, 10).cast("long"),
    )
    want = [
        duck.execute(
            "SELECT ('0x' || substr(md5(?), 16, 15))::BIGINT", [s]
        ).fetchone()[0]
        for s in SAMPLES
    ]
    assert got == want


def test_uniform_double_parity(spark, duck):
    """The rmat draw: (hash60 >> 7) · 2^-53 must be the same IEEE double in
    both engines (exact: 53-bit integer → double is lossless)."""
    got = _spark_vals(
        spark,
        lambda s: F.shiftrightunsigned(
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"), 7
        ).cast("double")
        * F.lit(1.0 / (1 << 53)),
    )
    want = [
        duck.execute(
            "SELECT (('0x' || substr(md5(?), 1, 15))::BIGINT >> 7)::DOUBLE"
            f" * {2.0 ** -53!r}",
            [s],
        ).fetchone()[0]
        for s in SAMPLES
    ]
    assert got == want  # exact equality, not approx — the draws must agree


def test_concat_ws_renders_like_sql_concat(spark, duck):
    """Spark concat_ws('|', lit(seed), bigint_col) must byte-match the
    DuckDB seed || '|' || CAST(v AS VARCHAR) rendering used in oracles."""
    df = spark.range(1).select(
        F.concat_ws("|", F.lit("12345"), F.lit(2**62).cast("long"), F.lit("3")).alias("v")
    )
    got = df.collect()[0].v
    want = duck.execute(
        "SELECT '12345' || '|' || CAST(4611686018427387904 AS VARCHAR) || '|' || '3'"
    ).fetchone()[0]
    assert got == want
