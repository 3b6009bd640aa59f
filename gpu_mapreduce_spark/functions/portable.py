"""Portable (cross-engine) deterministic hashing helpers.

The driver's correctness gate hashes VALUES, so any operator whose output
depends on a hash must use one both engines can compute bit-identically.
The portable form used across this repo (see also operators/rmat.py:54-56,
operators/dedup.simhash_sigs):

    Spark:  conv(substring(md5(s), 1, 15), 16, 10) cast to BIGINT
    DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

— 15 hex chars = 60 bits, always positive. A uniform double in [0, 1) is
`(h >> 7) * 2^-53`: 53 mantissa bits, exactly representable, so the float
compare against a threshold literal is deterministic in both engines.
Guarded by tests/test_portable_hash.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(s: Column) -> Column:
    """60-bit positive BIGINT hash of a string column (md5 hex prefix)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def uniform01(s: Column) -> Column:
    """Deterministic uniform double in [0, 1) from a string column —
    exactly reproducible by the DuckDB mirror `sql_uniform01`."""
    return F.shiftrightunsigned(hash60(s), 7).cast("double") * F.lit(
        1.0 / (1 << 53)
    )


def sql_uniform01(expr: str) -> str:
    """DuckDB mirror of `uniform01` for splicing into oracle SQL."""
    return (
        f"(CAST((('0x' || substr(md5({expr}), 1, 15))::BIGINT >> 7) AS DOUBLE)"
        f" * (1.0 / 9007199254740992))"
    )
