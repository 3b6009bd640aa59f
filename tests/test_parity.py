"""Oracle-parity harness: for EVERY registered query with an oracle, run the
Spark query and the DuckDB SQL on the same sf dir and assert equal results —
exactly the driver's CORRECTNESS check, run locally at sf0.001 for speed."""

from __future__ import annotations

import pytest

from gpu_mapreduce_spark.registry import load_all
from tests.conftest import SF_DIR, compare_frames

_QUERIES = load_all()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle_parity(name, spark, ddb):
    q = _QUERIES[name]
    df = q.fn(spark, SF_DIR)
    assert df is not None
    if q.oracle is None:
        assert df.count() > 0  # rows-only smoke — must produce rows
        return
    compare_frames(df, ddb.sql(q.oracle.replace("{SF_DIR}", SF_DIR)))


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
