"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over `gpu_mapreduce_spark.registry` — every implemented operator
from SURVEY.md §2 registers a (Spark query, DuckDB oracle) pair there; this
module just re-exposes the registry in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gpu_mapreduce_spark.registry import driver_order, load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"
ORACLE_SF_DIR = "/root/testdata/sf0.01"  # the driver's correctness scale


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    q = load_all()["q1_pricing_summary"]
    return q.fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry queries, STALENESS-ordered (see registry.driver_order):
    the driver checks only the first ~50 entries, so queries with no green
    row in any committed CORRECTNESS_r*.json come first and the rest rotate
    by how long ago they were last verified."""
    reg = load_all()
    return {name: reg[name].fn for name in driver_order()}


def oracle_sql(sf_dir: str = ORACLE_SF_DIR) -> dict[str, str]:
    """Oracle SQL per query (same staleness order as queries()); `{SF_DIR}`
    templates (used by oracles that read files directly rather than the
    pre-registered views) are resolved to the driver's sf0.01 correctness
    dir. The driver calls this with no args; tools/drive_driver.py passes
    its sweep dir so the substitution logic lives in exactly one place."""
    reg = load_all()
    return {
        name: reg[name].oracle.replace("{SF_DIR}", sf_dir)
        for name in driver_order()
        if reg[name].oracle is not None
    }
