"""Query registry: name -> (Spark query, DuckDB oracle SQL).

This is the single source of truth consumed by `__spark_entry__.py`
(driver contract), `tests/test_parity.py` (local oracle harness) and
`bench.py` (headline timing set).

Determinism rules every registered query follows (so the driver's
order-insensitive value-hash matches):
  - Every computed column is aliased identically in Spark and SQL.
  - DOUBLE aggregations are computed exactly via the fixed-point discipline in
    functions/numeric.py: per-row arithmetic in DOUBLE, FLOOR(x * 10000) to a
    BIGINT, exact integer sum, final divide-by-10000 back to DOUBLE. Averages
    divide that exact sum by the count. Never rely on float summation order.
  - LIMIT queries carry a total order (ties broken by key columns).
  - Timestamps are output as epoch milliseconds or DATE, never raw
    timestamp (engine formatting differs).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QueryDef] = {}


def register(
    name: str,
    *,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query {name!r}")
        QUERIES[name] = QueryDef(name, fn, oracle, bench, tags)
        return fn

    return deco


_loaded = False


def load_all() -> dict[str, QueryDef]:
    """Import every query-defining module exactly once and return the registry."""
    global _loaded
    if not _loaded:
        from gpu_mapreduce_spark.queries import (  # noqa: F401
            relational,
            core_ops,
            text,
            graph,
            graph_iter,
            rmat_gen,
            dedup,
            similarity,
            textstats,
            multimodal,
            streaming_batch,
            analytics,
            skew,
        )

        _loaded = True
    return QUERIES
