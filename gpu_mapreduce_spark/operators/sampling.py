"""Deterministic sampling operators for the training-data pipeline layer
(builder brief "beyond-reference"; the reference has no sampling at all —
its demos subsample by generating less data).

Why not `DataFrame.sample()`: Spark's sampler is seeded per-partition, so
the selected set changes with partitioning, engine, and retry — useless for
reproducible pipelines and un-oracle-able. Sampling here is a PURE FILTER on
a portable hash of a stable row key: u = uniform01(md5(tag|key)) < rate.

  - Rerun-, partitioning- and engine-independent: the same rows are chosen
    on a laptop, a 1000-executor cluster, and inside the DuckDB oracle.
  - Embarrassingly parallel: no shuffle, no state; pushes down to a scan
    filter, composes with any downstream operator.
  - Statistically sound: md5 bits are uniform, so P(keep) = rate per row and
    strata are sampled independently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gpu_mapreduce_spark.functions.portable import sql_uniform01, uniform01


def _key(tag: str, key_col: str) -> Column:
    return F.concat_ws("|", F.lit(tag), F.col(key_col).cast("string"))


def sample_uniform(
    df: DataFrame, key_col: str, rate: float, tag: str = "smp"
) -> DataFrame:
    """Keep each row iff uniform01(tag|key) < rate. Deterministic in
    (data, tag, rate) only."""
    return df.filter(uniform01(_key(tag, key_col)) < F.lit(rate))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    tag: str = "smp",
) -> DataFrame:
    """Per-stratum deterministic sampling: rows in stratum s are kept at
    rates[s] (default_rate for unlisted strata). One scan, zero shuffles."""
    thr: Column = F.lit(default_rate)
    for s, r in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == s, F.lit(r)).otherwise(thr)
    return df.filter(uniform01(_key(tag, key_col)) < thr)


def sql_sample_predicate(tag: str, key_expr: str, rate_expr: str) -> str:
    """DuckDB mirror of the keep-predicate, for oracle SQL: the SAME hash,
    threshold comparison, and string rendering (`tag|key`)."""
    u = sql_uniform01(f"'{tag}' || '|' || CAST({key_expr} AS VARCHAR)")
    return f"({u} < ({rate_expr}))"
