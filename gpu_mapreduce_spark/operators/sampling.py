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


# train/val/test cut points over 10000 hash buckets: 1% test, 1% val, 98%
# train — holdouts first so widening train never reassigns a holdout row
SPLIT_CUTS: tuple[tuple[str, int], ...] = (
    ("test", 100),
    ("val", 200),
    ("train", 10000),
)


def split_bucket(tag: str, key_col: str) -> Column:
    """Deterministic 0..9999 bucket of a stable row key (hash60 % 10000) —
    the assignment primitive behind hash_split, exposed for oracle parity
    tests."""
    from gpu_mapreduce_spark.functions.portable import hash60

    return hash60(_key(tag, key_col)) % 10000


def hash_split(
    df: DataFrame,
    key_col: str,
    cuts: tuple[tuple[str, int], ...] = SPLIT_CUTS,
    tag: str = "split",
) -> DataFrame:
    """Seeded train/val/test assignment as a PURE SCAN PROJECTION: row ->
    split name by its hash bucket against ascending cut points. Why not
    DataFrame.randomSplit: Spark's splitter samples per-partition, so the
    assignment changes with partitioning, retries, and engine — a holdout
    set that silently rotates into training data on the next rerun is a
    contamination bug, not a split. Here the same doc lands in the same
    split on a laptop, a 1000-executor cluster, and inside the DuckDB
    oracle, and membership is derivable from the key alone (no membership
    table to ship). Zero shuffles; composes with any downstream filter."""
    b = split_bucket(tag, key_col)
    names = [n for n, _ in cuts]
    expr: Column = F.lit(names[-1])
    for name, cut in reversed(cuts[:-1]):
        expr = F.when(b < cut, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def sql_split_expr(tag: str, key_expr: str,
                   cuts: tuple[tuple[str, int], ...] = SPLIT_CUTS) -> str:
    """DuckDB mirror of hash_split's assignment expression."""
    b = (f"(('0x' || substr(md5('{tag}' || '|' ||"
         f" CAST({key_expr} AS VARCHAR)), 1, 15))::BIGINT % 10000)")
    whens = " ".join(
        f"WHEN {b} < {cut} THEN '{name}'" for name, cut in cuts[:-1]
    )
    return f"CASE {whens} ELSE '{cuts[-1][0]}' END"
