"""Core KV dataflow algebra — the MR-MPI operator set (SURVEY.md §2.1),
re-expressed over DataFrames.

The reference's data model is a distributed multiset of opaque byte pairs
(src/keyvalue.h:27-34); ours is a typed DataFrame with designated key/value
columns. The KMV (grouped) form is either `ARRAY<value>` per key (small
groups) or the group iterator of applyInPandas (huge groups — the analog of
the reference's multi-block KMV streaming, src/mapreduce.h:105-107).

Semantics deltas vs the reference, intentional and documented:
  - `sort_keys`/`sort_values` are PER-PROCESSOR sorts in the reference
    (src/mapreduce.cpp:2102-2208); we expose both `within_partitions=True`
    (faithful, no shuffle) and the global sort users actually want.
  - `collapse` is per-processor there (src/mapreduce.cpp:681-708); we default
    to the global form (one row total) and offer the per-partition form.
  - `aggregate`'s custom hash (src/mapreduce.cpp:385-563) is Spark's hash
    partitioning; `repartition(n, key)` is the explicit form.

Scale notes: collate/compress/collate-like ops are single-shuffle with
map-side partial aggregation (the reference's `compress`-before-`aggregate`
pattern, src/mapreduce.cpp:749-859, which Spark applies automatically).
`collect_list` groups must fit in executor memory — for unbounded groups use
`group_apply` below (iterator-based) instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collate(
    kv: DataFrame, key: str | Sequence[str] = "k", val: str = "v", sort: bool = True
) -> DataFrame:
    """Global group-by: KV → KMV (src/mapreduce.cpp:710-747 `collate` =
    aggregate + convert). Values packed as an array per key; sorted for
    determinism (reference order is arrival order — undefined under MPI)."""
    keys = [key] if isinstance(key, str) else list(key)
    arr = F.collect_list(val)
    if sort:
        arr = F.array_sort(arr)
    return kv.groupBy(*keys).agg(arr.alias("vals"))


def compress(kv: DataFrame, key: str = "k", val: str = "v", agg: str = "sum") -> DataFrame:
    """Reference `compress` (src/mapreduce.cpp:749-859): LOCAL duplicate-key
    merge before the shuffle. Spark performs exactly this as partial (map-side)
    aggregation inside any algebraic groupBy — so the faithful mapping is the
    aggregation itself; this helper exposes the common sum/count/min/max cases."""
    return kv.groupBy(key).agg(getattr(F, agg)(val).alias(agg))


def cull(df: DataFrame) -> DataFrame:
    """Drop duplicate rows (oink/reduce_cull.cpp)."""
    return df.dropDuplicates()


def invert(kv: DataFrame, key: str = "k", val: str = "v") -> DataFrame:
    """Swap key and value columns (oink/map_invert.cpp)."""
    return kv.select(F.col(val).alias(key), F.col(key).alias(val))


def collapse(
    kv: DataFrame,
    newkey,
    key: str = "k",
    val: str = "v",
    per_partition: bool = False,
) -> DataFrame:
    """All pairs → ONE pair (newkey, [k1,v1,k2,v2,...])
    (src/mapreduce.cpp:681-708). Global by default; `per_partition=True` is
    the reference's per-processor form."""
    pair = F.struct(F.col(key).alias("k"), F.col(val).alias("v"))
    if per_partition:
        kv = kv.withColumn("_part", F.spark_partition_id())
        return kv.groupBy("_part").agg(
            F.lit(newkey).alias("key"), F.array_sort(F.collect_list(pair)).alias("pairs")
        )
    return kv.agg(
        F.lit(newkey).alias("key"), F.array_sort(F.collect_list(pair)).alias("pairs")
    )


def gather(df: DataFrame, nprocs: int = 1) -> DataFrame:
    """Concentrate pairs onto few partitions (src/mapreduce.cpp:893-1042)
    without a full shuffle."""
    return df.coalesce(nprocs)


def scrunch(df: DataFrame, nprocs: int, newkey, key: str = "k", val: str = "v") -> DataFrame:
    """gather + collapse (src/mapreduce.cpp:2075-2100)."""
    return collapse(gather(df, nprocs), newkey, key, val, per_partition=True)


def add(a: DataFrame, b: DataFrame) -> DataFrame:
    """Append b's pairs (src/mapreduce.cpp:348-383). Bag semantics — UNION ALL."""
    return a.unionAll(b)


def broadcast_small(df: DataFrame) -> DataFrame:
    """Replicate to every node for join purposes (src/mapreduce.cpp:569-629)."""
    # bcast-audit: bounded by the operator's contract (caller owns the size bound)
    return F.broadcast(df)


def aggregate(df: DataFrame, num_partitions: int, key: str = "k") -> DataFrame:
    """Explicit hash-shuffle by key (src/mapreduce.cpp:385-563). Usually
    unnecessary — groupBy/join shuffle implicitly — but exposed for co-locating
    a partitioning across several downstream stages."""
    return df.repartition(num_partitions, key)


def sort_keys(
    df: DataFrame,
    cols: Sequence[str] = ("k",),
    ascending: bool = True,
    within_partitions: bool = False,
) -> DataFrame:
    """`sort_keys` (src/mapreduce.cpp:2102-2154). within_partitions=True is
    the faithful per-processor external sort; False is a true global sort
    (range-partitioned)."""
    exprs = [F.col(c).asc() if ascending else F.col(c).desc() for c in cols]
    return df.sortWithinPartitions(*exprs) if within_partitions else df.orderBy(*exprs)


def sort_multivalues(kmv: DataFrame, vals_col: str = "vals") -> DataFrame:
    """Sort within each group's value array (src/mapreduce.cpp:2210-2357)."""
    return kmv.withColumn(vals_col, F.array_sort(F.col(vals_col)))


def topk(df: DataFrame, order_cols: Sequence, k: int) -> DataFrame:
    """Global top-k with a caller-supplied TOTAL order (pass tie-breakers!).
    Compiles to TakeOrderedAndProject = the reference's local-top-k →
    gather(1) → re-sort pattern (examples/wordfreq.cpp:72-87)."""
    return df.orderBy(*order_cols).limit(k)


def kv_stats(kv: DataFrame, key: str = "k", val: str = "v", exact: bool = False) -> DataFrame:
    """Global pair-count / key-cardinality / value-range summary
    (src/mapreduce.cpp:2937-3005).

    Default key cardinality is approx_count_distinct (single pass, no
    expand/extra shuffle — the right call at 100 TB); `exact=True` opts into
    the exact distinct count (used by the oracle-checked query)."""
    nkeys = F.countDistinct(key) if exact else F.approx_count_distinct(key)
    return kv.agg(
        F.count(F.lit(1)).alias("nkv"),
        nkeys.alias("nkeys"),
        F.min(val).alias("vmin"),
        F.max(val).alias("vmax"),
        F.sum(F.length(F.col(key).cast("string"))).alias("key_bytes"),
    )


def histo(kv: DataFrame, key: str = "k") -> DataFrame:
    """oink/histo.cpp:36-73 — frequency of each key, then histogram of those
    frequencies, descending."""
    counts = kv.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.groupBy("cnt")
        .agg(F.count(F.lit(1)).alias("nkeys"))
        .orderBy(F.desc("cnt"))
    )


def kmv_stats(kmv: DataFrame, key: str = "k", vals: str = "vals") -> DataFrame:
    """Stats over a grouped (KMV) frame (src/mapreduce.cpp:2937-3005
    `kmv_stats`): group count, total packed values, largest multivalue —
    the counters the reference prints to spot skewed groups before a
    reduce."""
    return kmv.agg(
        F.count(F.lit(1)).alias("nkmv"),
        F.sum(F.size(vals)).alias("nvalues"),
        F.max(F.size(vals)).alias("max_nvalues"),
        F.min(F.size(vals)).alias("min_nvalues"),
    )


class IncrementalKV:
    """open/close/append — incremental KV building across multiple operations
    (src/mapreduce.cpp:1648-1669 `open`/`close`, src/keyvalue.cpp:216
    `append`; used by the reference's iterative algorithms to collect
    results across rounds, e.g. MIS members in oink/luby_find.cpp:73-88 and
    distance updates in oink/sssp.cpp:112-137).

    Spark mapping: accumulate immutable DataFrames, union on close; callers
    inside fixpoint loops should close periodically and localCheckpoint (the
    pattern plans/iterate.py automates) so lineage stays bounded."""

    def __init__(self) -> None:
        self._parts: list[DataFrame] = []

    def append(self, df: DataFrame) -> None:
        self._parts.append(df)

    def close(self) -> DataFrame:
        if not self._parts:
            raise ValueError("IncrementalKV.close() with nothing appended")
        out = self._parts[0]
        for part in self._parts[1:]:
            out = out.unionAll(part)
        return out


def clone(kv: DataFrame, key: str = "k", val: str = "v") -> DataFrame:
    """KV→KMV 1:1: each pair becomes its own single-value group
    (src/mapreduce.cpp:631-656). Under typed DataFrames this is just the
    value wrapped in a one-element array — no grouping, no shuffle."""
    return kv.select(key, F.array(F.col(val)).alias("vals"))


def scan_sink(df: DataFrame, path: str, fmt: str = "csv", **options) -> None:
    """Read-only pass over all pairs into a sink (src/mapreduce.cpp:1933-2073
    `scan`; the reference's callback prints/accumulates — ours writes, the
    distributed equivalent of side-effect-per-pair)."""
    df.write.mode("overwrite").options(**options).format(fmt).save(path)


def print_pairs(df: DataFrame, n: int = 20) -> None:
    """Formatted dump (src/mapreduce.cpp:1671-1767 `print`). Driver-side by
    design — bounded by n, never a full collect."""
    df.show(n, truncate=False)


def group_apply(kv: DataFrame, key: str, fn, schema) -> DataFrame:
    """General `reduce` (src/mapreduce.cpp:1769-1872) for non-algebraic
    callbacks: per-group pandas DataFrame in/out via Arrow. The group iterator
    is the analog of multi-block KMV streaming for huge groups."""
    return kv.groupBy(key).applyInPandas(fn, schema=schema)
