"""Skew-aware shuffle operators: salting for hot keys.

The reference handles key skew with hand-rolled zone splitting inside each
affected command (oink/cc_find.cpp:43-55 splits zones larger than `nthresh`
across procs with hi-bit proc tags; the MR-MPI `aggregate` has no recourse
at all — one proc owns one hash bucket, src/mapreduce.cpp hash partitioner).
Spark gives two generic answers, and this module packages the one AQE cannot
apply on its own:

  1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`) fixes
     SORT-MERGE joins at runtime by splitting oversized partitions — free,
     already on in session.py, nothing to implement.
  2. SALTING fixes the cases AQE does not reach: shuffle-HASH joins, and
     aggregations whose per-group state cannot map-side combine (collect_list
     and friends), where one hot group still funnels every row to one task.
     Salting rewrites the shuffle key from k to (k, salt) so a hot key's rows
     spread over `num_salts` reducers, then restores exact semantics with a
     second, cheap combine over `num_salts`-bounded partials.

Salt assignment is a deterministic hash (xxhash64) of caller-chosen columns,
never rand(): results are identical across runs and retries (a task retry
with rand() salts would double-count rows under shuffle replay), and the
output is salt-invariant, so oracles are the PLAIN equivalent SQL.

At 100 TB: num_salts trades dim-side replication (joins replicate the dim
num_salts x) against reducer fan-out of the hot key; 8-32 covers hubs that
are <=10% of the fact side. Salting is a no-op burden on unskewed keys, so
apply it to the specific skewed join/collect, not globally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def _salt_of(src_cols: list[str], num_salts: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in src_cols]), F.lit(num_salts))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    num_salts: int = 8,
    salt_src: list[str] | None = None,
    force_shuffle: bool = False,
) -> DataFrame:
    """Inner equi-join on `on` with the left (fact) side's hot keys spread
    over `num_salts` shuffle buckets; the right (dim) side is replicated once
    per bucket so every (key, salt) pair still meets its dim row.

    `salt_src`: left columns the salt is hashed from — pick columns that
    vary WITHIN a hot key group (default: all non-join columns), so the hot
    key's rows actually fan out. `force_shuffle` pins a shuffle-hash join
    (the scenario salting exists for); leave False to let the planner choose
    when the replicated dim is still broadcastable.
    """
    if salt_src is None:
        salt_src = [c for c in left.columns if c not in on]
    if not salt_src:
        raise ValueError(
            "salted_join needs at least one non-join left column to hash the "
            "salt from (salt hashed from the join key itself would put every "
            "hot-key row in ONE bucket, silently defeating the salting); "
            "pass salt_src explicitly"
        )
    lt = left.withColumn(SALT, _salt_of(salt_src, num_salts))
    rt = right.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    if force_shuffle:
        rt = rt.hint("shuffle_hash")
    return lt.join(rt, [*on, SALT]).drop(SALT)


def salted_collect_sorted(
    df: DataFrame,
    keys: list[str],
    value: str,
    num_salts: int = 8,
    alias: str = "values",
) -> DataFrame:
    """groupBy(keys).collect_list(value), sorted, with the collect split into
    two stages: stage 1 collects per (keys, salt), so the ROW-heavy work — one
    grouping-state update per input row — spreads over num_salts reducers
    instead of funneling a hot key through one; stage 2 receives only
    num_salts pre-aggregated array rows per key and flattens + sorts in-row.
    The hot group's BYTES still meet at the stage-2 task (inherent to
    returning the full list — aggregate to a digest/size instead if even
    that must stay bounded); what salting fixes is the per-row reducer
    hotspot. Exact same multiset as the direct collect; the final sort makes
    the result a function of the data, not of arrival order.
    """
    partial = (
        df.withColumn(SALT, _salt_of([value], num_salts))
        .groupBy(*keys, SALT)
        .agg(F.collect_list(value).alias("_vals"))
    )
    return partial.groupBy(*keys).agg(
        F.array_sort(F.flatten(F.collect_list("_vals"))).alias(alias)
    )
