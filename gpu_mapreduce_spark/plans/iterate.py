"""Iterative fixpoint driver (SURVEY.md §7 step 5, §4 conclusion (a)).

Spark has no fixpoint operator; the reference got iteration "for free" from
mutable KV objects (`kv->append` loops, e.g. oink/sssp.cpp:112-137,
oink/cc_find.cpp:64-103 `while (!done)`). The Spark-native equivalent is a
driver-side loop whose per-iteration state is `localCheckpoint`ed:

  - localCheckpoint truncates lineage — without it the plan doubles every
    iteration and Catalyst analysis time alone goes super-linear by ~iter 15.
    Eager=True also pins the iteration's result so the convergence action and
    the next step don't recompute it.
  - Convergence is a driver-side `count` action per iteration — same contract
    as the reference's per-iteration MPI_Allreduce pair count.

Scale notes (1000 executors / 100 TB): localCheckpoint stores to executor
block storage (memory then disk) — for TB-scale iteration state prefer
`reliable=True`-style checkpointing to a cluster FS (spark.checkpoint.dir) at
a less frequent cadence; the loop structure is unchanged. The per-iteration
work here is one key-partitioned join + one partially-aggregated groupBy, so
each round is a single shuffle of the frontier, and map-side combine bounds
hot keys (the reference needed hand-rolled zone splitting for this,
oink/cc_find.cpp:43-55 — Spark's partial aggregation + AQE subsume it).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def fixpoint(
    state: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    num_changed: Callable[[DataFrame, DataFrame], int],
    max_iter: int = 50,
) -> tuple[DataFrame, int]:
    """Iterate `state = step(state)` until `num_changed(prev, cur) == 0` or
    max_iter. Returns (fixpoint DataFrame — checkpointed, iterations run)."""
    cur = state.localCheckpoint(eager=True)
    for i in range(1, max_iter + 1):
        nxt = step(cur).localCheckpoint(eager=True)
        if num_changed(cur, nxt) == 0:
            return nxt, i
        cur = nxt
    return cur, max_iter


def iterate_n(
    state: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    n: int,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Run exactly n iterations (no convergence action — for algorithms whose
    semantics are round-bounded, e.g. K-round Bellman-Ford or fixed-iteration
    pagerank, where the round count IS the spec and oracle parity requires it).
    """
    cur = state.localCheckpoint(eager=True)
    for i in range(1, n + 1):
        cur = step(cur)
        if i % checkpoint_every == 0 or i == n:
            cur = cur.localCheckpoint(eager=True)
    return cur
