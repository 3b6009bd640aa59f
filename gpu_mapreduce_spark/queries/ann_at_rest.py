"""ANN index AT REST: the IVF cell assignment persisted as a
cid-partitioned parquet layout and probed through a partition-pruned scan
(r05 tail registration per SURVEY §2.6).

ann_ivf_topk computes the cell assignment in-session; a production vector
store keeps it ON DISK, partitioned by cell, so a query's probe reads only
its nprobe cell directories — this query makes that layout real and proves
it: the assignment is written with partitionBy("cid") ONCE per session
(queries/similarity._ivf_at_rest — the index-build amortization every
vector store does), then each query collects its probe list (nprobe ×
|queries| rows — constant driver traffic) and reads the index back
filtered to the probed cids (the filter reaches the scan as
PartitionFilters — asserted mechanically in tests/test_plan_audit.py, the
events_partitioned_scan discipline), and exact-reranks. The SELECTED
result is identical to ann_ivf_topk, so both registrations share one
oracle — the at-rest path is a physical-layout claim, not a new algorithm.

Scale notes (100 TB): the index write is one distributed partitioned sink
(n_centroids directories — centroid count scales with the corpus, e.g.
sqrt(N), not with queries), paid once and amortized over every consumer;
each query batch then touches nprobe/n_centroids of the data by DIRECTORY
PRUNING, never a full scan. The probe list crossing the driver is nprobe
rows per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import similarity
from gpu_mapreduce_spark.queries.similarity import (
    _AT_REST_SCHEMA,
    _IVF_NPROBE,
    _ivf_at_rest,
    _ivf_index,
    IVF_ORACLE,
    TOP_K,
    _queries,
)
from gpu_mapreduce_spark.registry import register


def _probe_pruned(
    spark: SparkSession, sf_dir: str, centroids: DataFrame, path: str,
    k: int = TOP_K,
) -> DataFrame:
    """Probe the at-rest index at `path`: nearest-nprobe cells per query,
    directory-pruned read, exact rerank (top-`k` per query — callers like
    ann_rerank_crossscore widen k to harvest a candidate set). `probes` is
    eagerly checkpointed once — it is consumed twice (collected for the
    prune list, joined in the rerank) and would otherwise recompute the
    centroid scoring."""
    probes = similarity.ivf_probes(
        _queries(spark, sf_dir), centroids, nprobe=_IVF_NPROBE
    ).localCheckpoint(eager=True)
    # the probed cell set: nprobe × |queries| rows of constant driver
    # traffic; static by read time, so the isin filter prunes directories
    # (r14 A/B: rebuilding the probe side as a collected local relation
    # instead measured SLOWER — 1.40 vs 1.18 s interleaved — so the
    # eager-checkpoint + tiny collect pair stays)
    probe_cids = sorted({r.cid for r in probes.select("cid").collect()})
    back = spark.read.schema(_AT_REST_SCHEMA).parquet(path)
    cells = back.filter(F.col("cid").isin(probe_cids))
    return similarity.ivf_rerank(cells, probes, k=k).orderBy(
        "qid", F.desc("sim_e6"), "vec_id"
    )


def ivf_at_rest_topk(spark: SparkSession, sf_dir: str, path: str) -> DataFrame:
    """Build→persist→prune→rerank against a caller-owned `path`. Split from
    the registered query so tests can assert PartitionFilters on the pruned
    scan of a layout they control; the registered query probes the
    session-memoized artifact instead of rewriting the index per run."""
    centroids, assigned = _ivf_index(spark, sf_dir)
    assigned.write.mode("overwrite").partitionBy("cid").parquet(path)
    return _probe_pruned(spark, sf_dir, centroids, path)


@register(
    "ann_ivf_at_rest",
    bench=True,
    tags=("llm", "similarity", "sources", "pushdown"),
    oracle=IVF_ORACLE,
)
def ann_ivf_at_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_ivf_topk through the persisted cell-partitioned index — same
    selection, partition-pruned physical path (module docstring). The
    write is the session-memoized one-time build; this query's per-run
    cost is probe + pruned read + rerank, order-independent."""
    centroids, path = _ivf_at_rest(spark, sf_dir)
    return _probe_pruned(spark, sf_dir, centroids, path)
