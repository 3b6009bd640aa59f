"""ANN index AT REST: the IVF cell assignment persisted as a
cid-partitioned parquet layout and probed through a partition-pruned scan
(r05 tail registration per SURVEY §2.6).

ann_ivf_topk computes the cell assignment in-session; a production vector
store keeps it ON DISK, partitioned by cell, so a query's probe reads only
its nprobe cell directories — this query makes that layout real and proves
it: write `ivf_build`'s assignment with partitionBy("cid"), collect the
probe list (nprobe × |queries| rows — constant driver traffic), read the
index back filtered to the probed cids (the filter reaches the scan as
PartitionFilters — asserted mechanically in tests/test_similarity.py, the
events_partitioned_scan discipline), and exact-rerank. The SELECTED result
is identical to ann_ivf_topk, so both registrations share one oracle — the
at-rest path is a physical-layout claim, not a new algorithm.

Scale notes (100 TB): the index write is one distributed partitioned sink
(n_centroids directories — centroid count scales with the corpus, e.g.
sqrt(N), not with queries); each query batch then touches
nprobe/n_centroids of the data by DIRECTORY PRUNING, never a full scan.
The probe list crossing the driver is nprobe rows per query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import similarity
from gpu_mapreduce_spark.plans.scratch import sink_roundtrip
from gpu_mapreduce_spark.queries.similarity import (
    _IVF_NPROBE,
    IVF_ORACLE,
    TOP_K,
    _ivf_index,
    _queries,
)
from gpu_mapreduce_spark.registry import register


def ivf_at_rest_topk(spark: SparkSession, sf_dir: str, path: str) -> DataFrame:
    """Build→persist→prune→rerank against the index at `path`. Split from
    the registered query so tests can assert PartitionFilters on the pruned
    scan pre-checkpoint. The in-session build is the memoized _ivf_index
    (shared with ann_ivf_topk/dedup_semantic); this query's claim is the
    persisted partitioned LAYOUT of that same assignment."""
    centroids, assigned = _ivf_index(spark, sf_dir)
    assigned.write.mode("overwrite").partitionBy("cid").parquet(path)

    probes = similarity.ivf_probes(
        _queries(spark, sf_dir), centroids, nprobe=_IVF_NPROBE
    )
    # the probed cell set: nprobe × |queries| rows of constant driver
    # traffic; static by read time, so the isin filter prunes directories
    probe_cids = sorted({r.cid for r in probes.select("cid").collect()})
    back = spark.read.schema(
        "vec_id bigint, embedding array<float>, cid int"
    ).parquet(path)
    cells = back.filter(F.col("cid").isin(probe_cids))
    return similarity.ivf_rerank(cells, probes, k=TOP_K).orderBy(
        "qid", F.desc("sim_e6"), "vec_id"
    )


@register(
    "ann_ivf_at_rest",
    bench=True,
    tags=("llm", "similarity", "sources", "pushdown"),
    oracle=IVF_ORACLE,
)
def ann_ivf_at_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_ivf_topk through the persisted cell-partitioned index — same
    selection, partition-pruned physical path (module docstring)."""
    return sink_roundtrip(
        "ivf_index_", lambda path: ivf_at_rest_topk(spark, sf_dir, path)
    )
