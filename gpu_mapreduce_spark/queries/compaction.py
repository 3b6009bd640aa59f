"""At-rest index compaction (r09 tail registration; SCALE.md r10 third
slate, design 1, landed early) — the maintenance op every append-heavy
store schedules: after sustained ann_ivfpq_append cycles each cell
directory accumulates base + N delta files, and small-file proliferation
is what kills scan throughput at scale (every file is an open + a footer
read + a task). Compaction rewrites every cell into ONE file and must
prove CONTENT IDENTITY.

The proof is the registered output: the per-cell inventory of the
COMPACTED root, against ann_ivfpq_append's oracle for the THIRD time —
one oracle, three physical paths (batch append, streaming ingest,
compacted rewrite), the strongest form of the suite's
one-oracle-many-physical-paths discipline. The file-count reduction
itself (fragmented root has > 1 file per touched cell, compacted root has
exactly 1) is asserted in tests/test_at_rest.py — a digest can prove
content, only the listing proves the compaction actually compacted.

Topology (100 TB): one partitioned read + one partitioned write; the
single-file-per-cell layout comes from repartition(cid) BEFORE the
partitioned write (each cell's rows land in one task, so each cell
directory gets one part file — at store scale, repartition into
size-targeted buckets per cell instead, the packed_shards_append
discipline). Compaction is schedulable cell-by-cell: nothing outside the
touched directories moves, and readers keep working against the old
files until the path flips (the ivf_index_swap metadata-flip
discipline)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import similarity
from gpu_mapreduce_spark.plans.scratch import sink_roundtrip
from gpu_mapreduce_spark.queries.ann_append import (
    _MOD,
    _REM,
    _ivf_existing_at_rest,
)
from gpu_mapreduce_spark.queries.ivfpq_append import (
    _CODES_SCHEMA,
    _ivfpq_existing_at_rest,
    _pq_books_existing,
    inventory_agg,
)
from gpu_mapreduce_spark.registry import QUERIES, register
from gpu_mapreduce_spark.sources.tables import table


def compact_codes_root(
    spark: SparkSession, base_root: str, added: DataFrame, out_dir: str
) -> DataFrame:
    """Rewrite base ∪ added into `out_dir` with one file per cell
    (repartition on cid so each cell's rows land in a single task before
    the partitioned write) and return the compacted rows re-read from
    disk — the artifact, not the plan, is what downstream readers get."""
    base = spark.read.schema(_CODES_SCHEMA).parquet(base_root)
    combined = base.unionByName(added)
    (
        combined.repartition(F.col("cid"))
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(out_dir)
    )
    return spark.read.schema(_CODES_SCHEMA).parquet(out_dir)


@register(
    "index_compaction",
    tags=("llm", "similarity", "sources", "incremental"),
    # the append oracle for the THIRD time: batch append ≡ stream ingest ≡
    # compacted rewrite ≡ full rebuild under the frozen artifacts
    oracle=QUERIES["ann_ivfpq_append"].oracle,
)
def index_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the fragmented post-append state (immutable base root + delta
    cell files), compact it to one file per cell, and report the COMPACTED
    root's per-cell inventory: (cid, n_vecs, n_delta, inv_digest) —
    hash-identical to the fragmented state's, which is the content-
    preservation proof."""
    centroids, _base_path = _ivf_existing_at_rest(spark, sf_dir)
    books = _pq_books_existing(spark, sf_dir)
    base_root = _ivfpq_existing_at_rest(spark, sf_dir)
    delta = table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % _MOD == _REM
    )
    delta_rows = similarity.pq_encode(delta, books).join(
        similarity.ivf_assign(delta, centroids).select("vec_id", "cid"),
        "vec_id",
    )

    def build(path: str) -> DataFrame:
        delta_rows.write.mode("overwrite").partitionBy("cid").parquet(
            f"{path}/delta"
        )
        added = spark.read.schema(_CODES_SCHEMA).parquet(f"{path}/delta")
        compacted = compact_codes_root(
            spark, base_root, added, f"{path}/compact"
        )
        return inventory_agg(compacted)

    return sink_roundtrip("compaction_", build)
