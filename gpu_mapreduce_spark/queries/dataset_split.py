"""Reproducible train/val/test split report (r09 tail registration): the
split every training pipeline publishes with a dataset release — seeded
hash assignment (operators/sampling.hash_split: 98/1/1 over 10000 hash
buckets of the stable doc key) with per-(source, split) accounting: doc
counts, whitespace-token mass, and each split's per-source share in basis
points.

Why this is an operator and not a one-liner: Spark's own randomSplit
samples per-partition, so holdout membership rotates with partitioning,
retries, and reruns — at 100 TB that is silent train/test contamination.
The hash assignment is a pure scan projection (membership derivable from
the key alone, no membership table to ship), the rollup is one map-side-
combined aggregate to |sources| x 3 rows, and the per-source totals join
is against that same bounded table. The hash gate pins every stratum
count, so a drifted assignment (changed seed, changed bucket math, a
nondeterministic sampler sneaking back in) fails the driver loudly.

Composes with split_contamination (queries/decontam.py), which checks the
complementary property — that no TEXT leaks across an existing split; this
registration pins the ASSIGNMENT itself.

Reference parity: none (the reference has no sampling; SURVEY §2.6) —
this extends the sampling tier (sample_uniform / stratified_sample /
pps_weighted_sample) to the split shape."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import sampling
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

# whitespace-token count — the textstats _TOKS discipline (both engines
# split on \s+ and drop empties)
_NTOK_SQL = (
    r"CAST(len(list_filter(regexp_split_to_array(text, '\s+'),"
    r" t -> t <> '')) AS BIGINT)"
)


@register(
    "dataset_split",
    tags=("llm", "sampling", "pipeline"),
    oracle=f"""
        WITH s AS (
            SELECT source,
                   {sampling.sql_split_expr("split", "doc_id")} AS split,
                   {_NTOK_SQL} AS n_tok
            FROM documents
        ),
        agg AS (
            SELECT source, split,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tok) AS BIGINT) AS n_tokens
            FROM s GROUP BY source, split
        ),
        tot AS (SELECT source, SUM(n_docs) AS t FROM agg GROUP BY source)
        SELECT a.source, a.split, a.n_docs, a.n_tokens,
               CAST((10000 * a.n_docs) // t.t AS BIGINT) AS share_bp
        FROM agg a JOIN tot t USING (source)
    """,
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, split) manifest of the seeded 98/1/1 assignment:
    (source, split, n_docs, n_tokens, share_bp) with share_bp the split's
    basis-point share of its source — the number a release's data card
    reports per stratum. Strata with zero docs emit no row on either
    engine."""
    docs = sampling.hash_split(table(spark, sf_dir, "documents"), "doc_id")
    ntok = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    ).cast("bigint")
    agg = (
        docs.select("source", "split", ntok.alias("n_tok"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )
    tot = agg.groupBy("source").agg(F.sum("n_docs").alias("t"))
    # bcast-audit: bounded (|sources| rows)
    return agg.join(F.broadcast(tot), "source").select(
        "source",
        "split",
        "n_docs",
        "n_tokens",
        F.expr("(10000 * n_docs) div t").cast("bigint").alias("share_bp"),
    )
