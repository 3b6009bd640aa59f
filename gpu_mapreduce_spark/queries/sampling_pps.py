"""Weighted (probability-proportional-to-size) corpus sampling — the
weight-proportional tier of the sampling suite (r06 tail registration):
`stratified_sample_orders` samples at a fixed rate per stratum,
`corpus_mixture_sample` hits exact per-language quotas; this query draws
each document with probability proportional to its SIZE, the scheme
behind temperature/size-weighted corpus subsampling (a big document is
proportionally more likely to be audited/sampled) and one-pass weighted
data audits at corpus scale.

Scheme: Poisson-PPS. With total weight W = Σ n_chars and expected sample
size k, document i is included iff

    u_i < π_i  where  π_i = min(1, k·w_i / W)

with u_i the deterministic portable-hash uniform. The comparison is done
entirely in integers — u_i as the raw 60-bit hash h_i against
k·w_i·2^60 / W, cross-multiplied to  h_i·W < w_i·k·2^60  — so both
engines evaluate the identical exact predicate (Spark: DECIMAL(38,0)
products, sized 19+18+1 digits so ANSI mode can never overflow; DuckDB:
HUGEINT). Each kept row carries its Horvitz–Thompson expansion weight
1/π_i as fixed-point basis points (floor(10000·W / (k·w_i)), exact
BIGINT floor-division in both engines) — the estimator weight that makes
any sum over the sample unbiased for the corpus total.

Scale notes (100 TB): the W aggregate is one partially-aggregated scalar
(collected driver-side — the pagerank discipline; in production it comes
from table statistics), and the sample itself is a MAP-ONLY filter over
the corpus scan — no shuffle, no sort, no per-stratum state. The
DECIMAL(38,0) cross-multiplication holds to W < 10^19 chars (ten
exabytes); the HT weight is all-BIGINT on both engines (the k·n_chars
divisor cast explicitly so no 32-bit cap hides under the division) and
its 10000·W numerator holds to W ≤ 9·10^14 — both beyond the design
point. Sample size is Binomial(N, ~k/N) around k — the trade every
hash-threshold sampler in this repo makes to avoid a global weighted
rank.

Reference parity: the reference has no weighted sampler (its `scan` +
OINK filters are unweighted); this is part of the LLM-pipeline layer the
build adds beyond the reference surface (SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.functions.portable import hash60
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_K = 64  # expected sample size
_K_SHIFT = _K << 60  # k·2^60 = 2^66; exceeds int64 — always a decimal/HUGEINT


@register(
    "pps_weighted_sample",
    bench=True,
    tags=("llm", "sampling"),
    oracle=f"""
        WITH w AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS tot FROM documents)
        SELECT doc_id, lang, n_chars,
               CASE WHEN {_K} * CAST(n_chars AS BIGINT) >= (SELECT tot FROM w)
                    THEN CAST(10000 AS BIGINT)
                    ELSE (10000 * (SELECT tot FROM w))
                         // ({_K} * CAST(n_chars AS BIGINT))
               END AS ht_fp
        FROM documents
        WHERE CAST(('0x' || substr(md5('pps|' || CAST(doc_id AS VARCHAR)),
                                   1, 15))::BIGINT AS HUGEINT)
              * (SELECT tot FROM w)
            < CAST(n_chars AS HUGEINT) * {_K_SHIFT}
        ORDER BY doc_id
    """,
)
def pps_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-PPS sample of the documents corpus, size-weighted by
    n_chars, expected size k=64: (doc_id, lang, n_chars, ht_fp) with
    ht_fp = the Horvitz–Thompson weight 1/π in basis points."""
    docs = table(spark, sf_dir, "documents")
    # W: one scalar aggregate, collected (constant driver traffic; at scale
    # this is a table statistic). Python-int exact. SUM over zero rows is
    # NULL — fold to 0 so the interpolated SQL below stays well-formed on an
    # empty corpus (the filter is then vacuous: no rows to keep).
    w_tot = docs.agg(F.sum("n_chars")).collect()[0][0] or 0

    h = hash60(F.concat(F.lit("pps|"), F.col("doc_id").cast("string")))
    # h < 2^60 (≤1.16·10^18, 19 digits) × W (≤19 digits) → DECIMAL(38,0):
    # the product tops out at ~1.2·10^37 < 10^38, exact;
    # n_chars (≤10 digits) × k·2^60 (20 digits) → DECIMAL(31,0), exact.
    lhs = h.cast("decimal(19,0)") * F.lit(w_tot).cast("decimal(19,0)")
    rhs = F.col("n_chars").cast("decimal(10,0)") * F.expr(
        f"CAST('{_K_SHIFT}' AS DECIMAL(20,0))"
    )
    return (
        docs.filter(lhs < rhs)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.when(
                F.lit(_K).cast("bigint") * F.col("n_chars") >= F.lit(w_tot),
                F.lit(10000).cast("bigint"),
            )
            .otherwise(
                F.expr(
                    f"(10000 * CAST({w_tot} AS BIGINT))"
                    f" div ({_K} * CAST(n_chars AS BIGINT))"
                )
            )
            .alias("ht_fp"),
        )
        .orderBy("doc_id")
    )
