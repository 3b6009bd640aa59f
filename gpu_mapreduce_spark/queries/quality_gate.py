"""Percentile-calibrated quality gate (r05 tail registration per
SURVEY §2.6).

quality filtering with a BUDGET instead of a magic constant: keep the
top half of the corpus by an exact-integer quality score, where the
threshold is CALIBRATED from the data (the C4/Gopher-style pipelines fix
thresholds by corpus percentile, not by hand). The report shows, per
source, how a single global bar treats each slice — the "which sources
survive" view a data-mixing decision needs.

Determinism: score_u = (10000 * distinct_tokens) // tokens is exact
BIGINT arithmetic (token-diversity in basis points — the uniq_ratio
signal of operators/textstats.quality_score made fixed-point); the
threshold is the MAXIMAL score s with |{score_u >= s}| >= ceil(N/2),
derived from the score histogram. Both engines replay every step.

Scale notes (100 TB): the score is a per-row projection; the calibration
histogram is groupBy(score_u) — AT MOST 10001 groups regardless of
corpus size (the score domain is bounded by construction), collected to
the driver like pagerank's vertex count, never a global sort or an
unpartitioned window; the keep pass is one scan with a literal
threshold; accounting is the two-stage bucketed digest (bounded state)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import textstats as ts
from gpu_mapreduce_spark.queries.formats import (
    _sql_two_stage_digest,
    _two_stage_digest,
)
from gpu_mapreduce_spark.queries.textstats import _TOKS
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_KEEP_NUM, _KEEP_DEN = 1, 2  # keep the top 1/2 by score

_SCORE_SQL = (
    "CASE WHEN len(toks) = 0 THEN 0 "
    "ELSE (10000 * len(list_distinct(toks))) // len(toks) END"
)


@register(
    "quality_threshold_keep",
    bench=True,
    tags=("llm", "textstats", "sampling"),
    oracle=f"""
        WITH s AS (
            SELECT doc_id, source, n_chars, {_SCORE_SQL} AS score_u
            FROM (SELECT doc_id, source, n_chars, {_TOKS} AS toks
                  FROM documents)
        ),
        hist AS (SELECT score_u, COUNT(*) AS cnt FROM s GROUP BY score_u),
        thr AS (
            SELECT MAX(score_u) AS t FROM (
                SELECT score_u,
                       SUM(cnt) OVER (ORDER BY score_u DESC) AS cum
                FROM hist
            ) WHERE cum >= (SELECT CAST(ceil(COUNT(*) * {_KEEP_NUM}.0
                                            / {_KEEP_DEN}) AS BIGINT)
                            FROM s)
        ),
        kept AS (SELECT * FROM s WHERE score_u >= (SELECT t FROM thr)),
        tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total
                FROM s GROUP BY source),
        acct AS ({_sql_two_stage_digest("kept", "source", "doc_id",
                                        "n_chars")})
        SELECT tot.source, tot.n_total,
               CAST(COALESCE(a.n, 0) AS BIGINT) AS n_kept,
               CAST(COALESCE(a.n, 0) * 10000 // tot.n_total AS BIGINT)
                   AS kept_bp,
               CAST((SELECT t FROM thr) AS BIGINT) AS threshold_u,
               a.key_digest AS docid_digest
        FROM tot LEFT JOIN acct a ON tot.source = a.source
        ORDER BY tot.source
    """,
)
def quality_threshold_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source report of a globally-calibrated quality gate:
    (source, n_total, n_kept, kept_bp, threshold_u, docid_digest) where
    threshold_u is the largest score keeping >= {_KEEP_NUM}/{_KEEP_DEN}
    of the corpus and docid_digest proves the kept set."""
    staged = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", ts.tokens(F.col("text")).alias("toks")
    )
    # exact integer score from the materialized token array; checkpointed —
    # the skinny (doc_id, source, n_chars, score_u) projection feeds THREE
    # consumers (the histogram collect, the kept filter, the per-source
    # totals), which would otherwise each re-tokenize the corpus
    scored = staged.select(
        "doc_id",
        "source",
        "n_chars",
        F.when(F.size("toks") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.expr("(10000 * size(array_distinct(toks))) div size(toks)")
        )
        .cast("bigint")
        .alias("score_u"),
    ).localCheckpoint(eager=True)
    hist = (
        scored.groupBy("score_u")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    total = sum(r.cnt for r in hist)
    target = -(-total * _KEEP_NUM // _KEEP_DEN)  # ceil
    cum = 0
    threshold = 0
    for r in sorted(hist, key=lambda r: -r.score_u):
        cum += r.cnt
        if cum >= target:
            threshold = r.score_u
            break
    kept = scored.filter(F.col("score_u") >= threshold)
    acct = _two_stage_digest(kept, "source", "doc_id", "n_chars")
    tot = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    return (
        tot.join(acct.withColumnRenamed("n", "n_kept"), "source", "left")
        .select(
            "source",
            "n_total",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.expr("coalesce(n_kept, 0) * 10000 div n_total")
            .cast("bigint")
            .alias("kept_bp"),
            F.lit(threshold).cast("bigint").alias("threshold_u"),
            F.col("key_digest").alias("docid_digest"),
        )
        .orderBy("source")
    )
