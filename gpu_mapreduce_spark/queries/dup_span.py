"""Exact-substring duplication report at token-window granularity (r10
tail registration; SCALE.md r11 design 1, landed early) — the Lee et al.
*Deduplicating Training Data Makes Language Models Better* ExactSubstr
operation, the granularity the suite's dedup ladder skips between
paragraph_dedup's fixed paragraphs and dedup_exact's whole documents: a
span duplicated VERBATIM across documents is memorization fuel even when
neither the paragraphs nor the documents match.

Every L-token window (L = 8, stride 1 — overlapping, unlike
paragraph_dedup's tiling) is fingerprinted with the portable 60-bit
hash; a window whose fingerprint appears in >= 2 DISTINCT documents is a
duplicated span. Report per doc: (doc_id, n_windows, n_dup_windows,
dup_bp) with dup_bp the exact integer basis-point ratio (the mixture
discipline — no float division crosses the gate). Run over the
injected-dup corpus, all three regimes carry rows: exact-dup docs are
100% duplicated, near-dup docs are duplicated everywhere except windows
touching their modified tail, unique docs only pick up incidental
cross-doc window collisions.

Topology (100 TB): one token explode folds to (doc_id, h) BIGINT pairs
inside the first projection — window TEXT never shuffles (the
paragraph_dedup rule); window doc-frequency is the two-level
map-side-combinable aggregate (never COUNT(DISTINCT)); the report joins
windows to frequencies on the 8-byte key. Candidate volume is exactly
total-tokens rows — linear, no banding needed because the predicate is
equality, not similarity. The slice-and-rehash here costs O(L) per
window; at store scale swap in a polynomial rolling hash (same plan,
O(1) per window) — the paper's suffix array is deliberately NOT ported:
its arbitrary-length maximal matches collapse to fixed-L windows when
the policy is "flag spans >= L", which is how production pipelines
configure it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.functions.portable import hash60
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources import fixtures

_L = 8  # tokens per window
_C = fixtures.duckdb_with("corpus")


@register(
    "dup_span_report",
    tags=("llm", "dedup", "textstats"),
    oracle=f"""
        {_C},
        tok AS (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM corpus
        ),
        win AS (
            SELECT doc_id,
                   ('0x' || substr(md5(array_to_string(
                        toks[i + 1:i + {_L}], ' ')), 1, 15))::BIGINT AS h
            FROM tok, UNNEST(range(0, len(toks) - {_L} + 1)) AS t(i)
            WHERE len(toks) >= {_L}
        ),
        fpd AS (
            SELECT h, CAST(COUNT(*) AS BIGINT) AS nd
            FROM (SELECT h, doc_id FROM win GROUP BY h, doc_id)
            GROUP BY h
        )
        SELECT w.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(SUM(CASE WHEN f.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_windows,
               CAST((10000 * SUM(CASE WHEN f.nd > 1 THEN 1 ELSE 0 END))
                    // COUNT(*) AS BIGINT) AS dup_bp
        FROM win w JOIN fpd f USING (h)
        GROUP BY w.doc_id
    """,
)
def dup_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc exact-substring duplication over the injected-dup corpus:
    (doc_id, n_windows, n_dup_windows, dup_bp); a window is duplicated
    iff its fingerprint appears in >= 2 distinct documents. Documents
    with fewer than L tokens emit no row on either engine."""
    corpus = fixtures.corpus(spark, sf_dir)
    tok = corpus.select(
        "doc_id",
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0
        ).alias("toks"),
    ).filter(F.size("toks") >= _L)
    win = tok.select(
        "doc_id", "toks", F.explode(F.sequence(F.lit(0), F.size("toks") - _L)).alias("i")
    ).select(
        "doc_id",
        hash60(
            F.concat_ws(" ", F.expr(f"slice(toks, i + 1, {_L})"))
        ).alias("h"),
    )
    fpd = (
        win.groupBy("h", "doc_id")
        .agg(F.lit(1).alias("_one"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    )
    dup = (F.col("nd") > 1).cast("bigint")
    return (
        win.join(fpd, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.sum(dup).cast("bigint").alias("n_dup_windows"),
            F.expr(
                "CAST((10000 * sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END))"
                " div count(1) AS BIGINT)"
            ).alias("dup_bp"),
        )
    )
