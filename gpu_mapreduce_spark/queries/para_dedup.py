"""Paragraph-granularity dedup (r09 tail registration; SCALE.md r10 fresh
design 1, landed early) — the CCNet/RefinedWeb boilerplate-removal step
this suite's document-level dedup tiers deliberately do not cover: a web
corpus's worst duplication lives INSIDE documents (templated headers,
footers, navigation), so production pipelines fingerprint paragraphs and
drop the ones repeated across documents, keeping the documents themselves.

Segmentation: the fixture corpus is a single-line word stream, so the
paragraph segmenter is fixed windows of P = 12 words (the doc_chunks
discipline; at web scale this is the newline/sentence segmenter — the
plan is identical, only the split expression changes). A paragraph's
fingerprint is md5 of its space-joined words (exact strings); a paragraph
is BOILERPLATE iff its fingerprint appears in more than one DISTINCT
document. Run over the injected-dup corpus fixture, this is non-vacuous
at every scale: exact-duplicate docs drop every window, near-duplicate
docs retain exactly their modified tail window, and unique docs keep
everything — the three retention regimes the hash gate pins per doc.

Topology (100 TB): one token explode folds to per-window rows carrying
only (doc_id, pid, fp, n_words) — the paragraph TEXT reduces to its
16-byte hash inside the first aggregate and never shuffles; the
fingerprint doc-frequency is a two-level map-side-combinable aggregate
(per (fp, doc) then per fp — never COUNT(DISTINCT)'s expand); the
per-doc rollup joins windows to frequencies on the 16-byte fp key. At
web scale the hot fingerprints (the actual boilerplate) are a bounded
set one can broadcast as a drop-list; the general equi-join here is the
shape that needs no such assumption."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources import fixtures

_P = 12  # words per paragraph window
_C = fixtures.duckdb_with("corpus")


@register(
    "paragraph_dedup",
    tags=("llm", "dedup", "textstats", "pipeline"),
    oracle=f"""
        {_C},
        tokp AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
                   unnest(range(1, len(regexp_extract_all(lower(text),
                                                          '[a-z0-9]+')) + 1))
                       AS pos
            FROM corpus
        ),
        paras AS (
            SELECT doc_id, (pos - 1) // {_P} AS pid,
                   md5(string_agg(w, ' ' ORDER BY pos)) AS fp,
                   CAST(COUNT(*) AS BIGINT) AS n_words
            FROM tokp GROUP BY doc_id, (pos - 1) // {_P}
        ),
        fpd AS (
            SELECT fp, CAST(COUNT(*) AS BIGINT) AS nd
            FROM (SELECT fp, doc_id FROM paras GROUP BY fp, doc_id)
            GROUP BY fp
        )
        SELECT p.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_paras,
               CAST(SUM(CASE WHEN f.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped,
               CAST(SUM(CASE WHEN f.nd <= 1 THEN p.n_words ELSE 0 END)
                    AS BIGINT) AS retained_words
        FROM paras p JOIN fpd f USING (fp)
        GROUP BY p.doc_id
    """,
)
def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc boilerplate report over the injected-dup corpus:
    (doc_id, n_paras, n_dropped, retained_words) with a paragraph dropped
    iff its fingerprint appears in more than one distinct document.
    Documents with no tokens emit no row on either engine."""
    corpus = fixtures.corpus(spark, sf_dir)
    tokp = corpus.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("pos", "w"),
    )
    paras = (
        tokp.withColumn("pid", F.expr(f"pos div {_P}"))
        .groupBy("doc_id", "pid")
        .agg(
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "w"))),
                        lambda x: x["w"],
                    ),
                )
            ).alias("fp"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
        )
    )
    fpd = (
        paras.groupBy("fp", "doc_id")
        .agg(F.lit(1).alias("_one"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    )
    return (
        paras.join(fpd, "fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_paras"),
            F.sum((F.col("nd") > 1).cast("bigint"))
            .cast("bigint")
            .alias("n_dropped"),
            F.sum(
                F.when(F.col("nd") <= 1, F.col("n_words")).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("retained_words"),
        )
    )
