"""Tokenizer fertility report (r09 tail registration; SCALE.md r10
design 3, landed early): tokens-per-word under the trained merges, per
source — THE tokenizer-quality number an LLM data pipeline tracks per
corpus slice (fertility near 1.0 = the vocab fits the slice; high
fertility = over-fragmentation, the signal that a slice needs vocab
budget or its own tokenizer_swap).

Composes the session-memoized full-corpus merges
(queries/bpe_encode._bpe_merges — the published tokenizer artifact) with
operators/bpe.fertility_units carrying `source`, then aggregates the
exact per-doc integers to one row per source: n_docs, n_words (word
occurrences), n_tokens_bpe (encoded symbols) and
fert_u = (10000 * n_tokens_bpe) div n_words in exact fixed-point units.
Integer sums re-aggregate exactly, so the per-doc and per-source passes
agree bit-for-bit with the oracle's direct word-level aggregate.

Topology: one corpus token pass, one broadcast vocab join (the vocab is
bounded — it IS the tokenizer's shipped table), one source-keyed
aggregate over per-doc partials — at 100 TB the only exchange is the
map-side-combined (source) rollup, a handful of rows per partition.

Oracle: the bpe_encode chain's w{K} states joined to the per-source token
stream and aggregated by source — all exact strings and integers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import bpe
from gpu_mapreduce_spark.queries.bpe import bpe_cte_chain
from gpu_mapreduce_spark.queries.bpe_encode import _bpe_merges
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table


def _fertility_oracle(k: int) -> str:
    return f"""{bpe_cte_chain(k)},
        tokd AS (
            SELECT d.doc_id, d.source,
                   unnest(regexp_extract_all(lower(d.text), '{bpe.WORD_RE}'))
                       AS word
            FROM documents d
        ),
        flen AS (SELECT word,
                        CAST(length(s) - length(replace(s, ' ', ''))
                             AS BIGINT) AS n_sym
                 FROM w{k})
        SELECT t.source,
               CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(f.n_sym) AS BIGINT) AS n_tokens_bpe,
               CAST((10000 * SUM(f.n_sym)) // COUNT(*) AS BIGINT) AS fert_u
        FROM tokd t JOIN flen f USING (word)
        GROUP BY t.source"""


@register(
    "fertility_report",
    bench=True,
    tags=("llm", "textstats", "vocab"),
    oracle=_fertility_oracle(bpe.K_MERGES),
)
def fertility_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer fertility under the trained merges: (source,
    n_docs, n_words, n_tokens_bpe, fert_u). Documents with no [a-z0-9]
    runs contribute to no source row on either engine (their fertility is
    undefined — operators/bpe.fertility_units emits no row, and the
    oracle's token stream has nothing to join)."""
    docs = table(spark, sf_dir, "documents")
    per_doc = bpe.fertility_units(
        docs, _bpe_merges(spark, sf_dir), carry=("source",)
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_tokens_bpe").cast("bigint").alias("n_tokens_bpe"),
        )
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_tokens_bpe",
            F.expr("(10000 * n_tokens_bpe) div n_words").alias("fert_u"),
        )
    )
