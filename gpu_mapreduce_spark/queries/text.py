"""Text-analytics queries: wordfreq, inverted index, intcount.

Reference pipelines:
  - wordfreq: examples/wordfreq.cpp:64-87 (map tokens → collate → sum →
    local top-k → gather(1) → global top-k). Spark's orderBy+limit compiles to
    TakeOrderedAndProject — exactly the reference's local-then-global top-k.
  - inverted index: cuda/InvertedIndex.cu:175-202 — GPU kernel matches the
    9-byte `<a href="` pattern (:79-107) and extracts to the closing quote
    (:109-135); here that is one vectorized `regexp_extract_all`, which stays
    JVM-side in whole-stage codegen (the Spark analog of the GPU map stage).
  - intcount: cpu/IntCount.cpp:150-190 (emit (int,1) per 4 bytes → aggregate
    → convert) → groupBy().count().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import text as text_ops
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources import fixtures

_WORDS = fixtures.duckdb_with("words")
_DOCS = fixtures.duckdb_with("docs")
_INTS = fixtures.duckdb_with("ints")


@register(
    "wordfreq_topk",
    bench=True,
    tags=("text",),
    oracle=f"""
        {_WORDS}
        SELECT word, COUNT(*) AS cnt
        FROM words
        GROUP BY word
        ORDER BY cnt DESC, word
        LIMIT 20
    """,
)
def wordfreq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = fixtures.words(spark, sf_dir)
    return text_ops.wordfreq(w.select("word"), ntop=20)


@register(
    "wordfreq_counts",
    tags=("text",),
    oracle=f"""
        {_WORDS}
        SELECT word, COUNT(*) AS cnt FROM words GROUP BY word
    """,
)
def wordfreq_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full (word, count) table — the reference's wordfreq without top-k
    (`oink/wordfreq.cpp:40-90` with ntop=0)."""
    w = fixtures.words(spark, sf_dir)
    return text_ops.wordfreq(w.select("word"), ntop=None)


@register(
    "inverted_index",
    bench=True,
    tags=("text",),
    oracle=f"""
        {_DOCS}
        SELECT url, array_to_string(list_sort(list(DISTINCT filename)), ' ') AS files
        FROM (
            SELECT unnest(regexp_extract_all(text, '<a href="([^"]*)"', 1)) AS url,
                   filename
            FROM docs
        )
        GROUP BY url
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fixtures.docs(spark, sf_dir)
    return text_ops.inverted_index(d)


@register(
    "intcount",
    bench=True,
    tags=("text",),
    oracle=f"""
        {_INTS}
        SELECT v, COUNT(*) AS cnt FROM ints GROUP BY v
    """,
)
def intcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    i = fixtures.ints(spark, sf_dir)
    return text_ops.intcount(i)
