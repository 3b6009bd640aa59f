"""Text operators: wordfreq, inverted index, intcount.

These are the reference fork's own workloads (SURVEY.md §2.2/§2.3):
  - `wordfreq(words, ntop)`   ≙ examples/wordfreq.cpp:64-87, oink/wordfreq.cpp:40-112
  - `tokenize(docs)`          ≙ whitespace tokenizer examples/wordfreq.cpp:120-129
  - `extract_hrefs(docs)`     ≙ cuda/InvertedIndex.cu:79-135 GPU kernels /
                                cpu/InvertedIndex.cpp:197-268 DFA — both are
                                implementations of one logical operator; here it
                                is a single codegen'd regexp over the text column.
  - `inverted_index(docs)`    ≙ cuda/InvertedIndex.cu:175-202 full pipeline
  - `intcount(ints)`          ≙ cpu/IntCount.cpp:75-91
  - `combiner` concat-values  ≙ cuda/InvertedIndex.cu:413-456

Scale notes: all operators are a single shuffle (the groupBy); the map side is
pure codegen (split/explode/regexp) — no Python in the hot path. The top-k in
wordfreq compiles to TakeOrderedAndProject (per-partition heap + driver merge),
which is the reference's local-top-k → gather(1) → global-top-k pattern
(examples/wordfreq.cpp:72-87) done by the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HREF_PATTERN = '<a href="([^"]*)"'


def tokenize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokenization: one output row per token, empties dropped."""
    return docs.select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    ).filter(F.col("word") != "")


def wordfreq(words: DataFrame, ntop: int | None = 10) -> DataFrame:
    """(word) stream → (word, cnt), optionally global top-N (ties broken by
    word so the result is deterministic, unlike the reference's arbitrary
    tie order)."""
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    if ntop is None:
        return counts
    return counts.orderBy(F.desc("cnt"), "word").limit(ntop)


def extract_hrefs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(filename, text) → (url, filename), one row per anchor occurrence."""
    return docs.select(
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(HREF_PATTERN), 1)).alias(
            "url"
        ),
        "filename",
    )


def inverted_index(docs: DataFrame) -> DataFrame:
    """url → space-joined sorted list of distinct files containing it.

    The reference emits the value list unsorted per-proc
    (cuda/InvertedIndex.cu:463-513); we sort for determinism and emit one
    string, matching its text output format ("url \\t f1 f2 ...").
    """
    return (
        extract_hrefs(docs)
        .groupBy("url")
        .agg(
            F.array_join(F.array_sort(F.collect_set("filename")), " ").alias("files")
        )
    )


def intcount(ints: DataFrame, col: str = "v") -> DataFrame:
    """int stream → (v, cnt) frequency table."""
    return ints.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))


def combiner_concat(kv: DataFrame, key: str = "k", val: str = "v") -> DataFrame:
    """Reference `combiner`: concatenate a key's values into one
    space-separated string (cuda/InvertedIndex.cu:413-456). Values sorted
    for determinism."""
    return kv.groupBy(key).agg(
        F.array_join(F.array_sort(F.collect_list(F.col(val).cast("string"))), " ").alias(
            "vals"
        )
    )


def ngram_counts(
    docs: DataFrame, n: int = 2, min_count: int = 2, text_col: str = "text"
) -> DataFrame:
    """Corpus word n-gram counts with min-count pruning — wordfreq's
    (examples/wordfreq.cpp:64-87) n-gram generalization and the
    language-model-counts workload (KenLM-style corpus prep: count all
    n-gram occurrences, prune singletons). Occurrences are counted, not
    per-doc presence — within-doc repeats count.

    Scale: one explode + ONE partially-aggregated shuffle on the gram key
    (map-side combine collapses hot grams per partition before the
    exchange — the same property that makes wordfreq's shuffle bounded);
    the min-count prune runs post-aggregate where it belongs (pruning
    pre-aggregate would need the very counts it prunes by)."""
    from gpu_mapreduce_spark.operators.textstats import _ngrams, tokens

    grams = docs.select(
        F.explode(_ngrams(tokens(F.col(text_col)), n)).alias("g")
    )
    return (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
