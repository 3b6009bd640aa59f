"""Oracle-checked text-analysis queries over the `documents` base table
(token stats, quality scoring, language-ID, fingerprinting — the
training-data pipeline layer; operators/textstats.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gpu_mapreduce_spark.operators import textstats as ts
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

# DuckDB mirror of operators/textstats.tokens
_TOKS = r"list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')"


def _inlist(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in ts.STOPWORDS[lang])


@register(
    "textstats_tokens",
    bench=True,
    tags=("llm", "textstats"),
    oracle=f"""
        SELECT doc_id,
               CAST(len(toks) AS INT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS INT) AS n_uniq_tokens,
               CAST(list_sum(list_transform(toks, t -> len(t))) AS BIGINT)
                   / CAST(len(toks) AS DOUBLE) AS avg_token_len,
               CAST(len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe_tokens,
               CAST(length(text) AS INT) AS n_chars
        FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    """,
)
def textstats_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts.token_stats(table(spark, sf_dir, "documents"))


@register(
    "textstats_quality",
    tags=("llm", "textstats"),
    oracle=f"""
        SELECT doc_id,
               CAST(len(toks) AS INT) AS n_tokens,
               CAST(len(list_filter(toks, t -> lower(t) IN ({_inlist('en')}))) AS BIGINT)
                   / CAST(len(toks) AS DOUBLE) AS stop_ratio,
               CAST(len(list_distinct(toks)) AS BIGINT)
                   / CAST(len(toks) AS DOUBLE) AS uniq_ratio,
               (len(toks) >= 10 AND len(toks) <= 10000
                AND CAST(len(list_filter(toks, t -> lower(t) IN ({_inlist('en')}))) AS BIGINT)
                    / CAST(len(toks) AS DOUBLE) >= 0.01
                AND CAST(len(list_distinct(toks)) AS BIGINT)
                    / CAST(len(toks) AS DOUBLE) >= 0.2) AS keep
        FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    """,
)
def textstats_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts.quality_score(table(spark, sf_dir, "documents"))


_LANG_CASE = f"""
    CASE WHEN s_en + s_de + s_es + s_fr = 0 THEN 'und'
         WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         WHEN s_es >= s_fr THEN 'es'
         ELSE 'fr' END
"""


@register(
    "lang_id",
    tags=("llm", "textstats"),
    oracle=f"""
        SELECT doc_id, s_en, s_de, s_es, s_fr, {_LANG_CASE} AS guess
        FROM (
            SELECT doc_id,
                   CAST(len(list_filter(toks, t -> lower(t) IN ({_inlist('en')}))) AS INT) AS s_en,
                   CAST(len(list_filter(toks, t -> lower(t) IN ({_inlist('de')}))) AS INT) AS s_de,
                   CAST(len(list_filter(toks, t -> lower(t) IN ({_inlist('es')}))) AS INT) AS s_es,
                   CAST(len(list_filter(toks, t -> lower(t) IN ({_inlist('fr')}))) AS INT) AS s_fr
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
        )
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts.lang_id(table(spark, sf_dir, "documents"))


@register(
    "doc_fingerprint",
    tags=("llm", "textstats"),
    oracle=r"""
        SELECT doc_id,
               md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts.fingerprint(table(spark, sf_dir, "documents"))
