"""Corpus mixture sampling — rebalance the documents corpus toward a target
language mix (r05 tail registration per SURVEY §2.6).

The mixing step every multi-source training pipeline runs: given target
proportions, DOWN-sample the over-represented strata so the kept corpus
hits the target mix at the largest size the data allows (never upsample —
duplicating docs is what the dedup layer exists to prevent). All mixture
arithmetic is exact integers (basis-point weights, floor division), the
keep decision is a deterministic portable-hash threshold per doc, and the
kept doc_id set is digest-proven — so the oracle replays byte-for-byte and
a re-run anywhere reproduces the same corpus (the dataset_split_report
reproducibility discipline applied to mixing).

Scale notes (100 TB): one 5-row aggregate to size the strata (collected
like pagerank's vertex count — constant driver traffic), then ONE corpus
scan with a per-row hash comparison; no per-stratum sort, no global
window, no shuffle beyond the final per-lang accounting aggregate. The
hash-threshold rule keeps counts binomially close to the exact m_l rather
than exactly m_l — the trade every hash-mod sampler makes to avoid a
per-stratum global rank (a 5-partition sort of the whole corpus is the
skew anti-pattern SCALE.md forbids)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.functions.portable import hash60
from gpu_mapreduce_spark.queries.formats import (
    _sql_two_stage_digest,
    _two_stage_digest,
)
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

# target mix in integer percent (sums to 100); the fixture's organic mix is
# en-heavy, so en/de are down-sampled hardest and the rarest lang binds B
_WEIGHTS = {"en": 40, "de": 20, "es": 20, "fr": 15, "zh": 5}
_HMOD = 1_000_000


def _hash_unit_sql() -> str:
    return (
        "('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15))"
        f"::BIGINT % {_HMOD}"
    )


def _weights_sql() -> str:
    return " UNION ALL ".join(
        f"SELECT '{lang}' AS lang, {w} AS w" for lang, w in _WEIGHTS.items()
    )


@register(
    "corpus_mixture_sample",
    bench=True,
    tags=("llm", "sampling"),
    oracle=f"""
        WITH wts AS ({_weights_sql()}),
        counts AS (
            SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n, MIN(w.w) AS w
            FROM documents d JOIN wts w ON d.lang = w.lang
            GROUP BY d.lang
        ),
        budget AS (SELECT MIN(n * 100 // w) AS b FROM counts),
        quota AS (
            SELECT lang, n, (SELECT b FROM budget) * w // 100 AS m
            FROM counts
        ),
        kept AS (
            SELECT d.lang, d.doc_id, d.n_chars
            FROM documents d JOIN quota q ON d.lang = q.lang
            WHERE ({_hash_unit_sql()}) * q.n < q.m * {_HMOD}
        ),
        acct AS ({_sql_two_stage_digest("kept", "lang", "doc_id", "n_chars")})
        SELECT q.lang, q.n AS n_total, COALESCE(a.n, 0) AS n_kept,
               COALESCE(a.s, 0) AS kept_chars,
               CAST(COALESCE(a.n, 0) * 10000
                    // (SELECT SUM(n) FROM acct) AS BIGINT) AS share_bp,
               a.key_digest AS docid_digest
        FROM quota q LEFT JOIN acct a ON q.lang = a.lang
        ORDER BY q.lang
    """,
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language mixture report: total docs, kept docs, kept chars, the
    achieved share in basis points of the kept corpus, and the two-stage
    bucketed digest of the kept doc_id set (formats._two_stage_digest —
    bounded aggregation state). Budget B = the largest corpus size the
    rarest-vs-target stratum allows; per-lang quota m_l = B*w_l//100; a doc
    is kept iff its 60-bit md5 hash (mod 1e6, salted 'mix|') scaled by the
    stratum size clears the quota — exact integer predicate, identical in
    both engines."""
    docs = table(spark, sf_dir, "documents").filter(
        F.col("lang").isin(list(_WEIGHTS))
    )
    counts = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    budget = min(n * 100 // _WEIGHTS[lang] for lang, n in counts.items())
    quota = {lang: budget * _WEIGHTS[lang] // 100 for lang in counts}

    h = (
        hash60(F.concat(F.lit("mix|"), F.col("doc_id").cast("string")))
        % _HMOD
    )
    # element_at with the lang COLUMN as key (bracket access with a string
    # would read it as the literal key "lang"); values cast to BIGINT —
    # F.lit(python int) types as int32, and `quota * _HMOD` overflows int32
    # once a quota exceeds 2147 docs (ARITHMETIC_OVERFLOW under ANSI,
    # silent wrap + oracle divergence without; sf0.1's largest quota 1404
    # is already 65% of the int32 ceiling)
    n_of = F.element_at(
        F.create_map(
            *[
                x
                for lang in counts
                for x in (F.lit(lang), F.lit(counts[lang]).cast("bigint"))
            ]
        ),
        F.col("lang"),
    )
    m_of = F.element_at(
        F.create_map(
            *[
                x
                for lang in counts
                for x in (F.lit(lang), F.lit(quota[lang]).cast("bigint"))
            ]
        ),
        F.col("lang"),
    )
    kept = docs.filter(h * n_of < m_of * F.lit(_HMOD).cast("bigint"))

    # materialize the 5-row accounting once — it feeds both the report join
    # and the total; unmaterialized, the kept-scan + digest tree runs twice
    acct = _two_stage_digest(kept, "lang", "doc_id", "n_chars").localCheckpoint(
        eager=True
    )
    # the grand total is one scalar off the checkpointed 5-row acct — collect
    # it (constant driver traffic, same discipline as the stratum counts)
    # rather than scalar-joining it back, which folds to a BNLJ
    total_kept = acct.agg(F.sum("n")).collect()[0][0] or 0
    quota_df = spark.createDataFrame(
        [(lang, counts[lang]) for lang in counts], "lang string, n_total bigint"
    )
    return (
        quota_df.join(acct.withColumnRenamed("n", "n_kept"), "lang", "left")
        .select(
            "lang",
            "n_total",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("s", F.lit(0)).cast("bigint").alias("kept_chars"),
            F.expr(f"coalesce(n_kept, 0) * 10000 div {total_kept}")
            .cast("bigint")
            .alias("share_bp"),
            F.col("key_digest").alias("docid_digest"),
        )
        .orderBy("lang")
    )
