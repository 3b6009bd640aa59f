"""BM25 ranked retrieval (r09 tail registration; SCALE.md r10 design 2 of
the fresh wave, landed early) — the retrieval-quality upgrade of
tfidf_search_topk, with BM25's tf saturation and length normalization held
as EXACT RATIONALS so the whole score is integer arithmetic both engines
replay bit-identically.

With k1 = 6/5, b = 3/4, avgdl_i = T div N (integer average doc length;
T = total corpus tokens, N = docs), the per-(doc, term) score clears all
denominators to ONE non-negative floor division:

    idf_u    = (10000 * (2N - 2df + 1)) div (2df + 1)
               -- the rational substitute for ln((N-df+.5)/(df+.5)):
               -- same argument, same monotonicity in N/df, no libm
               -- (the tfidf_search_topk discipline)
    denom    = 20*avgdl_i*tf + 6*avgdl_i + 18*dl
               -- = 20*avgdl_i * (tf + k1*(1 - b + b*dl/avgdl_i))
    score_u  = (idf_u * tf * 44 * avgdl_i) div denom
               -- numerator factor 44 = 20 * (k1 + 1) * (k1 denominator 5
               -- cleared): tf*(k1+1) over the saturated denominator

Every operand is non-negative, so Spark `div` and DuckDB `//` agree.
Exactness bound (documented, not silent): idf_u * tf * 44 * avgdl_i must
stay under 2^63 (~9.22e18) — with tf <= 1e4 and avgdl_i <= 1e3 the safe
envelope is idf_u <= 2^63/(44e7) ~= 2e10 (N/df ratio <= ~1e6); rarer
terms should be scored per-shard and merged, or idf_u rescaled, before
that bound (Spark's non-ANSI BIGINT multiply wraps silently past it,
while DuckDB errors — ADVICE r09 corrected the earlier 2e11 figure,
which overflowed ~10x inside its own claimed-safe envelope).

Plan shape (argued at 100 TB — the tfidf_search_topk shape plus the
per-doc length): substring pre-filter before tokenization (strict
superset, scan-level predicate); tf = one map-side-combined
groupBy((doc, term)) over query-term tokens only; dl computed in the SAME
prefiltered projection (no second corpus pass for matched docs); df is
|terms| rows broadcast back; (N, T) is a 1-row aggregate attached by the
literal-key broadcast join (q15 discipline); final ranking is
TakeOrderedAndProject with the (score_u DESC, doc_id) total order."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.queries.ranking import _TERMS, _TERMS_SQL
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_TOP = 15
_NTOK = (
    "len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
    " t -> t <> ''))"
)


@register(
    "bm25_topk",
    tags=("llm", "text", "ranking"),
    oracle=f"""
        WITH d AS (
            SELECT doc_id, lower(text) AS lt,
                   CAST({_NTOK} AS BIGINT) AS dl
            FROM documents
        ),
        corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                          CAST(SUM(dl) AS BIGINT) AS t_toks
                   FROM d),
        tf AS (
            SELECT doc_id, dl, tok, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (
                SELECT doc_id, dl,
                       unnest(regexp_split_to_array(lt, '[^a-z0-9]+')) AS tok
                FROM d
            ) WHERE tok IN {_TERMS_SQL}
            GROUP BY doc_id, dl, tok
        ),
        df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
               FROM tf GROUP BY tok),
        consts AS (SELECT n_docs, t_toks // n_docs AS avgdl FROM corpus)
        SELECT tf.doc_id,
               CAST(SUM(
                   (((10000 * (2 * c.n_docs - 2 * df.df + 1))
                     // (2 * df.df + 1))
                    * tf.tf * 44 * c.avgdl)
                   // (20 * c.avgdl * tf.tf + 6 * c.avgdl + 18 * tf.dl)
               ) AS BIGINT) AS score_u,
               CAST(COUNT(*) AS BIGINT) AS n_terms
        FROM tf JOIN df ON tf.tok = df.tok, consts c
        GROUP BY tf.doc_id
        ORDER BY score_u DESC, doc_id
        LIMIT {_TOP}
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TOP} documents for the query terms {_TERMS} by exact-integer
    BM25: (doc_id, score_u, n_terms), total order (score_u DESC, doc_id).
    Docs matching no term never leave the scan pre-filter."""
    docs = table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != ""
    )
    d = docs.select("doc_id", F.lower("text").alias("lt"),
                    F.size(toks).cast("bigint").alias("dl"))
    corpus = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("t_toks"),
    ).select(
        "n_docs", F.expr("t_toks div n_docs").alias("avgdl"), F.lit(1).alias("k")
    )
    prefilter = None
    for t in _TERMS:
        cond = F.col("lt").contains(t)
        prefilter = cond if prefilter is None else (prefilter | cond)
    tf = (
        d.filter(prefilter)
        .select(
            "doc_id",
            "dl",
            F.explode(F.split(F.col("lt"), "[^a-z0-9]+")).alias("tok"),
        )
        .filter(F.col("tok").isin(*_TERMS))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    # bcast-audit: bounded (1-row corpus constants onto the <=3-row df)
    df_n = df.withColumn("k", F.lit(1)).join(F.broadcast(corpus), "k")
    term_score = F.expr(
        "(((10000 * (2 * n_docs - 2 * df + 1)) div (2 * df + 1))"
        " * tf * 44 * avgdl)"
        " div (20 * avgdl * tf + 6 * avgdl + 18 * dl)"
    ).cast("bigint")
    return (
        # bcast-audit: bounded (df rows <= the query's own term set)
        tf.join(F.broadcast(df_n), "tok")
        .withColumn("w", term_score)
        .groupBy("doc_id")
        .agg(
            F.sum("w").cast("bigint").alias("score_u"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        )
        .orderBy(F.desc("score_u"), "doc_id")
        .limit(_TOP)
    )
