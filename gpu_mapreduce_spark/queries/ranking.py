"""Text retrieval scoring (beyond-reference LLM-pipeline layer): TF-IDF
ranked search over the documents table. Tail-registered per the SURVEY
§2.6 discipline (new queries queue behind the driver's staleness window).

The reference's InvertedIndex (cuda/InvertedIndex.cu:175-202) stops at
postings lists; this is the retrieval step a corpus pipeline runs on top
of such an index: score each document against a small query-term set and
return the top-k. IDF is the RATIONAL form floor(N * 10000 / df) rather
than the textbook log(N/df): log's last-ULP rounding is libm-dependent and
would flake the cross-engine hash gate, while integer floor-division is
bit-identical in Spark and DuckDB and preserves the same ranking monotonic
in N/df. Scores are therefore exact BIGINTs end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_TERMS = ("data", "model", "training")
_TERMS_SQL = "('" + "','".join(_TERMS) + "')"
_TOP = 15
_IDF_SCALE = 10000


@register(
    "tfidf_search_topk",
    bench=True,
    tags=("llm", "text", "ranking"),
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
            FROM documents
        ),
        tf AS (
            SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tok WHERE tok IN {_TERMS_SQL}
            GROUP BY doc_id, tok
        ),
        df AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
        SELECT tf.doc_id,
               CAST(SUM(tf.tf * ((n.n_docs * {_IDF_SCALE}) // df.df))
                    AS BIGINT) AS score_u,
               CAST(COUNT(*) AS BIGINT) AS n_terms
        FROM tf JOIN df ON tf.tok = df.tok, n
        GROUP BY tf.doc_id
        ORDER BY score_u DESC, doc_id
        LIMIT {_TOP}
    """,
)
def tfidf_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TOP} documents for the query terms {_TERMS} by exact-integer
    TF-IDF (idf_u = N * {_IDF_SCALE} div df — see module docstring for why
    not log).

    Plan shape, argued at 100 TB:
      - A substring PRE-FILTER (`lower(text) LIKE '%term%'` disjunction)
        runs before tokenization. Token membership implies substring
        membership, so this is a strict superset and never changes the
        result — but it skips the explode for the (at web scale, vast)
        majority of documents matching no query term, and it is a plain
        scan-level predicate.
      - Per-doc term frequencies: one groupBy((doc, term)) with map-side
        combine; only query-term tokens survive the explode filter, so the
        shuffle is O(matching docs x |terms|), never corpus-token-sized.
      - df is |terms| rows (<= 3) — broadcast back onto tf; N is a 1-row
        aggregate attached to that 3-row df by a literal-key broadcast
        equi-join (q15 discipline, no BNLJ on a big side).
      - Final ranking is TakeOrderedAndProject with a total order
        (score desc, doc_id)."""
    docs = table(spark, sf_dir, "documents")
    prefilter = None
    for t in _TERMS:
        cond = F.lower(F.col("text")).contains(t)
        prefilter = cond if prefilter is None else (prefilter | cond)
    tf = (
        docs.filter(prefilter)
        .select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("tok"),
        )
        .filter(F.col("tok").isin(*_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs")).withColumn(
        "k", F.lit(1)
    )
    # bcast-audit: bounded (1-row corpus count)
    df_n = df.withColumn("k", F.lit(1)).join(F.broadcast(n), "k")
    return (
        # bcast-audit: bounded (df rows <= the query's own token set)
        tf.join(F.broadcast(df_n), "tok")
        .withColumn(
            "w",
            F.col("tf")
            * F.expr(f"(n_docs * {_IDF_SCALE}) div df").cast("bigint"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("w").alias("score_u"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        )
        .orderBy(F.desc("score_u"), "doc_id")
        .limit(_TOP)
    )
