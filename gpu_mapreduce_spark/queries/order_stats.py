"""Exact global quantile-cut documents via the two-phase rank operator
(r06 tail registration) — the total-order capability the suite
deliberately routed around everywhere else, now provided ONCE, correctly.

`quality_threshold_keep` computes its percentile through a bounded
histogram precisely because a naive exact global rank is a
single-partition window (`Exchange SinglePartition` → one task does the
whole corpus). When the exact answer is genuinely required — "show me THE
median document", audit cut points, exact CDF positions for calibration —
`operators/prefix.global_ranks_and_count` delivers it TeraSort-style:
range exchange → pinned partitions → per-partition counts collected
(≤P rows) → broadcast prefix offsets → within-partition row_number. No
stage ever holds more than ~N/P rows; `tests/test_order_stats.py` asserts
the executed plan contains no SinglePartition exchange.

The query ranks documents by the unique total order (n_chars, doc_id) and
returns the exact cut document at each of 7 canonical quantiles
(p1/p25/p50/p75/p90/p99/max), rank position ceil(q·N) — pure integer
arithmetic on the driver-side N, replayed identically by the oracle's
ROW_NUMBER window (DuckDB runs single-node, where the naive window is
fine — that is exactly the point of the pair).

Reference parity: the reference's sort_keys/sort_values + `viewer.cpp`
ordered scans give it total-order access for free on one node
(`mrmpi` qsort over spooled pages); this is the distributed equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators.prefix import global_ranks_and_count
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_Q_BP = [100, 2500, 5000, 7500, 9000, 9900, 10000]  # quantiles in basis points


@register(
    "global_rank_quantile_docs",
    bench=True,
    tags=("analytics", "order", "rank"),
    oracle=f"""
        WITH ranked AS (
            SELECT doc_id, n_chars,
                   ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rk
            FROM documents
        ),
        n AS (SELECT COUNT(*) AS n FROM documents),
        qs AS (SELECT unnest([{", ".join(str(q) for q in _Q_BP)}]) AS q_bp),
        pos AS (
            SELECT q_bp,
                   (q_bp * (SELECT n FROM n) + 9999) // 10000 AS p
            FROM qs
        )
        SELECT CAST(p.q_bp AS INT) AS q_bp, r.rk, r.doc_id, r.n_chars
        FROM pos p JOIN ranked r ON r.rk = p.p
        ORDER BY p.q_bp
    """,
)
def global_rank_quantile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact quantile-cut documents of the corpus length distribution:
    (q_bp, rk, doc_id, n_chars) at rank ceil(q·N) for q in
    {{1, 25, 50, 75, 90, 99, 100}}%, via the no-single-partition global
    rank."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked, n = global_ranks_and_count(docs, ["n_chars", "doc_id"])
    pos = [(q, (q * n + 9999) // 10000) for q in _Q_BP]
    pos_df = spark.createDataFrame(pos, "q_bp int, p bigint")
    return (
        ranked.join(F.broadcast(pos_df), ranked["rk"] == pos_df["p"])
        .select("q_bp", "rk", "doc_id", "n_chars")
        .orderBy("q_bp")
    )
