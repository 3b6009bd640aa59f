"""Interchange-format coverage: JSONL and ORC sink→source roundtrips.
Tail-registered per the SURVEY §2.6 discipline.

The reference reads text/binary files only (SURVEY §2.1 map variants);
a Spark engine additionally owes the columnar/interchange formats a
pipeline actually moves data through: parquet (every fixture read), CSV
(csv_source_revenue / csv_malformed_audit / scan_roundtrip), JSONL (the
de-facto LLM corpus interchange format — one JSON object per line), and
ORC (the other columnar at-rest format). Each roundtrip writes
DISTRIBUTED part files, reads them back with an explicit schema (never
inference on the read-back path — schema drift would hide), and proves
row identity with a content digest, not just counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.functions.numeric import dsum, sql_dsum
from gpu_mapreduce_spark.plans.scratch import sink_roundtrip
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table


_DIGEST_BUCKETS = 256


def _two_stage_digest(
    back: DataFrame, group: str, key: str, sum_col: str
) -> DataFrame:
    """Row-identity digest with BOUNDED aggregation state: keys bucket by
    abs(key) % {_DIGEST_BUCKETS} (abs so a future negative key cannot
    diverge from the SQL mirror's sign rendering), stage 1 digests each
    (group, bucket)'s sorted key list, stage 2 digests the zero-padded
    'bucket:digest' strings per group — per-group state is one bucket
    (stage 1) or one digest list (stage 2), never the whole group's keys.
    (A single-stage collect_list-of-all-keys digest would hold a
    corpus-sized group buffer at the scale these probes argue — the exact
    unbounded state SCALE.md forbids.) Zero-padding makes the stage-2
    lexicographic sort equal the numeric bucket order in both engines.
    The per-group count and `sum_col` sum ride the SAME two aggregates, so
    callers get (group, n, s, key_digest) from ONE read-back scan — no
    second stats pass, no join."""
    s1 = (
        back.groupBy(group, (F.abs(F.col(key)) % _DIGEST_BUCKETS).alias("bkt"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(sum_col).cast("bigint").alias("s"),
            F.md5(
                F.concat_ws(
                    ",", F.sort_array(F.collect_list(key)).cast("array<string>")
                )
            ).alias("d"),
        )
        .select(
            group, "n", "s", F.format_string("%03d:", "bkt").alias("pb"), "d"
        )
    )
    return s1.groupBy(group).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s").cast("bigint").alias("s"),
        F.md5(
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.concat("pb", "d")))
            )
        ).alias("key_digest"),
    )


def _sql_two_stage_digest(src: str, group: str, key: str, sum_expr: str) -> str:
    """DuckDB mirror of _two_stage_digest: (group, n, s, key_digest)."""
    return f"""
        SELECT {group}, CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(s) AS BIGINT) AS s,
               md5(string_agg(lpad(CAST(bkt AS VARCHAR), 3, '0') || ':' || d,
                              ',' ORDER BY bkt)) AS key_digest
        FROM (
            SELECT {group}, abs({key}) % {_DIGEST_BUCKETS} AS bkt,
                   COUNT(*) AS n,
                   CAST(SUM({sum_expr}) AS BIGINT) AS s,
                   md5(string_agg(CAST({key} AS VARCHAR), ','
                                  ORDER BY {key})) AS d
            FROM {src} GROUP BY {group}, bkt
        ) GROUP BY {group}
    """


@register(
    "jsonl_roundtrip",
    tags=("sources", "llm"),
    oracle=f"""
        SELECT lang, n AS n_docs, s AS chars_u, key_digest AS docid_digest
        FROM ({_sql_two_stage_digest('documents', 'lang', 'doc_id', 'n_chars')})
        ORDER BY lang
    """,
)
def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSONL part files → read back (explicit schema) →
    per-lang accounting with a two-stage bucketed md5 digest over the
    doc_id set (_two_stage_digest — bounded per-group state): the digest
    mismatches if the roundtrip drops, duplicates, or corrupts a single
    row — the oracle computes the same report straight from the parquet
    source of truth, so the query proves JSONL write+read is lossless.
    JSON escaping covers the text column's arbitrary content; writes are
    one part per partition (the landing-zone layout)."""
    docs = table(spark, sf_dir, "documents")

    def build(path: str) -> DataFrame:
        docs.write.mode("overwrite").json(path)
        back = spark.read.schema(
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint"
        ).json(path)
        return (
            _two_stage_digest(back, "lang", "doc_id", "n_chars")
            .select(
                "lang",
                F.col("n").alias("n_docs"),
                F.col("s").alias("chars_u"),
                F.col("key_digest").alias("docid_digest"),
            )
            .orderBy("lang")
        )

    return sink_roundtrip("jsonl_rt_", build)


@register(
    "orc_roundtrip",
    tags=("sources",),
    oracle=f"""
        SELECT o_orderstatus, n AS n_orders, s AS price_u, key_digest
        FROM ({_sql_two_stage_digest(
            'orders', 'o_orderstatus', 'o_orderkey',
            'CAST(FLOOR(o_totalprice * 10000) AS BIGINT)')})
        ORDER BY o_orderstatus
    """,
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → ORC part files → read back (explicit schema) → per-status
    accounting with exact fixed-point price sums and the two-stage
    bucketed key digest — same losslessness contract as jsonl_roundtrip
    for the columnar format. price_u quantizes BEFORE the write so the
    roundtripped value is an exact BIGINT and the digest never depends on
    double formatting."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 10000).cast("bigint").alias("price_u"),
    )

    def build(path: str) -> DataFrame:
        orders.write.mode("overwrite").orc(path)
        back = spark.read.schema(
            "o_orderkey bigint, o_orderstatus string, price_u bigint"
        ).orc(path)
        return (
            _two_stage_digest(back, "o_orderstatus", "o_orderkey", "price_u")
            .select(
                "o_orderstatus",
                F.col("n").alias("n_orders"),
                F.col("s").alias("price_u"),
                "key_digest",
            )
            .orderBy("o_orderstatus")
        )

    return sink_roundtrip("orc_rt_", build)


def dpp_day_counts(spark: SparkSession, sf_dir: str, path: str) -> DataFrame:
    """Write events date-partitioned, then join the read-back fact against
    a FILTERED date-dimension (Mondays) — the canonical star-schema shape
    where the partition list is only known after evaluating the dim, so
    static pruning is impossible and Spark's dynamic partition pruning
    (DPP) injects the broadcast dim result as a runtime partition filter:
    only the Monday directories are ever listed/opened. (The dim must
    carry a SELECTIVE PREDICATE — a plain Filter — for the PartitionPruning
    rule to fire; an aggregate/limit dim does not qualify, which is itself
    a documented planner contract this probe pins.) Split from the
    registered query so tests/test_plan_audit.py can assert
    `dynamicpruning` on the partitioned scan pre-checkpoint."""
    from gpu_mapreduce_spark.queries.streaming_batch import write_events_bydate

    ev, back = write_events_bydate(spark, sf_dir, path)
    date_dim = (
        ev.select("event_date")
        .distinct()
        .withColumn("dow", F.dayofweek(F.to_date("event_date")))
        .filter(F.col("dow") == 2)  # Mondays (Spark: 1=Sunday..7=Saturday)
        .select(F.col("event_date").alias("d"))
    )
    return (
        # bcast-audit: bounded (calendar-day dim)
        back.join(F.broadcast(date_dim), back.event_date == F.col("d"))
        .groupBy("event_date")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value")).alias("sum_value"),
        )
        # the partition column re-infers as DATE on read-back; cast AFTER
        # the grouped aggregate (casting before the join could sit between
        # the scan and the DPP filter) so the output type matches the
        # oracle's VARCHAR — the repo-wide convention that dates cross the
        # hash gate as strings or epoch ms, never engine-native date types
        .select(
            F.col("event_date").cast("string").alias("event_date"),
            "n",
            "sum_value",
        )
        .orderBy("event_date")
    )


@register(
    "events_dpp_join",
    tags=("sources", "pushdown", "join"),
    oracle="""
        WITH days AS (
            SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS d
            FROM events WHERE dayofweek(ts) = 1
        )
        SELECT strftime(e.ts, '%Y-%m-%d') AS event_date,
               COUNT(*) AS n,
               {dsum} AS sum_value
        FROM events e JOIN days ON strftime(e.ts, '%Y-%m-%d') = days.d
        GROUP BY 1 ORDER BY event_date
    """.format(dsum=sql_dsum("value")),
)
def events_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning probe: per-day totals for the Monday
    partitions, where the day list reaches the date-partitioned fact scan
    as a runtime DPP filter (dpp_day_counts; the `dynamicpruning` subquery
    on the scan is asserted mechanically). At 100 TB this is the
    difference between opening ~4 day directories and scanning the whole
    table — free because the join is declared, not hand-scheduled. The
    oracle selects the same weekday's days (DuckDB numbers Sunday=0, so
    Monday is 1 there and 2 in Spark) and aggregates them from the
    original table."""
    return sink_roundtrip(
        "events_dpp_", lambda path: dpp_day_counts(spark, sf_dir, path)
    )
