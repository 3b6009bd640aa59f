"""Advanced-analytics queries beyond the reference's operator set (builder
brief): as-of join, banded range join, window top-N, rollup grouping sets,
deterministic stratified sampling, and a TPC-H Q5-shape multi-way join.
Every query carries a full DuckDB oracle; the join operators live in
operators/joins.py, sampling in operators/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_mapreduce_spark.functions.numeric import dsum, sql_dsum
from gpu_mapreduce_spark.operators import joins, sampling
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table


@register(
    "asof_join_events",
    bench=True,
    tags=("analytics", "join", "asof"),
    oracle="""
        WITH v AS (
            SELECT user_id, ts, MAX(value) AS value
            FROM events WHERE event_type = 'view'
            GROUP BY user_id, ts
        ),
        c AS (
            SELECT event_id, user_id, ts, value
            FROM events WHERE event_type = 'click'
        )
        SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS ts_ms, c.value,
               CAST(epoch_ms(v.ts) AS VARCHAR) AS r_ts_ms, v.value AS r_value
        FROM c ASOF LEFT JOIN v
          ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click annotated with the user's most recent view at or before
    it — the as-of join every event/tick pipeline needs. Spark side is the
    union+window formulation (operators/joins.asof_join: one shuffle on
    user_id, no join node); the oracle is DuckDB's native ASOF JOIN — two
    entirely different algorithms, same rows."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    out = joins.asof_join(clicks, views, key="user_id", ts="ts", payload=["value"])
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        "value",
        # string, not BIGINT: the column is nullable (clicks with no prior
        # view), and a nullable int64 round-trips through pandas as float64
        # on the oracle side, corrupting epoch values past 2^53 formatting
        F.unix_millis("r_ts").cast("string").alias("r_ts_ms"),
        "r_value",
    )


@register(
    "range_join_events",
    tags=("analytics", "join", "range"),
    oracle=f"""
        SELECT e.event_id AS err_id,
               COUNT(c.cts) AS n_clicks,
               {sql_dsum('c.cval')} AS sum_click_value
        FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') e
        LEFT JOIN (SELECT ts AS cts, value AS cval
                   FROM events WHERE event_type = 'click') c
          ON c.cts >= e.ts AND c.cts < e.ts + INTERVAL 10 MINUTE
        GROUP BY e.event_id
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks landing in the 10 minutes after each error event — a
    point-in-interval range join. Spark side uses band bucketing
    (operators/joins.range_join_points, equi-join shuffle shape); the
    oracle is DuckDB's inequality join (IEJoin) — the quadratic formulation
    the banded plan avoids at scale."""
    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("start"),
        F.expr("ts + INTERVAL 10 MINUTES").alias("end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("cts"), F.col("value").alias("cval")
    )
    pairs = joins.range_join_points(
        clicks, errors, pt="cts", start="start", end="end", band_ms=600_000
    )
    agg = pairs.groupBy("err_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        dsum(F.col("cval")).alias("sum_click_value"),
    )
    return (
        errors.select("err_id")
        .join(agg, "err_id", "left")
        .select(
            "err_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            "sum_click_value",
        )
    )


@register(
    "window_topn_per_group",
    tags=("analytics", "window"),
    oracle="""
        SELECT o_orderpriority, o_orderkey, o_totalprice, rn
        FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS BIGINT) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price within every priority class via row_number —
    the per-group top-N window pattern (rank ties broken by key for a total
    order). One shuffle on the partition key; at scale Catalyst inserts a
    per-partition rank filter before the final sort when N is small."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "rollup_order_stats",
    tags=("analytics", "groupingsets"),
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               {sql_dsum('o_totalprice')} AS sum_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts and exact price sums at three grain levels in one pass
    (detail / per-status / grand total) via ROLLUP. grouping_id
    disambiguates subtotal rows from genuine NULL group values; both
    engines use the same MSB-first bit order."""
    return (
        table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "sum_price")
    )


_RATES = {"1-URGENT": 0.25, "5-LOW": 0.10}
_DEFAULT_RATE = 0.02


def _rate_case() -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN CAST({r!r} AS DOUBLE)" for s, r in sorted(_RATES.items())
    )
    return (
        f"CASE o_orderpriority {whens} ELSE CAST({_DEFAULT_RATE!r} AS DOUBLE) END"
    )


@register(
    "stratified_sample_orders",
    tags=("analytics", "sampling"),
    oracle=f"""
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders
        WHERE {sampling.sql_sample_predicate('smp', 'o_orderkey', _rate_case())}
    """,
)
def stratified_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-priority sampling (25% URGENT, 10% LOW, 2% rest)
    keyed on o_orderkey: the same rows are selected on any engine, any
    partitioning, any rerun — DataFrame.sample() can guarantee none of
    that. Pure scan filter: zero shuffles."""
    return sampling.stratified_sample(
        table(spark, sf_dir, "orders"),
        stratum_col="o_orderpriority",
        key_col="o_orderkey",
        rates=_RATES,
        default_rate=_DEFAULT_RATE,
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@register(
    "q5_region_revenue",
    bench=True,
    tags=("relational", "join", "flagship"),
    oracle=f"""
        SELECT n.n_name,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND s.s_nationkey = c.c_nationkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join with a cross-dimension predicate
    (supplier nation == customer nation). Physical strategy: the bounded
    dims (region/nation/supplier) broadcast explicitly, customer under an
    AQE size guard (see below), so the only guaranteed shuffle join is the
    big-big orders⋈lineitem on orderkey — same bucketable axis as q3."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = (
        table(spark, sf_dir, "nation")
        # bcast-audit: bounded (region: <=5 rows at any sf)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    sn = (
        table(spark, sf_dir, "supplier")
        # bcast-audit: bounded (nation: <=25 rows at any sf)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(
            # bcast-audit: bounded (nation: <=25 rows at any sf)
            F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"))),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .select("c_custkey", "c_nationkey")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    # customer is the ONE dim that grows with the fact tables (SF-scaled), so
    # it gets a size guard instead of an unconditional hint: AQE's runtime
    # stats broadcast it while it fits under autoBroadcastJoinThreshold and
    # fall back to a shuffle join beyond — the tiny bounded dims above stay
    # explicitly broadcast (region-filtered nation is <= |nations| rows).
    co = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "c_nationkey"
    )
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = (
        l.join(co, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            # bcast-audit: sf-dim (supplier x nation) — SCALE.md broadcast audit
            F.broadcast(sn),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return (
        rev.groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )
