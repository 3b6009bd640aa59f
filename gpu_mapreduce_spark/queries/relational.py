"""Relational/SQL capability queries.

The reference has no SQL layer (SURVEY.md §0) — its "queries" are hand-coded
MR pipelines. This module demonstrates the declarative spine the engine is
built on: scan → (pushed) filter → partial agg → shuffle → agg → sort →
limit, plus real joins (which the reference fakes via add+collate+tag-dispatch
reduces, SURVEY.md §2.1 note).

Scale notes: q1 is a pure map-side-combinable aggregation on 6 groups (flat
scaling); q3 joins fact tables against a filtered dim — the dim side is
broadcast so the lineitem scan never shuffles for the join, and the final
top-k is TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_Q1_CUTOFF = "1998-09-02"


_Q1_SQL = f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_quantity')} AS sum_qty,
               {sql_dsum('l_extendedprice')} AS sum_base_price,
               {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
               {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
               {sql_davg('l_quantity')} AS avg_qty,
               {sql_davg('l_extendedprice')} AS avg_price,
               {sql_davg('l_discount')} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF} 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """


@register(
    "q1_pricing_summary",
    bench=True,
    tags=("relational", "flagship"),
    oracle=_Q1_SQL,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the flagship end-to-end slice (SURVEY.md §7 step 1).

    Filter pushes to the parquet scan; 8 aggregates over 6 groups partial-
    aggregate map-side, so the shuffle carries only a handful of rows per
    partition at any scale.
    """
    li = table(spark, sf_dir, "lineitem")
    price, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(price).alias("sum_base_price"),
            dsum(price * (1 - disc)).alias("sum_disc_price"),
            dsum(price * (1 - disc) * (1 + tax)).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(price).alias("avg_price"),
            davg(disc).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q6_forecast_revenue",
    bench=True,
    tags=("relational", "pushdown"),
    oracle=f"""
        SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the canonical predicate-pushdown/column-pruning probe
    — four range predicates, a 4-column projection from an 11-column table,
    one scalar aggregate. The RIGHT plan is a bare scan with every filter in
    `PushedFilters` and `ReadSchema` shrunk to the 4 touched columns, then a
    map-side-total partial agg — no shuffle of data rows at any scale.
    tests/test_plan_audit.py asserts the pushdown/pruning mechanically."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q3_top_orders",
    bench=True,
    tags=("relational", "join"),
    oracle=f"""
        SELECT l.l_orderkey,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d')
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: two joins + agg + total-order top-k.

    customer (filtered on segment) is tiny relative to lineitem → explicit
    broadcast; orders is mid-sized and joins lineitem on its key. At cluster
    scale orders/lineitem would be co-bucketed on orderkey; here AQE picks
    the strategy.
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    # broadcast only the filtered dim (customer); orders⋈lineitem stays a
    # key-partitioned big-big join (bucketable on orderkey at cluster scale)
    co = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_orderdate")
    )
    return (
        l.join(co, l.l_orderkey == co.o_orderkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_Q3_ORACLE = f"""
        SELECT l.l_orderkey,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d')
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """


@register(
    "q3_bucketed",
    bench=True,
    tags=("relational", "join", "bucketed"),
    oracle=_Q3_ORACLE,
)
def q3_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3_top_orders on orders/lineitem CO-BUCKETED by orderkey — the
    at-rest layout q3's docstring promises at cluster scale, made real
    (sources/bucketed.py). Both bucketed scans report
    HashPartitioning(orderkey, 16), so the fact-fact sort-merge join AND the
    downstream groupBy(l_orderkey, ...) run with ZERO exchanges
    (tests/test_bucketed.py asserts it); the only data movement left in the
    whole query is the customer broadcast and the top-k gather. First call
    per session pays the one-time bucketed write (ingest-time work on a real
    cluster)."""
    from gpu_mapreduce_spark.sources.bucketed import bucketed_table

    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = bucketed_table(spark, sf_dir, "orders", "o_orderkey").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = bucketed_table(spark, sf_dir, "lineitem", "l_orderkey").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    co = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_orderdate")
    )
    return (
        l.join(co, l.l_orderkey == co.o_orderkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register("q1_sql_dual", tags=("relational", "sql"), oracle=_Q1_SQL)
def q1_sql_dual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle string itself, executed by Spark SQL over temp views of
    the base tables — one ANSI-SQL text drives BOTH engines (the fixed-point
    discipline in functions/numeric.py is what makes that possible: FLOOR /
    BIGINT sums are bit-identical everywhere). Demonstrates the spark.sql
    surface next to the DataFrame API."""
    from gpu_mapreduce_spark.sources.tables import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(_Q1_SQL)


@register(
    "customers_no_orders",
    tags=("relational", "join", "anti"),
    oracle="""
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — a join class the reference cannot express at all
    (its add+collate+tag-dispatch idiom needs a value present on BOTH
    sides to dispatch on; absence detection requires the grouped
    all-values-view only a real anti join / NOT EXISTS provides). Plan:
    the orders side reduces to its join key at the scan (ReadSchema one
    column), then one hash anti join."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@register(
    "cube_order_stats",
    tags=("relational", "groupingsets"),
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               {sql_dsum('o_totalprice')} AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all four grain combinations in one pass
    (detail / per-status / per-priority / grand total) — the per-priority
    margin is the row set ROLLUP cannot produce. Same exact fixed-point
    sums and MSB-first grouping_id convention as rollup_order_stats."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "sum_price")
    )
