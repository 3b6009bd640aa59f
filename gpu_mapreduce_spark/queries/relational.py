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


_Q4_START, _Q4_END = "1996-01-01", "1996-07-01"


@register(
    "q4_priority_late",
    tags=("relational", "semijoin"),
    oracle=f"""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '{_Q4_START} 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '{_Q4_END} 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def q4_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts over orders with at least one
    late-shipped lineitem. The EXISTS subquery is expressed directly as a
    LEFT SEMI join (what Catalyst decorrelates EXISTS into): equi-key on
    orderkey plus the non-equi lateness predicate riding the same join, so
    each order is emitted at most once however many lineitems are late —
    no distinct, no row explosion. Scale: fact⋈fact semi join shuffles on
    orderkey (the bucketable axis); the date filter pushes to the orders
    scan and prunes before the shuffle."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q4_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q4_END).cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q14_START, _Q14_END = "1997-03-01", "1997-04-01"
_Q14_REV = "l.l_extendedprice * (1 - l.l_discount)"


@register(
    "q14_promo_revenue",
    tags=("relational", "join"),
    oracle=f"""
        SELECT {sql_dsum(f"CASE WHEN p.p_type = 'PROMO' THEN {_Q14_REV} ELSE 0 END")}
                   AS promo_revenue,
               {sql_dsum(_Q14_REV)} AS total_revenue,
               100.0 * {sql_dsum(f"CASE WHEN p.p_type = 'PROMO' THEN {_Q14_REV} ELSE 0 END")}
                     / {sql_dsum(_Q14_REV)} AS promo_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '{_Q14_START} 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '{_Q14_END} 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one ship-month's revenue from PROMO-type
    parts. part is a bounded dim → explicit broadcast, so the lineitem scan
    (ship-month filter pushed down) never shuffles; the conditional
    aggregation is two map-side-combinable fixed-point sums, and the final
    percentage is one deterministic double division of exact sums (both
    engines evaluate the identical 100.0 * promo / total)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q14_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q14_END).cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    agg = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        dsum(promo).alias("promo_revenue"),
        dsum(rev).alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
    )


_Q18_QTY = 150


@register(
    "q18_large_orders",
    tags=("relational", "join", "having"),
    oracle=f"""
        WITH big AS (
            SELECT l_orderkey, {sql_dsum('l_quantity')} AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING {sql_dsum('l_quantity')} > {_Q18_QTY}
        )
        SELECT c.c_name, o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               o.o_totalprice, b.sum_qty
        FROM big b
        JOIN orders o ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY b.sum_qty DESC, o.o_orderkey
        LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — HAVING on an aggregate, then
    join the survivors back to their order/customer rows. The quantity
    aggregate runs FIRST and its filter cuts the fact table to the handful
    of big orders before any join, so the join-back input is tiny (AQE
    broadcasts it at runtime); top-20 is TakeOrderedAndProject with a total
    order (sum_qty desc, orderkey)."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > _Q18_QTY)
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("sum_qty"), "o_orderkey")
        .limit(20)
    )


@register(
    "q16_supplier_variety",
    tags=("relational", "antijoin", "distinct"),
    oracle="""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        ok AS (
            SELECT ps.l_partkey, ps.l_suppkey FROM ps
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = ps.l_suppkey
                                AND s.s_acctbal < 0)
        )
        SELECT p.p_brand, p.p_type,
               CAST(COUNT(DISTINCT ok.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM ok JOIN part p ON ok.l_partkey = p.p_partkey
        GROUP BY p.p_brand, p.p_type
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each (brand,
    type), excluding blacklisted suppliers (negative acctbal here — the
    fixture's analog of Q16's complaints filter). The part-supplier
    relation is DERIVED from lineitem by distinct projection (the fixture
    has no partsupp table); exclusion is a LEFT ANTI join against the
    filtered supplier dim (broadcast — bounded), then a two-level distinct
    aggregation. Scale: the distinct projection partial-aggregates
    map-side; count(distinct) rewrites to a two-stage expand+agg on
    (brand, type, suppkey) — no row ever carries more than the pair."""
    ps = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ok = ps.join(
        F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti"
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    return (
        ok.join(F.broadcast(p), ok.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


_Q10_START, _Q10_END = "1997-01-01", "1997-04-01"


@register(
    "q10_returned_revenue",
    tags=("relational", "join"),
    oracle=f"""
        SELECT c.c_custkey, c.c_name, n.n_name,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '{_Q10_START} 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '{_Q10_END} 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most revenue in a
    quarter. Join order keeps the big-big join on the orderkey axis
    (returnflag + date filters pushed to both scans first); nation is an
    explicit broadcast, customer rides the AQE size guard like q5. Top-20
    with a total order (revenue desc — exact fixed-point, so ties are
    impossible to misorder — then custkey)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q10_END).cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ol = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_custkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    return (
        ol.join(c, ol.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("rev")).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
