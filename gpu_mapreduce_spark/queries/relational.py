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
        # bcast-audit: sf-dim (filtered customer) — SCALE.md broadcast audit
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
        # bcast-audit: sf-dim (filtered customer) — SCALE.md broadcast audit
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
    # bcast-audit: sf-dim (part) — SCALE.md broadcast audit
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
        # bcast-audit: sf-dim (filtered supplier) — SCALE.md broadcast audit
        F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti"
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    return (
        # bcast-audit: sf-dim (part) — SCALE.md broadcast audit
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
        # bcast-audit: bounded (nation: <=25 rows at any sf)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("rev")).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q12_HIGH = "('1-URGENT', '2-HIGH')"
_Q12_START, _Q12_END = "1996-01-01", "1997-01-01"


@register(
    "q12_priority_lines",
    tags=("relational", "join", "conditional-agg"),
    oracle=f"""
        SELECT l.l_returnflag,
               CAST(SUM(CASE WHEN o.o_orderpriority IN {_Q12_HIGH}
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN {_Q12_HIGH}
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_returnflag IN ('A', 'R')
          AND l.l_shipdate >= TIMESTAMP '{_Q12_START} 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '{_Q12_END} 00:00:00'
        GROUP BY l.l_returnflag
        ORDER BY l.l_returnflag
    """,
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode folded to returnflag — the fixture carries
    no l_shipmode): per-flag counts of high- vs low-priority order lines in
    a ship-year, i.e. a join whose AGGREGATE is conditional on the OTHER
    side's column. Both CASE sums partial-aggregate map-side after the one
    orderkey-axis join; lineitem's flag+date filters prune before the
    shuffle, orders reads only (orderkey, orderpriority)."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit(_Q12_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q12_END).cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q13_order_distribution",
    tags=("relational", "outerjoin"),
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c LEFT OUTER JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution. The LEFT OUTER
    join (filter riding the join PREDICATE, not a WHERE — customers whose
    every order is filtered out must still appear with c_count = 0) feeds
    COUNT(o_orderkey), which counts only matched rows; then a second,
    tiny aggregation histograms the counts. The reference's tag-dispatch
    join idiom cannot express this preserved-row semantics (same class as
    customers_no_orders). Scale: one custkey-axis shuffle join + two
    partial aggs; the histogram keyspace is O(max orders/customer)."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q15_START, _Q15_END = "1996-01-01", "1996-04-01"


@register(
    "q15_top_supplier",
    tags=("relational", "scalar-subquery"),
    oracle=f"""
        WITH rev AS (
            SELECT l_suppkey AS supplier_no,
                   {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{_Q15_START} 00:00:00'
              AND l_shipdate <  TIMESTAMP '{_Q15_END} 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM rev r JOIN supplier s ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
        ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    an aggregate compared against a scalar aggregate OVER THE SAME derived
    table. The scalar side is joined back via a literal-key broadcast
    equi-join (1-row build side, BroadcastHashJoin — NOT a nested-loop
    cross join, and NOT an unpartitioned window over all suppliers), so
    the plan audit's global-Window/BNLJ bans hold. Revenue is fixed-point
    exact, so the equality join is deterministic on both engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q15_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_END).cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev")).withColumn(
        "_k", F.lit(1)
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.withColumn("_k", F.lit(1))
        # bcast-audit: bounded (1-row scalar build)
        .join(F.broadcast(mx), "_k")
        .filter(F.col("total_revenue") == F.col("max_rev"))
        # bcast-audit: sf-dim (supplier) — SCALE.md broadcast audit
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q17_BRAND, _Q17_TYPE = "Brand#3", "SMALL"


@register(
    "q17_small_qty_revenue",
    tags=("relational", "correlated-agg"),
    oracle=f"""
        WITH pl AS (
            SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand = '{_Q17_BRAND}' AND p.p_type = '{_Q17_TYPE}'
        ),
        avgq AS (
            SELECT l_partkey, 0.2 * {sql_davg('l_quantity')} AS qty_cut
            FROM pl GROUP BY l_partkey
        )
        SELECT {sql_dsum('pl.l_extendedprice')} / 7.0 AS avg_yearly,
               COUNT(*) AS n_small_lines
        FROM pl JOIN avgq ON pl.l_partkey = avgq.l_partkey
        WHERE pl.l_quantity < avgq.qty_cut
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from order lines whose quantity is below
    20% of the PER-PART average — a correlated scalar aggregate,
    decorrelated the way Catalyst does it: compute the per-part threshold
    as a grouped aggregate, join it back on partkey, filter, aggregate.
    The brand/type filter cuts lineitem via a broadcast semi-shaped join
    FIRST, so both the threshold agg and the join-back run on the small
    filtered slice; the threshold (0.2 x exact-avg) is the identical IEEE
    expression on both engines."""
    p = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == _Q17_BRAND) & (F.col("p_type") == _Q17_TYPE))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # bcast-audit: sf-dim (filtered part) — SCALE.md broadcast audit
    pl = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avgq = pl.groupBy("l_partkey").agg(
        (F.lit(0.2) * davg(F.col("l_quantity"))).alias("qty_cut")
    )
    return (
        pl.join(avgq, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


_Q19_BANDS = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#2", 1, 10, 10, 20),
    ("Brand#15", 1, 15, 20, 30),
)


@register(
    "q19_disjunctive_revenue",
    tags=("relational", "join", "pushdown"),
    oracle=f"""
        SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE {' OR '.join(
            f"(p.p_brand = '{b}' AND p.p_size BETWEEN {s1} AND {s2}"
            f" AND l.l_quantity BETWEEN {q1} AND {q2})"
            for b, s1, s2, q1, q2 in _Q19_BANDS
        )}
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs predicate mixing columns from BOTH
    join sides — the disjunction cannot push down as-is, so the scale move
    is to push its BOUNDING BOX manually: part pre-filters to the brand
    set + max size band, lineitem to the overall quantity envelope, and
    the exact disjunction evaluates once on the (broadcast) joined rows.
    At 100x the data the scans shrink by the envelope selectivity before
    a single row moves."""
    brands = [b for b, *_ in _Q19_BANDS]
    min_size = min(s1 for _, s1, _, _, _ in _Q19_BANDS)
    max_size = max(s2 for _, _, s2, _, _ in _Q19_BANDS)
    qmin = min(q1 for *_, q1, _ in _Q19_BANDS)
    qmax = max(q2 for *_, q2 in _Q19_BANDS)
    p = (
        table(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin(brands)
            & (F.col("p_size") >= min_size)
            & (F.col("p_size") <= max_size)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= qmin) & (F.col("l_quantity") <= qmax)
    )
    disj = None
    for b, s1, s2, q1, q2 in _Q19_BANDS:
        band = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(s1, s2)
            & F.col("l_quantity").between(q1, q2)
        )
        disj = band if disj is None else (disj | band)
    return (
        # bcast-audit: sf-dim (filtered part) — SCALE.md broadcast audit
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(disj)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q21_LATE_DAYS = 60


@register(
    "q21_waiting_supplier",
    bench=True,
    tags=("relational", "semijoin", "antijoin"),
    oracle=f"""
        WITH late AS (
            SELECT l.l_orderkey, l.l_suppkey
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
              AND l.l_shipdate > o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
        )
        SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM late l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 10
    """,
)
def q21_waiting_supplier(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    multi-supplier finalized orders (lateness = shipped > {_Q21_LATE_DAYS}
    days after the order date — the fixture's stand-in for
    receiptdate > commitdate). The correlated EXISTS / NOT EXISTS pair
    becomes a LEFT SEMI then LEFT ANTI self-join on the SAME orderkey
    axis with the suppkey inequality riding each join — three shuffles
    total, all on orderkey, no distinct, no row explosion; supplier is a
    broadcast dim."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # materialize `late` once: it feeds BOTH sides (the probe l1 and the
    # anti build l3) — without this the plan recomputes the fact⋈orders
    # lateness join twice, which doubles the big join at any scale (at
    # cluster scale this is a persisted intermediate table). The audited
    # post-checkpoint plan collapses the join to Scan ExistingRDD, so
    # tests/test_plan_audit.py::test_q21_pre_checkpoint_plan re-audits the
    # materialize=False pipeline.
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q21_LATE_DAYS} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    if materialize:
        late = late.localCheckpoint(eager=True)
    l1, l2, l3 = late.alias("l1"), li.alias("l2"), late.alias("l3")
    sole = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .alias("l1")
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        # bcast-audit: sf-dim (supplier) — SCALE.md broadcast audit
        sole.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


_Q22_NATIONS = (1, 2, 3, 4, 5, 6, 7)
_Q22_CUTOFF = "1998-01-01"


@register(
    "q22_idle_customers",
    tags=("relational", "antijoin", "scalar-subquery"),
    oracle=f"""
        WITH pos AS (
            SELECT {sql_davg('c_acctbal')} AS avg_bal
            FROM customer
            WHERE c_acctbal > 0.0
              AND c_nationkey IN {_Q22_NATIONS}
        )
        SELECT c.c_nationkey AS cntry,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               {sql_dsum('c.c_acctbal')} AS totacctbal
        FROM customer c, pos
        WHERE c.c_nationkey IN {_Q22_NATIONS}
          AND c.c_acctbal > pos.avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF} 00:00:00')
        GROUP BY c.c_nationkey
        ORDER BY c.c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers (balance above the positive-
    balance average of their nation group) with no recent orders. Composes
    the two subquery classes in one query: a scalar aggregate subquery
    (literal-key broadcast join of the 1-row average, as q15) and a
    filtered NOT EXISTS (LEFT ANTI join against date-pruned orders — the
    date filter pushes to the orders SCAN, so the anti join's build input
    shrinks before it ships)."""
    nats = list(_Q22_NATIONS)
    c = table(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nats))
    pos = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(davg(F.col("c_acctbal")).alias("avg_bal"))
        .withColumn("_k", F.lit(1))
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    rich = (
        c.withColumn("_k", F.lit(1))
        # bcast-audit: bounded (1-row scalar build)
        .join(F.broadcast(pos), "_k")
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
    )
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntry")
    )
