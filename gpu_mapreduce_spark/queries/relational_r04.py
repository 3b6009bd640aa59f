"""TPC-H shapes added late in r04 (q7/q9/q8/q2/q11/q20).

Functionally these belong with queries/relational.py; they live in a
separate module ONLY for registration order: the driver's 50-slot
correctness window holds exactly the 50 never-driver-checked queries this
round, and a new query registered in an early-loading module would
displace one of them (SURVEY §2.6 tail-registration discipline). The
registry imports this module in the tail block, so these queue behind the
window and enter it next round."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.functions.numeric import dsum, sql_dsum
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

# NATION_3 <-> NATION_21: both directions carry lines at EVERY fixture
# scale incl. sf0.001, so the local parity test is never empty-vs-empty
_Q7_N1, _Q7_N2 = "NATION_3", "NATION_21"
_Q7_START, _Q7_END = "1996-01-01", "1998-01-01"


@register(
    "q7_nation_volume",
    tags=("relational", "join"),
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year,
               {sql_dsum('volume')} AS revenue,
               COUNT(*) AS n_lines
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS INT) AS l_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume
            FROM supplier s
            JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}')
                   OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}'))
              AND l.l_shipdate >= TIMESTAMP '{_Q7_START} 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '{_Q7_END} 00:00:00'
        )
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations, grouped by
    direction and ship-year. The two-sided nation disjunction cannot pick a
    side until both dims are attached, but its BOUNDING set can: supplier
    and customer each pre-filter (broadcast semi-shape) to the two-nation
    subset before the fact joins, so the orderkey-axis big-big join runs on
    the reduced slice and the exact direction disjunction evaluates once on
    the joined rows (the q19 bounding-box discipline applied to dims).
    Year extraction is a codegen projection; the final aggregate is four
    tiny groups (2 directions x 2 ship-years in the window)."""
    nations = [_Q7_N1, _Q7_N2]
    n = table(spark, sf_dir, "nation").filter(F.col("n_name").isin(nations))
    s = (
        table(spark, sf_dir, "supplier")
        # bcast-audit: bounded (nation: <=25 rows at any sf)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        table(spark, sf_dir, "customer")
        # bcast-audit: bounded (nation: <=25 rows at any sf)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q7_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q7_END).cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        # bcast-audit: sf-dim (supplier) — SCALE.md broadcast audit
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(
            ((F.col("supp_nation") == _Q7_N1) & (F.col("cust_nation") == _Q7_N2))
            | ((F.col("supp_nation") == _Q7_N2) & (F.col("cust_nation") == _Q7_N1))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q9_PAT = "bolt"


@register(
    "q9_product_profit",
    tags=("relational", "join", "pushdown"),
    oracle=f"""
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INT) AS o_year,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)'
                         ' - 0.1 * p.p_retailprice * l.l_quantity')} AS sum_profit
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%{_Q9_PAT}%'
        GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
        ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line (parts whose name contains
    '{_Q9_PAT}'), by supplier nation and order year; cost term derived from
    p_retailprice (the fixture carries no partsupp). The LIKE '%...%'
    predicate pushes to the part scan as a StringContains parquet filter —
    the substring-pushdown class no other query exercises (mechanically
    asserted in tests/test_plan_audit.py); the filtered part dim and
    supplier⋈nation are broadcasts, so the only big-big join is
    lineitem⋈orders on the orderkey axis."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(_Q9_PAT))
        .select("p_partkey", "p_retailprice")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # bcast-audit: bounded (nation: <=25 rows at any sf)
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        # bcast-audit: sf-dim (filtered part) — SCALE.md broadcast audit
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        # bcast-audit: sf-dim (supplier x nation) — SCALE.md broadcast audit
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# NATION_21 suppliers sell ECONOMY parts to AMERICA customers at every
# fixture scale incl. sf0.001 — the conditional branch is never dead in
# the local parity test
_Q8_NATION, _Q8_REGION, _Q8_TYPE = "NATION_21", "AMERICA", "ECONOMY"
_Q8_START, _Q8_END = "1996-01-01", "1998-01-01"


@register(
    "q8_market_share",
    tags=("relational", "join", "conditional-agg"),
    oracle=f"""
        SELECT o_year,
               {sql_dsum(f"CASE WHEN supp_nation = '{_Q8_NATION}'"
                         " THEN volume ELSE 0 END")} AS nation_volume,
               {sql_dsum('volume')} AS total_volume,
               {sql_dsum(f"CASE WHEN supp_nation = '{_Q8_NATION}'"
                         " THEN volume ELSE 0 END")}
                   / {sql_dsum('volume')} AS mkt_share
        FROM (
            SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   n1.n_name AS supp_nation
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n2.n_regionkey
            WHERE p.p_type = '{_Q8_TYPE}'
              AND r.r_name = '{_Q8_REGION}'
              AND o.o_orderdate >= TIMESTAMP '{_Q8_START} 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '{_Q8_END} 00:00:00'
        )
        GROUP BY o_year
        ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: {_Q8_NATION}'s share of {_Q8_REGION}-customer
    {_Q8_TYPE}-part revenue per order year — the widest join chain in the
    suite (8 tables) feeding a grouped conditional-sum RATIO (q14's
    percentage generalized to per-group). Bounded dims (part filtered on
    type, supplier⋈nation, nation⋈region) broadcast; customer rides the
    AQE size guard (q5 discipline); the two fact joins stay on the
    orderkey axis. The ratio divides two exact fixed-point sums — one
    deterministic double division per group."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == _Q8_TYPE)
        .select("p_partkey")
    )
    n1 = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        table(spark, sf_dir, "supplier")
        # bcast-audit: bounded (nation: <=25 rows at any sf)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    r = (
        table(spark, sf_dir, "region")
        .filter(F.col("r_name") == _Q8_REGION)
        .select("r_regionkey")
    )
    n2 = (
        table(spark, sf_dir, "nation")
        # bcast-audit: bounded (region: <=5 rows at any sf)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("c_nkey"))
    )
    c = (
        table(spark, sf_dir, "customer")
        # bcast-audit: bounded (nation: <=25 rows at any sf)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .select("c_custkey")
    )
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q8_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q8_END).cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_vol = F.when(F.col("supp_nation") == _Q8_NATION, vol).otherwise(
        F.lit(0.0)
    )
    joined = (
        # bcast-audit: sf-dim (filtered part) — SCALE.md broadcast audit
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        # bcast-audit: sf-dim (supplier) — SCALE.md broadcast audit
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == c.c_custkey)
    )
    agg = joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        dsum(nat_vol).alias("nation_volume"),
        dsum(vol).alias("total_volume"),
    )
    return agg.select(
        "o_year",
        "nation_volume",
        "total_volume",
        (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
    ).orderBy("o_year")


_Q2_SIZE = 5


@register(
    "q2_min_cost_supplier",
    tags=("relational", "argmin", "join"),
    oracle=f"""
        WITH ps AS (
            SELECT DISTINCT l_partkey, l_suppkey,
                   CAST((l_partkey * 31 + l_suppkey) % 1000 AS BIGINT)
                       AS cost_u
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_size = {_Q2_SIZE})
        ),
        best AS (
            SELECT l_partkey,
                   MIN(cost_u * 1000000000 + l_suppkey) AS packed
            FROM ps GROUP BY l_partkey
        )
        SELECT p.p_partkey, p.p_brand,
               CAST(b.packed % 1000000000 AS BIGINT) AS s_suppkey,
               CAST(b.packed // 1000000000 AS BIGINT) AS min_cost_u,
               s.s_name, n.n_name AS supp_nation
        FROM best b
        JOIN part p ON p.p_partkey = b.l_partkey AND p.p_size = {_Q2_SIZE}
        JOIN supplier s ON s.s_suppkey = b.packed % 1000000000
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        ORDER BY p.p_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the minimum-cost supplier per part (the correlated
    MIN subquery), for parts of one size. The part-supplier relation and a
    deterministic integer cost are DERIVED from lineitem (the fixture has
    no partsupp). The argmin is ONE grouped aggregate over a packed BIGINT
    (cost_u * 1e9 + suppkey — exact integer packing, suppkey < 1e9, so the
    MIN simultaneously picks lowest cost with lowest-suppkey tie-break and
    both engines unpack identical fields) — no window, no join-back against
    a separate min table. Dims (part filtered on size, supplier, nation)
    broadcast onto the per-part argmin output."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size") == _Q2_SIZE)
        .select("p_partkey", "p_brand")
    )
    li = table(spark, sf_dir, "lineitem")
    ps = (
        # pre-filter to the size-band parts BEFORE the distinct/argmin:
        # only ~2% of pairs survive, so the dominant shuffle shrinks ~50x
        # (the q7/q19 scan-reduction discipline applied to the aggregate)
        li.join(
            # bcast-audit: sf-dim (filtered part keys) — SCALE.md broadcast audit
            F.broadcast(p.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .select("l_partkey", "l_suppkey")
        .distinct()
        .select(
            "l_partkey",
            "l_suppkey",
            ((F.col("l_partkey") * 31 + F.col("l_suppkey")) % 1000)
            .cast("bigint")
            .alias("cost_u"),
        )
    )
    best = ps.groupBy("l_partkey").agg(
        F.min(F.col("cost_u") * 1000000000 + F.col("l_suppkey")).alias("packed")
    )
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        # bcast-audit: sf-dim (filtered part) — SCALE.md broadcast audit
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .select(
            "p_partkey",
            "p_brand",
            (F.col("packed") % 1000000000).cast("bigint").alias("s_suppkey"),
            F.expr("packed div 1000000000").cast("bigint").alias("min_cost_u"),
        )
        # bcast-audit: sf-dim (supplier) — SCALE.md broadcast audit
        .join(F.broadcast(s), "s_suppkey")
        # bcast-audit: bounded (nation: <=25 rows at any sf)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            "p_partkey", "p_brand", "s_suppkey", "min_cost_u",
            "s_name", F.col("n_name").alias("supp_nation"),
        )
        .orderBy("p_partkey")
    )


# Three nations that each have at least one supplier at EVERY fixture
# scale incl. sf0.001 (single-nation filters are vacuous there: 10
# suppliers spread over 10 distinct nations), so q11/q20's local parity
# runs are never empty-vs-empty.
_Q11_NATIONS = ("NATION_3", "NATION_21", "NATION_15")
_Q11_NATIONS_SQL = "('" + "','".join(_Q11_NATIONS) + "')"

# Derived partsupp attributes (the fixture carries no partsupp table):
# deterministic pure-integer functions of the key pair, identical in both
# engines. cost_u matches q2's derivation; avail_u is 1..100.
_COST_U = "((l_partkey * 31 + l_suppkey) % 1000)"
_AVAIL_U = "((l_partkey * 17 + l_suppkey * 7) % 100 + 1)"


@register(
    "q11_important_stock",
    tags=("relational", "having", "scalar-subquery"),
    oracle=f"""
        WITH ps AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        ),
        v AS (
            SELECT l_partkey,
                   CAST({_COST_U} * {_AVAIL_U} AS BIGINT) AS value_u,
                   l_suppkey
            FROM ps
        ),
        nv AS (
            SELECT v.l_partkey, v.value_u
            FROM v
            JOIN supplier s ON s.s_suppkey = v.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name IN {_Q11_NATIONS_SQL}
        ),
        per AS (
            SELECT l_partkey AS ps_partkey, SUM(value_u) AS value_u
            FROM nv GROUP BY l_partkey
        ),
        tot AS (
            SELECT SUM(value_u) AS total_u, COUNT(*) AS n_parts FROM per
        )
        SELECT ps_partkey, CAST(per.value_u AS BIGINT) AS value_u
        FROM per, tot
        WHERE per.value_u * tot.n_parts > 2 * tot.total_u
        ORDER BY per.value_u DESC, ps_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value held by a nation set's
    suppliers exceeds a fraction of the group's total (the HAVING-vs-
    global-scalar-subquery shape). partsupp and its cost/availqty are
    DERIVED from lineitem's distinct (part, supplier) pairs (no partsupp
    in the fixture; q2's derivation discipline). The threshold is
    DATA-DERIVED — value > 2x the average per-part value — because any
    fixed fraction of the total is scale-dependent (TPC-H itself scales
    Q11's fraction by 1/SF): the comparison `value_u * n_parts >
    2 * total_u` is exact BIGINT arithmetic at every scale. The global
    total attaches via a literal-key broadcast equi-join (q15 discipline —
    no BroadcastNestedLoopJoin, no single-partition window); the nation
    filter broadcasts into supplier and semi-reduces the pair set before
    the per-part shuffle."""
    nat = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*_Q11_NATIONS)
    )
    s = (
        table(spark, sf_dir, "supplier")
        # bcast-audit: bounded (nation: <=25 rows at any sf)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    ps = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        # bcast-audit: sf-dim (filtered supplier set) — SCALE.md broadcast audit
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
    )
    per = (
        ps.select(
            "l_partkey",
            (F.expr(_COST_U) * F.expr(_AVAIL_U)).cast("bigint").alias("value_u"),
        )
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum("value_u").alias("value_u"))
    )
    tot = per.agg(
        F.sum("value_u").alias("total_u"), F.count(F.lit(1)).alias("n_parts")
    ).withColumn("k", F.lit(1))
    return (
        per.withColumn("k", F.lit(1))
        # bcast-audit: bounded (1-row scalar build)
        .join(F.broadcast(tot), "k")
        .filter(F.col("value_u") * F.col("n_parts") > 2 * F.col("total_u"))
        .select("ps_partkey", "value_u")
        .orderBy(F.desc("value_u"), "ps_partkey")
    )


_Q20_PREFIX = "small"
_Q20_START, _Q20_END = "1996-01-01", "1997-01-01"


@register(
    "q20_excess_suppliers",
    tags=("relational", "semi-join", "pushdown"),
    oracle=f"""
        WITH q AS (
            SELECT l_partkey, l_suppkey,
                   SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS qty_u
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{_Q20_START} 00:00:00'
              AND l_shipdate <  TIMESTAMP '{_Q20_END} 00:00:00'
              AND l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE '{_Q20_PREFIX}%')
            GROUP BY l_partkey, l_suppkey
        ),
        f AS (
            SELECT DISTINCT l_suppkey FROM q
            WHERE 2 * {_AVAIL_U} > qty_u
        )
        SELECT s.s_suppkey, s.s_name, n.n_name AS supp_nation
        FROM f
        JOIN supplier s ON s.s_suppkey = f.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN {_Q11_NATIONS_SQL}
        ORDER BY s.s_suppkey
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in a nation set holding excess stock
    (availqty > half the quantity they shipped in a year) of parts whose
    name starts with '{_Q20_PREFIX}' — the nested-semi-join chain. availqty
    is the q11 derivation; shipped quantity floors to exact BIGINT units.
    The `LIKE 'prefix%'` pushes to the part scan as a StringStartsWith
    parquet filter (the prefix-pushdown class; q9 covers Contains), the
    filtered part set broadcast-semi-reduces lineitem BEFORE its
    (part, supplier) shuffle, and pairs with no shipped lines in the window
    are excluded (TPC-H NULL-comparison semantics: an empty correlated sum
    qualifies nothing). The qualifying-supplier set is tiny, so it
    broadcast-semi-joins INTO supplier rather than shuffling it."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(_Q20_PREFIX))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q20_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q20_END).cast("timestamp"))
    )
    q = (
        # bcast-audit: sf-dim (filtered part keys) — SCALE.md broadcast audit
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.floor("l_quantity").cast("bigint")).alias("qty_u"))
    )
    f = (
        q.filter(2 * F.expr(_AVAIL_U) > F.col("qty_u"))
        .select("l_suppkey")
        .distinct()
    )
    nat = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*_Q11_NATIONS)
    )
    return (
        table(spark, sf_dir, "supplier")
        # bcast-audit: sf-dim (qualifying-supplier set) — SCALE.md broadcast audit
        .join(F.broadcast(f), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        # bcast-audit: bounded (nation: <=25 rows at any sf)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
        .orderBy("s_suppkey")
    )
