"""The bucketed-layout claim, checked mechanically: co-bucketing the fact
tables by the join key deletes every exchange between scan and top-k
(sources/bucketed.py; SCALE.md "q3-style joins")."""

from __future__ import annotations

import re

from gpu_mapreduce_spark.registry import load_all

SF_DIR = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_bucketed_has_no_shuffle(spark):
    qs = load_all()
    # At sf0.001 Catalyst would just broadcast the tiny fact side, which
    # proves nothing about the layout; force the big-big join down the
    # sort-merge path it would take at scale (the explicit customer
    # broadcast hint survives the threshold).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _executed_plan(qs["q3_bucketed"].fn(spark, SF_DIR))
        # BroadcastExchange (the filtered dim) is the point of the design;
        # shuffle exchanges are what bucketing exists to delete.
        shuffles = re.findall(r"Exchange (?!SinglePartition)\w*partitioning", plan)
        assert not shuffles, f"bucketed q3 still shuffles: {shuffles}\n{plan}"
        assert "SortMergeJoin" in plan

        # the unbucketed twin DOES shuffle — the comparison that proves the
        # layout, not the optimizer's mood, removed the exchanges
        plan_plain = _executed_plan(qs["q3_top_orders"].fn(spark, SF_DIR))
        assert re.search(r"Exchange hashpartitioning", plan_plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q3_bucketed_matches_plain(spark):
    qs = load_all()
    bucketed = qs["q3_bucketed"].fn(spark, SF_DIR).collect()
    plain = qs["q3_top_orders"].fn(spark, SF_DIR).collect()
    assert [r.asDict() for r in bucketed] == [r.asDict() for r in plain]


def test_bucketed_tables_isolated_across_sf_dirs(spark):
    # regression: the catalog name must be sf-qualified — interleaving two
    # scale dirs in one session previously overwrote the table and stale
    # handles read the other scale's data
    qs = load_all()
    a = qs["q3_bucketed"].fn(spark, SF_DIR).collect()
    b = qs["q3_bucketed"].fn(spark, "/root/testdata/sf0.01").collect()
    a2 = qs["q3_bucketed"].fn(spark, SF_DIR).collect()
    assert a == a2
    assert a != b
