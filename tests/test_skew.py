"""Salting operators (operators/skew.py): salted forms must be EXACTLY
equivalent to their unsalted counterparts — salting changes only the shuffle
shape, never the result — and the salt column must never leak into output."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import skew


def _skewed_fact(spark):
    # 900 of 1000 rows share key 0 — a hot key, with a varying payload column
    return spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )


def test_salted_join_matches_plain_join(spark):
    fact = _skewed_fact(spark)
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 13).alias("attr")
    )
    plain = sorted(fact.join(dim, ["k"]).collect())
    for force in (False, True):
        salted = skew.salted_join(
            fact, dim, on=["k"], num_salts=5, salt_src=["payload"],
            force_shuffle=force,
        )
        assert salted.columns == ["k", "payload", "attr"]
        assert sorted(salted.collect()) == plain


def test_salted_join_spreads_hot_key(spark):
    # the hot key's rows must land in >1 salt bucket (salt varies with payload)
    fact = _skewed_fact(spark)
    buckets = (
        fact.withColumn("s", skew._salt_of(["payload"], 5))
        .filter(F.col("k") == 0)
        .select("s")
        .distinct()
        .count()
    )
    assert buckets == 5


def test_salted_collect_matches_plain_collect(spark):
    fact = _skewed_fact(spark)
    plain = {
        r["k"]: sorted(r["vs"])
        for r in fact.groupBy("k").agg(F.collect_list("payload").alias("vs")).collect()
    }
    salted = {
        r["k"]: list(r["values"])
        for r in skew.salted_collect_sorted(fact, ["k"], "payload", num_salts=5).collect()
    }
    assert salted == plain  # same multiset AND already sorted
