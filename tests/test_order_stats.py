"""Two-phase global rank (operators/prefix): exactness vs the naive
single-partition window, permutation property, and the scale assertion —
the executed plan must contain NO SinglePartition exchange (the one thing
the operator exists to avoid)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators.prefix import (
    global_ranks,
    global_ranks_and_count,
)
from gpu_mapreduce_spark.sources.tables import table
from tests.conftest import SF_DIR


def _docs(spark):
    return table(spark, SF_DIR, "documents").select("doc_id", "n_chars")


def test_ranks_match_naive_global_window(spark):
    ranked, n = global_ranks_and_count(_docs(spark), ["n_chars", "doc_id"])
    got = {
        r["doc_id"]: r["rk"]
        for r in ranked.select("doc_id", "rk").collect()
    }
    naive = {
        r["doc_id"]: r["rk"]
        for r in _docs(spark)
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy("n_chars", "doc_id")),
        )
        .collect()
    }
    assert len(got) == n
    assert got == naive


def test_ranks_are_a_permutation(spark):
    ranked, n = global_ranks_and_count(_docs(spark), ["n_chars", "doc_id"])
    rks = sorted(r["rk"] for r in ranked.select("rk").collect())
    assert rks == list(range(1, n + 1))


def test_no_single_partition_stage(spark):
    """The whole point: the executed plan never funnels the dataset into
    one partition (the naive Window.orderBy plan does)."""
    ranked = global_ranks(_docs(spark), ["n_chars", "doc_id"])
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "SinglePartition" not in plan
    # and the naive formulation DOES — guard that the assertion above is
    # actually discriminating
    naive = _docs(spark).withColumn(
        "rk", F.row_number().over(Window.orderBy("n_chars", "doc_id"))
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in naive_plan


def test_rank_independent_of_partition_count(spark):
    a = global_ranks(_docs(spark), ["n_chars", "doc_id"], num_partitions=3)
    b = global_ranks(_docs(spark), ["n_chars", "doc_id"], num_partitions=11)
    ra = sorted((r["doc_id"], r["rk"]) for r in a.collect())
    rb = sorted((r["doc_id"], r["rk"]) for r in b.collect())
    assert ra == rb
