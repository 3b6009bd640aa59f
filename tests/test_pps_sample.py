"""Poisson-PPS sampling (queries/sampling_pps): determinism, the
Horvitz–Thompson identity (for size-proportional PPS every uncapped
sampled doc contributes the SAME expansion value W/k — the property that
makes the HT total estimator low-variance), and sample-size
concentration."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from gpu_mapreduce_spark.queries.sampling_pps import _K, pps_weighted_sample
from gpu_mapreduce_spark.sources.tables import table
from tests.conftest import SF_DIR


def _sample(spark):
    return pps_weighted_sample(spark, SF_DIR).collect()


def test_deterministic(spark):
    a = [tuple(r) for r in _sample(spark)]
    b = [tuple(r) for r in _sample(spark)]
    assert a == b
    assert len(a) > 0


def test_sample_size_concentrates(spark):
    n = len(_sample(spark))
    # Binomial around k=64, sd <= 8; 4 sigma on either side
    assert _K // 2 <= n <= _K * 2, n


def test_ht_weights_reconstruct_total(spark):
    """sum over the sample of w_i * (1/pi_i) is unbiased for W; with
    pi ∝ w each uncapped term is exactly W/k, so the estimate is
    |S|·W/k ± floor error — assert within the binomial band."""
    rows = _sample(spark)
    w_tot = (
        table(spark, SF_DIR, "documents")
        .agg(F.sum("n_chars").alias("s"))
        .collect()[0]["s"]
    )
    est = sum(r["n_chars"] * r["ht_fp"] / 10000.0 for r in rows)
    assert abs(est - w_tot) / w_tot < 0.6, (est, w_tot)
    # every uncapped term's ht_fp*w is the same W/k constant up to the
    # basis-point floor
    for r in rows:
        if r["ht_fp"] < 10000:
            contrib = r["n_chars"] * r["ht_fp"]
            target = 10000 * w_tot / _K
            assert abs(contrib - target) <= r["n_chars"], r


def test_plan_is_map_only(spark):
    """The scale claim in the module docstring, pinned: after the collected
    scalar-W aggregate, the sample itself is ONE pruned 3-column scan +
    filter + project with no join and no shuffle except the output sort's
    range exchange."""
    df = pps_weighted_sample(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    exchanges = [l for l in plan.splitlines() if "Exchange" in l]
    assert len(exchanges) == 1 and "rangepartitioning" in exchanges[0], plan
    assert plan.count("FileScan") == 1, plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and sorted(f.split(":")[0] for f in m.group(1).split(",")) == [
        "doc_id",
        "lang",
        "n_chars",
    ], plan


def test_inclusion_is_size_monotone_in_probability(spark):
    """pi_i ∝ w_i: the sampled docs' mean size exceeds the corpus mean
    (big docs are proportionally more likely to be drawn)."""
    rows = _sample(spark)
    docs = table(spark, SF_DIR, "documents")
    mean_all = docs.agg(F.avg("n_chars")).collect()[0][0]
    mean_sampled = sum(r["n_chars"] for r in rows) / len(rows)
    assert mean_sampled > mean_all


def test_hash_split_model(spark):
    """hash_split vs a pure-Python hashlib replay: identical assignment for
    every doc, every stratum non-trivially populated at the 98/1/1 cuts,
    and the assignment is a function of the KEY alone (repartitioning the
    input must not move a single row — the randomSplit failure mode)."""
    import hashlib

    from gpu_mapreduce_spark.operators import sampling
    from gpu_mapreduce_spark.sources.tables import table
    from tests.conftest import SF_DIR

    docs = table(spark, SF_DIR, "documents").select("doc_id")
    got = {
        r.doc_id: r.split
        for r in sampling.hash_split(docs, "doc_id").collect()
    }

    def want(doc_id):
        b = int(hashlib.md5(f"split|{doc_id}".encode()).hexdigest()[:15], 16) % 10000
        return "test" if b < 100 else ("val" if b < 200 else "train")

    assert got == {d: want(d) for d in got}
    counts = {s: sum(1 for v in got.values() if v == s) for s in ("train", "val", "test")}
    assert counts["train"] > counts["val"] > 0 and counts["test"] > 0, counts
    rep = {
        r.doc_id: r.split
        for r in sampling.hash_split(docs.repartition(13), "doc_id").collect()
    }
    assert rep == got
