"""theta_sketch_ops model checks: the O(k) algebra against brute force,
the mergeability law against a raw-union sketch build, the full-sketch
guard, and the estimator accuracy claim the exact gate can't state."""

from __future__ import annotations

import hashlib

import pytest

from gpu_mapreduce_spark.queries import theta_ops as t
from tests.conftest import SF_DIR


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_theta_ops_algebra_brute_force():
    """On fully-enumerated universes the convention's outputs are
    checkable by hand: theta, the intersection survivor count, and every
    fixed-point read-out."""
    k = 64
    A = sorted(_h(f"a{i}") for i in range(500))[:k]
    B = sorted(_h(f"a{i}") for i in range(250, 750))[:k]
    ops = t.theta_ops(A, B, k=k)
    theta = min(max(A), max(B))
    assert ops["theta"] == theta
    want_inter = len({h for h in A if h < theta} & set(B))
    assert ops["n_inter"] == want_inter
    assert ops["est_a"] == (k - 1) * t._U * t._SCALE // max(A)
    assert ops["est_inter"] == want_inter * t._U * t._SCALE // theta
    assert ops["est_diff_ab"] == ops["est_a"] - ops["est_inter"]
    assert ops["_sku"] == sorted(set(A) | set(B))[:k]


def test_theta_ops_requires_full_sketches():
    with pytest.raises(ValueError, match="must be full"):
        t.theta_ops([1, 2, 3], [4, 5, 6], k=64)


def test_theta_estimator_accuracy():
    """est/true within the KMV error band (~1/sqrt(k-1) ~ 13% relative;
    assert 3 sigma) for the per-source and union estimates; the
    intersection estimate's error is relative to the UNION size, so its
    band is checked in absolute union terms."""
    k = 64
    nA, nB, shared = 4000, 3000, 1000
    A_items = [f"s{i}" for i in range(shared)] + [
        f"a{i}" for i in range(nA - shared)
    ]
    B_items = [f"s{i}" for i in range(shared)] + [
        f"b{i}" for i in range(nB - shared)
    ]
    A = sorted(_h(x) for x in A_items)[:k]
    B = sorted(_h(x) for x in B_items)[:k]
    ops = t.theta_ops(A, B, k=k)
    n_union = nA + nB - shared
    for key, truth in (("est_a", nA), ("est_b", nB), ("est_union", n_union)):
        est = ops[key] / t._SCALE
        assert abs(est - truth) / truth < 0.39, f"{key}: {est} vs {truth}"
    est_inter = ops["est_inter"] / t._SCALE
    assert abs(est_inter - shared) / n_union < 0.39


def test_kmv_union_sketch_mergeability(spark):
    """The mergeability law directly: the union sketch computed from the
    two SKETCHES must equal the sketch of the raw source union — the
    same law the oracle proves through the hash gate."""
    from pyspark.sql import functions as F

    from gpu_mapreduce_spark.sources.tables import table

    docs = table(spark, SF_DIR, "documents")
    ska = t.kmv_sketch(docs.filter(F.col("doc_id") % 2 == 0))
    skb = t.kmv_sketch(docs.filter(F.col("doc_id") % 3 == 0))
    from_sketches = sorted(set(ska) | set(skb))[: t._K]
    from_raw = t.kmv_sketch(
        docs.filter(
            (F.col("doc_id") % 2 == 0) | (F.col("doc_id") % 3 == 0)
        )
    )
    assert from_sketches == from_raw


def test_stream_theta_ingest_equals_raw_and_survives_duplication(spark):
    """The r12 stream path: the streamed k-min union must equal the
    raw-built source-A sketch, and — KMV's structural safety — folding a
    DUPLICATED partial changes nothing (idempotent + commutative union,
    the property that makes at-least-once delivery harmless here)."""
    from pyspark.sql import functions as F

    from gpu_mapreduce_spark.registry import load_all
    from gpu_mapreduce_spark.sources.tables import table

    qs = load_all()
    got = [r.h for r in qs["stream_theta_ingest"].fn(spark, SF_DIR).collect()]
    want = t.kmv_sketch(
        table(spark, SF_DIR, "documents").filter(F.col("doc_id") % 2 == 0)
    )
    assert got == want
    # duplicated partial: union with itself is the identity
    dup = sorted(set(got) | set(got))[: t._K]
    assert dup == want
