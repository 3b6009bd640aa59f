"""ann_pq_residual checks beyond the hash gate: the IP decomposition
identity, the measured geometric finding (residual spread ABOVE raw
spread on this fixture — why the standard residual-PQ recall win cannot
materialize here), and the honest recall floor of the served path."""

from __future__ import annotations

import duckdb
import numpy as np

from gpu_mapreduce_spark.operators import similarity
from gpu_mapreduce_spark.queries import ann_pq_residual as rq
from gpu_mapreduce_spark.queries.similarity import (
    _ivf_index,
    _queries,
    TOP_K,
)
from gpu_mapreduce_spark.sources.tables import table
from tests.conftest import SF001_DIR


def test_ip_decomposition_identity():
    """The scoring convention's algebra: <q, v> = <q, ce> + <q, v - ce>
    exactly (floating point: to ~1 ulp) — the centroid term the naive
    q - ce LUT drops is NOT negligible; its candidate-varying remainder
    is why that variant measured 5/3/2 pooled hits."""
    rng = np.random.RandomState(7)
    q = rng.randn(64)
    v = rng.randn(64)
    ce = rng.randn(64)
    lhs = float(q @ v)
    rhs = float(q @ ce) + float(q @ (v - ce))
    assert abs(lhs - rhs) < 1e-12 * max(1.0, abs(lhs))


def _fixture_vectors(sf_dir: str) -> np.ndarray:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    con.close()
    return np.array([r[0] for r in rows], dtype=np.float64)


def test_fixture_geometry_premise_failure(spark):
    """The documented finding's mechanical core: on this fixture the
    residual norms AVERAGE ABOVE the raw norms (measured 1.21x at
    sf0.01) because the unit-norm near-isotropic corpus has no cluster
    structure for 16 coarse centroids to absorb — the premise of
    residual PQ (residual spread < raw spread) fails HERE, by geometry.
    If a future fixture becomes clustered this assertion flips and the
    recall claim should be re-measured (and likely pinned >= plain)."""
    centroids, assigned = _ivf_index(spark, SF001_DIR)
    res = rq.residual_frame(assigned, centroids)
    rows = res.select("embedding").collect()
    rnorm = np.mean([np.linalg.norm(r.embedding) for r in rows])
    X = _fixture_vectors(SF001_DIR)
    xnorm = np.mean(np.linalg.norm(X, axis=1))
    assert rnorm > 1.05 * xnorm, (rnorm, xnorm)


def test_served_recall_floor_and_full_k(spark):
    """The served residual-IVFPQ path: full k rows per query, and the
    honest pooled-recall floor (measured 5 hits of 50 at sf0.01; floor
    pinned at 3 for stability). The finding that plain IVFPQ measures
    higher on this fixture is documented in the module and in the
    geometry test above — this floor keeps the served path from
    silently degrading to noise."""
    res = rq.respq_topk(spark, SF001_DIR)
    per_q = {r.qid: r.cnt for r in res.groupBy("qid").count().withColumnRenamed("count", "cnt").collect()}
    assert set(per_q) == set(range(5))
    assert all(c == TOP_K for c in per_q.values()), per_q
    exact = similarity.cosine_topk(
        table(spark, SF001_DIR, "embeddings"),
        _queries(spark, SF001_DIR),
        k=TOP_K,
    )
    hits = (
        similarity.recall_at_k(res, exact, TOP_K)
        .groupBy()
        .sum("n_hits")
        .collect()[0][0]
    )
    assert hits >= 3, hits


def test_packed_codes_roundtrip():
    """The 4-bit packing of the gate's 'code' rows is lossless for
    codes in 1..16 over 8 subspaces."""
    codes = [1, 16, 7, 3, 9, 12, 5, 2]
    packed = sum((c - 1) << (4 * i) for i, c in enumerate(codes))
    assert packed < 1 << 32
    assert [((packed >> (4 * i)) & 15) + 1 for i in range(8)] == codes
