"""kmeanspp_seed model checks: the seeding-quality property the exact
gate can't state (k-means|| seeds must beat the distance-blind md5-rank
init on initial clustering cost), and the loud degenerate-input guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import kmeans
from gpu_mapreduce_spark.sources.tables import table
from tests.conftest import SF_DIR


def _cost(pts, cents):
    terms = [
        (F.col("xu") - F.lit(cx)) * (F.col("xu") - F.lit(cx))
        + (F.col("yu") - F.lit(cy)) * (F.col("yu") - F.lit(cy))
        for cx, cy in cents
    ]
    d2 = terms[0] if len(terms) == 1 else F.least(*terms)
    return pts.agg(F.sum(d2)).collect()[0][0]


def test_kmeanspp_seeds_beat_rank_init_cost(spark):
    pts = kmeans.quantize_2d(table(spark, SF_DIR, "embeddings"))
    out = kmeans.kmeanspp_seed(spark, pts).collect()
    seeds = [(r.xu, r.yu) for r in out if r.rank > 0]
    cands = [r for r in out if r.rank == -1]
    assert len(seeds) == kmeans.K
    assert len(cands) >= kmeans.K
    # every seed is one of the candidates
    cand_pts = {(r.xu, r.yu) for r in cands}
    assert all(s in cand_pts for s in seeds)
    rank_init = [
        (cx, cy) for _ck, cx, cy in kmeans._init_centroids(pts, kmeans.K)
    ]
    assert _cost(pts, seeds) < _cost(pts, rank_init), (
        "k-means|| seeding must beat the distance-blind md5-rank init"
    )


def test_kmeanspp_raises_on_degenerate_input(spark):
    same = spark.createDataFrame(
        [(i, 5, 5) for i in range(10)], "id bigint, xu bigint, yu bigint"
    )
    with pytest.raises(RuntimeError, match="candidates for k="):
        kmeans.kmeanspp_seed(spark, same)
