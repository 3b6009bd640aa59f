"""K-means (Lloyd's algorithm), deterministic fixed-point formulation.

K-means is the one workload in the reference chapter's benchmark suite
(chapter_final.pdf §3.4, Figs. 6(a)/7 — the GPMR comparison system runs 2-D
float points) that the fork ships no code for; BASELINE.md records that.
This implements it anyway as the repo's canonical ITERATIVE-CENTROID
pattern, Spark-first:

  - Assignment is a PURE PROJECTION: with k centroids on the driver (k rows
    — the only data that ever leaves the cluster, exactly like MLlib), the
    nearest-centroid choice is `least()` over k codegen expressions. No
    join, no shuffle, no UDF on the hot path.
  - Update is one map-side-combinable groupBy per iteration (k groups) —
    the same single-shuffle-per-round shape as pagerank/cc_find here.
  - At 100 TB the per-iteration cost is one scan + one k-group shuffle of
    k-row partials per partition; centroid traffic is O(k * iters).

Determinism (the driver hash gate): coordinates are quantized to integer
units (floor(x * 10000) — functions/numeric.py discipline), so distances
are exact BIGINT arithmetic; nearest-centroid ties break toward the lower
centroid id via score packing (dist * 16 + ck, k <= 16); init picks the k
points with the smallest portable md5 hash (functions/portable.py), and
centroid updates compute floor(sum::double / n) — the BIGINT sum is exact,
the division rounds in IEEE double, and BOTH engines share that identical
rounding, which is all the hash gate needs (bit-exactness of the mean
beyond 2^53 is not claimed). Every step replays bit-identical in the
DuckDB oracle (queries/similarity.py builds the CTE chain).

Empty clusters (no points assigned in an iteration) are DROPPED, not
re-seeded — both engines derive assignments from identical state, so the
drop is itself deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.functions.portable import hash60

K = 8
ITERS = 5
PACK = 16  # score = dist * PACK + ck; requires k <= PACK
TAG = "km"


def quantize_2d(emb: DataFrame, scale: int = 10000) -> DataFrame:
    """Project an embedding table to 2-D integer-unit points (the chapter
    benchmark's 2-D float points, quantized for cross-engine exactness)."""
    return emb.select(
        F.col("vec_id").alias("id"),
        F.floor(F.col("embedding")[0].cast("double") * scale)
        .cast("long")
        .alias("xu"),
        F.floor(F.col("embedding")[1].cast("double") * scale)
        .cast("long")
        .alias("yu"),
    )


def _init_centroids(pts: DataFrame, k: int) -> list[tuple[int, int, int]]:
    h = hash60(F.concat_ws("|", F.lit(TAG), F.col("id").cast("string")))
    rows = pts.select("id", "xu", "yu", h.alias("h")).orderBy("h", "id").limit(k).collect()
    return [(i, r.xu, r.yu) for i, r in enumerate(rows)]


def _assign(pts: DataFrame, cents: list[tuple[int, int, int]]) -> DataFrame:
    scores = [
        ((F.col("xu") - F.lit(cx)) * (F.col("xu") - F.lit(cx))
         + (F.col("yu") - F.lit(cy)) * (F.col("yu") - F.lit(cy))) * PACK
        + F.lit(ck)
        for ck, cx, cy in cents
    ]
    best = scores[0] if len(scores) == 1 else F.least(*scores)
    return pts.withColumn("ck", (best % PACK).cast("long"))


def kmeans_2d(
    spark: SparkSession, points: DataFrame, k: int = K, iters: int = ITERS
) -> DataFrame:
    """Run `iters` Lloyd iterations; returns (k, x_u, y_u, n): final integer-
    unit centroids with their last-iteration assignment counts. The returned
    frame is a k-row local relation — all per-point work already ran
    distributed; only k-row centroid states crossed the driver."""
    assert k <= PACK
    pts = points.persist()
    try:
        cents = _init_centroids(pts, k)
        final: list[tuple[int, int, int, int]] = []
        for _ in range(iters):
            new = (
                _assign(pts, cents)
                .groupBy("ck")
                .agg(
                    F.floor(F.sum("xu").cast("double") / F.count(F.lit(1)))
                    .cast("long")
                    .alias("cx"),
                    F.floor(F.sum("yu").cast("double") / F.count(F.lit(1)))
                    .cast("long")
                    .alias("cy"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            cents = sorted((r.ck, r.cx, r.cy) for r in new)
            final = sorted((r.ck, r.cx, r.cy, r.n) for r in new)
    finally:
        pts.unpersist()
    return spark.createDataFrame(
        final, "k bigint, x_u bigint, y_u bigint, n bigint"
    )
