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
    # one parsed expression per round instead of ~15 py4j round-trips per
    # centroid (r14; integer literals parse identically to F.lit(int))
    scores = [
        f"((xu - ({cx})) * (xu - ({cx}))"
        f" + (yu - ({cy})) * (yu - ({cy}))) * {PACK} + {ck}"
        for ck, cx, cy in cents
    ]
    best = scores[0] if len(scores) == 1 else f"least({','.join(scores)})"
    return pts.withColumn("ck", F.expr(f"CAST(({best}) % {PACK} AS BIGINT)"))


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


KPP_L = 4  # k-means|| oversampling factor per round
KPP_ROUNDS = 4
KPP_TAG = "kpp"
KPP_CAP = 256  # loud bound on the candidate set (packing + sanity)


def _d2_expr(cands: list[tuple[int, int, int]]):
    """min squared distance to the chosen set — codegen least() over
    |C| expressions, the `_assign` projection shape."""
    terms = [
        f"((xu - ({cx})) * (xu - ({cx}))"
        f" + (yu - ({cy})) * (yu - ({cy})))"
        for _id, cx, cy in cands
    ]
    return F.expr(terms[0] if len(terms) == 1 else f"least({','.join(terms)})")


def kmeanspp_seed(
    spark: SparkSession,
    points: DataFrame,
    k: int = K,
    l: int = KPP_L,
    rounds: int = KPP_ROUNDS,
) -> DataFrame:
    """k-means|| seeding (Bahmani et al., "Scalable k-means++", VLDB
    2012) — the oversampling initialization real cluster jobs spend
    their quality budget on, deterministic and hash-gateable:

      * round 0 chooses the single point with the smallest
        (hash60('kpp|id'), id) — the kmeans_2d init rule at size 1;
      * each of `rounds` rounds computes d2(x) = exact integer squared
        distance to the nearest chosen point (codegen least(), no join,
        no shuffle), phi = sum d2 (ONE scalar across the driver), and
        selects x iff  (hash60('kpp{r}|id') >> 7) * phi
                       <  l * d2(x) * 2^53
        — the uniform01 < l*d2/phi draw cross-multiplied into exact
        integer form (both sides < 1e38: DECIMAL(38,0) on Spark,
        HUGEINT in the oracle — the functions/hllest.py machinery), so
        both engines pick the identical candidate set; already-chosen
        points have d2 = 0 and can never re-select;
      * candidate weights = nearest-candidate assignment counts (packed
        argmin over idx, the _assign discipline at base KPP_CAP);
      * reduction to k seeds is the deterministic greedy
        max(w * min-d2-to-seeds) with (score DESC, idx ASC) tie-break,
        run on the COLLECTED candidate table — O(k * |C|) integer ops
        on ~20 rows (the theta_ops bounded-collect precedent; Bahmani's
        weighted k-means++ re-cluster, made tie-free).

    Returns one frame: candidates as (rank -1, id, xu, yu, w) plus the
    chosen seeds as (rank 1..k, id, xu, yu, w). Raises loudly when the
    draw yields fewer than k candidates or overflows KPP_CAP — never a
    silent pad or trim. 100 TB: per round ONE scan with an O(|C|)-row
    codegen projection + one scalar; candidate traffic is O(l * rounds)
    rows total — the entire reason k-means|| replaces k-means++'s k
    sequential passes."""
    pts = points.persist()
    try:
        h0 = hash60(
            F.concat_ws("|", F.lit(KPP_TAG), F.col("id").cast("string"))
        )
        first = (
            pts.select("id", "xu", "yu", h0.alias("h"))
            .orderBy("h", "id")
            .limit(1)
            .collect()[0]
        )
        chosen: list[tuple[int, int, int]] = [(first.id, first.xu, first.yu)]
        for r in range(1, rounds + 1):
            with_d2 = pts.withColumn("d2", _d2_expr(chosen))
            phi = with_d2.agg(F.sum("d2")).collect()[0][0]
            if phi == 0:  # every point already chosen — degenerate input
                break
            hu = F.shiftrightunsigned(
                hash60(
                    F.concat_ws(
                        "|", F.lit(f"{KPP_TAG}{r}"), F.col("id").cast("string")
                    )
                ),
                7,
            )
            new = (
                with_d2.withColumn("hu", hu)
                .filter(
                    F.expr(
                        f"CAST(hu AS DECIMAL(38,0)) * CAST({phi} AS DECIMAL(38,0))"
                        f" < CAST({l} AS DECIMAL(38,0)) * CAST(d2 AS DECIMAL(38,0))"
                        f" * CAST({1 << 53} AS DECIMAL(38,0))"
                    )
                )
                .select("id", "xu", "yu")
                .collect()
            )
            chosen += sorted((row.id, row.xu, row.yu) for row in new)
            if len(chosen) > KPP_CAP:
                raise RuntimeError(
                    f"kmeanspp_seed: {len(chosen)} candidates exceed"
                    f" KPP_CAP={KPP_CAP}; lower l or rounds"
                )
        if len(chosen) < k:
            raise RuntimeError(
                f"kmeanspp_seed: only {len(chosen)} candidates for k={k};"
                " raise l or rounds"
            )
        # canonical candidate index: ascending id (ids are unique points)
        cands = sorted(chosen)
        idx_of = {cid: i for i, (cid, _x, _y) in enumerate(cands)}
        scores = [
            f"((xu - ({cx})) * (xu - ({cx}))"
            f" + (yu - ({cy})) * (yu - ({cy})))"
            f" * {KPP_CAP} + {idx_of[cid]}"
            for cid, cx, cy in cands
        ]
        best = (
            f"least({','.join(scores)})" if len(scores) > 1 else scores[0]
        )
        wrows = (
            pts.withColumn(
                "ci", F.expr(f"CAST(({best}) % {KPP_CAP} AS BIGINT)")
            )
            .groupBy("ci")
            .agg(F.count(F.lit(1)).alias("w"))
            .collect()
        )
        w = {r2.ci: r2.w for r2 in wrows}
        cand_full = [
            (i, cid, cx, cy, w.get(i, 0))
            for i, (cid, cx, cy) in enumerate(cands)
        ]
        # greedy weighted reduction, tie-free
        seeds = [max(cand_full, key=lambda c: (c[4], -c[0]))]
        taken = {seeds[0][0]}
        while len(seeds) < k:
            def score(c):
                dmin = min(
                    (c[2] - s[2]) ** 2 + (c[3] - s[3]) ** 2 for s in seeds
                )
                return (c[4] * dmin, -c[0])
            nxt = max(
                (c for c in cand_full if c[0] not in taken), key=score
            )
            seeds.append(nxt)
            taken.add(nxt[0])
    finally:
        pts.unpersist()
    rows = [
        (-1, cid, cx, cy, cw) for _i, cid, cx, cy, cw in cand_full
    ] + [
        (rank + 1, cid, cx, cy, cw)
        for rank, (_i, cid, cx, cy, cw) in enumerate(seeds)
    ]
    return spark.createDataFrame(
        rows, "rank bigint, id bigint, xu bigint, yu bigint, w bigint"
    )
