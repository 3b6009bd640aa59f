"""k-means|| seeding (r12 tail registration; the SCALE.md r13
kmeanspp_seed design, landed in-round) — Bahmani et al.'s scalable
k-means++ initialization (VLDB 2012) over the 2-D quantized embedding
points: the seeding step real cluster jobs spend their quality budget
on, and the natural upstream of the suite's kmeans_2d (whose md5-rank
init is deterministic but distance-blind). Every draw is the portable
hash cross-multiplied into exact integer form, so the CHOSEN CANDIDATE
SET, the weights and the final k seeds are all hash-gateable — no
estimator tolerance anywhere (operators/kmeans.kmeanspp_seed).

Oracle: full algorithm replay — the round-0 min-hash pick, each
round's d2/phi/threshold selection in HUGEINT (mirroring Spark's
DECIMAL(38,0) cross-multiplication), the packed nearest-candidate
weight assignment, and the k-seed greedy reduction unrolled with the
same (score DESC, idx ASC) tie-break. Rounds after a phi = 0 fixed
point select nothing on both engines (Spark breaks the loop, the SQL
rounds no-op — identical final state).

100 TB: per round one point scan with an O(|C|) codegen least()
projection and ONE phi scalar across the driver; selected candidates
are O(l) rows per round; the greedy reduction is O(k * |C|) integer
ops on ~20 collected rows. Measured candidate counts at the three
driver scales: 19 / 23 / 17 for k = 8 — the l = 4, rounds = 4 budget
holds with ~2x margin, and the operator raises loudly below k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gpu_mapreduce_spark.operators import kmeans
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_SCALE = 10_000


def _kpp_oracle(
    k: int = kmeans.K,
    l: int = kmeans.KPP_L,
    rounds: int = kmeans.KPP_ROUNDS,
    cap: int = kmeans.KPP_CAP,
) -> str:
    parts = [
        f"""WITH pts AS (
            SELECT vec_id AS id,
                   CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * {_SCALE}) AS BIGINT) AS xu,
                   CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * {_SCALE}) AS BIGINT) AS yu
            FROM embeddings
        ), ch0 AS MATERIALIZED (
            SELECT id, xu, yu FROM (
                SELECT id, xu, yu,
                       ('0x' || substr(md5('{kmeans.KPP_TAG}|' || CAST(id AS VARCHAR)), 1, 15))::BIGINT AS h
                FROM pts
            ) ORDER BY h, id LIMIT 1
        )"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f""", d{r} AS MATERIALIZED (
                SELECT p.id, p.xu, p.yu,
                       MIN((p.xu - c.xu) * (p.xu - c.xu)
                           + (p.yu - c.yu) * (p.yu - c.yu)) AS d2
                FROM pts p CROSS JOIN ch{p} c GROUP BY p.id, p.xu, p.yu
            ), ph{r} AS (SELECT SUM(d2) AS phi FROM d{r})
            , sel{r} AS (
                SELECT id, xu, yu FROM d{r}
                WHERE (('0x' || substr(md5('{kmeans.KPP_TAG}{r}|' || CAST(id AS VARCHAR)), 1, 15))::BIGINT >> 7)::HUGEINT
                          * (SELECT phi FROM ph{r})
                      < {l}::HUGEINT * d2 * {1 << 53}
            ), ch{r} AS MATERIALIZED (
                SELECT id, xu, yu FROM ch{p}
                UNION ALL SELECT id, xu, yu FROM sel{r}
            )"""
        )
    parts.append(
        f""", cand AS MATERIALIZED (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS BIGINT) AS ci,
                   id, xu, yu
            FROM ch{rounds}
        ), asg AS (
            SELECT p.id,
                   MIN(((p.xu - c.xu) * (p.xu - c.xu)
                        + (p.yu - c.yu) * (p.yu - c.yu)) * {cap} + c.ci)
                       % {cap} AS ci
            FROM pts p CROSS JOIN cand c GROUP BY p.id
        ), wc AS MATERIALIZED (
            SELECT c.ci, c.id, c.xu, c.yu,
                   CAST(COALESCE(a.w, 0) AS BIGINT) AS w
            FROM cand c LEFT JOIN (
                SELECT ci, COUNT(*) AS w FROM asg GROUP BY ci
            ) a ON c.ci = a.ci
        ), g1 AS MATERIALIZED (
            SELECT ci, 1 AS rank FROM wc ORDER BY w DESC, ci LIMIT 1
        )"""
    )
    for j in range(2, k + 1):
        parts.append(
            f""", sc{j} AS (
                SELECT c.ci, c.w * MIN((c.xu - s.xu) * (c.xu - s.xu)
                                       + (c.yu - s.yu) * (c.yu - s.yu)) AS score
                FROM wc c CROSS JOIN (
                    SELECT w2.xu, w2.yu FROM wc w2
                    JOIN g{j - 1} g ON w2.ci = g.ci
                ) s
                WHERE c.ci NOT IN (SELECT ci FROM g{j - 1})
                GROUP BY c.ci, c.w
            ), p{j} AS (SELECT ci, {j} AS rank FROM sc{j}
                        ORDER BY score DESC, ci LIMIT 1)
            , g{j} AS MATERIALIZED (
                SELECT ci, rank FROM g{j - 1}
                UNION ALL SELECT ci, rank FROM p{j}
            )"""
        )
    parts.append(
        f"""SELECT rank, id, xu, yu, w FROM (
            SELECT CAST(-1 AS BIGINT) AS rank, id, xu, yu, w FROM wc
            UNION ALL
            SELECT CAST(g.rank AS BIGINT), c.id, c.xu, c.yu, c.w
            FROM g{k} g JOIN wc c ON g.ci = c.ci
        ) ORDER BY rank, id"""
    )
    return "\n".join(parts)


@register(
    "kmeanspp_seed",
    tags=("iterative", "clustering", "sampling"),
    oracle=_kpp_oracle(),
)
def kmeanspp_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means|| oversampled candidates with weights (rank -1) plus the
    k greedy-reduced seeds (rank 1..k) over the quantized 2-D embedding
    points — see module docstring."""
    pts = kmeans.quantize_2d(table(spark, sf_dir, "embeddings"))
    return kmeans.kmeanspp_seed(spark, pts).orderBy("rank", "id")
