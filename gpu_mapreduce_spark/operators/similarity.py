"""Similarity search over an embedding column (builder brief
"beyond-reference" §similarity; no reference analog).

Two paths:
  cosine_topk   brute-force: broadcast the (small) query set against the
                corpus, fold the dot product JVM-side (zip_with + aggregate —
                no Python, no explode), rank per query. The correctness
                baseline and the right plan whenever |queries| is small:
                one pass over the corpus, zero shuffles before the top-k.
  lsh_topk      random-hyperplane LSH: 16-bit sign signatures from
                xxhash64-derived ±1 planes, banded 8x2; candidates share a
                band with the query, then exact cosine re-rank. The scale
                path: the corpus is bucketed once, each query probes its
                buckets instead of every row.

Similarities are emitted as sim_e6 = floor(1e6 * cosine) BIGINT: ranking and
cross-engine comparison happen on the quantized value with vec_id
tie-breaks, so last-ulp float noise cannot reorder results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EMB_DIM = 64


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Top-k corpus rows per query vector by cosine similarity.

    embeddings: (vec_id, embedding ARRAY<FLOAT>); queries: (qid, qe).
    Self-matches (vec_id == qid) are excluded. Output (qid, vec_id, sim_e6),
    ranked by (sim_e6 DESC, vec_id)."""
    pairs = embeddings.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("qid")
    )
    sim = _dot(F.col("embedding"), F.col("qe")) / (
        _norm(F.col("embedding")) * _norm(F.col("qe"))
    )
    scored = pairs.select(
        "qid",
        "vec_id",
        F.floor(F.lit(1e6) * sim).cast("bigint").alias("sim_e6"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim_e6"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


_PLANES = 16
_BANDS = 8  # 8 bands x 2 bits


def _sig_bands(emb: Column, seed: int) -> list[Column]:
    """Random-hyperplane signature, banded: plane p has ±1 weights derived
    from xxhash64(seed, p, dim); bit_p = (Σ_d emb[d]·w[p,d] >= 0). Returns
    one packed value per band (2 bits each)."""
    bits = []
    for p in range(_PLANES):
        proj = F.aggregate(
            F.zip_with(
                emb,
                F.array(
                    *[
                        (
                            F.shiftrightunsigned(
                                F.xxhash64(F.lit(seed), F.lit(p), F.lit(d)), 1
                            ).bitwiseAND(F.lit(1))
                            * 2
                            - 1
                        ).cast("double")
                        for d in range(EMB_DIM)
                    ]
                ),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append((proj >= 0).cast("int"))
    per_band = _PLANES // _BANDS
    return [
        sum(
            (bits[b * per_band + i] * (1 << i) for i in range(per_band)),
            F.lit(0),
        ).alias(f"band{b}")
        for b in range(_BANDS)
    ]


def lsh_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10, seed: int = 5
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing >= 1 LSH band
    with the query, re-ranked by exact cosine. Output shape matches
    cosine_topk; recall vs it is asserted in tests/test_similarity.py."""
    emb_sig = embeddings.select(
        "vec_id", "embedding", *_sig_bands(F.col("embedding"), seed)
    ).localCheckpoint(eager=True)
    q_sig = queries.select("qid", "qe", *_sig_bands(F.col("qe"), seed))

    e_entries = emb_sig.select(
        "vec_id",
        "embedding",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bv"))
                    for b in range(_BANDS)
                ]
            )
        ).alias("e"),
    ).select("vec_id", "embedding", "e.band", "e.bv")
    q_entries = q_sig.select(
        "qid",
        "qe",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bv"))
                    for b in range(_BANDS)
                ]
            )
        ).alias("e"),
    ).select("qid", "qe", "e.band", "e.bv")

    cand = (
        e_entries.join(F.broadcast(q_entries), ["band", "bv"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "qe", "vec_id", "embedding")
        .distinct()
    )
    sim = _dot(F.col("embedding"), F.col("qe")) / (
        _norm(F.col("embedding")) * _norm(F.col("qe"))
    )
    scored = cand.select(
        "qid",
        "vec_id",
        F.floor(F.lit(1e6) * sim).cast("bigint").alias("sim_e6"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim_e6"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
