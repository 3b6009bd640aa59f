"""Similarity search over an embedding column (builder brief
"beyond-reference" §similarity; no reference analog).

Four paths:
  cosine_topk   brute-force: broadcast the (small) query set against the
                corpus, fold the dot product JVM-side (zip_with + aggregate —
                no Python, no explode), rank per query. The correctness
                baseline and the right plan whenever |queries| is small:
                one pass over the corpus, zero shuffles before the top-k.
  lsh_topk      random-hyperplane LSH: 16-bit sign signatures from
                portable ±1 planes (plane_weights: md5-derived constants
                shared with the DuckDB oracle replay), banded 8x2;
                candidates share a band with the query, then exact cosine
                re-rank. The scale path: the corpus is bucketed once, each
                query probes its buckets instead of every row.
  ivf_topk      inverted-file (IVF-flat): the corpus is partitioned once
                into centroid cells; each query exhaustively re-ranks only
                its `nprobe` nearest cells. The other classic ANN layout —
                bounded, tunable probe cost like LSH but with
                data-adaptive cells.
  dup_pairs / dup_pairs_lsh
                embedding-cosine near-duplicate pairs (the dedup tier the
                builder brief lists alongside MinHash/SimHash): all (a < b)
                with quantized cosine >= a threshold. `dup_pairs` is the
                exact all-pairs baseline (oracle-able); `dup_pairs_lsh`
                generates candidates from shared hyperplane bands and
                verifies exactly — the corpus^2-free scale path.

Similarities are emitted as sim_e6 = floor(1e6 * cosine) BIGINT: ranking and
cross-engine comparison happen on the quantized value with vec_id
tie-breaks, so last-ulp float noise cannot reorder results.
"""

from __future__ import annotations

import hashlib

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
    # bcast-audit: bounded (fixed query set)
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
PER_BAND = _PLANES // _BANDS


def plane_weights(seed: int, planes: int = _PLANES, dim: int = EMB_DIM) -> list[list[float]]:
    """±1.0 hyperplane weights for (plane p, dim d), derived from the low
    bit of md5(f"{seed}|{p}|{d}") — data-independent CONSTANTS computed
    once in Python and embedded verbatim as literals in BOTH the Spark
    expression and the DuckDB oracle replay, so the two engines share the
    exact same hyperplanes with no cross-engine hash dependency. (±1.0
    multiplies are exact in IEEE754; the projection folds in index order in
    both engines, so even the sign of a near-zero projection agrees —
    guarded by tests/test_portable_hash.py's fold-parity checks.)"""
    return [
        [
            1.0
            if int(hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()[0], 16) & 1
            else -1.0
            for d in range(dim)
        ]
        for p in range(planes)
    ]


def _sig_bands(emb: Column, seed: int) -> list[Column]:
    """Random-hyperplane signature, banded: plane p has the ±1
    plane_weights(seed) row; bit_p = (Σ_d emb[d]·w[p,d] >= 0). Returns one
    packed value per band (PER_BAND bits each)."""
    weights = plane_weights(seed)
    bits = []
    for p in range(_PLANES):
        # one parsed ±1.0 literal row per plane (r14): the F.lit-per-
        # element form cost ~2 py4j round-trips × dim × _PLANES per call;
        # 1.0D/-1.0D parse to the exact doubles F.lit produced
        wrow = F.expr(
            "array({})".format(
                ",".join(f"{w!r}D" for w in weights[p])
            )
        )
        proj = F.aggregate(
            F.zip_with(
                emb,
                wrow,
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append((proj >= 0).cast("int"))
    return [
        sum(
            (bits[b * PER_BAND + i] * (1 << i) for i in range(PER_BAND)),
            F.lit(0),
        ).alias(f"band{b}")
        for b in range(_BANDS)
    ]


def lsh_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10, seed: int = 52
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
        # bcast-audit: bounded (query-side band entries)
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


def _quantized_sim(a: Column, b: Column) -> Column:
    return F.floor(F.lit(1e6) * (_dot(a, b) / (_norm(a) * _norm(b)))).cast(
        "bigint"
    )


def ivf_build(
    embeddings: DataFrame, n_centroids: int = 16, seed: int = 11
) -> tuple[DataFrame, DataFrame]:
    """IVF-flat index build: (centroids (cid, ce), assignment
    (vec_id, embedding, cid)).

    Centroids = `n_centroids` hash-sampled corpus vectors (deterministic:
    lowest portable-hash(seed|vec_id) ranks, the same md5-hex-slice hash
    DuckDB can replay — at 100 TB this sampling pass is a TABLESAMPLE +
    optional k-means refinement, same layout); every corpus vector is
    assigned to its nearest centroid (one pass against the broadcast
    centroid set — the cell assignment is computed ONCE and persists,
    amortized over all queries; ivf_assignment_sink writes it as the
    at-rest cell-partitioned index)."""
    pick_hash = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("vec_id"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    # centroid selection: lowest n_centroids rows by (pick_hash, vec_id).
    # orderBy().limit(n) compiles to TakeOrderedAndProject — per-partition
    # top-n then a driver merge of n rows/partition — so the corpus is never
    # funneled through one task (a global Window.orderBy would be exactly
    # that single-task sort). The row_number that assigns cids runs AFTER
    # the limit, over n_centroids rows only. The centroid table is
    # checkpointed eagerly: ivf_assign collects it driver-side (bounded, k
    # rows), and without the cut that collect would re-run the corpus-wide
    # pick a second time for the returned `centroids` dataframe.
    picked = (
        embeddings.select("vec_id", "embedding", pick_hash.alias("_h"))
        .orderBy("_h", "vec_id")
        .limit(n_centroids)
    )
    centroids = (
        picked.withColumn(
            "cid", F.row_number().over(Window.orderBy("_h", "vec_id"))
        )
        .select("cid", F.col("embedding").alias("ce"))
        .localCheckpoint(eager=True)
    )
    return centroids, ivf_assign(embeddings, centroids)


def nearest_cid(emb: Column, centroid_rows: list[tuple[int, list[float]]]) -> Column:
    """Winning-cell expression for one embedding column against a FROZEN,
    driver-side centroid list (ties → lower cid): the argmax runs inside
    the scan projection, so the embedding payload NEVER enters an exchange
    — the lean shape the r08 100x measurement demanded (SCALE.md r09
    design 3; the kmeans_2d least() discipline generalized to d dims).

    The centroid matrix is ONE array-of-structs literal per centroid
    (F.lit of a list is a single Literal node, so the Catalyst tree is
    O(k), not O(k·d)) folded with transform + array_max over (cs, -cid)
    structs — ascending-cid literal order plus the negated cid reproduces
    ivf_assign's historical ties-to-lower-cid rule bit-for-bit (same
    float->double casts, same left-to-right fold order as _quantized_sim
    against a joined centroid column). Each element evaluates the
    quantized cosine exactly once.

    Shape note (measured at k=160 on the 100x harness corpus): a fully
    UNROLLED codegen form (explicit k·d literal multiply-add terms) was
    tried and REJECTED — the 21k-node expression tree exceeds janino's
    method limits, whole-stage codegen falls back to interpreted
    node-walking, and the walk is ~4x SLOWER than this higher-order-
    function fold (112 s vs 28 s). The O(k) literal fold is also the only
    shape whose analysis cost stays flat at store-scale k."""
    rows = sorted((int(cid), [float(x) for x in ce]) for cid, ce in centroid_rows)
    # ONE parsed expression for the whole k×d matrix. The previous
    # F.struct(F.lit(cid), F.lit(ce)) per centroid looked like O(k)
    # Python calls, but PySpark expands lit(list) into one lit() py4j
    # round-trip PER ELEMENT — k·d ≈ 5,800 socket round-trips that cost
    # ~1.5 s of pure driver time per ivf_assign call (r14 cProfile of
    # ann_index_append). CAST('<repr>' AS DOUBLE) round-trips each value
    # exactly (shortest-repr parse is correctly rounded), so the literal
    # tree — and every downstream similarity — is bit-identical to the
    # lit() form; the Catalyst tree is unchanged.
    elems = ",".join(
        "named_struct('cid', CAST({} AS INT), 'ce', array({}))".format(
            cid, ",".join(f"CAST('{v!r}' AS DOUBLE)" for v in ce)
        )
        for cid, ce in rows
    )
    cmat = F.expr(f"array({elems})")
    best = F.array_max(
        F.transform(
            cmat,
            lambda c: F.struct(
                _quantized_sim(emb, c["ce"]).alias("cs"),
                (-c["cid"]).alias("ncid"),
            ),
        )
    )
    return (-best["ncid"]).cast("int")


def ivf_assign(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid cell assignment against a FROZEN centroid set
    (ties → lower cid): one scan-shaped projection over `embeddings`, with
    the k centroids collected driver-side (bounded scalar discipline — k
    rows) and burned into the projection as literals (nearest_cid). Zero
    shuffles and zero joins: the previous broadcast-crossJoin + groupBy
    argmax carried the embedding payload through its aggregate exchange
    (measured 74 s at k=160 in the r08 scale harness); here the payload
    never leaves its row. Split from ivf_build so incremental index
    maintenance can route a delta batch into the EXISTING coarse
    quantizer's cells (the FAISS `IndexIVF.add` semantics — append never
    re-clusters) exactly as the initial build assigned the base corpus.

    Contract: emits one row PER INPUT ROW (a projection). The pre-r09
    groupBy('vec_id') argmax incidentally deduplicated repeated vec_ids;
    callers feeding a delta that may repeat vec_ids must dedup upstream
    or the index inventory double-counts (every in-repo caller passes
    unique vec_ids by construction)."""
    rows = [
        (r["cid"], list(r["ce"]))
        for r in centroids.select("cid", "ce").collect()  # bounded: k rows
    ]
    return embeddings.select(
        "vec_id", "embedding", nearest_cid(F.col("embedding"), rows).alias("cid")
    )


def ivf_probes(
    queries: DataFrame, centroids: DataFrame, nprobe: int = 4
) -> DataFrame:
    """Per-query probe list: the nprobe nearest cells (qid, qe, cid)."""
    w_probe = Window.partitionBy("qid").orderBy(F.desc("qcs"), F.asc("cid"))
    return (
        # bcast-audit: bounded (k centroids)
        queries.crossJoin(F.broadcast(centroids))
        .select(
            "qid", "qe", "cid", _quantized_sim(F.col("qe"), F.col("ce")).alias("qcs")
        )
        .withColumn("_rn", F.row_number().over(w_probe))
        .filter(F.col("_rn") <= nprobe)
        .select("qid", "qe", "cid")
    )


def ivf_candidates(cells: DataFrame, probes: DataFrame) -> DataFrame:
    """The probed-cell candidate stream (cells ⋈ probes minus self-pairs)
    — ivf_rerank's first stage, exposed so a caller needing a candidate
    statistic can observe it on the SAME pass instead of scheduling a
    separate count job over the probed cells (r15; nprobe_tuning_curve)."""
    # bcast-audit: bounded (probe list ∝ query set)
    return cells.join(F.broadcast(probes), "cid").filter(
        F.col("vec_id") != F.col("qid")
    )


def ivf_rerank(
    cells: DataFrame,
    probes: DataFrame,
    k: int,
    cand: DataFrame | None = None,
) -> DataFrame:
    """Exact quantized-cosine re-rank of the probed cells' vectors:
    top-k per query over cells ⋈ probes (the IVF probe's second stage).
    ``cand`` overrides the candidate stream (must be ivf_candidates(...)
    or a row-identical wrapper such as an observed copy)."""
    scored = (
        (ivf_candidates(cells, probes) if cand is None else cand)
        .select(
            "qid",
            "vec_id",
            _quantized_sim(F.col("embedding"), F.col("qe")).alias("sim_e6"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim_e6"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k via an inverted file (IVF-flat): ivf_build's cell
    assignment, ivf_probes' nprobe nearest cells per query, ivf_rerank's
    exact quantized-cosine second stage. Probe cost ∝ nprobe/n_centroids of
    the corpus instead of all of it; recall vs cosine_topk asserted in
    tests. Output shape matches cosine_topk: (qid, vec_id, sim_e6)."""
    centroids, assigned = ivf_build(embeddings, n_centroids, seed)
    probes = ivf_probes(queries, centroids, nprobe)
    return ivf_rerank(assigned, probes, k)


CROSS_SCALE = 10_000  # fixed-point quantization for the exact cross-score
CROSS_MAG_FLOOR = 1_000  # |quantized value| >= floor counts as a "hot" dim
CROSS_OVERLAP_W = 1_000_000  # integer weight of the overlap feature


def _quant_u(v: Column) -> Column:
    """Per-element fixed-point quantization FLOOR(x * CROSS_SCALE) as
    BIGINT — exact and engine-portable (float -> double is exact, FLOOR of
    identical doubles identical)."""
    return F.transform(
        v, lambda x: F.floor(x.cast("double") * CROSS_SCALE).cast("bigint")
    )


def crossscore_rerank(
    candidates: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Cross-encoder-style second-stage rerank of a BOUNDED candidate set.

    `candidates` is (qid, vec_id) — |Q| x m rows from a first-stage
    retriever (IVF/LSH), never all-pairs. Both embedding sides are fetched
    by key: the candidate table broadcasts into an equi-join against the
    corpus (at cluster scale: against the cid-partitioned at-rest index),
    the query vectors broadcast by qid. Each pair is re-scored with a
    deliberately RICHER exact function than the retrieval metric —
    fixed-point integer dot product plus an exact overlap feature (count
    of dimensions where both vectors are >= CROSS_MAG_FLOOR in quantized
    magnitude) — standing in for the cross-encoder forward pass this
    container cannot run; a real model swaps into the same scoring
    projection as an Arrow-batched pandas UDF without changing the plan
    (candidate fetch -> per-pair score -> bounded per-query top-k).

    rerank_score = dot_u + CROSS_OVERLAP_W * n_overlap, all exact integer
    arithmetic, so a SQL oracle replays it verbatim; ties break by vec_id.
    """
    # bcast-audit: bounded (candidate list ∝ query set)
    fetched = embeddings.join(F.broadcast(candidates), "vec_id")
    # bcast-audit: bounded (query set)
    pairs = fetched.join(F.broadcast(queries), "qid")
    eu = _quant_u(F.col("embedding"))
    qu = _quant_u(F.col("qe"))
    dot_u = F.aggregate(
        F.zip_with(eu, qu, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    n_overlap = F.size(
        F.filter(
            F.zip_with(
                eu,
                qu,
                lambda x, y: (F.abs(x) >= CROSS_MAG_FLOOR)
                & (F.abs(y) >= CROSS_MAG_FLOOR),
            ),
            lambda b: b,
        )
    )
    scored = pairs.select(
        "qid",
        "vec_id",
        dot_u.alias("dot_u"),
        n_overlap.cast("int").alias("n_overlap"),
    ).select(
        "*",
        (
            F.col("dot_u")
            + F.lit(CROSS_OVERLAP_W).cast("bigint") * F.col("n_overlap")
        ).alias("rerank_score"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rerank_score"), F.asc("vec_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


DUP_PAIRS_MAX_ROWS = 100_000  # hard cap on the quadratic baseline


def dup_pairs(
    embeddings: DataFrame,
    threshold_e6: int = 400_000,
    max_rows: int | None = DUP_PAIRS_MAX_ROWS,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact: all (a < b) with
    sim_e6 >= threshold_e6. One corpus self-join with the right side
    broadcast — the O(n^2) correctness baseline the LSH variant is measured
    against.

    GUARDED against accidental use at scale: counts the corpus up front and
    raises above ``max_rows`` (one cheap count-aggregate job — nothing next
    to the quadratic scan it prevents). This operator is a recall baseline,
    not a scale path; beyond the cap use :func:`dup_pairs_lsh`, whose
    candidate generation is an equi-join on signature bands. Pass
    ``max_rows=None`` only where the quadratic cost is the point (tests,
    recall measurement on a sampled corpus)."""
    if max_rows is not None:
        n = embeddings.count()
        if n > max_rows:
            raise ValueError(
                f"dup_pairs is the O(n^2) exact baseline: corpus has {n:,}"
                f" rows > max_rows={max_rows:,}; use dup_pairs_lsh (banded"
                " candidates) at this scale, or pass max_rows=None if the"
                " quadratic scan is intentional"
            )
    left = embeddings.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("ea")
    )
    right = embeddings.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("eb")
    )
    return (
        # bcast-audit: bounded (hard-guarded <=100k-row recall baseline)
        left.join(F.broadcast(right), F.col("a") < F.col("b"))
        .select("a", "b", _quantized_sim(F.col("ea"), F.col("eb")).alias("sim_e6"))
        .filter(F.col("sim_e6") >= F.lit(threshold_e6))
    )


def dup_pairs_lsh(
    embeddings: DataFrame, threshold_e6: int = 400_000, seed: int = 52
) -> DataFrame:
    """Embedding-cosine near-dup pairs via hyperplane-LSH banding:
    candidates = pairs sharing >= 1 of the 8 signature bands (equi-join on
    (band, value) — never corpus^2), then exact quantized-cosine
    verification, so output ⊆ dup_pairs with banding-controlled recall
    (for cos >= 0.4: P[collide] = 1-(1-p^2)^8, p = 1-θ/π ≈ 0.63 → ~0.98).
    Same candidate topology as dedup.minhash_lsh_pairs — this is the tier
    the builder brief calls embedding-cosine near-dup."""
    sigs = embeddings.select(
        "vec_id", "embedding", *_sig_bands(F.col("embedding"), seed)
    ).localCheckpoint(eager=True)
    entries = sigs.select(
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
    ea = entries.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("ea"), "band", "bv"
    )
    eb = entries.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("eb"), "band", "bv"
    )
    cand = (
        ea.join(eb, ["band", "bv"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ea", "eb")
        .distinct()
    )
    return cand.select(
        "a", "b", _quantized_sim(F.col("ea"), F.col("eb")).alias("sim_e6")
    ).filter(F.col("sim_e6") >= F.lit(threshold_e6))


def dup_pairs_semantic(
    embeddings: DataFrame,
    threshold_e6: int = 400_000,
    n_centroids: int = 16,
    seed: int = 11,
    cells: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style cluster-bounded near-dup pairs (Abbas et al. 2023,
    arXiv:2303.09540): candidates are pairs sharing an IVF cell
    (ivf_build's deterministic hash-sampled centroids), verified by exact
    quantized cosine — the third candidate topology in the dedup suite,
    after LSH bands (dup_pairs_lsh) and MinHash bands (dedup.py).

    Cells play the band role but follow the data's DENSITY rather than
    random planes: duplicates cluster, so candidate effort concentrates
    exactly where the dups are. Pairs split across a cell boundary are
    missed BY DESIGN — that is SemDeDup's stated approximation (it
    deduplicates within k-means clusters only), and the oracle replays the
    same algorithm so the hash gate verifies what is actually computed.

    Scale (100 TB): the cell self-join is an equi-join on cid — never
    corpus^2; per-cell pair volume is |cell|^2, bounded by sizing
    n_centroids ~ sqrt(N) (SemDeDup runs ~1e5 clusters at web scale). The
    assignment is computed ONCE (checkpointed) and both join sides read
    the materialized cells. `cells` injects a prebuilt MATERIALIZED
    assignment (the session-memoized index of queries/similarity.
    _ivf_index — the caller owns consistency with n_centroids/seed, the
    dedup.jaccard_pairs `shingles` contract). Output:
    (cid, a, b, sim_e6)."""
    if cells is None:
        _, assigned = ivf_build(embeddings, n_centroids=n_centroids, seed=seed)
        cells = assigned.localCheckpoint(eager=True)
    ea = cells.select(
        "cid", F.col("vec_id").alias("a"), F.col("embedding").alias("ea")
    )
    eb = cells.select(
        "cid", F.col("vec_id").alias("b"), F.col("embedding").alias("eb")
    )
    return (
        ea.join(eb, "cid")
        .filter(F.col("a") < F.col("b"))
        .select(
            "cid",
            "a",
            "b",
            _quantized_sim(F.col("ea"), F.col("eb")).alias("sim_e6"),
        )
        .filter(F.col("sim_e6") >= F.lit(threshold_e6))
    )


def assignment_migration(
    old_assigned: DataFrame, new_assigned: DataFrame
) -> DataFrame:
    """Quantizer-drift histogram between two cell assignments of the same
    corpus (SCALE.md r09 design 3, staged ahead of registration):
    (old_cid, new_cid, n_vecs) for every occupied transition — the metric
    an IVF store watches to decide when an out-of-band retrain+swap is
    due, and the proof artifact of the swap itself (how many vectors each
    old cell scattered across the new quantizer). One vec_id equi-join +
    one bounded aggregate (≤ k_old × k_new groups); at 100 TB both sides
    are the narrow at-rest assignments, co-partitioned on vec_id."""
    o = old_assigned.select("vec_id", F.col("cid").alias("old_cid"))
    n = new_assigned.select("vec_id", F.col("cid").alias("new_cid"))
    return (
        o.join(n, "vec_id")
        .groupBy("old_cid", "new_cid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """Recall@k of an approximate top-k result against the exact baseline
    (SCALE.md r10 design 1, staged ahead of its registration): per query,
    hits = |approx ∩ exact| on (qid, vec_id), recall in exact fixed-point
    units recall_u = (10000 * hits) div k — the index-quality metric a
    vector store publishes per build/retrain to tune nprobe and decide a
    swap. Queries the approximate path missed entirely still report
    (qid, 0, 0) via the left join from the exact side's qid set.

    Both inputs are bounded (≤ k rows per query by construction — this is
    an evaluation harness over the standard query set, not a serving
    path), so every stage is a small equi-join/aggregate; at 100 TB the
    exact side comes from the one brute-force pass the evaluation
    schedules, never from serving traffic. Both projections are
    deduplicated on (qid, vec_id) before the intersection join — an
    approx result assembled from multi-probe unions may repeat a
    candidate, and a repeated pair must count one hit, never multiply
    through the join past n_hits > k."""
    if k <= 0:
        raise ValueError(f"recall_at_k requires k >= 1, got {k}")
    a = approx.select("qid", "vec_id").distinct()
    e = exact.select("qid", "vec_id").distinct()
    hits = a.join(e, ["qid", "vec_id"]).groupBy("qid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    base = e.select("qid").distinct()
    return base.join(hits, "qid", "left").select(
        "qid",
        F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
        F.expr(
            f"(10000 * CAST(coalesce(n_hits, 0) AS BIGINT)) div {int(k)}"
        ).alias("recall_u"),
    )


def recall_report(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """recall_at_k's per-query rows PLUS the pooled qid = -1 row
    ((10000 * total hits) div (|Q| * k)) — the shared report shape of
    ann_recall_report / ann_pq_recall / mrl_truncation_recall.

    The per-query table is localCheckpoint'ed (<= |Q| rows — O(1))
    BEFORE the pooled aggregate is derived from it: a plain
    `per.unionByName(per.agg(...))` re-executes the whole upstream
    subtree for the aggregate branch, and that subtree contains the one
    corpus-sized brute-force pass the evaluation deliberately schedules
    (r14 plan audit: the duplicated SortMergeJoin branches). With the
    checkpoint the heavy pass runs exactly once per evaluation at any
    scale; the pooled row folds over |Q| materialized rows."""
    per = recall_at_k(approx, exact, k).localCheckpoint(eager=True)
    pooled = per.agg(
        F.sum("n_hits").cast("bigint").alias("n_hits"),
        F.expr(f"(10000 * sum(n_hits)) div (count(1) * {int(k)})")
        .cast("bigint")
        .alias("recall_u"),
    ).select(F.lit(-1).cast("bigint").alias("qid"), "n_hits", "recall_u")
    return per.unionByName(pooled)


def quantize_int8(emb: DataFrame) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column — the
    4x compression step a vector store applies before indexing at corpus
    scale (beyond-reference, builder brief §similarity; no reference
    analog).

    scale = max|x| / 127; q_i = floor(x_i/scale + 0.5) in [-127, 127]
    (all-zero vectors quantize to zeros with scale 0). Every step is a
    per-element scalar expression — identical IEEE arithmetic on both
    engines, so outputs (including the double-typed scale and max
    reconstruction error) are bit-identical and hash-comparable; sums over
    elements are integer, and max is order-free. One scan, zero shuffles,
    zero Python.
    """
    e = F.col("embedding")
    scale = (
        F.array_max(F.transform(e, lambda x: F.abs(x.cast("double")))) / 127.0
    )
    staged = emb.select("vec_id", "embedding", scale.alias("scale"))
    q = F.when(
        F.col("scale") > 0,
        F.transform(
            e,
            lambda x: F.floor(x.cast("double") / F.col("scale") + 0.5).cast(
                "int"
            ),
        ),
    ).otherwise(F.transform(e, lambda x: F.lit(0)))
    qz = staged.select("vec_id", "embedding", "scale", q.alias("q"))
    err = F.zip_with(
        e,
        F.col("q"),
        lambda x, qi: F.abs(x.cast("double") - qi * F.col("scale")),
    )
    return qz.select(
        "vec_id",
        F.size(e).cast("int").alias("n_dims"),
        F.col("scale"),
        F.aggregate(
            F.col("q"), F.lit(0).cast("bigint"), lambda a, x: a + F.abs(x)
        ).alias("q_l1"),
        F.array_max(F.transform(F.col("q"), F.abs)).cast("int").alias("q_max"),
        F.array_max(err).alias("max_abs_err"),
    )


def power_iteration_top_direction(
    emb: DataFrame,
    dim: int = EMB_DIM,
    rounds: int = 6,
    vscale: int = 1_000_000,
) -> DataFrame:
    """Dominant principal direction of the embedding matrix by power
    iteration on the (uncentered) Gram matrix: v <- normalize(X^T (X v)),
    `rounds` fixed synchronous rounds (round-bounded semantics like
    pagerank — the round count IS the spec, so the oracle replays it
    exactly; the Gram matrix is PSD, so no sign flipping between rounds).

    Exactness discipline (the driver hash gate): the direction state lives
    in integer units (v_u = vscale at j for the all-ones start). Per round
      dot_u(r) = SUM_j floor(x_rj * v_uj)            -- exact BIGINT
      w_uj     = SUM_r floor(dot_u(r) * x_rj)        -- exact BIGINT
      v'_uj    = sign(w) * ((|w_uj| * vscale) div max_j|w_uj|)
    Every float product is a single IEEE double multiply identical in both
    engines; every sum is integer; the normalizer is max-abs (exact integer
    division on non-negatives, where Spark's `div`, DuckDB's `//` and
    Python's `//` agree) rather than the L2 norm, whose sum-of-squares
    exceeds 2^53 and whose sqrt would reintroduce engine-ordered float
    summation. Max-norm changes only the scaling, not the direction.

    Scale shape (the MLlib linear-algebra pattern): per round ONE corpus
    scan — dot product as codegen zip_with/aggregate against the v literal,
    then posexplode + partially-aggregated 64-group sum — and only the
    64-row direction crosses the driver.

    Overflow envelope (GUARDED, not just documented): |x| < 1 bounds
    |w_uj| <= n_rows * dim * vscale, and the renorm multiplies that by
    vscale again — in Spark (final round) and DuckDB (every oracle round)
    that product lives in engine BIGINTs, so the binding constraint is
    n_rows * dim * vscale^2 < 2^63, i.e. ~1.4e5 rows at the default
    constants (dim=64, vscale=1e6) — NOT the ~1e11 the w_uj bound alone
    would allow; Spark wraps silently and DuckDB raises, the worst kind of
    divergence, hence the hard raise below. Larger corpora downshift
    vscale (1e3 extends the envelope to ~1.4e11 rows at 1e-3 direction
    resolution). Intermediate Spark-side renorms run in Python bigints and
    never overflow — only the engine-side arithmetic binds.

    Returns (j, vu): the direction in vscale units, 64 rows.
    """
    n_rows = emb.count()
    if n_rows * dim * vscale * vscale >= 2**63:
        raise ValueError(
            f"power_iteration_top_direction: n_rows={n_rows} * dim={dim} * "
            f"vscale^2={vscale**2} exceeds the BIGINT renorm envelope; "
            "pass a smaller vscale"
        )
    vec = [int(vscale)] * dim

    def _w_frame(v: list[int]) -> DataFrame:
        # one parsed literal per iteration (r14: F.lit-per-element cost
        # ~2 py4j round-trips × dim per power-iteration round)
        vlit = F.expr(
            "array({})".format(",".join(str(int(x)) for x in v))
        )
        # every product is cast to DOUBLE explicitly: Spark coerces
        # float * bigint to FLOAT (single-precision multiply), DuckDB to
        # DOUBLE — without the cast the floor flips on last-ulp boundaries
        dot_u = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                vlit,
                lambda x, w: F.floor(x.cast("double") * w).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
        return (
            emb.select(dot_u.alias("dot_u"), "embedding")
            .select(
                F.posexplode("embedding").alias("j", "x"), "dot_u"
            )
            .select(
                "j",
                F.floor(F.col("dot_u") * F.col("x").cast("double"))
                .cast("long")
                .alias("t"),
            )
            .groupBy("j")
            .agg(F.sum("t").alias("wu"))
        )

    def _renorm(w: dict[int, int]) -> list[int]:
        wv = [int(w.get(j, 0)) for j in range(dim)]
        m = max((abs(x) for x in wv), default=0) or 1
        return [
            -((-x) * vscale // m) if x < 0 else x * vscale // m for x in wv
        ]

    for _ in range(rounds - 1):
        vec = _renorm({r.j: r.wu for r in _w_frame(vec).collect()})
    last = _w_frame(vec).localCheckpoint(eager=True)
    m = max((abs(r.wu) for r in last.collect()), default=0) or 1
    # integer div on non-negative operands; sign split keeps both engines'
    # truncation identical
    return last.select(
        "j",
        F.when(
            F.col("wu") < 0,
            -F.expr(f"((-wu) * {vscale}) div {m}"),
        )
        .otherwise(F.expr(f"(wu * {vscale}) div {m}"))
        .cast("long")
        .alias("vu"),
    ).orderBy("j")


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the vector-store compression/serving tier
# (builder brief "beyond-reference" §similarity; SCALE.md r10 design,
# second set). The corpus is encoded as PQ_M one-byte codes per vector
# (PQ_M * log2(PQ_KS) bits = 8 bytes vs 256 for the float64-dim payload, a
# 32x index compression) and queries scan the CODES with per-subspace
# lookup tables (ADC — asymmetric distance computation), never touching
# the embedding payload. Reference parity: none (the reference ships no
# vector index); the sample-train discipline follows ivf_build's
# hash-sampled quantizer and the r08 100x lesson (never cluster all N).

PQ_M = 8  # subspaces (EMB_DIM / PQ_SUB)
PQ_SUB = EMB_DIM // PQ_M  # dims per subspace
PQ_KS = 16  # codewords per subspace codebook
PQ_TRAIN = 1024  # bounded training sample (the sample-train discipline)
PQ_SEED = 23


def _qsq_e6(a: Column, b: Column) -> Column:
    """Quantized squared L2 distance floor(1e6 * sum((a_i - b_i)^2)) as
    BIGINT — per-element double arithmetic, left-to-right fold (the _dot
    discipline), so DuckDB's list_sum replays it bit-for-bit."""
    return F.floor(
        F.lit(1e6)
        * F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    ).cast("bigint")


def _qdot_e6(a: Column, b: Column) -> Column:
    """Quantized inner product floor(1e6 * sum(a_i * b_i)) as BIGINT —
    same fold discipline as _qsq_e6."""
    return F.floor(F.lit(1e6) * _dot(a, b)).cast("bigint")


def pq_codebooks(
    embeddings: DataFrame,
    m_sub: int = PQ_M,
    ks: int = PQ_KS,
    seed: int = PQ_SEED,
    train_n: int = PQ_TRAIN,
) -> DataFrame:
    """PQ codebook training: (m, code, cw) with cw the m-th subvector of a
    hash-sampled training vector. Two-stage sampling, both portable
    md5-rank picks DuckDB replays verbatim:
      1. ONE corpus pass takes the train_n lowest hash(seed|vec_id) rows
         (TakeOrderedAndProject — per-partition top-n, never a global
         sort; the sample-train discipline ivf_build shares: at 100 TB
         the quantizer NEVER trains on all N).
      2. Per subspace m, the ks lowest hash(seed|m|vec_id) training rows
         become codewords 1..ks (a partitioned window over the BOUNDED
         train_n * m_sub exploded table — thousands of rows, not corpus).
    Codewords are copied subvectors (zero arithmetic), so the pick is
    exactly replayable; a production build would k-means-refine each
    codebook from the same sample without changing any consumer."""
    th = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("vec_id"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    train = (
        embeddings.select("vec_id", "embedding", th.alias("_th"))
        .orderBy("_th", "vec_id")
        .limit(train_n)
        .localCheckpoint(eager=True)
    )
    ms = F.explode(F.array(*[F.lit(m) for m in range(m_sub)])).alias("m")
    mh = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.lit(str(seed)), F.col("m"), F.col("vec_id")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("m").orderBy("_mh", "vec_id")
    sub = EMB_DIM // m_sub
    return (
        train.select("vec_id", "embedding", ms)
        .select("m", "vec_id", "embedding", mh.alias("_mh"))
        .withColumn("code", F.row_number().over(w))
        .filter(F.col("code") <= ks)
        .select(
            "m",
            "code",
            F.expr(f"slice(embedding, m * {sub} + 1, {sub})").alias("cw"),
        )
    )


def _books_rows(
    codebooks: DataFrame,
) -> dict[int, list[tuple[int, list[float]]]]:
    """Collect the bounded codebook table (m_sub * ks rows — the centroid
    bounded-scalar discipline) as {m: [(code, cw), ...] code-ascending}."""
    books: dict[int, list[tuple[int, list[float]]]] = {}
    for r in codebooks.collect():
        books.setdefault(int(r["m"]), []).append(
            (int(r["code"]), [float(x) for x in r["cw"]])
        )
    for rows in books.values():
        rows.sort()
    return books


def _nearest_code(
    sub: Column, book: list[tuple[int, list[float]]]
) -> Column:
    """Winning code for one subvector against a FROZEN codebook (argmin
    quantized squared L2, ties -> lower code): the nearest_cid literal-fold
    discipline — the argmin runs inside the scan projection, the payload
    never enters an exchange."""
    bmat = F.array(
        *[
            F.struct(
                F.lit(code).cast("int").alias("code"),
                F.lit(cw).alias("cw"),
            )
            for code, cw in book
        ]
    )
    best = F.array_max(
        F.transform(
            bmat,
            lambda c: F.struct(
                (-_qsq_e6(sub, c["cw"])).alias("nd"),
                (-c["code"]).alias("ncode"),
            ),
        )
    )
    return (-best["ncode"]).cast("int")


def pq_encode(
    embeddings: DataFrame, books: dict[int, list[tuple[int, list[float]]]]
) -> DataFrame:
    """PQ encoding: (vec_id, codes ARRAY<INT>) with codes[m+1] the 1-based
    nearest codeword of subspace m — one scan-shaped projection (m_sub
    literal-fold argmins per row, zero shuffles, zero joins; the
    ivf_assign lean shape). This IS the at-rest PQ index: 8 ints per
    vector in place of the 64-float payload."""
    sub = len(next(iter(books.values()))[0][1])
    codes = F.array(
        *[
            _nearest_code(
                F.expr(f"slice(embedding, {m * sub + 1}, {sub})"),
                books[m],
            )
            for m in sorted(books)
        ]
    )
    return embeddings.select("vec_id", codes.alias("codes"))


def pq_lut_expr(
    books: dict[int, list[tuple[int, list[float]]]], qcol: str
) -> Column:
    """Per-query ADC lookup table: lut[m+1][code] = floor(1e6 *
    <q_sub_m, codeword>) as one nested ARRAY<ARRAY<BIGINT>> column over the
    query-vector column `qcol`. Built as ONE SQL expression over a nested
    codebook literal, not m_sub * ks Python-composed Columns: building 128
    Column trees costs thousands of driver py4j round-trips (~4 s per
    CALL, measured at registration time — pure query-construction
    overhead, 30x the actual 0.14 s execution), while one expr string is a
    single hop and parses JVM-side. repr(float) round-trips exactly, so
    the double literals are bit-identical to the F.lit path (the _band_sql
    discipline); the inner fold is _qdot_e6's left-to-right order."""
    sub = len(next(iter(books.values()))[0][1])
    books_sql = "array(" + ",".join(
        "array("
        + ",".join(
            "array(" + ",".join(repr(x) for x in cw) + ")"
            for _code, cw in books[m]
        )
        + ")"
        for m in sorted(books)
    ) + ")"
    return F.expr(
        f"transform({books_sql}, (bm, m) -> transform(bm, cw ->"
        f" CAST(FLOOR(1e6 * aggregate(zip_with("
        f"slice({qcol}, m * {sub} + 1, {sub}), cw,"
        " (x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE),"
        " (acc, v) -> acc + v)) AS BIGINT)))"
    )


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    books: dict[int, list[tuple[int, list[float]]]],
    k: int = 10,
) -> DataFrame:
    """ADC top-k: score every encoded vector against each query with
    per-subspace lookup tables and rank (score_e6 DESC, vec_id), excluding
    self-matches. Output (qid, vec_id, score_e6) where score_e6 =
    sum_m floor(1e6 * <q_sub_m, codeword(codes[m])>) — the asymmetric
    inner-product approximation every PQ store serves with.

    Topology: the LUT column is built per query row from the frozen
    codebook literals (m_sub * ks quantized dots — bounded work on a
    bounded query set), then ONE scan over the CODES table (broadcast
    query side; the cosine_topk scan-and-score shape, but over 8-int codes
    instead of 64-float payloads) folds codes against LUTs with zip_with +
    element_at. At 100 TB this is why stores PQ-compress: the serving scan
    reads 32x fewer bytes and does m_sub integer lookups per row instead
    of d multiply-adds; the embedding column appears nowhere in the
    plan."""
    qlut = queries.select("qid", pq_lut_expr(books, "qe").alias("lut"))
    score = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("lut"),
            lambda c, l: F.element_at(l, c),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    # bcast-audit: bounded (fixed query set)
    scored = (
        codes.crossJoin(F.broadcast(qlut))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", score.alias("score_e6"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score_e6"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
