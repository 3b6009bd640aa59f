"""Recall/soundness checks for the approximate similarity paths (LSH ANN,
IVF ANN, embedding near-dup) vs their exact brute-force baselines."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import similarity
from gpu_mapreduce_spark.sources.tables import table
from tests.conftest import SF_DIR


def _queries(spark):
    emb = table(spark, SF_DIR, "embeddings")
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )


def test_lsh_recall_at_10(spark):
    emb = table(spark, SF_DIR, "embeddings")
    q = _queries(spark)
    exact = similarity.cosine_topk(emb, q, k=10).collect()
    approx = similarity.lsh_topk(emb, q, k=10).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.qid, set()).add(r.vec_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.qid, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[qid] & approx_sets.get(qid, set())) / len(exact_sets[qid])
        for qid in exact_sets
    ]
    # deterministic given seed; measured 0.9-1.0 per query on the fixture —
    # assert a floor that still catches bucketing regressions
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    # every returned candidate's similarity must match the exact score
    exact_sim = {(r.qid, r.vec_id): r.sim_e6 for r in exact}
    for r in approx:
        if (r.qid, r.vec_id) in exact_sim:
            assert exact_sim[(r.qid, r.vec_id)] == r.sim_e6


def test_ivf_recall_at_10(spark):
    emb = table(spark, SF_DIR, "embeddings")
    q = _queries(spark)
    exact = similarity.cosine_topk(emb, q, k=10).collect()
    approx = similarity.ivf_topk(emb, q, k=10, n_centroids=16, nprobe=4).collect()
    exact_pairs = {(r.qid, r.vec_id) for r in exact}
    approx_pairs = {(r.qid, r.vec_id) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # near-random vectors probe-bound recall: nprobe/n_centroids = 0.25 is
    # the no-locality floor; the cells must beat it (measured 0.46)
    assert recall >= 0.3, recall
    # scores of overlapping results must be the exact quantized cosine
    exact_sim = {(r.qid, r.vec_id): r.sim_e6 for r in exact}
    for r in approx:
        if (r.qid, r.vec_id) in exact_sim:
            assert exact_sim[(r.qid, r.vec_id)] == r.sim_e6


def test_embedding_dup_pairs_lsh_sound_and_recall(spark):
    emb = table(spark, SF_DIR, "embeddings")
    exact = {
        (r.a, r.b): r.sim_e6
        for r in similarity.dup_pairs(emb, threshold_e6=400_000).collect()
    }
    approx = {
        (r.a, r.b): r.sim_e6
        for r in similarity.dup_pairs_lsh(emb, threshold_e6=400_000).collect()
    }
    assert exact, "fixture should contain pairs at cos >= 0.4"
    # soundness: every LSH pair is a true pair with the identical score
    assert set(approx) <= set(exact)
    for pair, sim in approx.items():
        assert exact[pair] == sim
    # recall: banding misses are possible but rare (measured 1.0 at
    # sf0.001, 0.992 at sf0.1 — 7 of 920 pairs missed, which is why the
    # registered query's oracle replays the banding rather than asserting
    # equality to the exact set; see queries/similarity.dedup_embedding_lsh)
    assert len(approx) / len(exact) >= 0.9


def test_dup_pairs_semantic_sound_and_recall(spark):
    """SemDeDup-style cluster-bounded pairs: soundness (every within-cell
    pair is a true pair with the identical quantized score) plus measured
    cell recall vs the exact baseline. Near-random fixture vectors give
    cells little locality, so the floor is deliberately loose — what the
    assertion must catch is a broken assignment (recall ~ 1/n_centroids)
    or an unsound score, not the fixture's luck."""
    emb = table(spark, SF_DIR, "embeddings")
    exact = {
        (r.a, r.b): r.sim_e6
        for r in similarity.dup_pairs(emb, threshold_e6=400_000).collect()
    }
    semantic = {
        (r.a, r.b): r.sim_e6
        for r in similarity.dup_pairs_semantic(
            emb, threshold_e6=400_000
        ).collect()
    }
    assert exact, "fixture should contain pairs at cos >= 0.4"
    assert set(semantic) <= set(exact)
    for pair, sim in semantic.items():
        assert exact[pair] == sim
    # same-cell probability for near-random vectors ~ 1/16; genuine near-dups
    # co-cluster far more often (measured: see queries/semantic.py docstring)
    assert len(semantic) / len(exact) > 1 / 16


def test_dup_pairs_guard_refuses_large_corpus(spark):
    """dup_pairs is the declared O(n^2) baseline: it must refuse a corpus
    above its row cap (pointing at dup_pairs_lsh) BEFORE launching the
    quadratic join, and still run when the cap is lifted explicitly."""
    import pytest

    emb = table(spark, SF_DIR, "embeddings")
    with pytest.raises(ValueError, match="dup_pairs_lsh"):
        similarity.dup_pairs(emb, max_rows=10).collect()
    # explicit opt-out still works (sampled-recall / test use)
    small = emb.filter(F.col("vec_id") < 50)
    assert similarity.dup_pairs(small, max_rows=None).count() >= 0
    # default cap admits the fixture corpora
    assert similarity.DUP_PAIRS_MAX_ROWS >= emb.count()


def test_crossscore_rerank_exact_and_bounded(spark):
    """The cross-score reranker must (a) select only from its candidate
    set, (b) produce the exact integer score a Python recomputation gives
    (fixed-point dot + hot-dim overlap), and (c) keep exactly top-k per
    query by (rerank_score DESC, vec_id)."""
    import math

    emb = table(spark, SF_DIR, "embeddings")
    q = _queries(spark)
    # a small deterministic candidate set: 20 lowest corpus ids per query
    cand = q.select("qid").crossJoin(
        emb.filter(F.col("vec_id") < 20).select("vec_id")
    ).filter(F.col("vec_id") != F.col("qid"))
    got = similarity.crossscore_rerank(cand, emb, q, k=5).collect()
    vecs = {r.vec_id: list(r.embedding) for r in emb.filter(
        F.col("vec_id") < 20).collect()}
    qs = {r.qid: list(r.qe) for r in q.collect()}

    def quant(v):
        return [math.floor(float(x) * similarity.CROSS_SCALE) for x in v]

    expected = {}
    for qid, qe in qs.items():
        scored = []
        for vid, e in vecs.items():
            if vid == qid:
                continue
            eu, qu = quant(e), quant(qe)
            dot = sum(a * b for a, b in zip(eu, qu))
            ov = sum(
                1
                for a, b in zip(eu, qu)
                if abs(a) >= similarity.CROSS_MAG_FLOOR
                and abs(b) >= similarity.CROSS_MAG_FLOOR
            )
            scored.append(
                (dot + similarity.CROSS_OVERLAP_W * ov, dot, ov, vid)
            )
        scored.sort(key=lambda t: (-t[0], t[3]))
        expected[qid] = scored[:5]
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == set(qs)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: (-r.rerank_score, r.vec_id))
        assert [
            (r.rerank_score, r.dot_u, r.n_overlap, r.vec_id) for r in rows
        ] == expected[qid]


def test_assignment_migration_histogram(spark):
    """The drift histogram must count every (old, new) transition and
    nothing else — identical assignments land on the diagonal."""
    old = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2), (4, 2), (5, 3)],
        "vec_id bigint, cid int",
    )
    new = spark.createDataFrame(
        [(1, 1), (2, 4), (3, 4), (4, 2), (5, 3)],
        "vec_id bigint, cid int",
    )
    got = {
        (r.old_cid, r.new_cid): r.n_vecs
        for r in similarity.assignment_migration(old, new).collect()
    }
    assert got == {(1, 1): 1, (1, 4): 1, (2, 4): 1, (2, 2): 1, (3, 3): 1}
    same = {
        (r.old_cid, r.new_cid): r.n_vecs
        for r in similarity.assignment_migration(old, old).collect()
    }
    assert all(o == n for (o, n) in same) and sum(same.values()) == 5


def test_recall_at_k_model(spark):
    """recall_at_k: exact-vs-itself is 10000 for every query; a constructed
    approximate result reports the known per-qid hit counts, including the
    all-missed query via the exact-side left join."""
    from gpu_mapreduce_spark.operators import similarity

    exact = spark.createDataFrame(
        [(q, v) for q in (1, 2, 3) for v in (10, 11, 12, 13)],
        "qid bigint, vec_id bigint",
    )
    assert {
        (r.qid, r.n_hits, r.recall_u)
        for r in similarity.recall_at_k(exact, exact, 4).collect()
    } == {(1, 4, 10000), (2, 4, 10000), (3, 4, 10000)}
    approx = spark.createDataFrame(
        # q1: 3/4 hit; q2: 1/4 (plus 3 non-hits); q3: absent entirely
        [(1, 10), (1, 11), (1, 12), (1, 99), (2, 13), (2, 97), (2, 98), (2, 99)],
        "qid bigint, vec_id bigint",
    )
    assert {
        (r.qid, r.n_hits, r.recall_u)
        for r in similarity.recall_at_k(approx, exact, 4).collect()
    } == {(1, 3, 7500), (2, 1, 2500), (3, 0, 0)}
    # repeated (qid, vec_id) rows — a multi-probe union without dedup —
    # count ONE hit each, never multiplying through the intersection join
    dup_approx = approx.unionByName(approx).unionByName(approx)
    assert {
        (r.qid, r.n_hits, r.recall_u)
        for r in similarity.recall_at_k(dup_approx, exact, 4).collect()
    } == {(1, 3, 7500), (2, 1, 2500), (3, 0, 0)}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k >= 1"):
        similarity.recall_at_k(approx, exact, 0)


def _py_pq(vectors, m_sub, ks, seed, train_n):
    """Pure-Python PQ model: md5-rank training pick, per-subspace codebook
    pick, argmin-squared-L2 encode — the operators/similarity.pq_* contract
    replayed with hashlib + IEEE doubles (same left-to-right fold order)."""
    import hashlib

    sub = similarity.EMB_DIM // m_sub

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    train = sorted(vectors, key=lambda r: (h(f"{seed}|{r[0]}"), r[0]))[:train_n]
    books = {}
    for m in range(m_sub):
        picked = sorted(train, key=lambda r: (h(f"{seed}|{m}|{r[0]}"), r[0]))[:ks]
        books[m] = [
            (c + 1, [float(x) for x in vec[m * sub : (m + 1) * sub]])
            for c, (_vid, vec) in enumerate(picked)
        ]

    def qsq_e6(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (float(x) - float(y)) * (float(x) - float(y))
        import math

        return math.floor(1e6 * acc)

    def encode(vec):
        out = []
        for m in range(m_sub):
            s = vec[m * sub : (m + 1) * sub]
            out.append(
                min(books[m], key=lambda cw: (qsq_e6(s, cw[1]), cw[0]))[0]
            )
        return out

    return books, {vid: encode(vec) for vid, vec in vectors}


def test_pq_encode_matches_python_model(spark):
    """pq_codebooks + pq_encode vs the pure-Python replay on the fixture
    corpus: identical codebooks (pick is pure hashing — zero arithmetic)
    and identical codes for every vector (same quantized-L2 argmin, same
    ties-to-lower-code rule)."""
    emb = table(spark, SF_DIR, "embeddings")
    vectors = [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in emb.select("vec_id", "embedding").collect()
    ]
    m_sub, ks, seed, train_n = 4, 8, 99, 64
    want_books, want_codes = _py_pq(vectors, m_sub, ks, seed, train_n)
    cb = similarity.pq_codebooks(emb, m_sub=m_sub, ks=ks, seed=seed, train_n=train_n)
    books = similarity._books_rows(cb)
    assert books == want_books
    got = {
        r.vec_id: list(r.codes)
        for r in similarity.pq_encode(emb, books).collect()
    }
    assert got == want_codes
    assert all(len(c) == m_sub and all(1 <= x <= ks for x in c) for c in got.values())


def test_pq_adc_scores_are_lut_sums(spark):
    """pq_adc_topk's score must equal the Python LUT-sum replay for every
    returned (qid, vec_id) — floor-per-subspace THEN integer sum, never one
    float sum over all dims — and self-matches must be excluded."""
    import math

    emb = table(spark, SF_DIR, "embeddings")
    books = similarity._books_rows(similarity.pq_codebooks(emb))
    codes = {
        r.vec_id: list(r.codes)
        for r in similarity.pq_encode(emb, books).collect()
    }
    q = _queries(spark)
    qvecs = {r.qid: [float(x) for x in r.qe] for r in q.collect()}

    def lut_e6(qv, cw):
        acc = 0.0
        for x, y in zip(qv, cw):
            acc = acc + float(x) * float(y)
        return math.floor(1e6 * acc)

    top = similarity.pq_adc_topk(
        similarity.pq_encode(emb, books), q, books, k=10
    ).collect()
    assert top, "empty ADC top-k"
    per_q = {}
    for r in top:
        assert r.vec_id != r.qid
        sub = similarity.PQ_SUB
        want = sum(
            lut_e6(
                qvecs[r.qid][m * sub : (m + 1) * sub],
                dict(books[m])[codes[r.vec_id][m]],
            )
            for m in range(similarity.PQ_M)
        )
        assert r.score_e6 == want, (r.qid, r.vec_id, r.score_e6, want)
        per_q.setdefault(r.qid, []).append(r.score_e6)
    # ranked descending within each query, exactly k rows per query
    for qid, scores in per_q.items():
        assert scores == sorted(scores, reverse=True) and len(scores) == 10
