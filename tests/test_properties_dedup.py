"""Property-based cross-checks (hypothesis) for the near-duplicate layer —
prefix-filtered exact Jaccard, MinHash-LSH, and SimHash — against
independent pure-Python models on arbitrary small corpora. The parity
suite pins these on the driver's fixtures; these pin the *guarantees*
(prefix-filter completeness, LSH verification soundness, the band
pigeonhole) on adversarial shapes: empty docs, docs below the shingle
width, exact duplicates, threshold-boundary pairs.

jaccard_pairs' prefix filter and simhash_pairs' 4x16-bit banding are both
COMPLETE candidate generators (pigeonhole arguments in their docstrings),
so those two are tested for set EQUALITY with the model, not containment.
MinHash banding is probabilistic, so it gets soundness (output must be a
subset of the true pairs with exact Jaccard values) plus one
deterministic completeness tooth: an appended exact duplicate has an
identical signature, collides in every band, and MUST be emitted."""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gpu_mapreduce_spark.operators import dedup

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_VOCAB = ["aa", "bb", "cc", "dd"]

token_lists = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=10)
corpora = st.lists(token_lists, min_size=1, max_size=6)
thresholds = st.sampled_from([0.4, 0.6, 0.8])


def _docs_df(spark, corpus):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shingles(toks: list[str], k: int) -> set[str]:
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _model_jaccard_pairs(
    corpus, t: float, k: int, split_id: int | None = None
) -> dict[tuple[int, int], float]:
    sh = {i: _shingles(toks, k) for i, toks in enumerate(corpus)}
    out: dict[tuple[int, int], float] = {}
    for a in sh:
        for b in sh:
            if split_id is None:
                if not a < b:
                    continue
            elif not (a < split_id <= b):
                continue
            union = len(sh[a] | sh[b])
            if union == 0:
                continue
            jac = len(sh[a] & sh[b]) / union  # same int/int IEEE division
            if jac >= t:
                out[(a, b)] = jac
    return out


@given(corpus=corpora, t=thresholds, k=st.integers(1, 3))
@settings(**_SETTINGS)
def test_jaccard_pairs_matches_model(spark, corpus, t, k):
    got = {
        (r.a, r.b): r.jac
        for r in dedup.jaccard_pairs(_docs_df(spark, corpus), threshold=t, k=k).collect()
    }
    assert got == _model_jaccard_pairs(corpus, t, k)


@given(corpus=st.lists(token_lists, min_size=2, max_size=6), t=thresholds)
@settings(**_SETTINGS)
def test_jaccard_pairs_cross_set_matches_model(spark, corpus, t):
    split = len(corpus) // 2
    got = {
        (r.a, r.b): r.jac
        for r in dedup.jaccard_pairs(
            _docs_df(spark, corpus), threshold=t, k=2, split_id=split
        ).collect()
    }
    assert got == _model_jaccard_pairs(corpus, t, 2, split_id=split)


@given(corpus=corpora, t=thresholds)
@settings(**_SETTINGS)
def test_minhash_lsh_sound_and_finds_exact_dup(spark, corpus, t):
    # append an exact copy of doc 0 — identical shingle set => identical
    # signature => collides in every band => must be verified and emitted
    dup_id = len(corpus)
    extended = corpus + [corpus[0]]
    got = {
        (r.a, r.b): r.jac
        for r in dedup.minhash_lsh_pairs(
            _docs_df(spark, extended), threshold=t, k=2, bands=8, rows=2
        ).collect()
    }
    want = _model_jaccard_pairs(extended, t, 2)
    assert set(got) <= set(want)
    for pair, jac in got.items():
        assert jac == want[pair]
    if _shingles(corpus[0], 2):
        assert (0, dup_id) in got and got[(0, dup_id)] == 1.0


def _model_simhash(corpus, seed: int = 7):
    rows = {}
    for i, toks in enumerate(corpus):
        distinct = set(toks)
        n = len(distinct)
        sums = [0] * 64
        for tok in distinct:
            hx = hashlib.md5(f"{seed}|{tok}".encode()).hexdigest()
            h1, h2 = int(hx[0:15], 16), int(hx[15:30], 16)
            for b in range(64):
                sums[b] += (h1 >> b if b < 32 else h2 >> (b - 32)) & 1
        bits = [1 if 2 * s > n else 0 for s in sums]
        sig = sum(bit << p for p, bit in enumerate(bits))
        bands = tuple(
            sum(bits[bi * 16 + p] << p for p in range(16)) for bi in range(4)
        )
        rows[i] = (sig, bands)
    return rows


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


@given(corpus=corpora)
@settings(**_SETTINGS)
def test_simhash_sigs_match_model(spark, corpus):
    got = {
        r.doc_id: (r.sig, (r.b0, r.b1, r.b2, r.b3))
        for r in dedup.simhash_sigs(_docs_df(spark, corpus)).collect()
    }
    want = {
        i: (_signed64(sig), bands)
        for i, (sig, bands) in _model_simhash(corpus).items()
    }
    assert got == want


@given(corpus=st.lists(token_lists, min_size=2, max_size=6))
@settings(**_SETTINGS)
def test_simhash_pairs_matches_model(spark, corpus):
    """Band-pigeonhole completeness: got == ALL pairs at Hamming <= 3."""
    got = {
        (r.a, r.b): r.dist
        for r in dedup.simhash_pairs(_docs_df(spark, corpus), max_dist=3).collect()
    }
    sigs = _model_simhash(corpus)
    want = {}
    for a in sigs:
        for b in sigs:
            if a < b:
                d = bin(sigs[a][0] ^ sigs[b][0]).count("1")
                if d <= 3:
                    want[(a, b)] = d
    assert got == want


# Whitespace-normalization edge: tokens() drops empties, so texts differing
# only in whitespace runs shingle identically.
def test_whitespace_runs_shingle_identically(spark):
    df = spark.createDataFrame(
        [(0, "aa  bb\tcc"), (1, " aa bb cc ")], "doc_id long, text string"
    )
    got = {
        (r.a, r.b): r.jac
        for r in dedup.jaccard_pairs(df, threshold=0.9, k=2).collect()
    }
    assert got == {(0, 1): 1.0}
