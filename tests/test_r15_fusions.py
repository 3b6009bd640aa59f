"""r15 optimization parity tests: every fused path must be bit-identical
to the classic multi-pass form it replaced (the r14 test_iterate_observed
discipline).

- kmv_sketch_pair (one tagged pass) ≡ two kmv_sketch jobs, including
  across arbitrary partition splits (the KMV mergeability law the fold
  relies on).
- encode_pair_with_merges (one corpus pass, both vocabs) ≡ the joined
  two-pass encode_with_merges form.
- bpe_train's lazy-checkpoint loop ≡ the classic eager two-job-per-round
  loop (merges AND final word states).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import bpe
from gpu_mapreduce_spark.queries import theta_ops as t
from tests.conftest import SF001_DIR


def _docs(spark):
    from gpu_mapreduce_spark.sources.tables import table

    return table(spark, SF001_DIR, "documents")


def test_kmv_sketch_pair_matches_two_pass(spark):
    docs = _docs(spark)
    ska = t.kmv_sketch(docs.filter(F.col("doc_id") % 2 == 0))
    skb = t.kmv_sketch(docs.filter(F.col("doc_id") % 3 == 0))
    pa, pb = t.kmv_sketch_pair(docs)
    assert (pa, pb) == (ska, skb)


def test_kmv_sketch_pair_split_invariant(spark):
    """The per-(partition, tag) fold must be exact for ANY split — the
    mergeability law: re-partitioning the corpus cannot change the folded
    sketch."""
    docs = _docs(spark)
    base = t.kmv_sketch_pair(docs)
    for n in (1, 7):
        assert t.kmv_sketch_pair(docs.repartition(n)) == base


def test_encode_pair_matches_joined_two_pass(spark):
    docs = _docs(spark).limit(200).localCheckpoint(eager=True)
    old = [("t", "h"), ("th", "e")]
    new = [("a", "n"), ("an", "d"), ("t", "o")]
    o = bpe.encode_with_merges(docs, old).select(
        "doc_id",
        F.col("n_tokens_bpe").alias("n_old"),
        F.col("tokens_digest").alias("dg_old"),
    )
    n = bpe.encode_with_merges(docs, new).select(
        "doc_id",
        F.col("n_tokens_bpe").alias("n_new"),
        F.col("tokens_digest").alias("dg_new"),
    )
    want = {
        r.doc_id: (r.n_old, r.dg_old, r.n_new, r.dg_new)
        for r in o.join(n, "doc_id").collect()
    }
    got = {
        r.doc_id: (r.n_old, r.dg_old, r.n_new, r.dg_new)
        for r in bpe.encode_pair_with_merges(docs, old, new).collect()
    }
    assert got == want


def test_bpe_train_matches_classic_loop(spark):
    """The r15 one-job-per-round loop (lazy localCheckpoint materialized
    by the next argmax action) returns the same merges and the same final
    word states as the classic eager loop."""
    docs = _docs(spark).limit(150).localCheckpoint(eager=True)

    def classic(k):
        docw, words = bpe.word_tables(docs)
        words = words.localCheckpoint(eager=True)
        merges = []
        for step in range(1, k + 1):
            best = bpe.best_pair(bpe.pair_counts(words))
            if best is None:
                break
            a, b, cnt = best
            merges.append((step, a, b, cnt))
            words = bpe.apply_merge(words, a, b).localCheckpoint(eager=True)
        return merges, words

    want_merges, want_words = classic(bpe.K_MERGES)
    got_merges, got_words, _docw = bpe.bpe_train(spark, docs, bpe.K_MERGES)
    assert got_merges == want_merges
    want_state = {r.word: (r.wt, r.s) for r in want_words.collect()}
    got_state = {r.word: (r.wt, r.s) for r in got_words.collect()}
    assert got_state == want_state
