"""Cross-split leakage audit (queries/decontam.py)."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from gpu_mapreduce_spark.functions.portable import hash60
from gpu_mapreduce_spark.queries.decontam import (
    _TEST_GE,
    _TRAIN_LT,
    split_contamination,
)
from gpu_mapreduce_spark.sources import fixtures


def _split_of(spark, sf_dir):
    bkt = (
        hash60(F.concat_ws("|", F.lit("split"), F.col("doc_id").cast("string")))
        % 100
    )
    return {
        r.doc_id: r.b
        for r in fixtures.corpus(spark, sf_dir)
        .select("doc_id", bkt.alias("b"))
        .collect()
    }


def test_split_contamination_flags_cross_split_twins(spark):
    """A test-split doc whose EXACT duplicate twin (the +1e6 injection
    namespace, byte-identical text) landed in TRAIN must report full
    leakage — identical text shares every 5-gram. Near copies (+2e6) add a
    tail whose grams may or may not leak, so only the exact relation is
    asserted at 10000 bp; everything else pins the report's invariants."""
    rows = {r.doc_id: r for r in split_contamination(spark, SF_DIR).collect()}
    assert rows, "test split should be non-empty at fixture scale"
    splits = _split_of(spark, SF_DIR)

    def in_train(doc_id):
        return splits.get(doc_id, 100) < _TRAIN_LT

    full_leaks = 0
    for doc_id, r in rows.items():
        assert splits[doc_id] >= _TEST_GE  # report covers the test split only
        assert 0 <= r.n_leaked <= r.n_grams
        assert r.leak_bp == r.n_leaked * 10000 // r.n_grams
        base = doc_id % 1_000_000
        exact_twins = {base, base + 1_000_000} - {doc_id}
        # the byte-identical relation only holds between an original and
        # its +1e6 copy; a NEAR-dup doc (>= 2e6, ' near dup tail'
        # appended) has tail-crossing 5-grams its base doesn't contain,
        # so it can legitimately report < 10000 bp even with the base in
        # train (real case at sf0.1: docs 2001337/2001519/...)
        if doc_id < 2_000_000 and any(in_train(t) for t in exact_twins):
            assert r.leak_bp == 10000, (doc_id, r)
            full_leaks += 1
    # the fixture's injection rate guarantees the audit has something to find
    assert full_leaks >= 1
