"""ann_filtered_topk model checks: predicate soundness, full-k pages,
recall vs FILTERED brute force, and the under-fill demonstration that
motivates pre-filtering over post-filtering."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import similarity
from gpu_mapreduce_spark.queries.ann_filtered import _LABEL
from gpu_mapreduce_spark.queries.similarity import TOP_K, _queries
from gpu_mapreduce_spark.registry import load_all
from gpu_mapreduce_spark.sources.tables import table
from tests.conftest import SF001_DIR


def test_filtered_topk_sound_full_and_recalls(spark):
    qs = load_all()
    rows = qs["ann_filtered_topk"].fn(spark, SF001_DIR).collect()
    results = [r for r in rows if r.vec_id >= 0]
    counts = {r.qid: r.sim_e6 for r in rows if r.vec_id < 0}

    emb = table(spark, SF001_DIR, "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    # soundness: every result satisfies the predicate
    assert results and all(labels[r.vec_id] == _LABEL for r in results)
    # full pages: k results per query (the pre-filter design's point)
    per_q = {}
    for r in results:
        per_q.setdefault(r.qid, []).append(r.vec_id)
    assert all(len(v) == TOP_K for v in per_q.values()), per_q
    # candidate counts present and plausible (selectivity * probed rows)
    assert set(counts) == set(per_q)
    assert all(c >= TOP_K for c in counts.values())

    # recall vs FILTERED brute force (exact top-k over the label subset)
    brute = similarity.cosine_topk(
        emb.filter(F.col("label") == _LABEL),
        _queries(spark, SF001_DIR),
        k=TOP_K,
    ).collect()
    truth = {}
    for r in brute:
        truth.setdefault(r.qid, set()).add(r.vec_id)
    hits = sum(len(truth[q] & set(v)) for q, v in per_q.items())
    recall = hits / sum(len(v) for v in truth.values())
    # nprobe=4 IVF on the near-random fixture: pin well below measured,
    # far above chance (~TOP_K / |label subset|)
    assert recall >= 0.3, f"filtered recall {recall:.2f}"

    # the motivating contrast: POST-filtering the unfiltered IVF top-k
    # under-fills at ~10% selectivity (expected ~1 of 10 rows per query)
    unfiltered = qs["ann_ivf_topk"].fn(spark, SF001_DIR).collect()
    post = {}
    for r in unfiltered:
        if labels[r.vec_id] == _LABEL:
            post.setdefault(r.qid, []).append(r.vec_id)
    worst = min(len(post.get(q, [])) for q in per_q)
    assert worst < TOP_K, "post-filter did not under-fill — fixture drifted"
