"""Interleaved same-JVM A/B: classic two-job-per-round bpe_train vs the
r15 lazy-checkpoint fused form (one job per round).

Both variants run the SAME rounds over the sf0.1 documents table,
alternating A/B/A/B... inside one JVM so machine load hits both equally
(the r14 measurement discipline: cross-process wall clocks on this
sandbox swing +-50%). Per sample: wall seconds and the Spark
statusStore job-count delta (deterministic). Asserts the merge lists
are identical every sample.

    python tools/ab_bpe.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession

from gpu_mapreduce_spark.operators import bpe
from gpu_mapreduce_spark.plans.iterate import unpersist_checkpoint
from gpu_mapreduce_spark.session import get_spark
from gpu_mapreduce_spark.sources.tables import table


def bpe_train_classic(
    spark: SparkSession, docs: DataFrame, k: int = bpe.K_MERGES
):
    """The pre-r15 loop, verbatim: eager checkpoint + argmax collect per
    round (two scheduled jobs), rebuilt here as the A side."""
    docw, words = bpe.word_tables(docs)
    words = words.localCheckpoint(eager=True)
    merges = []
    snapshots = [words]
    for step in range(1, k + 1):
        best = bpe.best_pair(bpe.pair_counts(words))
        if best is None:
            break
        a, b, cnt = best
        merges.append((step, a, b, cnt))
        words = bpe.apply_merge(words, a, b).localCheckpoint(eager=True)
        snapshots.append(words)
    return merges, words, docw, snapshots


def n_jobs(spark: SparkSession) -> int:
    return spark._jsc.sc().statusStore().jobsList(None).size()


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_bpe")
    docs = table(spark, sf_dir, "documents")
    # warm-up both paths once (JIT, scan caches)
    bpe.bpe_train(spark, docs)
    res = {"classic": [], "fused": []}
    jobs = {"classic": [], "fused": []}
    merges_ref = None
    for i in range(pairs):
        for label in ("classic", "fused"):
            j0 = n_jobs(spark)
            t0 = time.perf_counter()
            if label == "classic":
                merges, words, docw, snaps = bpe_train_classic(spark, docs)
            else:
                merges, words, docw = bpe.bpe_train(spark, docs)
                snaps = [words]
            dt = time.perf_counter() - t0
            dj = n_jobs(spark) - j0
            res[label].append(round(dt, 3))
            jobs[label].append(dj)
            if merges_ref is None:
                merges_ref = merges
            assert merges == merges_ref, (label, merges, merges_ref)
            # free this sample's state so the next is clean
            for s in snaps:
                unpersist_checkpoint(s)
            unpersist_checkpoint(words)
            unpersist_checkpoint(docw)
            print(
                f"# pair {i} {label}: {dt:.3f}s, {dj} jobs",
                file=sys.stderr,
                flush=True,
            )
    print(
        {
            "classic_s": res["classic"],
            "fused_s": res["fused"],
            "classic_min": min(res["classic"]),
            "fused_min": min(res["fused"]),
            "classic_jobs": jobs["classic"],
            "fused_jobs": jobs["fused"],
            "merges_identical": True,
            "n_merges": len(merges_ref),
        }
    )


if __name__ == "__main__":
    main()
