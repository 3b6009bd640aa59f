"""Isolated per-query re-measurement — the adjudication step behind every
bench_compare flag (BASELINE.md "Measurement discipline").

bench.py times ~40 queries in one long-lived JVM; heap-regime carryover
and residual machine load can inflate individual entries 1.3-8x with the
plan unchanged (r05's split_contamination recorded 31 s against a 3.7 s
floor). Before believing — or re-anchoring on — any flagged number, run
the suspect FIRST in a fresh session here:

    python tools/rebench.py <query> [<query> ...]        # sf0.1
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/rebench.py q1

Per query: one untimed warm-up collect (absorbs session-memoized index /
checkpoint builds, exactly like bench.py), then 2 timed collects with a
full Python+JVM GC between samples. Prints one JSON object to stdout;
per-query progress to stderr. Run on an idle machine (check
/proc/loadavg first) and run suspects FIRST — a heap-blowing query
contaminates whatever runs after it even with explicit GC between.
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpu_mapreduce_spark.registry import load_all
from gpu_mapreduce_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("rebench")
    spark.range(1000).count()  # JVM spin-up outside any query's timing
    qs = load_all()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    out = {}
    for n in names:
        fn = qs[n].fn
        fn(spark, sf_dir).collect()  # warm-up
        samples = []
        for _ in range(2):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            samples.append(round(time.perf_counter() - t0, 3))
        out[n] = {"min": min(samples), "samples": samples, "rows": len(rows)}
        print(f"# {n}: {min(samples)}s samples={samples}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
