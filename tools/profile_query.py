"""cProfile one registered query's fn-construction + collect in a fresh
JVM; print the top driver-time sinks and the construct/execute split.

    python tools/profile_query.py <query> [ncalls]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpu_mapreduce_spark.registry import load_all
from gpu_mapreduce_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    ncalls = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_query")
    spark.range(1000).count()
    qs = load_all()
    fn = qs[name].fn
    fn(spark, sf_dir).collect()  # warm-up (memoized artifacts, JIT)

    def jobs() -> int:
        return spark._jsc.sc().statusStore().jobsList(None).size()

    for _ in range(ncalls):
        j0 = jobs()
        pr = cProfile.Profile()
        pr.enable()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        rows = df.collect()
        t2 = time.perf_counter()
        pr.disable()
        print(
            f"# {name}: construct {t1 - t0:.3f}s execute {t2 - t1:.3f}s"
            f" rows={len(rows)} jobs={jobs() - j0}",
            file=sys.stderr,
        )
        buf = io.StringIO()
        st = pstats.Stats(pr, stream=buf).sort_stats("cumulative")
        st.print_stats(30)
        print(buf.getvalue())


if __name__ == "__main__":
    main()
