"""Dump `.explain("formatted")` for registered queries to plans/<tag>/.

The optimization-round deliverable: plans/r14/<query>_before.txt and
_after.txt snapshots the judge checks plan claims against (guide §7.2).

Usage:
    python tools/plan_dump.py --tag=r14 --suffix=before [name ...]

Defaults to every bench=True query. Plans are captured at
$SPARK_GRAFT_SF_DIR (default sf0.1) under the same gpu_mapreduce_spark
session bench.py uses, so Exchange counts / join strategies match what
the bench actually runs (AQE initial plan: isFinalPlan=false — runtime
coalescing/skew splits land on top of this shape).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpu_mapreduce_spark.registry import load_all
from gpu_mapreduce_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    tag, suffix = "r14", "before"
    names: list[str] = []
    for a in args:
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
        elif a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_dump")
    qs = load_all()
    if not names:
        names = sorted(n for n, q in qs.items() if q.bench)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    for n in names:
        try:
            df = qs[n].fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record, keep dumping
            text = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{n}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"# {n}: {len(text)} chars -> {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
