"""Bench set <-> baseline consistency (no Spark session needed).

ADVICE r04 flagged baseline duplication as a drift risk; BASELINE_BENCH
.json is now the single machine-readable source. This pins the other
half of the contract: every bench=True registry entry has a baseline (a
new bench query without one silently escapes the 2x regression gate),
and no baseline is stale (a de-benched query's entry would make
bench_compare report a false 'missing' regression forever)."""

import json
from pathlib import Path

from gpu_mapreduce_spark.registry import load_all

_ROOT = Path(__file__).resolve().parents[1]


def test_every_bench_query_has_a_baseline_and_vice_versa():
    base = json.loads((_ROOT / "BASELINE_BENCH.json").read_text())[
        "baseline_sec"
    ]
    bench = {n for n, q in load_all().items() if q.bench}
    missing = bench - set(base)
    stale = set(base) - bench
    assert not missing, f"bench queries without a baseline: {sorted(missing)}"
    assert not stale, f"baselines for non-bench queries: {sorted(stale)}"
    assert all(
        isinstance(v, (int, float)) and v > 0 for v in base.values()
    ), "baselines must be positive seconds"
