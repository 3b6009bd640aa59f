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


def test_bench_stdout_line_fits_driver_tail_capture():
    """The round driver parses only the TAIL (~2000 chars) of bench.py's
    stdout; BENCH_r06.json lost every per-query timing when inlined
    samples pushed the JSON line past that window. Guard the budget with
    the real bench-query names at worst-case field widths so a payload
    regression fails HERE, not in the next round's artifact."""
    bench = sorted(n for n, q in load_all().items() if q.bench)
    payload = {
        "metric": "headline_queries_total",
        "value": 9999.999,
        # stdout carries 2-decimal per-query values since r09 (bench.py
        # rounds; full precision lives in the telemetry sidecar)
        "queries": {n: 9999.99 for n in bench},
        "unit": "sec",
        "queries_ok": len(bench),
        "queries_total": len(bench),
        "sf": 0.001,
        "run_id": "f" * 12,
    }
    line = json.dumps(payload, separators=(",", ":"))
    assert len(line) < 1800, (
        f"bench stdout line would be {len(line)} chars at {len(bench)} "
        "queries — within 200 of the driver's ~2000-char tail capture; "
        "shrink the payload or move fields to BENCH_TELEMETRY.json"
    )
