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
    samples pushed the JSON line past that window, and by r09 the fixed
    format had <100 chars of worst-case headroom left (VERDICT r09 #4).
    Since r10 bench._compact_payload GUARANTEES the line serializes within
    its 1800-char budget (>= 200 chars under the capture) by eliding the
    fastest per-query entries when needed — the sidecar stays complete.
    Pin both halves: at the CURRENT bench set with realistic worst-case
    widths nothing elides, and the guard actually trims a pathological
    set to budget."""
    import bench

    names = sorted(n for n, q in load_all().items() if q.bench)
    # realistic worst case: every query at 999.99 s (a query past ~17 min
    # would have DNF'd the round long before the payload mattered)
    payload, elided = bench._compact_payload(
        {n: 999.99 for n in names}, len(names), 0.001, "f" * 12, {}
    )
    line = json.dumps(payload, separators=(",", ":"))
    assert len(line) <= 1800, f"guard failed: {len(line)} chars"
    assert not elided, (
        f"current bench set elides {len(elided)} entries at worst-case "
        "widths — the per-query map no longer fits; trim the bench set "
        "or raise the driver-side capture budget deliberately"
    )

    # pathological set: 400 long-named queries must still fit the budget
    big = {f"synthetic_query_with_a_long_name_{i:03d}": 9999.99 for i in range(400)}
    payload, elided = bench._compact_payload(big, 400, 0.1, "f" * 12, {})
    line = json.dumps(payload, separators=(",", ":"))
    assert len(line) <= 1800, f"guard failed on big set: {len(line)} chars"
    assert payload["queries_elided"] == len(elided) > 0
    # 'value' stays the exact sum of the ROUNDED entries (ADVICE r09):
    # internally consistent stdout, no reconciliation drift
    assert payload["value"] == round(sum(9999.99 for _ in big), 2)
    # ...and under elision the line stays SELF-consistent (ADVICE r10):
    # value == sum of the surviving entries + the elided entries' total
    assert payload["value"] == round(
        sum(payload["queries"].values()) + payload["elided_total"], 2
    )


def test_bench_stdout_value_is_sum_of_rounded_queries():
    """ADVICE r09 bench.py finding: 'value' used to be the full-precision
    sum while 'queries' carried 2-decimal values, so the two could drift
    by ~0.005*n for any consumer reconciling them. Now value == the exact
    sum of the emitted per-query values."""
    import bench

    times = {"a": 1.004, "b": 2.006, "c": 0.333}
    payload, elided = bench._compact_payload(times, 3, 0.1, "f" * 12, {})
    assert not elided
    assert payload["value"] == round(sum(payload["queries"].values()), 2)
