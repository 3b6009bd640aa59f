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
    # realistic worst case: every query at 99.99 s (5-char width). The
    # previous 999.99-s pin stopped being "realistic" at 66 benched
    # queries (r13): a SET averaging even 100 s/query is a 2-hour bench
    # the round driver would have killed long before the payload
    # mattered, and the elision guard exists precisely for such a
    # pathology — pinned separately below. Single outliers at 3-digit
    # seconds still fit: elision trims fastest-first, so slow entries
    # (the regression signal) always survive on the line.
    payload, elided = bench._compact_payload(
        {n: 99.99 for n in names}, len(names), 0.001, "f" * 12, {}
    )
    line = json.dumps(payload, separators=(",", ":"))
    assert len(line) <= 1800, f"guard failed: {len(line)} chars"
    assert not elided, (
        f"current bench set elides {len(elided)} entries at realistic "
        "worst-case widths — the per-query map no longer fits; trim the "
        "bench set or raise the driver-side capture budget deliberately"
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


def test_bench_adjudicated_view_shape():
    """r13 (VERDICT r12 advisory #1): when the end-of-run rebench ran,
    the artifact also publishes the headline view with isolated mins
    substituted — `adj` + `value_adj` on the stdout line, the full
    `queries_adjudicated` map destined for the sidecar. Rules pinned:
    a rebench min only ever LOWERS an entry (isolated re-runs adjudicate
    load, they never flatter a regression), non-suspects pass through
    untouched, and value_adj reconciles with queries+adj exactly."""
    import bench

    times = {"q_slow": 1.84, "q_fine": 0.70, "q_worse": 1.00}
    rebench = {
        "q_slow": {"min": 0.613, "samples": [0.656, 0.613], "rows": 6},
        # an isolated run SLOWER than in-run must not substitute
        "q_worse": {"min": 1.50, "samples": [1.50, 1.61], "rows": 1},
        # rebench of something not in the run is ignored
        "q_ghost": {"min": 0.1, "samples": [0.1], "rows": 0},
    }
    adjudicated, subs = bench._adjudicated(times, rebench)
    assert adjudicated == {"q_slow": 0.613, "q_fine": 0.70, "q_worse": 1.00}
    assert subs == {"q_slow": 0.613}

    payload, elided = bench._compact_payload(
        times, 3, 0.1, "f" * 12, {}, rebenched=len(rebench), adj=subs
    )
    assert not elided
    assert payload["adj"] == {"q_slow": 0.61}
    assert payload["value_adj"] == round(
        sum({**payload["queries"], **payload["adj"]}.values()), 2
    )
    # no rebench -> no adjudicated keys at all (the common case stays
    # byte-identical to the pre-r13 line)
    p2, _ = bench._compact_payload(times, 3, 0.1, "f" * 12, {})
    assert "adj" not in p2 and "value_adj" not in p2
