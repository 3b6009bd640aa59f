"""Compare a bench.py JSON line against the operative per-query baseline.

Usage:
    python bench.py 2>/dev/null | python tools/bench_compare.py
    python tools/bench_compare.py < BENCH_rNN.json   # driver artifact shape too

Prints one row per benched query: measured seconds, baseline seconds, and
the ratio, flagging anything past the 2x regression bar (BASELINE.md
"Consolidated r04 bench-set baseline"). Queries whose baseline is an r04
local range compare against the range's upper end. A baselined query that
errored or vanished from the run counts as a regression — bench.py's
fault isolation must never read as a pass. (Corollary: artifacts recorded
BEFORE a query joined the bench set, e.g. BENCH_r03 vs the r04 baseline
table, flag those later additions as missing — the gate is for current
runs, strictness is the point.)
"""

from __future__ import annotations

import json
import sys

# Operative baselines: BENCH_r03 values where benched in r03, else the
# upper end of the r04 local steady-state range recorded in BASELINE.md.
BASELINE: dict[str, float] = {
    "luby_find": 5.8,
    "dedup_incremental": 5.1,
    "sssp": 2.423,
    "pagerank": 2.334,
    "kcore": 2.2,
    "kmeans_2d": 1.812,
    "dedup_minhash_lsh": 1.757,
    "cc_find_skew": 1.354,
    "q21_waiting_supplier": 1.3,
    "cc_find": 1.302,
    "q5_region_revenue": 1.199,
    "skew_join_salted": 1.134,
    "pipeline_clean_corpus": 1.012,
    "q3_top_orders": 0.875,
    "ann_bruteforce_topk": 0.752,
    "tfidf_search_topk": 0.7,
    "asof_join_events": 0.661,
    "q3_bucketed": 0.570,
    "tri_count": 0.516,
    "events_hopping": 0.5,
    "degree_stats": 0.490,
    "q1_pricing_summary": 0.416,
    "pii_redact": 0.3,
    "events_windowed": 0.289,
    "inverted_index": 0.284,
    "wordfreq_topk": 0.267,
    "textstats_tokens": 0.252,
    "intcount": 0.247,
    "q6_forecast_revenue": 0.196,
}


def main() -> None:
    raw = json.load(sys.stdin)
    # accept both bench.py stdout and the driver's BENCH_rNN.json wrapper
    # ("parsed" can be null when a round's bench run failed — fall back)
    payload = raw.get("parsed") or raw
    queries = payload.get("queries", {})
    errors = payload.get("errors") or {}
    if not queries and not errors:
        print("no queries map in input", file=sys.stderr)
        sys.exit(2)
    regressions = []
    print(f"{'query':32s} {'sec':>8s} {'base':>8s} {'ratio':>6s}")
    for name, sec in sorted(queries.items(), key=lambda kv: -kv[1]):
        base = BASELINE.get(name)
        if base is None:
            print(f"{name:32s} {sec:8.3f} {'new':>8s}")
            continue
        ratio = sec / base
        flag = "  <-- REGRESSION (>2x)" if ratio > 2.0 else ""
        if ratio > 2.0:
            regressions.append(name)
        print(f"{name:32s} {sec:8.3f} {base:8.3f} {ratio:6.2f}{flag}")
    # a baselined query that ERRORED or silently vanished from the run is
    # the worst regression there is — bench.py's per-query fault isolation
    # diverts failures to the 'errors' map, which must not read as a pass
    for name in sorted(set(BASELINE) - set(queries)):
        why = errors.get(name, "missing from run")
        print(f"{name:32s} {'--':>8s} {BASELINE[name]:8.3f}   FAIL  <-- {why}")
        regressions.append(name)
    total = payload.get("value")
    print(f"\ntotal: {total} s over {len(queries)} queries; "
          f"regressions past 2x (incl. errored/missing): "
          f"{regressions or 'none'}")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
