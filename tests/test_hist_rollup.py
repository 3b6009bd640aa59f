"""hist_quantile_rollup cross-checks.

The registration's hash gate proves the hourly→daily FOLD and the cut
arithmetic match the oracle; what the gate cannot say is that the marked
bin actually CONTAINS the exact quantile value — the histogram's
resolution claim. Pin that here against the suite's exact total-order
machinery (operators/prefix.global_ranks_and_count, the two-phase rank
global_rank_quantile_docs registers): for every (day, q) the exact
rank-ceil(q·n/10000) value under the (value, event_id) total order must
land inside [bin*W, (bin+1)*W) of the bin the rollup marked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators.prefix import global_ranks_and_count
from gpu_mapreduce_spark.queries.hist_rollup import (
    _Q_BP,
    _W,
    hist_quantile_rollup,
)
from gpu_mapreduce_spark.sources.tables import table
from tests.conftest import SF_DIR


def test_marked_bins_contain_exact_quantile_values(spark):
    rolled = hist_quantile_rollup(spark, SF_DIR).collect()
    # decode each row's q_sum back to the set of q_bp cut markers
    marked: dict[tuple[str, int], int] = {}  # (d, q_bp) -> bin
    days = set()
    for r in rolled:
        days.add(r.d)
        rest = r.q_sum
        for q in sorted(_Q_BP, reverse=True):
            if rest >= q:
                rest -= q
                marked[(r.d, q)] = r.bin
        assert rest == 0, f"q_sum {r.q_sum} is not a subset sum of {_Q_BP}"
    # every (day, q) pair is marked exactly once
    assert len(marked) == len(days) * len(_Q_BP)

    # exact ranks, three probe days (first/middle/last): the histogram's
    # marked bin must contain the exact rank-r value
    ev = table(spark, SF_DIR, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("d"), "value", "event_id"
    )
    for d in sorted(days)[:: max(1, (len(days) - 1) // 2)][:3]:
        day = ev.filter(F.col("d") == d).select("value", "event_id")
        ranked, n = global_ranks_and_count(day, ["value", "event_id"])
        for q in _Q_BP:
            r = (q * n + 9999) // 10000
            val = ranked.filter(F.col("rk") == r).collect()[0].value
            b = marked[(d, q)]
            assert b * _W <= val < (b + 1) * _W, (
                f"day {d} q {q}: exact rank-{r} value {val} outside marked"
                f" bin {b} [{b * _W}, {(b + 1) * _W})"
            )
