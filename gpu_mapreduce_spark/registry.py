"""Query registry: name -> (Spark query, DuckDB oracle SQL).

This is the single source of truth consumed by `__spark_entry__.py`
(driver contract), `tests/test_parity.py` (local oracle harness) and
`bench.py` (headline timing set).

Determinism rules every registered query follows (so the driver's
order-insensitive value-hash matches):
  - Every computed column is aliased identically in Spark and SQL.
  - DOUBLE aggregations are computed exactly via the fixed-point discipline in
    functions/numeric.py: per-row arithmetic in DOUBLE, FLOOR(x * 10000) to a
    BIGINT, exact integer sum, final divide-by-10000 back to DOUBLE. Averages
    divide that exact sum by the count. Never rely on float summation order.
  - LIMIT queries carry a total order (ties broken by key columns).
  - Timestamps are output as epoch milliseconds or DATE, never raw
    timestamp (engine formatting differs).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QueryDef] = {}


def register(
    name: str,
    *,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query {name!r}")
        QUERIES[name] = QueryDef(name, fn, oracle, bench, tags)
        return fn

    return deco


_loaded = False


def load_all() -> dict[str, QueryDef]:
    """Import every query-defining module exactly once and return the registry."""
    global _loaded
    if not _loaded:
        from gpu_mapreduce_spark.queries import (  # noqa: F401
            relational,
            core_ops,
            text,
            graph,
            graph_iter,
            rmat_gen,
            dedup,
            similarity,
            textstats,
            multimodal,
            streaming_batch,
            analytics,
            skew,
            # tail block stays LAST: queries registered here queue
            # behind the staleness window (SURVEY 2.6)
            embedding_io,
            packing,
            dedup_incremental,
            relational_r04,
            vocab,
            ingest_audit,
            ranking,
            kcore,
            pipeline_ops,
            formats,
            embedding_analytics,
            # r05 tail (behind the 20 never-checked late-r04 entries AND
            # ahead of nothing: never-green ties break by registration
            # order, so these take window slots only after every older
            # never-green query)
            training_sink,
            kcore_rmat,
            corpus_lm,
            mixture,
            ann_at_rest,
            semantic,
            decontam,
            sketches,
            chunking,
            quality_gate,
            funnel,
            collocations,
            label_prop,
            # r06 tail (same discipline: new modules at the END so they
            # take window slots only after every older never-green query)
            dedup_at_rest,
            sink_append,
            funnel_stream,
            ann_append,
            hll,
            bloom_decontam,
            sampling_pps,
            order_stats,
            # r08 tail (new modules at the END — the r06/r05 discipline)
            media_decode,
            ann_rerank,
            bpe,
            quality_classifier,
            # r09 tail (same discipline)
            bpe_encode,
            dedup_canonical,
            ivf_swap,
            # r09 tail, second wave (the SCALE.md r10 designs landed
            # early; still new-modules-at-the-END)
            ann_recall,
            tokenizer_swap,
            fertility,
            ann_pq,
            ann_ivfpq,
            dataset_split,
            manifest,
            ivfpq_append,
            modularity,
            stream_ingest,
            bm25,
            para_dedup,
            mrl_recall,
            compaction,
            nprobe_curve,
            # r10 tail (same discipline: new modules at the END)
            ktruss,
            hll_rollup,
            zorder,
            dup_span,
            betweenness,
            zorder_inc,
            msf,
            zorder_stream,
            dup_span_inc,
            # r11 tail (same discipline: new modules at the END)
            hist_rollup,
            dup_span_ingest,
            cms_rollup,
            hist_stream,
            hyperball,
            sessionize,
            # r12 tail (same discipline: new modules at the END)
            coloring,
            hyperball_harmonic,
            sessionize_stream,
            sessionize_inc,
            theta_ops,
            ppr,
            kmeanspp,
            forest_fire,
            anomaly,
            ann_filtered,
            theta_stream,
            # r13 tail (same discipline: new modules at the END)
            qsketch_merge,
            ann_pq_residual,
            sessionize_slab,
            cms_stream,
            decayed_sample,
            qsketch_rollup,
            qsketch_stream,
            misra_gries,
            theta_matrix,
            transitions,
            # r14 tail (same discipline: new modules at the END)
            drift_monitor,
            matching,
        )

        _loaded = True
    return QUERIES


def _last_green_rounds(root: "Path") -> dict[str, int]:
    """Last round each query had a fully-green row in a CORRECTNESS_r*.json.

    A row counts as green only if every match flag present is true and err is
    null — a failed or mismatched row keeps the query at the FRONT of the
    driver window so the failure stays visible until fixed.
    """
    import json
    import re

    last: dict[str, int] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.stem)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match", True)
                and row.get("schema_match", True)
                and row.get("hash_match", True)
                and row.get("err") is None
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


def driver_order(root: "Path | None" = None) -> list[str]:
    """Registry names ordered for the driver's capped correctness window.

    The round driver hash-checks only the FIRST ~50 entries of
    ``__spark_entry__.queries()``. With 91 registered queries, a fixed
    registration order leaves the tail permanently unverified (exactly what
    happened in r03: positions 51-91 — the whole dedup/ANN/textstats/
    multimodal/streaming/analytics/skew layer — never received a driver row).

    Rotation schedule (documented in SURVEY §2.6): order by STALENESS —
    queries never green in any committed CORRECTNESS_r*.json artifact first,
    then ascending by the last round they were green, ties broken by
    registration order. Self-maintaining: after each round's artifact is
    committed, the next round's window automatically picks up whatever was
    outside the previous window, so every query re-verifies at least every
    ``ceil(total / window)`` rounds with no per-round hand edits.
    """
    from pathlib import Path

    queries = load_all()
    if root is None:
        root = Path(__file__).resolve().parents[1]
    last = _last_green_rounds(root)
    reg_index = {n: i for i, n in enumerate(queries)}
    return sorted(queries, key=lambda n: (last.get(n, 0), reg_index[n]))
