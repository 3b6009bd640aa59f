"""Mergeable Misra-Gries heavy-hitters summary (r13 landing of the
SCALE.md r14 misra_gries_topk draft, landed in-round) — the
frequency-sketch DUAL of the CMS tier: count-min answers point queries
about keys you already hold; this SURFACES the heavy keys themselves,
with deterministic lower-bound counters, without ever running the
exact corpus-wide group-by to completion.

Order-free bulk semantics (classic streaming MG is order-dependent and
therefore not gateable; the canonical bulk form is): per slice, take
the exact per-key counts, rank by the TOTAL ORDER (count DESC, key
ASC), keep the first MG_K keys, and subtract the (MG_K+1)-th count d
from every kept counter (d = 0 when fewer than MG_K+1 keys exist);
err = d. This satisfies the MG law exactly: for kept keys
count_lo <= true and true - count_lo <= err; for dropped keys
true <= err. MERGE (Agarwal, Cormode, Huang, Phillips, Wei, Yi,
"Mergeable Summaries", PODS 2012): counters add keyed (missing = 0),
re-truncate by the same rule with decrement d', err adds plus d'. The
fold over the S = 4 hash slices uses the canonical pair tree (the
qsketch fold-order discipline). Every step is integer arithmetic over
a written-down total order, so the SUMMARY STATES — per-slice and
final — go through the hash gate; the sandwich law is pinned against
exact counts in tests/test_misra_gries.py, outside the gate.

Key = user_id over events (hundreds-to-thousands of distinct keys at
the fixture — enough that a k = 8 summary genuinely truncates at every
scale); slices by hash60('mg|' || event_id) % S (layout-agnostic — the
qsketch_rollup lesson: fixture ids correlate with every arithmetic
split).

Plan shape: per-key counts are ONE map-side-combinable aggregate; the
per-slice top-(k+1) runs as the TWO-PHASE distributed top-n (per
(input-partition, slice) candidates first — a slice-only window would
funnel each slice's whole key set through one task at billion-key
scale; the decayed_sample lesson applied verbatim), and only
S * (k+1) rows ever reach the driver. 100 TB: that IS the pitch —
summaries of k+1 rows per slice fold in kilobytes while the exact
group-by (the thing this replaces) would shuffle every key.

Output (sec, a, b): ('p{{j}}', key, count_lo) per slice, ('perr', j,
err_j), ('final', key, count_lo), ('err', -1, err_final).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_mapreduce_spark.functions.portable import hash60
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

MG_K = 8  # counters per summary
S = 4  # hash slices


def mg_truncate(counts: dict[int, int], k: int = MG_K) -> tuple[dict[int, int], int]:
    """The bulk truncation convention: keep the k largest by
    (count DESC, key ASC), subtract the (k+1)-th count from each kept
    counter. Returns (counters, decrement)."""
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    d = ranked[k][1] if len(ranked) > k else 0
    return {key: c - d for key, c in ranked[:k]}, d


def mg_merge(
    a: tuple[dict[int, int], int], b: tuple[dict[int, int], int], k: int = MG_K
) -> tuple[dict[int, int], int]:
    """Mergeable-summaries merge: keyed counter add, re-truncate, errs
    add plus the new decrement."""
    ca, ea = a
    cb, eb = b
    summed = {key: ca.get(key, 0) + cb.get(key, 0) for key in {*ca, *cb}}
    out, d = mg_truncate(summed, k)
    return out, ea + eb + d


def mg_fold(parts: list[tuple[dict[int, int], int]]) -> tuple[dict[int, int], int]:
    """Canonical pair-tree fold (the qsketch fold-order discipline)."""
    layer = list(parts)
    if not layer:
        raise ValueError("mg_fold of an empty summary list")
    while len(layer) > 1:
        nxt = [
            mg_merge(layer[j], layer[j + 1])
            for j in range(0, len(layer) - 1, 2)
        ]
        if len(layer) % 2:
            nxt.append(layer[-1])
        layer = nxt
    return layer[0]


_HS = (
    "('0x' || substr(md5('mg|' || CAST(event_id AS VARCHAR)), 1, 15))"
    f"::BIGINT % {S}"
)


def _merge_cte(tag: str, left: str, right: str) -> str:
    """One oracle merge: keyed add of two summary CTEs (key, c) with
    errs (e), re-truncation by the shared total order. Emits
    {tag}sum/{tag}rk/{tag}d/{tag} (counters) and {tag}e (error)."""
    return f"""{tag}sum AS MATERIALIZED (
            SELECT COALESCE(l.key, r.key) AS key,
                   COALESCE(l.c, 0) + COALESCE(r.c, 0) AS c
            FROM {left} l FULL OUTER JOIN {right} r ON l.key = r.key
        ),
        {tag}rk AS MATERIALIZED (
            SELECT key, c,
                   row_number() OVER (ORDER BY c DESC, key) AS rn
            FROM {tag}sum
        ),
        {tag}d AS (
            SELECT COALESCE(MAX(c) FILTER (WHERE rn = {MG_K + 1}), 0) AS d
            FROM {tag}rk
        ),
        {tag} AS MATERIALIZED (
            SELECT key, c - (SELECT d FROM {tag}d) AS c
            FROM {tag}rk WHERE rn <= {MG_K}
        ),
        {tag}e AS (
            SELECT (SELECT e FROM {left}e) + (SELECT e FROM {right}e)
                   + (SELECT d FROM {tag}d) AS e
        )"""


def _oracle_sql() -> str:
    ctes = [
        f"""cnts AS MATERIALIZED (
            SELECT {_HS} AS sl, user_id AS key,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        )"""
    ]
    for j in range(S):
        ctes.append(
            f"""p{j}rk AS MATERIALIZED (
            SELECT key, c, row_number() OVER (ORDER BY c DESC, key) AS rn
            FROM cnts WHERE sl = {j}
        ),
        p{j}d AS (
            SELECT COALESCE(MAX(c) FILTER (WHERE rn = {MG_K + 1}), 0) AS d
            FROM p{j}rk
        ),
        p{j} AS MATERIALIZED (
            SELECT key, c - (SELECT d FROM p{j}d) AS c
            FROM p{j}rk WHERE rn <= {MG_K}
        ),
        p{j}e AS (SELECT (SELECT d FROM p{j}d) AS e)"""
        )
    # canonical pair tree over 4 slices: (0,1) (2,3) then the root
    ctes.append(_merge_cte("m01", "p0", "p1"))
    ctes.append(_merge_cte("m23", "p2", "p3"))
    ctes.append(_merge_cte("fin", "m01", "m23"))
    body = ",\n        ".join(ctes)
    sec_rows = "\n            UNION ALL ".join(
        f"SELECT 'p{j}' AS sec, key AS a, c AS b FROM p{j}" for j in range(S)
    )
    perr_rows = "\n            UNION ALL ".join(
        f"SELECT 'perr', CAST({j} AS BIGINT), (SELECT e FROM p{j}e)"
        for j in range(S)
    )
    return f"""
        WITH {body}
        SELECT sec, a, b FROM (
            {sec_rows}
            UNION ALL {perr_rows}
            UNION ALL SELECT 'final', key, c FROM fin
            UNION ALL SELECT 'err', CAST(-1 AS BIGINT),
                      (SELECT e FROM fine)
        ) ORDER BY sec, a, b
    """


@register(
    "misra_gries_topk",
    tags=("llm", "sketch", "events"),
    oracle=_oracle_sql(),
)
def misra_gries_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-slice Misra-Gries summaries over events.user_id plus their
    mergeable fold — states and error bounds all gate-hashed; see
    module docstring."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").alias("key")
    )
    sl = hash60(
        F.concat(F.lit("mg|"), F.col("event_id").cast("string"))
    ) % S
    cnts = (
        ev.select(sl.alias("sl"), "key")
        .groupBy("sl", "key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    # two-phase distributed top-(k+1) per slice (the decayed_sample
    # pattern: a slice-only window would funnel at billion-key scale)
    cand = (
        cnts.withColumn("pid", F.spark_partition_id())
        .withColumn(
            "prn",
            F.row_number().over(
                Window.partitionBy("pid", "sl").orderBy(
                    F.desc("c"), F.asc("key")
                )
            ),
        )
        .filter(F.col("prn") <= MG_K + 1)
        .drop("pid", "prn")
    )
    top = (
        cand.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("sl").orderBy(F.desc("c"), F.asc("key"))
            ),
        )
        .filter(F.col("rn") <= MG_K + 1)
    )
    rows = top.collect()  # bounded: S * (MG_K + 1)
    parts: list[tuple[dict[int, int], int]] = []
    for j in range(S):
        counts = {int(r.key): int(r.c) for r in rows if int(r.sl) == j}
        parts.append(mg_truncate(counts))
    final, err = mg_fold(parts)
    out = [
        (f"p{j}", key, c)
        for j, (cs, _e) in enumerate(parts)
        for key, c in cs.items()
    ]
    out += [("perr", j, e) for j, (_cs, e) in enumerate(parts)]
    out += [("final", key, c) for key, c in final.items()]
    out.append(("err", -1, err))
    return spark.createDataFrame(
        out, "sec string, a bigint, b bigint"
    ).orderBy("sec", "a", "b")
