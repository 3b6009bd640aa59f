"""Physical-plan audit over every registered query (SCALE.md "Global
posture"): the properties that make a plan survive a 100 TB scale-up are
checked mechanically, not by eyeball.

Forbidden in any query's executed plan:
  - CartesianProduct — an unkeyed all-pairs join is never acceptable; every
    candidate-pair operator here (dedup, ANN, triangles) is bucketed by
    construction.
  - BatchEvalPython — a row-at-a-time Python UDF in the hot path (the
    reference documents the per-element Python boundary as its own biggest
    overhead, doc/Technical.txt); only Arrow-batched forms are allowed
    (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas / ...InPandasWithState).
  - BroadcastNestedLoopJoin — allowed ONLY where the plan joins the 25-row
    nation table against itself (the fixture's deliberate inequality join
    building the 25-clique, fixtures.py edges_raw) or where a query is
    whitelisted below as a deliberate scan-and-score: one pass over the
    corpus against an explicitly broadcast, bounded probe side; anywhere
    else a BNLJ means a join lost its equi-key.

The audit plans (and, where query functions materialize fixtures, partially
executes) every registered query at sf0.001 in one session.
"""

from __future__ import annotations

import re

import pytest

from gpu_mapreduce_spark.registry import load_all

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = load_all()

# Deliberate broadcast scan-and-score plans: cost = |corpus| x |broadcast
# side|, with the broadcast side bounded by construction. The LSH/IVF-probe
# variants are the scale path; these are the exact baselines they are
# measured against (operators/similarity.py docstrings).
ALLOWED_BNLJ = {
    "ann_bruteforce_topk": "corpus x broadcast 8-row query set (exact baseline)",
    "ann_recall_report": "the evaluation's exact side IS the deliberate "
    "brute-force pass (corpus x broadcast bounded query set); the approx "
    "side stays directory-pruned",
    "ann_pq_topk": "the ADC serving scan: 8-int codes x broadcast bounded "
    "query-LUT set — the PQ analog of the brute-force scan-and-score, over "
    "a 32x smaller at-rest table",
    "ann_pq_recall": "composes ann_pq_topk's ADC scan AND the deliberate "
    "exact brute-force side of the evaluation",
    "mrl_truncation_recall": "both evaluation sides are the deliberate "
    "brute-force scan over the bounded query set (truncated-prefix vs "
    "full-dimension)",
    "ann_ivf_topk": "query set x broadcast centroid table (probe ranking; "
    "the cell assignment itself is a scan projection since r09)",
    # guarded: dup_pairs refuses corpora above DUP_PAIRS_MAX_ROWS (see
    # operators/similarity.py + tests/test_similarity.py guard test)
    "dedup_embedding": "O(n^2) exact near-dup baseline for dedup_embedding_lsh",
    # scalar-total attach with no natural equi-key (a literal key constant-
    # folds away): build side is the 1-row corpus total, probe side the
    # 32-row TakeOrdered output — 32 x 1 by construction
    "vocab_topk_coverage": "top-k (bounded) x broadcast 1-row corpus total",
    # 1-row-build scalar attaches whose downstream comparison is an
    # INEQUALITY, so (unlike q15, whose equality filter becomes the hash
    # key) the folded literal-key join stays nested-loop. Build side is one
    # row by construction -> the "nested loop" is a single comparison per
    # probe row, O(n) like a BroadcastHashJoin. q22 has the same shape and
    # passes only via the nation-substring clause below; listed here so the
    # sanction is explicit rather than accidental.
    "q11_important_stock": "per-part values x broadcast 1-row (total, count)",
    "q22_idle_customers": "customers x broadcast 1-row average balance",
    "tfidf_search_topk": "3-row term df x broadcast 1-row corpus count",
    "bm25_topk": "3-row term df x broadcast 1-row (n_docs, avgdl) constants "
    "(the tfidf literal-key shape)",
}

# Unpartitioned Window operators move ALL input rows to one task — the
# round-2 IVF centroid pick funneled the whole corpus that way. Allowed only
# where the window input is bounded by construction (a preceding limit).
ALLOWED_GLOBAL_WINDOW = {
    "ann_ivf_topk": "cid ranking over the n_centroids-row TakeOrdered output",
}

# A physical Window node prints `Window [exprs], [partitionSpec], [orderSpec]`
# — three bracket groups; with NO partition spec the middle group is absent,
# leaving two. (WindowGroupLimit nodes print differently and always carry
# their partition spec first.)
_GLOBAL_WINDOW_RE = re.compile(r"Window \[[^\n]*?\], \[[^\n]*?\]\s*$")
_PARTITIONED_WINDOW_RE = re.compile(r"Window \[[^\n]*?\], \[[^\n]*?\], \[[^\n]*?\]\s*$")


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted_plan(spark, df) -> str:
    """Formatted explain — the only mode that prints scan details
    (PushedFilters / PartitionFilters / ReadSchema)."""
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_plan_is_scale_safe(spark, name):
    plan = _plan_of(_QUERIES[name].fn(spark, SF_DIR))

    assert "CartesianProduct" not in plan, f"{name}: cartesian product:\n{plan}"
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF (use pandas_udf/mapInPandas):\n{plan}"
    )

    if name not in ALLOWED_GLOBAL_WINDOW:
        for line in plan.splitlines():
            s = line.strip()
            if "Window [" not in s or "WindowGroupLimit" in s:
                continue
            assert not (
                _GLOBAL_WINDOW_RE.search(s) and not _PARTITIONED_WINDOW_RE.search(s)
            ), (
                f"{name}: unpartitioned Window (single-task global sort of "
                f"its whole input):\n{s}\n{plan}"
            )

    if name in ALLOWED_BNLJ:
        return
    for m in re.finditer(r"BroadcastNestedLoopJoin[^\n]*", plan):
        # the only other sanctioned BNLJ is the nation-clique inequality
        # self-join the edges fixture builds (nation a x nation b ON
        # a.n_nationkey < b.n_nationkey): the join NODE ITSELF must carry
        # that inequality condition. (An earlier form of this clause only
        # looked for "nation" within +-4000 chars of the match — any plan
        # scanning a *_nationkey column passed, which silently sanctioned
        # unrelated BNLJs.)
        line = m.group(0)
        assert re.search(r"n_nationkey#\d+L? < n_nationkey#\d+", line), (
            f"{name}: BroadcastNestedLoopJoin that is not the nation-clique "
            f"inequality join:\n{line}\n{plan}"
        )


def test_ivf_at_rest_index_scan_prunes_cells(spark, tmp_path):
    """The persisted IVF index's probe must reach the scan as a partition
    filter on cid — only the probed cell directories are listed/opened
    (the layout claim ann_ivf_at_rest exists to prove)."""
    from gpu_mapreduce_spark.queries.ann_at_rest import ivf_at_rest_topk

    df = ivf_at_rest_topk(spark, SF_DIR, str(tmp_path / "ivf_idx"))
    plan = _formatted_plan(spark, df)
    m = re.search(r"PartitionFilters: \[([^\]]*cid[^\]]*)\]", plan)
    assert m, f"probe cid list not applied as a partition filter:\n{plan}"
    exec_plan = _plan_of(df)
    for bad in ("CartesianProduct", "BatchEvalPython"):
        assert bad not in exec_plan, f"{bad} in pre-checkpoint plan:\n{exec_plan}"


def test_ivf_swap_plan_never_touches_embedding(spark):
    """ivf_index_swap's lean-shape contract (SCALE.md r09 design 3 /
    VERDICT r08 item 5): the retrain-and-swap report reads only
    (vec_id, cid) back from the two at-rest roots — the embedding payload
    must appear NOWHERE in the plan (no scan column, no exchange), and
    every parquet read must prune to the bare vec_id (cid is the partition
    directory key)."""
    from gpu_mapreduce_spark.queries.ivf_swap import ivf_index_swap

    df = ivf_index_swap(spark, SF_DIR)
    plan = _plan_of(df)
    assert "embedding" not in plan, f"embedding leaked into the plan:\n{plan}"
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas and all(s == "struct<vec_id:bigint>" for s in schemas), (
        f"unpruned at-rest scan:\n{plan}"
    )


def test_pq_serving_scan_never_touches_embedding(spark):
    """ann_pq_topk's compression contract: past the one-time session-
    memoized build, the CORPUS side of the serving scan reads the codes
    table only (a checkpointed 8-int-per-vector scan — that the payload is
    32x out of the serving path is the entire point of PQ). The only
    parquet scan in the plan must be the QUERY side, pruned to the bounded
    query set by a pushed vec_id filter."""
    from gpu_mapreduce_spark.queries.ann_pq import ann_pq_topk
    from gpu_mapreduce_spark.queries.similarity import N_QUERIES

    df = ann_pq_topk(spark, SF_DIR)
    plan = _plan_of(df)
    scans = [ln for ln in plan.split("\n") if "FileScan parquet" in ln]
    assert len(scans) == 1, f"expected only the query-side scan:\n{plan}"
    assert f"LessThan(vec_id,{N_QUERIES})" in scans[0], (
        f"query-side scan not pruned to the bounded query set:\n{scans[0]}"
    )


def test_ivfpq_serving_plan_is_pruned_codes_only(spark):
    """ann_ivfpq_topk's serving contract: the only file scan in the plan is
    the codes-at-rest root, directory-pruned to the probed cells
    (PartitionFilters on cid) and reading codes — never the embedding
    (the probe list with its LUTs is a checkpointed bounded artifact, so
    the query-side embedding read isn't in the serving plan either)."""
    from gpu_mapreduce_spark.queries.ann_ivfpq import ann_ivfpq_topk

    df = ann_ivfpq_topk(spark, SF_DIR)
    plan = _plan_of(df)
    assert "embedding" not in plan, f"embedding leaked into the plan:\n{plan}"
    scans = [ln for ln in plan.split("\n") if "FileScan parquet" in ln]
    assert len(scans) == 1 and "ivfpq_at_rest_" in scans[0], (
        f"expected only the codes-root scan:\n{plan}"
    )
    assert re.search(r"PartitionFilters: \[[^\]]*cid", scans[0]), (
        f"codes scan not directory-pruned:\n{scans[0]}"
    )


def test_events_partitioned_scan_prunes_directories(spark, tmp_path):
    """The date-partitioned read-back must prune by directory: the one-week
    predicate shows up as PartitionFilters on the scan (only the matching
    day partitions are listed/opened), not as a post-scan filter."""
    from gpu_mapreduce_spark.queries.streaming_batch import partitioned_week_counts

    df = partitioned_week_counts(spark, SF_DIR, str(tmp_path / "bydate"))
    plan = _formatted_plan(spark, df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), (
        f"week predicate not applied as a partition filter:\n{plan}"
    )
    # the registered query checkpoints (its audited plan collapses to a
    # Scan ExistingRDD), so run the forbidden-node audit on the REAL
    # pre-checkpoint pipeline here
    exec_plan = _plan_of(df)
    for bad in ("CartesianProduct", "BatchEvalPython", "BroadcastNestedLoopJoin"):
        assert bad not in exec_plan, f"{bad} in pre-checkpoint plan:\n{exec_plan}"


def test_q15_scalar_subquery_is_broadcast_hash_join(spark):
    """q15's scalar-aggregate comparison must be a literal-key
    BroadcastHashJoin of the 1-row max — not a nested-loop cross join and
    not an unpartitioned Window over all suppliers (the two shapes the
    audit above forbids; this pins the POSITIVE claim in the docstring)."""
    plan = _plan_of(_QUERIES["q15_top_supplier"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q19_bounding_box_pushdown(spark):
    """q19's manually-pushed envelope must reach both parquet scans as
    PushedFilters: the brand IN-list + size bound on part, the quantity
    envelope on lineitem — the move that shrinks the scans before the
    exact disjunction runs on joined rows."""
    df = _QUERIES["q19_disjunctive_revenue"].fn(spark, SF_DIR)
    plan = _formatted_plan(spark, df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("p_brand" in p and "p_size" in p for p in pushed), plan
    assert any("l_quantity" in p for p in pushed), plan


def test_q6_pushdown_and_pruning(spark):
    """Q6 is the canonical scan-efficiency probe: all four predicates must
    reach the parquet reader as PushedFilters and the read schema must be
    pruned to exactly the 4 touched columns — a scan reading 11 columns for
    a 4-column query would be wrong at any scale."""
    df = _QUERIES["q6_forecast_revenue"].fn(spark, SF_DIR)
    plan = _formatted_plan(spark, df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, f"no PushedFilters in plan:\n{plan}"
    pushed = m.group(1)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"filter on {col} not pushed: [{pushed}]\n{plan}"
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, f"no ReadSchema in plan:\n{plan}"
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    }, f"scan not pruned to the touched columns: {sorted(read_cols)}"


def test_q9_like_pushdown(spark):
    """q9's substring predicate must reach the part scan as a
    StringContains pushed filter — the LIKE-pushdown class only this query
    exercises."""
    df = _QUERIES["q9_product_profit"].fn(spark, SF_DIR)
    plan = _formatted_plan(spark, df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("StringContains(p_name" in p for p in pushed), plan


def test_q21_pre_checkpoint_plan(spark):
    """q21 materializes its late-lines intermediate (the audited plan
    collapses that join to Scan ExistingRDD), so — like
    test_events_partitioned_scan_prunes_directories — run the
    forbidden-node audit on the REAL pre-checkpoint pipeline."""
    from gpu_mapreduce_spark.queries.relational import q21_waiting_supplier

    plan = _plan_of(q21_waiting_supplier(spark, SF_DIR, materialize=False))
    assert "ExistingRDD" not in plan, f"pre-checkpoint plan still collapsed:\n{plan}"
    for bad in ("CartesianProduct", "BatchEvalPython", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"{bad} in pre-checkpoint plan:\n{plan}"


def test_events_dpp_join_prunes_dynamically(spark, tmp_path):
    """The busiest-days join must reach the partitioned scan as a DYNAMIC
    partition-pruning filter (the day set only exists at runtime), not a
    full-scan + post-filter."""
    from gpu_mapreduce_spark.queries.formats import dpp_day_counts

    df = dpp_day_counts(spark, SF_DIR, str(tmp_path / "bydate"))
    plan = _formatted_plan(spark, df)
    assert "dynamicpruning" in plan.lower(), (
        f"no dynamic partition pruning on the date-partitioned scan:\n{plan}"
    )
    exec_plan = _plan_of(df)
    for bad in ("CartesianProduct", "BatchEvalPython", "BroadcastNestedLoopJoin"):
        assert bad not in exec_plan, f"{bad} in pre-checkpoint plan:\n{exec_plan}"
