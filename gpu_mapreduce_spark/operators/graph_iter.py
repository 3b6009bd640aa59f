"""Iterative graph algorithms over the fixpoint driver (SURVEY.md §2.4):
connected components, SSSP, pagerank, Luby MIS.

Reference analogs:
  - cc_find   ≙ oink/cc_find.cpp:38-109 (zone merging until no zone changes;
               skew handled by splitting giant zones across procs :43-55)
  - cc_stats  ≙ oink/cc_stats.cpp:37-63
  - sssp      ≙ oink/sssp.cpp:49-180 (frontier relaxation via compress loops)
  - pagerank  ≙ oink/pagerank.cpp:35-64 — a STUB there (empty loop :54-56);
               implemented for real here
  - luby_find ≙ oink/luby_find.cpp:53-95

Determinism discipline: every algorithm is either integer-exact (sssp in
weight units, pagerank in fixed-point micro-units) or a pure min/label
computation, so results are bit-identical across engines and runs — the
requirement the driver's value-hash imposes, and the property the reference
only approximates with seeds (SURVEY.md §5).

Scale notes: per iteration each algorithm is one join of the vertex state
(labels/frontier/ranks) against the checkpointed arc list plus one
partially-aggregated groupBy. The vertex-state side is explicitly broadcast
by default: without the hint Spark broadcasts the ARC side (LogicalRDD
stats undercount it), rebuilding a |E|-row broadcast every round — measured
2-5 s/round at sf0.1 vs ~0.5 s with the state broadcast, and the arc list
never moves at all. When |V| itself outgrows broadcast range (billions of
vertices at 100 TB), pass ``broadcast_state=False`` together with
``arcs=prepare_arcs_bucketed(...)`` (pagerank:
``prepare_arcs_deg_bucketed``): the arc table is then a parquet table
BUCKETED BY src at rest, whose scan reports HashPartitioning(src) to the
planner, and the state side carries a SHUFFLE_HASH hint — so each round the
O(|V|) state shuffles to the arcs' bucketing while the O(|E|) arc side
never moves and nothing is broadcast. Both paths share the identical loop
and produce bit-identical results (tests/test_graph_algorithms.py runs
cc_find/pagerank/luby_find both ways and asserts the bucketed plan joins
without a broadcast and without an arc-side exchange). min/sum are
algebraic → map-side combine bounds hot vertices; the reference needed
hand-rolled zone splitting for exactly this (oink/cc_find.cpp:43-55). AQE
skew-join covers the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators.graph import bidirect
from gpu_mapreduce_spark.plans.iterate import (
    fixpoint_observed,
    iterate_n,
    unpersist_checkpoint,
)


def _ckpt_by_dst(df: DataFrame) -> DataFrame:
    """Materialize an arc table hash-partitioned by dst.

    Every iterative round here ends in groupBy(dst) over the
    state-join-arcs output. The broadcast join preserves the arc table's
    layout, so with arcs already partitioned by dst each map partition holds
    complete key groups and the partial aggregation collapses to its final
    ~|V| rows before the exchange — the shuffle ships |V| rows instead of
    partitions x |V| partial rows. (Catalyst can't *know* this layout —
    localCheckpoint erases outputPartitioning, so the exchange stays in the
    plan — but it ships almost nothing. Measured: pagerank 8->5.4s at sf0.1.)
    On a cluster this is 'bucket the arc table by dst at rest'."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism, "dst").localCheckpoint(
        eager=True
    )


def prepare_arcs(edges: DataFrame) -> DataFrame:
    """Bidirected, dst-partitioned, checkpointed arc table for cc/luby.
    Build once per (session, input) and pass to multiple calls via the
    `arcs=` kwarg — the cluster-scale analog is the bucketed-by-dst arc
    table derived once at rest (fixtures.derived memoizes this for the
    driver's one-session-many-queries round)."""
    return _ckpt_by_dst(bidirect(edges))


def prepare_warcs(warcs: DataFrame) -> DataFrame:
    """Dst-partitioned, checkpointed weighted arc table for sssp."""
    return _ckpt_by_dst(warcs)


def prepare_arcs_deg(edges: DataFrame) -> tuple[DataFrame, int]:
    """(arc ⋈ out-degree table, vertex count) for pagerank.

    The |V|-row degree table is checkpointed with its row count observed
    (r14): the previous `deg.count()` probe recomputed the whole
    bidirect + groupBy from the source a second time; now the degree
    aggregate runs once and the annotation join reads the materialized
    table."""
    arcs = bidirect(edges)
    obs = Observation()
    deg = (
        arcs.groupBy(F.col("src").alias("v"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n = int(obs.get["n"])
    arcs_deg = _ckpt_by_dst(
        arcs.join(deg, arcs.src == deg.v).select("src", "dst", "outdeg")
    )
    unpersist_checkpoint(deg)  # folded into arcs_deg; no later consumer
    return arcs_deg, n


_BUCKETED_ARCS: dict[tuple[str, str], DataFrame] = {}


def _bucketed_by_src(df: DataFrame, tag: str, nbuckets: int) -> DataFrame:
    """Write an arc-shaped table (src, dst, ...) as a parquet table BUCKETED
    BY src — the at-rest layout of the no-broadcast iterative path. The
    bucketed scan reports HashPartitioning(src, nbuckets), so a
    shuffle-hash state join needs no exchange on the arc side: per round
    only the O(|V|) state moves. Written once per (session, tag, input plan)
    into a temp warehouse dir (on a cluster: written once at ingest).

    The memo key AND the catalog table name both fold in the input's
    canonicalized-plan hash: `tag` alone is not an identity — two different
    edge sets (e.g. two sf dirs) passing the same tag in one session would
    otherwise silently share one bucketed table (and a name-only overwrite
    would flip earlier handles onto the later data)."""
    import hashlib
    import tempfile

    spark = df.sparkSession
    # Identity = 32-bit semanticHash (hash of the canonicalized plan TREE,
    # including in-memory relation data that no toString prints) PLUS a
    # 64-bit md5 of the canonicalized plan TEXT (scan paths, filters,
    # structure). Either alone under-keys: text misses LocalRelation data,
    # the bare 32-bit hash is birthday-collidable between two edge sets
    # sharing a tag — the silent-aliasing failure this key exists to
    # prevent (review note r05).
    canon = df._jdf.queryExecution().analyzed().canonicalized().toString()
    plan_id = (
        f"{df.semanticHash() & 0xFFFFFFFF:08x}"
        f"{hashlib.md5(canon.encode()).hexdigest()[:16]}"
    )
    tbl = f"arcs_by_src_{tag}_{nbuckets}_{plan_id}"
    key = (spark.sparkContext.applicationId, tbl)
    if key not in _BUCKETED_ARCS:
        path = tempfile.mkdtemp(prefix=f"{tbl}_")
        (
            df.write.format("parquet")
            .bucketBy(nbuckets, "src")
            .sortBy("src")
            .mode("overwrite")
            .option("path", f"{path}/{tbl}")
            .saveAsTable(tbl)
        )
        _BUCKETED_ARCS[key] = spark.table(tbl)
    return _BUCKETED_ARCS[key]


def prepare_arcs_bucketed(
    edges: DataFrame, tag: str, nbuckets: int = 16
) -> DataFrame:
    """Bidirected arc table bucketed by src at rest — the 100-TB dual of
    prepare_arcs, for cc_find/luby_find with ``broadcast_state=False``."""
    return _bucketed_by_src(bidirect(edges), tag, nbuckets)


def prepare_warcs_bucketed(
    warcs: DataFrame, tag: str, nbuckets: int = 16
) -> DataFrame:
    """Weighted arc table (src, dst, wu) bucketed by src at rest — the
    100-TB dual of prepare_warcs, for sssp/sssp_multi with
    ``broadcast_state=False``. `warcs` must already be bidirected
    (weighted_arcs output)."""
    return _bucketed_by_src(warcs, tag, nbuckets)


def prepare_arcs_deg_bucketed(
    edges: DataFrame, tag: str, nbuckets: int = 16
) -> tuple[DataFrame, int]:
    """(bucketed-by-src arc ⋈ out-degree table, vertex count) for pagerank
    with ``broadcast_state=False``."""
    arcs = bidirect(edges)
    # NOTE: deliberately NOT the prepare_arcs_deg checkpoint-and-observe
    # form — _bucketed_by_src memoizes on the canonicalized plan hash,
    # and a checkpointed deg (LogicalRDD with a fresh RDD id per call)
    # would miss the memo every run and rewrite the bucketed table (r14).
    deg = arcs.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    arcs_deg = _bucketed_by_src(
        arcs.join(deg, arcs.src == deg.v).select("src", "dst", "outdeg"),
        f"{tag}_deg",
        nbuckets,
    )
    return arcs_deg, deg.count()


def _state_side(df: DataFrame, broadcast_state: bool) -> DataFrame:
    """The vertex-state side of the per-round state ⋈ arcs join.

    broadcast_state=True: explicit broadcast — the measured-fastest plan
    while |V| fits executor memory (see module docstring). False: a
    SHUFFLE_HASH hint — the state shuffles to the arc table's partitioning
    and is hash-built per partition; pair with prepare_arcs_bucketed so the
    arc side is bucketed at rest and never moves. Never let the planner
    choose unhinted: LogicalRDD stats undercount the arc side and it would
    broadcast |E| rows every round."""
    return F.broadcast(df) if broadcast_state else df.hint("shuffle_hash")


def cc_find(
    edges: DataFrame,
    max_iter: int = 50,
    arcs: DataFrame | None = None,
    broadcast_state: bool = True,
) -> tuple[DataFrame, int]:
    """Connected components by synchronous min-label propagation: every
    vertex starts as its own zone (reduce_self_zone, oink/cc_find.cpp:133-138)
    and each round adopts the minimum label in its closed neighborhood, until
    no label changes (the reference's zone-reassignment loop :64-103).

    ``broadcast_state=False`` (with ``arcs=prepare_arcs_bucketed(...)``) is
    the beyond-broadcast-|V| path — see the module docstring.

    Returns ((v, zone) DataFrame, rounds run). zone = min vertex id of the
    component, matching the reference's winning-smaller-zone rule
    (reduce_zone_winner).
    """
    if arcs is None:
        arcs = prepare_arcs(edges)
    labels = (
        arcs.select(F.col("src").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("label"), F.lit(True).alias("changed"))
    )

    def step(lab: DataFrame) -> DataFrame:
        # every vertex appears as a dst (arcs are bidirected), so nbr_min
        # covers the whole vertex set and the merge join is inner; the
        # changed flag rides along for free, so convergence needs no
        # prev-vs-cur comparison join
        nbr_min = (
            arcs.join(
                _state_side(lab.select("v", "label"), broadcast_state),
                arcs.src == lab.v,
            )
            .groupBy(F.col("dst").alias("nv"))
            .agg(F.min("label").alias("ml"))
        )
        return lab.join(nbr_min, lab.v == nbr_min.nv).select(
            lab.v.alias("v"),
            F.least(F.col("label"), F.col("ml")).alias("label"),
            (F.col("ml") < F.col("label")).alias("changed"),
        )

    # convergence = zero changed labels, observed during the round's own
    # checkpoint materialization (fixpoint_observed: no probe job)
    fix, rounds = fixpoint_observed(
        labels,
        step,
        lambda: F.expr("count_if(changed)"),
        lambda n_changed: n_changed == 0,
        max_iter,
    )
    return fix.select("v", F.col("label").alias("zone")), rounds


def kcore(
    edges: DataFrame,
    k: int,
    max_iter: int = 50,
    arcs: DataFrame | None = None,
    broadcast_state: bool = True,
) -> tuple[DataFrame, int]:
    """K-core decomposition by synchronous peeling: repeatedly delete every
    vertex whose degree in the surviving induced subgraph is < k, until no
    vertex falls below k. The k-core is schedule-independent (deleting in
    any order reaches the same unique maximal subgraph), so the synchronous
    rounds here and the oracle's unrolled CTE chain agree exactly.

    Extends the reference's degree/cc toolkit (oink/degree.cpp +
    oink/cc_find.cpp's iterate-until-stable shape) with the subgraph-mining
    primitive neither ships; same per-round plan discipline as cc_find:
    state (the survivor set) is broadcast by default, or shuffle-hash
    against bucketed-at-rest arcs via ``broadcast_state=False`` when |V|
    outgrows broadcast range.

    Per round, exactly cc_find's shape: ONE state join against the arc
    table on src (arcs bidirected, so counting surviving IN-neighbors per
    dst equals the undirected induced degree), one partially-aggregated
    groupBy(dst), then the O(|V|) degree table semi-filtered back to
    survivors. The arc side carries a single src-keyed join — under the
    bucketed path it genuinely never moves (an earlier form semi-joined
    arcs on BOTH endpoints, whose dst-side join re-shuffled the whole
    O(|E|) arc table every round; tests/test_graph_algorithms.py now pins
    the no-arc-exchange property). A vertex whose surviving degree hits 0
    leaves the state silently; that never changes another survivor's
    degree (all its remaining edges pointed at already-deleted vertices),
    so `no deg < k row` is an exact fixpoint test.

    Returns ((v, core_deg) for vertices in the k-core, rounds run);
    core_deg is the vertex's degree inside the core-induced subgraph.
    """
    if arcs is None:
        arcs = prepare_arcs(edges)
    deg0 = arcs.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("core_deg")
    )

    def step(cur: DataFrame) -> DataFrame:
        surv = cur.filter(F.col("core_deg") >= k).select("v")
        s1 = _state_side(surv, broadcast_state)
        indeg = (
            arcs.join(s1, arcs.src == s1.v, "left_semi")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.count(F.lit(1)).alias("core_deg"))
        )
        # both sides here are O(|V|): the state side behaves exactly like
        # the arc join's state side (broadcast or shuffle-hash)
        s2 = _state_side(surv.select(F.col("v").alias("w")), broadcast_state)
        return indeg.join(s2, indeg.v == F.col("w"), "left_semi")

    # convergence = no surviving vertex below k, observed during the
    # round's checkpoint materialization (no probe job)
    fix, rounds = fixpoint_observed(
        deg0,
        step,
        lambda: F.expr(f"count_if(core_deg < {int(k)})"),
        lambda n_below: n_below == 0,
        max_iter,
    )
    return fix, rounds


def label_propagation(
    edges: DataFrame,
    rounds: int,
    arcs: DataFrame | None = None,
    broadcast_state: bool = True,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) for community
    detection — FIXED round count by design: synchronous LPA can oscillate
    on bipartite-ish structure, so the spec here is 'exactly R rounds'
    (iterate_n, the K-round Bellman-Ford discipline) and the oracle unrolls
    the same R stages; there is no convergence probe to disagree about.

    Every vertex starts as its own label; each round every vertex adopts
    the most frequent label among its neighbors, ties toward the SMALLEST
    label (deterministic; the same argmax-by-packed-struct trick as the
    IVF cell assignment). Extends the cc_find/kcore toolkit with the
    community primitive the reference lacks; per round the plan is
    cc_find's exact shape plus one aggregation: state ⋈ arcs on src
    (state broadcast or shuffle-hash vs bucketed arcs via
    ``broadcast_state``), a partially-aggregated groupBy(dst, label)
    count, then a groupBy(dst) struct-max — per-round shuffle volume is
    O(distinct (dst, neighbor-label) pairs) <= O(|E|), collapsing toward
    O(|V|) as communities coalesce.

    Returns (v, label) after exactly `rounds` rounds."""
    if arcs is None:
        arcs = prepare_arcs(edges)
    labels = (
        arcs.select(F.col("src").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("label"))
    )

    def step(lab: DataFrame) -> DataFrame:
        votes = (
            arcs.join(
                _state_side(lab.select("v", "label"), broadcast_state),
                arcs.src == lab.v,
            )
            .groupBy(F.col("dst").alias("nv"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # max of (cnt, -label): most frequent neighbor label, ties -> lowest
        return (
            votes.groupBy("nv")
            .agg(
                F.max(
                    F.struct(
                        F.col("cnt"), (-F.col("label")).alias("nl")
                    )
                ).alias("mx")
            )
            .select(F.col("nv").alias("v"), (-F.col("mx.nl")).alias("label"))
        )

    return iterate_n(labels, step, rounds)


def weighted_arcs(wedges: DataFrame) -> DataFrame:
    """Bidirect weighted canonical edges, carrying the edge weight both ways
    (oink/map_read_edge_weight.cpp shape + sssp's reorganize_edges,
    oink/sssp.cpp:187-199)."""
    return wedges.select("src", "dst", "wu").unionAll(
        wedges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "wu"
        )
    )


def sssp(
    warcs: DataFrame,
    source: int,
    max_iter: int = 50,
    arcs: DataFrame | None = None,
    broadcast_state: bool = True,
) -> tuple[DataFrame, int]:
    """Single-source shortest paths by frontier relaxation
    (oink/sssp.cpp:49-180: seed source, loop {push dist+weight to neighbors,
    keep per-vertex min, flag changed} until no distance changes).

    `warcs` must carry integer weight units in `wu` — distances stay
    integer-exact, so min-ties are impossible and results are bit-identical
    across engines (the reference compares doubles, :244-297; our fixture
    weights are k/97 so units = k loses nothing).

    Only the changed frontier is joined against the arc list each round —
    the reference's `mr_dist_changed` set — so per-round shuffle volume is
    O(frontier ⋈ arcs), not O(V ⋈ arcs). The frontier is usually tiny, but
    on a low-diameter graph the mid-BFS frontier is O(|V|): when |V|
    outgrows broadcast range pass ``broadcast_state=False`` together with
    ``arcs=prepare_warcs_bucketed(...)`` — the same beyond-broadcast path as
    cc_find/pagerank/luby_find/kcore (module docstring). Returns ((v, du)
    for *reached* vertices, rounds).
    """
    if arcs is None:
        arcs = prepare_warcs(warcs)
    spark = arcs.sparkSession
    dist0 = spark.createDataFrame(
        [(source, 0, True)], "v bigint, du bigint, changed boolean"
    )

    def step(state: DataFrame) -> DataFrame:
        frontier = state.filter("changed")
        cand = (
            arcs.join(_state_side(frontier, broadcast_state), frontier.v == arcs.src)
            .groupBy(F.col("dst").alias("cv"))
            .agg(F.min(F.col("du") + F.col("wu")).alias("nd"))
        )
        return state.join(cand, state.v == cand.cv, "full_outer").select(
            F.coalesce(state.v, F.col("cv")).alias("v"),
            F.least(state.du, F.col("nd")).alias("du"),
            F.coalesce(F.col("nd") < state.du, state.du.isNull()).alias("changed"),
        )

    fix, rounds = fixpoint_observed(
        dist0,
        step,
        lambda: F.expr("count_if(changed)"),
        lambda n_changed: n_changed == 0,
        max_iter,
    )
    return fix.select("v", "du"), rounds


def sssp_multi(
    warcs: DataFrame,
    sources: list[int],
    max_iter: int = 50,
    arcs: DataFrame | None = None,
    broadcast_state: bool = True,
) -> tuple[DataFrame, int]:
    """Multi-source shortest paths in ONE synchronous loop.

    The reference's sssp command relaxes its N requested sources
    SEQUENTIALLY — a per-source `for (cnt = 0; cnt < ncnt; ...)` driver loop
    re-running the whole BFS (oink/sssp.cpp:88-180). The Spark-first form
    keys the frontier by source `s`, so every source relaxes in the same
    rounds over the same arc scan: total rounds = MAX per-source rounds
    instead of their SUM, and each round's join amortizes the arc-table
    read across all sources. Same exact integer-unit discipline and
    ``broadcast_state=False`` beyond-broadcast path as sssp() — the keyed
    frontier is |sources| times bigger, so the broadcast ceiling arrives
    correspondingly sooner here. Returns ((s, v, du) for reached vertices,
    rounds)."""
    if arcs is None:
        arcs = prepare_warcs(warcs)
    spark = arcs.sparkSession
    dist0 = spark.createDataFrame(
        [(s, s, 0, True) for s in sources],
        "s bigint, v bigint, du bigint, changed boolean",
    )

    def step(state: DataFrame) -> DataFrame:
        frontier = state.filter("changed")
        cand = (
            arcs.join(_state_side(frontier, broadcast_state), frontier.v == arcs.src)
            .groupBy(F.col("s").alias("cs"), F.col("dst").alias("cv"))
            .agg(F.min(F.col("du") + F.col("wu")).alias("nd"))
        )
        return state.join(
            cand, (state.s == cand.cs) & (state.v == cand.cv), "full_outer"
        ).select(
            F.coalesce(state.s, F.col("cs")).alias("s"),
            F.coalesce(state.v, F.col("cv")).alias("v"),
            F.least(state.du, F.col("nd")).alias("du"),
            F.coalesce(F.col("nd") < state.du, state.du.isNull()).alias("changed"),
        )

    fix, rounds = fixpoint_observed(
        dist0,
        step,
        lambda: F.expr("count_if(changed)"),
        lambda n_changed: n_changed == 0,
        max_iter,
    )
    return fix.select("s", "v", "du"), rounds


PR_SCALE = 10**12  # pagerank fixed-point: 1.0 rank unit == 10^12


def pagerank(
    edges: DataFrame,
    num_iter: int = 10,
    alpha_num: int = 17,
    alpha_den: int = 20,
    arcs_deg_n: tuple[DataFrame, int] | None = None,
    broadcast_state: bool = True,
) -> DataFrame:
    """PageRank with damping alpha = alpha_num/alpha_den (default 0.85), run
    for a fixed number of synchronous iterations.

    The reference *declares* this command but its loop body is empty
    (oink/pagerank.cpp:54-56) — this is the one place we implement what it
    only stubs. Semantics chosen to be integer-exact: ranks live in
    PR_SCALE-units (BIGINT); each vertex contributes
    `(alpha_num * r) div (alpha_den * outdeg)` to every neighbor and every
    vertex receives teleport `(alpha_den - alpha_num) * PR_SCALE div
    (alpha_den * N)`. Integer sums are order-independent, so results are
    bit-identical across engines/partitionings — no float-summation drift.

    Undirected interpretation (each edge contributes both directions), so
    there are no dangling vertices. Output: (v, rank_units BIGINT,
    rank DOUBLE = units / PR_SCALE).
    """
    arcs_deg, n = (
        arcs_deg_n if arcs_deg_n is not None else prepare_arcs_deg(edges)
    )
    teleport = (alpha_den - alpha_num) * PR_SCALE // (alpha_den * n)
    ranks0 = (
        arcs_deg.select(F.col("src").alias("v"))
        .distinct()
        .select("v", F.lit(PR_SCALE // n).cast("bigint").alias("r"))
    )

    def step(ranks: DataFrame) -> DataFrame:
        # the graph is bidirected, so every vertex has >=1 in-arc and the
        # contribution aggregate already covers the whole vertex set — new
        # ranks come straight off it, no join back onto the old rank table
        return (
            arcs_deg.join(_state_side(ranks, broadcast_state), arcs_deg.src == ranks.v)
            .select(
                F.col("dst").alias("cv"),
                F.expr(f"({alpha_num} * r) div ({alpha_den} * outdeg)").alias("c"),
            )
            .groupBy("cv")
            .agg(F.sum("c").alias("csum"))
            .select(
                F.col("cv").alias("v"),
                (F.lit(teleport) + F.col("csum")).cast("bigint").alias("r"),
            )
        )

    # checkpoint every 3rd round: un-truncated lineage is one broadcast-join
    # + agg per round — cheap to replay, and fewer materializations wins
    # (measured best cadence at sf0.1: ce3 4.3s vs ce1 5.8s vs ce2 5.0s)
    out = iterate_n(ranks0, step, num_iter, checkpoint_every=3)
    return out.select(
        "v",
        F.col("r").alias("rank_units"),
        (F.col("r") / F.lit(float(PR_SCALE))).alias("rank"),
    )


def forest_fire_sample(
    edges: DataFrame,
    seeds: list[int],
    rounds: int = 4,
    t_num: int = 3,
    t_den: int = 10,
    broadcast_state: bool = True,
    arcs: DataFrame | None = None,
) -> DataFrame:
    """Deterministic forest-fire / snowball graph sampling (Leskovec &
    Faloutsos, "Sampling from Large Graphs", KDD 2006 — the forest-fire
    family, made hash-deterministic): from the seed set, `rounds` rounds
    of frontier expansion in which each candidate arc (src in frontier,
    dst not yet burned) SURVIVES iff

        hash60('ff{r}|src|dst') >> 7  <  T,  T = t_num * 2^53 div t_den

    — the uniform01 < p draw as one integer literal compare (the
    PPS/kmeanspp threshold discipline), so the sampled arc set is
    bit-identical across engines. A vertex burns ONCE (the no-revisit
    rule): dst already burned never re-enters, but parallel arcs into a
    newly-burned dst in the same round are all recorded — the sampled
    subgraph keeps its multi-attachment structure.

    Returns (r, src, dst) for every surviving arc, r = 1..rounds.
    Plan per round: ONE arcs ⋈ frontier join (broadcast-or-bucketed
    via `_state_side`; pair ``broadcast_state=False`` with
    ``prepare_arcs_bucketed``) + a left-anti join against the burned
    vertex state + the codegen hash filter; the burned/frontier states
    are O(|V|) rows, checkpointed per round. 100 TB: cost ∝ arcs
    TOUCHED by the fire, never |E| — the point of sampling before an
    expensive exact analysis of a hub neighborhood."""
    from gpu_mapreduce_spark.functions.portable import hash60

    if rounds < 1:
        raise ValueError(
            f"forest_fire_sample: rounds must be >= 1, got {rounds}"
        )
    if not seeds:
        raise ValueError("forest_fire_sample: empty seed set")
    if arcs is None:
        arcs = prepare_arcs(edges)
    spark = arcs.sparkSession
    # seed validation (r12 ADVICE, the personalized_pagerank loud-failure
    # discipline): a seed absent from the graph burns but never expands —
    # raise instead of silently sampling nothing from it. One bounded
    # isin-filtered distinct (<= |seeds| rows collected).
    present = {
        r.v
        for r in arcs.select(F.col("src").alias("v"))
        .where(F.col("v").isin(list(seeds)))
        .distinct()
        .collect()
    }
    missing = sorted(set(seeds) - present)
    if missing:
        raise ValueError(
            "forest_fire_sample: seed vertices absent from the graph's"
            f" source set (no arcs to expand): {missing}"
        )
    thresh = t_num * (1 << 53) // t_den
    burned = spark.createDataFrame(
        [(v,) for v in seeds], "v bigint"
    ).localCheckpoint(eager=True)
    frontier = burned
    sampled: list[DataFrame] = []
    for r in range(1, rounds + 1):
        fr = frontier.select(F.col("v").alias("fv"))
        cand = (
            arcs.join(_state_side(fr, broadcast_state), arcs.src == F.col("fv"))
            .select("src", "dst")
            .join(
                burned.select(F.col("v").alias("bv")),
                F.col("dst") == F.col("bv"),
                "left_anti",
            )
        )
        h = hash60(
            F.concat_ws(
                "|",
                F.lit(f"ff{r}"),
                F.col("src").cast("string"),
                F.col("dst").cast("string"),
            )
        )
        surv = (
            cand.filter(F.shiftrightunsigned(h, 7) < F.lit(thresh))
            .select(F.lit(r).cast("int").alias("r"), "src", "dst")
            .localCheckpoint(eager=True)
        )
        sampled.append(surv)
        new = surv.select(F.col("dst").alias("v")).distinct()
        burned = burned.unionAll(new).localCheckpoint(eager=True)
        frontier = new.localCheckpoint(eager=True)
    out = sampled[0]
    for s in sampled[1:]:
        out = out.unionAll(s)
    return out


def personalized_pagerank(
    edges: DataFrame,
    sources: list[int],
    num_iter: int = 10,
    alpha_num: int = 17,
    alpha_den: int = 20,
    arcs_deg_n: "tuple[DataFrame, int] | None" = None,
    broadcast_state: bool = True,
) -> DataFrame:
    """Personalized PageRank: the teleport mass lands ONLY on the source
    set instead of uniformly — the source-biased random-walk proximity
    score recommendation / neighborhood-expansion pipelines run (Page et
    al. 1999 §6 'personalized' vector; Jeh & Widom 2003). Same loop,
    same integer discipline as `pagerank` (ranks in PR_SCALE BIGINT
    units, contributions `(alpha_num * r) div (alpha_den * outdeg)`,
    order-independent integer sums): init r0 = PR_SCALE div |S| on each
    source and 0 elsewhere; each round every vertex receives its
    neighbor contributions, and sources additionally receive
    `(alpha_den - alpha_num) * PR_SCALE div (alpha_den * |S|)`.
    Floor-division remainders shed a few units of mass per round
    (identically on both engines — the pagerank convention, never
    redistributed). Undirected bidirected arcs → no dangling mass.

    The source membership test is a literal IN over the O(|S|) id list —
    broadcast-free; everything else is pagerank's plan, including the
    ``broadcast_state=False`` + ``prepare_arcs_deg_bucketed`` path.
    Output: (v, ppr_units BIGINT, ppr DOUBLE)."""
    if not sources:
        raise ValueError("personalized_pagerank: empty source set")
    arcs_deg, _n = (
        arcs_deg_n if arcs_deg_n is not None else prepare_arcs_deg(edges)
    )
    # source validation (r12 ADVICE): ranks init from arcs_deg's src set,
    # so a source with no edges would silently drop its share of the
    # initial mass AND the per-round teleport, skewing every score by a
    # constant factor. One bounded isin-filtered distinct at init
    # (<= |sources| rows collected) raises loudly instead.
    present = {
        r.v
        for r in arcs_deg.select(F.col("src").alias("v"))
        .where(F.col("v").isin(list(sources)))
        .distinct()
        .collect()
    }
    missing = sorted(set(sources) - present)
    if missing:
        raise ValueError(
            "personalized_pagerank: source vertices absent from the"
            f" graph's vertex set: {missing}"
        )
    ns = len(sources)
    teleport = (alpha_den - alpha_num) * PR_SCALE // (alpha_den * ns)
    is_src = F.col("v").isin(sources)
    ranks0 = (
        arcs_deg.select(F.col("src").alias("v"))
        .distinct()
        .select(
            "v",
            F.when(is_src, F.lit(PR_SCALE // ns))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("r"),
        )
    )

    def step(ranks: DataFrame) -> DataFrame:
        return (
            arcs_deg.join(
                _state_side(ranks, broadcast_state), arcs_deg.src == ranks.v
            )
            .select(
                F.col("dst").alias("cv"),
                F.expr(f"({alpha_num} * r) div ({alpha_den} * outdeg)").alias(
                    "c"
                ),
            )
            .groupBy("cv")
            .agg(F.sum("c").alias("csum"))
            .select(
                F.col("cv").alias("v"),
                (
                    F.when(F.col("cv").isin(sources), F.lit(teleport))
                    .otherwise(F.lit(0))
                    + F.col("csum")
                )
                .cast("bigint")
                .alias("r"),
            )
        )

    out = iterate_n(ranks0, step, num_iter, checkpoint_every=3)
    return out.select(
        "v",
        F.col("r").alias("ppr_units"),
        (F.col("r") / F.lit(float(PR_SCALE))).alias("ppr"),
    )


def luby_find(
    edges: DataFrame,
    seed: int = 12345,
    max_iter: int = 50,
    arcs: DataFrame | None = None,
    broadcast_state: bool = True,
) -> tuple[DataFrame, int]:
    """Luby's maximal independent set (oink/luby_find.cpp:53-95).

    Each round over the still-undecided subgraph: a vertex whose random
    priority is a strict minimum among its undecided neighbors joins the MIS
    (reduce_vert_winner :186); its neighbors drop out (reduce_vert_loser
    :238); repeat until no vertex is undecided. Expected O(log V) rounds.

    The reference's priorities come from per-proc drand48 (map_vert_random)
    — rerun- and layout-dependent. Ours are (md5-derived hash of (seed, v),
    v): pure, collision-free (the id tiebreak), so the MIS is a
    deterministic function of (graph, seed) — required for reproducible
    tests, same trade the rmat generator makes. The hash is the portable
    md5-hex-slice form (not xxhash64) so the DuckDB oracle can assign the
    IDENTICAL priorities and replay the rounds in SQL
    (queries/rmat_gen._luby_oracle).

    Returns ((v) MIS members, rounds)."""
    if arcs is None:
        arcs = prepare_arcs(edges)
    verts = arcs.select(F.col("src").alias("v")).distinct()
    # status: 'u' undecided / 'i' in MIS / 'o' out (a MIS neighbor)
    state0 = verts.select(
        "v",
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("v"))), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("pri"),
        F.lit("u").alias("status"),
    )

    def step(state: DataFrame) -> DataFrame:
        und = state.filter(F.col("status") == "u").select("v", "pri")
        us = und.select(F.col("v").alias("sv"), F.col("pri").alias("spri"))
        ud = und.select(F.col("v").alias("dv"))
        # arcs of the undecided-only subgraph, annotated with source priority
        uarcs = (
            arcs.join(_state_side(us, broadcast_state), arcs.src == F.col("sv"))
            .join(_state_side(ud, broadcast_state), arcs.dst == F.col("dv"))
            .select(F.col("dst").alias("v"), F.col("spri"), F.col("src").alias("sv"))
        )
        nbr_min = uarcs.groupBy("v").agg(
            F.min(F.struct("spri", "sv")).alias("mn")
        )
        # winner: strict (pri, v) minimum over closed undecided neighborhood
        # (isolated undecided vertices win immediately)
        winners = (
            und.join(nbr_min, "v", "left")
            .filter(
                F.col("mn").isNull()
                | (F.struct(F.col("pri").alias("spri"), F.col("v").alias("sv")) < F.col("mn"))
            )
            .select(F.col("v").alias("wv"))
        )
        # losers: undecided neighbors of a winner. Winners and losers are
        # DISJOINT (w wins => w < every undecided neighbor v; v losing to w
        # would need v < v's neighbors incl. w — contradiction), so both
        # decisions fuse into ONE decided table and the state update is a
        # single left join instead of two (one fewer join + broadcast per
        # round; on the scheduling-floor-bound small-graph rounds that is
        # the dominant cost).
        losers = (
            arcs.join(_state_side(winners, broadcast_state), arcs.src == F.col("wv"))
            .select(F.col("dst").alias("dv2"))
            .distinct()
        )
        decided = winners.select(
            F.col("wv").alias("dcv"), F.lit("i").alias("dstat")
        ).unionAll(losers.select(F.col("dv2").alias("dcv"), F.lit("o")))
        return state.join(decided, state.v == F.col("dcv"), "left").select(
            "v",
            "pri",
            F.when(F.col("status") != "u", F.col("status"))
            .otherwise(F.coalesce(F.col("dstat"), F.lit("u")))
            .alias("status"),
        )

    fix, rounds = fixpoint_observed(
        state0,
        step,
        lambda: F.expr("count_if(status = 'u')"),
        lambda n_undecided: n_undecided == 0,
        max_iter,
    )
    return fix.filter(F.col("status") == "i").select("v"), rounds


def cc_stats(cc: DataFrame) -> DataFrame:
    """Component-size histogram, largest first (oink/cc_stats.cpp:37-63:
    invert → count → invert → count → sort)."""
    sizes = cc.groupBy("zone").agg(F.count(F.lit(1)).alias("csize"))
    return (
        sizes.groupBy("csize")
        .agg(F.count(F.lit(1)).alias("ncomp"))
        .orderBy(F.desc("csize"))
    )


def ktruss_edges(
    edges: DataFrame, k: int, max_rounds: int = 50
) -> tuple[DataFrame, int]:
    """k-truss decomposition of one k (SCALE.md r10 design, staged ahead of
    its registration): iteratively remove every edge supported by fewer
    than k-2 triangles IN THE SURVIVING SUBGRAPH until a fixed point — the
    edge-granularity dual of kcore (an edge of trussness k lives in a
    subgraph where every edge closes >= k-2 triangles). Returns
    (survivors (src, dst, support), rounds) with `support` the edge's
    triangle count in the final subgraph.

    The peel is BATCHED (all under-supported edges drop at once — rounds
    are O(peeling depth), not O(E)) and each round reuses the suite's
    triangle machinery: the (initial-degree, id) orientation is computed
    ONCE (a fixed strict total order stays acyclic on every subgraph, so
    triangles are still enumerated exactly once per round), then per
    round one adjacency aggregate + graph.tri_find's wedge-intersection
    join (O(E^1.5) bounded work), one explode of each triangle into its
    three edges, one map-side-combined (src, dst) count, one
    keyed anti/semi filter. Per round ONE scalar (the surviving edge
    count) crosses the driver — the pagerank convergence discipline —
    and the surviving set is localCheckpoint'ed so lineage never stacks
    (the cc_find loop discipline). Requires k >= 3 (k-2 >= 1; below that
    every edge trivially survives and the loop would be the identity).

    The survivors carry the support computed in the CONVERGING round, not
    a fresh pass: at a fixed point keep == cur as edge sets, so the
    support computed on cur IS the final subgraph's support (VERDICT r09
    "what's wrong #3" — a recount would double the final-round bill, and
    the triangle recount is the dominant per-round cost at scale).

    Raises RuntimeError when max_rounds is exhausted before a fixed
    point: a truncated edge set is NOT a k-truss (edges may remain whose
    support the unfinished peel would still drop below k-2), and a
    rounds-count return cannot distinguish converged-on-the-last-round
    from truncated (ADVICE r09) — so non-convergence is loud, never a
    silently-wrong result.

    100 TB: per-round cost is dominated by the triangle recount, which is
    the known k-truss cost everywhere; the batched peel bounds rounds by
    the support-peeling depth (typically tens on power-law graphs), and
    each round's shuffles carry only (edge, count) pairs, never adjacency
    payloads."""
    if k < 3:
        raise ValueError(f"ktruss requires k >= 3, got {k}")
    from gpu_mapreduce_spark.operators import graph

    def edge_support(oriented: DataFrame) -> DataFrame:
        """Per-canonical-edge triangle count of the subgraph given as a
        FIXED-orientation (lo, hi) edge list: adjacency rebuild is ONE
        aggregate, then graph.tri_find's wedge-intersection machinery."""
        # deliberately NOT checkpointed: _adj_intersections references the
        # adjacency twice (probe + build), but recomputing the one
        # aggregate from the checkpointed oriented list twice is cheaper
        # than materializing it every round (A/B measured on the
        # registered R-MAT query: 4.7 s with the checkpoint, 4.2 without)
        adj = oriented.groupBy(F.col("lo").alias("v")).agg(
            F.collect_list("hi").alias("nbrs")
        )
        tris = graph.tri_find(adj=adj)
        return (
            tris.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("a").alias("src"), F.col("b").alias("dst")
                        ),
                        F.struct(
                            F.col("a").alias("src"), F.col("c").alias("dst")
                        ),
                        F.struct(
                            F.col("b").alias("src"), F.col("c").alias("dst")
                        ),
                    )
                ).alias("e")
            )
            .select("e.src", "e.dst")
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        )

    canon = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    # Orient ONCE by (initial degree, id): any strict total order on the
    # vertices is an acyclic orientation on EVERY subgraph, so each
    # surviving triangle is still enumerated exactly once per round —
    # only the work bound degrades (wedges bounded by initial, not
    # current, degree), while the per-round cost drops by the whole
    # degree-recompute + two annotation joins the old re-orientation paid
    # (measured 5.4-6.4 s -> see BASELINE.md on the registered query).
    obs0 = Observation()
    cur = (
        graph._orient(canon)
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_cur = obs0.get["n"]
    rounds = 0
    if n_cur == 0:
        return (
            cur.select(
                F.col("lo").alias("src"),
                F.col("hi").alias("dst"),
                F.lit(0).cast("bigint").alias("support"),
            ),
            rounds,
        )
    prev_ckpt = cur  # the checkpointed DF backing the current round
    for _ in range(max_rounds):
        rounds += 1
        supp = edge_support(cur)
        # keep carries the support column so the converged exit needs NO
        # extra triangle pass (see docstring: at a fixed point the support
        # computed on cur is the final subgraph's support). The surviving
        # edge count — the ONE driver scalar per round — is observed
        # during the checkpoint materialization itself (r14: the separate
        # keep.count() job re-scanned the checkpointed set every round).
        obs = Observation()
        keep = (
            cur.select(
                "lo",
                "hi",
                F.least("lo", "hi").alias("src"),
                F.greatest("lo", "hi").alias("dst"),
            )
            .join(supp, ["src", "dst"], "left")
            .select(
                "lo",
                "hi",
                "src",
                "dst",
                F.coalesce("support", F.lit(0))
                .cast("bigint")
                .alias("support"),
            )
            .filter(F.col("support") >= k - 2)
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_new = obs.get["n"]
        unpersist_checkpoint(prev_ckpt)  # superseded round snapshot
        prev_ckpt = keep
        if n_new == n_cur or n_new == 0:
            return keep.select("src", "dst", "support"), rounds
        cur = keep.select("lo", "hi")
        n_cur = n_new
    raise RuntimeError(
        f"ktruss_edges(k={k}): no fixed point within max_rounds="
        f"{max_rounds} ({n_cur} edges still unsettled) — a truncated set"
        " is not a k-truss, so it is never returned; raise max_rounds"
    )


BC_SCALE = 10**4  # betweenness fixed-point: 1.0 dependency unit == 10^4


def betweenness_sources(
    edges: DataFrame,
    sources: list[int],
    max_depth: int = 30,
    arcs: DataFrame | None = None,
    broadcast_state: bool = True,
) -> tuple[DataFrame, int]:
    """K-source partial betweenness centrality (Brandes 2001 restricted to
    a fixed source set — the standard estimator at scale; SCALE.md r11
    design 2, staged ahead of its registration).

    Forward phase: layer-synchronous unweighted BFS from ALL sources at
    once (the sssp_multi keyed-frontier discipline) carrying exact BIGINT
    shortest-path counts sigma — layer d+1's sigma is the sum of its
    layer-d predecessors' sigmas, and a vertex joins the tree at its
    first (= shortest) depth via an anti-join against the visited set.

    Backward phase: dependency accumulation one depth layer at a time,
    deepest first, in fixed-point units of BC_SCALE:

        delta_u = SUM over DAG edges u->w (dist_w = dist_u + 1) of
                  (sigma_u * (BC_SCALE + delta_w)) div sigma_w

    The floor division is applied per term, deterministically, so the
    registered quantity is this exact integer estimator (replayable
    verbatim by a SQL oracle), not an IEEE float; it understates the real
    dependency by < 1 unit (1e-4) per tree edge on the path. Endpoint
    convention: source layers (v == s) are excluded from the output, the
    Brandes standard.

    Returns ((v, bc_u) summed over sources for every vertex reached at
    depth >= 1 from any source, bc_u in BC_SCALE units, max BFS depth).
    Per round only (s, v, sigma/delta) BIGINT rows shuffle; the state
    side broadcasts while |frontier|·|sources| is bounded
    (``broadcast_state=False`` for the bucketed beyond-broadcast path,
    as in sssp_multi). Raises on max_depth exhaustion (a truncated BFS
    tree silently undercounts every dependency — the ktruss_edges
    discipline)."""
    if arcs is None:
        arcs = prepare_arcs(edges)
    spark = arcs.sparkSession
    layer0 = spark.createDataFrame(
        [(s, s, 1) for s in sources], "s bigint, v bigint, sigma bigint"
    ).localCheckpoint(eager=True)
    layers = [layer0]
    visited = layer0.select(
        F.col("s").alias("ts"), F.col("v").alias("tv")
    ).localCheckpoint(eager=True)
    depth = 0
    for _ in range(max_depth):
        cur = layers[-1]
        nxt = (
            arcs.join(_state_side(cur, broadcast_state), arcs.src == cur.v)
            .groupBy(F.col("s"), F.col("dst").alias("nv"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        obs = Observation()
        nxt = (
            nxt.join(
                visited,
                (nxt.s == F.col("ts")) & (nxt.nv == F.col("tv")),
                "left_anti",
            )
            .select("s", F.col("nv").alias("v"), "sigma")
            # frontier size observed during the checkpoint itself —
            # zero extra probe jobs (the fixpoint_observed discipline)
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        if obs.get["n"] == 0:
            break
        depth += 1
        layers.append(nxt)
        visited = visited.unionAll(
            nxt.select(F.col("s").alias("ts"), F.col("v").alias("tv"))
        ).localCheckpoint(eager=True)
    else:
        raise RuntimeError(
            f"betweenness_sources: BFS not exhausted within max_depth="
            f"{max_depth} — a truncated tree undercounts every dependency,"
            " so it is never returned; raise max_depth"
        )

    # backward: deepest layer has delta 0; each shallower layer folds its
    # successors' (sigma, delta) through the fixed-point dependency rule
    dd = layers[depth].select(
        "s", "v", "sigma", F.lit(0).cast("bigint").alias("delta")
    )
    parts = [] if depth == 0 else [dd]
    for d in range(depth - 1, -1, -1):
        wside = dd.select(
            F.col("s").alias("ws"),
            F.col("v").alias("wv"),
            F.col("sigma").alias("wsig"),
            F.col("delta").alias("wdelta"),
        )
        cand = arcs.join(
            _state_side(wside, broadcast_state), arcs.dst == F.col("wv")
        ).select(
            F.col("ws").alias("cs"),
            F.col("src").alias("cv"),
            "wsig",
            "wdelta",
        )
        uside = layers[d]
        contrib = (
            uside.join(
                cand,
                (uside.s == F.col("cs")) & (uside.v == F.col("cv")),
            )
            .groupBy(F.col("cs"), F.col("cv"))
            .agg(
                F.sum(
                    F.expr(f"(sigma * ({BC_SCALE} + wdelta)) div wsig")
                )
                .cast("bigint")
                .alias("nd")
            )
        )
        dd = (
            uside.join(
                contrib,
                (uside.s == F.col("cs")) & (uside.v == F.col("cv")),
                "left",
            )
            .select(
                uside.s,
                uside.v,
                "sigma",
                F.coalesce(F.col("nd"), F.lit(0))
                .cast("bigint")
                .alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
        if d >= 1:
            parts.append(dd)
    if not parts:
        empty = spark.createDataFrame([], "v bigint, bc_u bigint")
        return empty, depth
    allv = parts[0]
    for p in parts[1:]:
        allv = allv.unionAll(p)
    bc = (
        allv.groupBy("v")
        .agg(F.sum("delta").cast("bigint").alias("bc_u"))
        .orderBy("v")
    )
    return bc, depth


def boruvka_msf(
    wedges: DataFrame,
    max_rounds: int = 20,
    max_jumps: int = 30,
) -> tuple[DataFrame, int, int]:
    """Minimum spanning forest by Boruvka hooking (SCALE.md r11 design,
    staged r10) — THE shuffle-friendly MSF: per outer round every
    component picks its minimum incident edge under the strict total
    order (wu, src, dst), those edges join the forest, and components
    contract by pointer-jumping the resulting pseudo-forest.

    Determinism: the (wu, src, dst) order is a strict total order on
    edges even with duplicate weights, so the forest is UNIQUE — the
    hash-gate requirement. The per-component argmin is ONE packed-BIGINT
    min (wu * 2^40 + src * 2^20 + dst; valid while vertex ids < 2^20 and
    wu < 2^22 — raised loudly below), map-side combinable, the suite's
    packed-struct argmax discipline.

    Contraction: parent(c) = other endpoint's component of c's min edge;
    mutual pairs (p(p(c)) == c) break to the smaller id (the hooking
    roots); then pointer-jump p = p(p) until fixed — depth halves per
    jump, so jumps are O(log chain). Both loops cross the driver one
    scalar per round (the pagerank discipline) and raise on bound
    exhaustion rather than return a truncated forest (the
    ktruss/betweenness discipline).

    Returns ((src, dst, wu) forest edges canonical src < dst, outer
    rounds, max effective pointer jumps in any round) — the jump count
    lets a caller with an UNROLLED oracle assert its fixed jump depth
    actually covered this run (ADVICE r10: the operator's max_jumps
    admits depth 2^16 while msf_rmat's oracle unrolls 7 doublings; a
    deeper chain must fail loudly at the guard, not as an opaque row
    mismatch). 100 TB: per round the edge list joins the broadcast-sized
    component map twice (or shuffle-hash beyond broadcast range), the
    argmin is one aggregate to <= |components| rows, and the
    pointer-jump state is |components| rows shrinking geometrically."""
    V_SHIFT = 1 << 20
    bad = wedges.filter(
        (F.col("src") >= V_SHIFT)
        | (F.col("dst") >= V_SHIFT)
        | (F.col("wu") >= (1 << 22))
        | (F.col("src") < 0)
        | (F.col("dst") < 0)
        | (F.col("wu") < 0)
    )
    if not bad.isEmpty():
        raise ValueError(
            "boruvka_msf packing envelope: needs 0 <= src/dst < 2^20 and"
            " 0 <= wu < 2^22 (re-pack for bigger graphs)"
        )
    canon = (
        wedges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col("wu").cast("bigint").alias("wu"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("wu").alias("wu"))  # parallel edges: keep the lightest
        .localCheckpoint(eager=True)
    )
    spark = canon.sparkSession
    comp = (
        canon.select(F.col("src").alias("v"))
        .unionAll(canon.select(F.col("dst").alias("v")))
        .distinct()
        .select("v", F.col("v").alias("c"))
        .localCheckpoint(eager=True)
    )
    forest_parts: list[DataFrame] = []
    rounds = 0
    max_jumps_used = 0  # effective (moved > 0) jumps in the worst round
    for _ in range(max_rounds):
        cs = comp.select(F.col("v").alias("sv"), F.col("c").alias("cs"))
        cd = comp.select(F.col("v").alias("dv"), F.col("c").alias("cd"))
        ec = (
            canon.join(F.broadcast(cs), canon.src == F.col("sv"))
            .join(F.broadcast(cd), canon.dst == F.col("dv"))
            .filter(F.col("cs") != F.col("cd"))
            .select("src", "dst", "wu", "cs", "cd")
        )
        packed = (
            F.col("wu") * F.lit(1 << 40)
            + F.col("src") * F.lit(V_SHIFT)
            + F.col("dst")
        ).alias("pk")
        arcs2 = ec.select(F.col("cs").alias("mc"), F.col("cd").alias("oc"), packed).unionAll(
            ec.select(F.col("cd").alias("mc"), F.col("cs").alias("oc"), packed)
        )
        # per-component argmin edge in ONE map-side-combinable aggregate:
        # min packed key decodes to the edge, min_by carries the other
        # endpoint's component (pk is unique within a component — each
        # edge contributes its two directions to two DIFFERENT mc groups)
        obs = Observation()
        m = (
            arcs2.groupBy("mc")
            .agg(F.min("pk").alias("mpk"), F.min_by("oc", "pk").alias("oc"))
            # emptiness observed during the checkpoint — no probe job
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        if obs.get["n"] == 0:  # no cross-component edges anywhere: done
            break
        rounds += 1
        # decode with INTEGER division: `/` is DOUBLE division in Spark,
        # which loses bits for mpk >= 2^53 (wu >= 2^13 under the 40-bit
        # shift) and would silently corrupt src/wu INSIDE the documented
        # wu < 2^22 envelope (ADVICE r10, verified: wu=2^22-1 decoded to
        # wu+1 with src=0). `div` keeps the decode exact for all of it.
        forest_parts.append(
            m.select(
                (F.col("mpk") % V_SHIFT).alias("dst"),
                (F.expr(f"mpk div {V_SHIFT}") % V_SHIFT).alias("src"),
                F.expr(f"mpk div {1 << 40}").alias("wu"),
            )
            .select("src", "dst", "wu")
            .distinct()
        )
        # hooking: parent(c) = other endpoint's component of c's min edge;
        # mutual pairs break to the smaller id (the roots of this round)
        par = m.select(F.col("mc").alias("c"), F.col("oc").alias("p"))
        par = par.alias("a").join(
            par.select(F.col("c").alias("bc"), F.col("p").alias("bp")).alias(
                "b"
            ),
            (F.col("a.p") == F.col("bc")) & (F.col("bp") == F.col("a.c")),
            "left",
        ).select(
            F.col("a.c").alias("c"),
            F.when(
                F.col("bc").isNotNull() & (F.col("a.c") < F.col("a.p")),
                F.col("a.c"),
            )
            .otherwise(F.col("a.p"))
            .alias("p"),
        )
        # isolated components (no cross edge) point to themselves
        par = (
            comp.select(F.col("c").alias("ac"))
            .distinct()
            .join(par, F.col("ac") == par.c, "left")
            .select(
                F.col("ac").alias("c"),
                F.coalesce("p", F.col("ac")).alias("p"),
            )
            .localCheckpoint(eager=True)
        )
        # pointer-jump to the roots (depth halves per jump). Per jump the
        # plan is par ⋈ par — 2^j joins of the last CHECKPOINTED par, so
        # the lineage stays shallow while the loop runs few jumps; the
        # convergence probe rides the SAME aggregate action (moved count),
        # one driver scalar per jump, no per-jump checkpoint.
        for _j in range(max_jumps):
            nxt = par.select(F.col("c").alias("jc"), F.col("p").alias("jp"))
            par2 = par.join(F.broadcast(nxt), par.p == F.col("jc")).select(
                "c",
                F.col("jp").alias("p"),
                (F.col("jp") != F.col("p")).cast("int").alias("moved"),
            )
            moved = par2.agg(F.sum("moved")).collect()[0][0] or 0
            par = par2.select("c", "p")
            if moved == 0:
                break
            max_jumps_used = max(max_jumps_used, _j + 1)
        else:
            raise RuntimeError(
                f"boruvka_msf: pointer-jump not settled in {max_jumps}"
                " jumps; raise max_jumps"
            )
        par = par.localCheckpoint(eager=True)
        # relabel every vertex to its component's new root
        comp = (
            comp.join(
                F.broadcast(par.select(F.col("c").alias("rc"), "p")),
                comp.c == F.col("rc"),
            )
            .select("v", F.col("p").alias("c"))
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"boruvka_msf: not contracted within max_rounds={max_rounds};"
            " raise max_rounds"
        )
    if not forest_parts:
        return (
            spark.createDataFrame([], "src bigint, dst bigint, wu bigint"),
            rounds,
            max_jumps_used,
        )
    forest = forest_parts[0]
    for fpart in forest_parts[1:]:
        forest = forest.unionAll(fpart)
    return forest.distinct().orderBy("src", "dst"), rounds, max_jumps_used


def hyperball_registers(
    edges: DataFrame,
    max_rounds: int = 20,
) -> tuple[DataFrame, int]:
    """HyperBall register propagation (Boldi & Vigna, "In-Core
    Computation of Geometric Centralities with HyperBall", 2013; also
    HADI, Kang et al. 2011) — per-vertex HLL sketches of the growing
    reachability ball, the way neighborhood functions and distance
    distributions are computed at scale. Staged r11 for the SCALE.md r12
    hyperball_neighborhood registration (the betweenness_sources
    discipline: operator + model test first, wiring next round).

    State is the SPARSE register table (v, b, reg): the hll_rollup
    derivation applied to neighbor VERTEX IDS (portable hash60 of the id
    string; b = h mod 64, reg = rho) — absent buckets contribute nothing
    to a max fold, so sparsity is exact, and state is bounded by
    |V| * 64 rows regardless of graph size. Initialization: each vertex
    holds the one-element sketch of {itself}.

    Per round: reg'(v, b) = max(reg(v, b), max over in-neighbors u of
    reg(u, b)) — ONE arcs ⋈ state join plus a map-side-combinable max
    aggregate, register-wise max being exactly the mergeability law
    hll_merge_rollup proves through the hash gate. Edges are treated as
    undirected (both arc directions), matching the suite's graph tier.

    Fixed point: when no register changes, reg(v, ·) IS the HLL sketch
    of v's whole reachable set (max over a union = union of maxes —
    associativity), which tests/test_graph_algorithms.py pins against a
    brute-force per-vertex sketch on hand graphs. Convergence is probed
    with ONE driver scalar per round (sum of all registers: max-folds
    are monotone non-decreasing, so the sum is stationary iff the state
    is), and the loop RAISES on bound exhaustion rather than return a
    truncated ball (the ktruss/betweenness discipline).

    Returns (sparse (v, b, reg) registers at the fixed point, rounds
    actually propagated = the graph's effective diameter bound). 100 TB:
    per round one edge-list join against a state table of <= 64 rows per
    vertex, shuffling (v, b, reg) BIGINT triples only; no vertex ever
    materializes its ball — that is the entire point of the sketch."""
    arcs, state = _hyperball_init(edges)
    prev_sum = state.agg(F.sum("reg")).collect()[0][0] or 0
    rounds = 0
    for _ in range(max_rounds):
        folded = _hyperball_fold(arcs, state)
        # monotone max-fold: the register sum is stationary iff the
        # whole state is — one scalar crosses the driver per round
        cur_sum = folded.agg(F.sum("reg")).collect()[0][0] or 0
        if cur_sum == prev_sum:
            return folded, rounds
        state, prev_sum = folded, cur_sum
        rounds += 1
    raise RuntimeError(
        f"hyperball_registers: not converged within max_rounds="
        f"{max_rounds}; raise max_rounds (ball still growing)"
    )


def _hyperball_init(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(bidirected arcs, round-0 state): each vertex's one-element sketch
    of {itself} — hll_rollup's register geometry (portable hash60, m=64,
    rho_max=55) applied to the vertex id string."""
    from gpu_mapreduce_spark.functions.portable import hash60

    m, rho_max = 64, 55  # queries/hll.py's register geometry
    arcs = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    verts = arcs.select(F.col("src").alias("v")).distinct()
    h = hash60(F.col("v").cast("string"))
    tail = F.shiftrightunsigned(h, 6)
    state = verts.select(
        "v",
        (h % m).cast("bigint").alias("b"),
        F.when(tail == 0, rho_max)
        .otherwise(rho_max - F.length(F.bin(tail)))
        .cast("bigint")
        .alias("reg"),
    ).localCheckpoint(eager=True)
    return arcs, state


def _hyperball_fold(arcs: DataFrame, state: DataFrame) -> DataFrame:
    """One propagation round: reg'(v, b) = max(own, neighbors) — one
    arcs ⋈ state join + a map-side-combinable max, checkpointed."""
    nbr = arcs.join(state, arcs.dst == state.v).select(
        F.col("src").alias("v"), "b", "reg"
    )
    return (
        state.unionAll(nbr)
        .groupBy("v", "b")
        .agg(F.max("reg").alias("reg"))
        .localCheckpoint(eager=True)
    )


def hyperball_rounds(edges: DataFrame, n_rounds: int) -> list[DataFrame]:
    """Exactly n_rounds HyperBall folds, returning EVERY intermediate
    state [round 0 .. round n_rounds] — the distance-resolved form the
    neighborhood-function registration needs (on an undirected graph the
    FIXED POINT is per-component constant; the per-round states are
    where |ball(v, r)| lives). Each state is checkpointed; no
    convergence probe — the round count is the caller's contract with
    its unrolled oracle."""
    arcs, state = _hyperball_init(edges)
    states = [state]
    for _ in range(n_rounds):
        state = _hyperball_fold(arcs, state)
        states.append(state)
    return states


def jp_coloring(
    edges: DataFrame,
    seed: int = 0,
    max_rounds: int = 60,
    arcs: DataFrame | None = None,
    broadcast_state: bool = True,
) -> tuple[DataFrame, int]:
    """Jones-Plassmann greedy graph coloring (Jones & Plassmann, "A
    Parallel Graph Coloring Heuristic", SIAM J. Sci. Comput. 1993) —
    staged r11 for the SCALE.md r12 jones_plassmann_coloring
    registration (operator + model test first, the
    betweenness/hyperball discipline).

    Per round, every UNCOLORED vertex that is the strict local maximum
    among its uncolored neighbors under the seeded priority total order
    (hash60(f'jp{seed}|{v}'), v) — deterministic, hash-gateable, ties
    impossible because v breaks them — takes the smallest color absent
    from its already-colored neighborhood (min-absent over at most
    deg(v) candidates, so color indices never exceed max degree).
    Independent-set winners per round make concurrent choices safe: two
    adjacent uncolored vertices can never both win a round.

    Plan per round: ONE arcs ⋈ uncolored-state join for the local-max
    test (map-side-combinable max of the packed neighbor priority), one
    arcs ⋈ colored join + bounded sequence-explode anti-join for
    min-absent, one scalar (remaining-uncolored count) across the
    driver; raises on bound exhaustion rather than return a partial
    coloring. State is (v, color) plus the shrinking uncolored set —
    O(|V|) rows, never materializing neighborhoods.

    Returns ((v, color) for every vertex, rounds). Validity (no
    monochromatic edge) and exact hand-graph colors are pinned in
    tests/test_graph_algorithms.py. 100 TB: the per-round bill is two
    edge-list joins against broadcast-or-bucketed vertex state — the
    luby_find posture with a color column. Both state joins key on
    arcs.src (neighbors read off dst — identical on the bidirected arc
    set), so ``broadcast_state=False`` with
    ``arcs=prepare_arcs_bucketed(...)`` is the beyond-broadcast-|V|
    path: state shuffles to the arcs' src bucketing, the O(|E|) side
    never moves, nothing is broadcast (round 1's uncolored set is ALL
    of |V| — the largest state the operator ever holds, so a hard
    broadcast there would be the scale ceiling; r11 ADVICE). Expected
    rounds O(log n) on bounded-degree graphs; hub-heavy graphs
    serialize around priority chains, which the round bound makes loud
    instead of silent."""
    from gpu_mapreduce_spark.functions.portable import hash60

    if arcs is None:
        arcs = edges.select("src", "dst").unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).localCheckpoint(eager=True)
    # strict total order as ONE packed key: priority in the high bits,
    # vertex id in the low 20 (the boruvka packing envelope discipline)
    V_SHIFT = 1 << 20
    bad = arcs.filter((F.col("src") >= V_SHIFT) | (F.col("src") < 0))
    if not bad.isEmpty():
        raise ValueError(
            "jp_coloring packing envelope: needs 0 <= vertex id < 2^20"
            " (re-pack for bigger graphs)"
        )
    pr = (
        hash60(F.concat(F.lit(f"jp{seed}|"), F.col("v").cast("string")))
        % (1 << 40)
    ) * V_SHIFT + F.col("v")
    uncolored = (
        arcs.select(F.col("src").alias("v"))
        .distinct()
        .select("v", pr.alias("p"))
        .localCheckpoint(eager=True)
    )
    spark = uncolored.sparkSession
    colored = spark.createDataFrame([], "v bigint, color bigint")
    rounds = 0
    n_uncolored = None  # None = probe the initial state once; observed after
    for _ in range(max_rounds):
        if (n_uncolored == 0) or (n_uncolored is None and uncolored.isEmpty()):
            return colored.orderBy("v"), rounds
        rounds += 1
        # local-max test among UNCOLORED neighbors only: state joins on
        # arcs.src, neighbors read off dst (identical on the bidirected
        # set) — the key prepare_arcs_bucketed buckets by
        un_s = uncolored.select(F.col("v").alias("uv"), F.col("p").alias("up"))
        nbr_max = (
            arcs.join(_state_side(un_s, broadcast_state), arcs.src == F.col("uv"))
            .groupBy(F.col("dst").alias("v"))
            .agg(F.max("up").alias("nmax"))
        )
        winners = (
            uncolored.join(nbr_max, "v", "left")
            .filter(F.col("nmax").isNull() | (F.col("p") > F.col("nmax")))
            .select("v")
            .localCheckpoint(eager=True)
        )
        # min-absent color over each winner's already-colored neighbors:
        # a winner with k colored neighbors needs only candidates 0..k
        col_s = colored.select(F.col("v").alias("cv"), "color")
        wn = winners.join(
            arcs.join(
                _state_side(col_s, broadcast_state), arcs.src == F.col("cv")
            ).select(F.col("dst").alias("v"), "color"),
            "v",
            "left",
        )
        used = wn.filter(F.col("color").isNotNull())
        ncols = wn.groupBy("v").agg(
            F.sum(F.col("color").isNotNull().cast("int")).alias("k")
        )
        cand = ncols.select(
            "v", F.explode(F.expr("sequence(0, k)")).alias("c")
        )
        chosen = (
            cand.join(
                used.select("v", F.col("color").alias("c")),
                ["v", "c"],
                "left_anti",
            )
            .groupBy("v")
            .agg(F.min("c").cast("bigint").alias("color"))
        )
        colored = colored.unionAll(chosen).localCheckpoint(eager=True)
        # remaining-uncolored count observed during the checkpoint — the
        # loop-top emptiness probe then costs no job (fixpoint_observed
        # discipline)
        obs = Observation()
        uncolored = (
            uncolored.join(winners, "v", "left_anti")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_uncolored = obs.get["n"]
    raise RuntimeError(
        f"jp_coloring: not finished within max_rounds={max_rounds};"
        " raise max_rounds (priority chains serialize around hubs)"
    )


def greedy_matching(
    wedges: DataFrame,
    max_rounds: int = 30,
    broadcast_state: bool = True,
) -> tuple[DataFrame, list[int]]:
    """Deterministic maximal weighted matching by Luby-round edge
    priorities (SCALE.md wave-4 design) — the pair-resolution primitive
    a dedup pipeline runs after candidate generation: each near-dup pair
    keeps at most one partner per side, heaviest pairs first.

    Luby's machinery applied to the LINE graph without materializing it:
    per round an edge joins the matching iff its priority is the strict
    best among all live edges sharing either endpoint — computed as TWO
    keyed min-aggregates (one per-vertex min over the src/dst-tagged
    union, map-side combinable) joined back, never an edge x edge join.
    Matched endpoints drop out (two broadcast anti-joins); repeat until
    no live edge remains, so MAXIMALITY holds by construction (the loop
    cannot end while an edge with two free endpoints survives).

    Priority is the packed strict total order (weight DESC, then
    src, dst) in ONE BIGINT — boruvka_msf's packing discipline verbatim
    with the weight field inverted: pk = (2^22-1 - wu) * 2^40 +
    src * 2^20 + dst, envelope 0 <= src/dst < 2^20, 0 <= wu < 2^22,
    raised loudly. Unique per edge, so "strict best" needs no extra
    tiebreak and the matched edge SET is a deterministic function of
    the graph — the hash-gate requirement, exactly like luby_find's
    MIS. The greedy order gives the classic 1/2-approximation of the
    maximum-weight matching (pinned in tests against brute force).
    Expected rounds are O(log E) when weights break symmetry (the
    fixture's pseudorandom wu does); a corpus with CONSTANT weights
    re-serializes around priority chains — there, salt wu with a
    portable hash before calling (the jp_coloring posture).

    Per round ONE scalar (the matched count) crosses the driver and the
    live set localCheckpoints so lineage never stacks (the cc_find
    discipline); bound exhaustion raises rather than returning a
    non-maximal matching (the ktruss discipline). Returns ((round, src,
    dst, wu) matched edges, per-round matched counts). 100 TB: cost is
    proportional to LIVE edges per round (halving geometry like
    luby/boruvka), state is two bounded per-vertex min tables.
    """
    V_SHIFT = 1 << 20
    WU_CAP = (1 << 22) - 1
    bad = wedges.filter(
        (F.col("src") >= V_SHIFT)
        | (F.col("dst") >= V_SHIFT)
        | (F.col("wu") > WU_CAP)
        | (F.col("src") < 0)
        | (F.col("dst") < 0)
        | (F.col("wu") < 0)
    )
    if not bad.isEmpty():
        raise ValueError(
            "greedy_matching packing envelope: needs 0 <= src/dst < 2^20"
            " and 0 <= wu < 2^22 (re-pack for bigger graphs)"
        )
    live = (
        wedges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col("wu").cast("bigint").alias("wu"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.max("wu").alias("wu"))  # parallel edges: keep the heaviest
        .select(
            "src",
            "dst",
            "wu",
            (
                (F.lit(WU_CAP) - F.col("wu")) * F.lit(1 << 40)
                + F.col("src") * F.lit(V_SHIFT)
                + F.col("dst")
            ).alias("pk"),
        )
        .localCheckpoint(eager=True)
    )
    matched_parts: list[DataFrame] = []
    counts: list[int] = []
    n_live = None  # None = probe the initial state once; observed after
    for rnd in range(1, max_rounds + 1):
        if (n_live == 0) or (n_live is None and live.isEmpty()):
            spark = wedges.sparkSession
            if not matched_parts:
                return (
                    spark.createDataFrame(
                        [], "round int, src bigint, dst bigint, wu bigint"
                    ),
                    counts,
                )
            out = matched_parts[0]
            for p in matched_parts[1:]:
                out = out.unionAll(p)
            return out, counts
        vmin = (
            live.select(F.col("src").alias("v"), "pk")
            .unionAll(live.select(F.col("dst").alias("v"), "pk"))
            .groupBy("v")
            .agg(F.min("pk").alias("vm"))
        )
        vs = _state_side(
            vmin.select(F.col("v").alias("sv"), F.col("vm").alias("svm")),
            broadcast_state,
        )
        vd = _state_side(
            vmin.select(F.col("v").alias("dv"), F.col("vm").alias("dvm")),
            broadcast_state,
        )
        # the per-round matched count — the ONE driver scalar — is
        # observed during the winners checkpoint itself (no count job)
        wobs = Observation()
        winners = (
            live.join(vs, live.src == F.col("sv"))
            .join(vd, live.dst == F.col("dv"))
            .filter((F.col("pk") == F.col("svm")) & (F.col("pk") == F.col("dvm")))
            .select("src", "dst", "wu")
            .observe(wobs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        counts.append(int(wobs.get["n"]))
        matched_parts.append(
            winners.select(
                F.lit(rnd).cast("int").alias("round"), "src", "dst", "wu"
            )
        )
        mv = _state_side(
            winners.select(F.col("src").alias("mv"))
            .unionAll(winners.select(F.col("dst").alias("mv")))
            .distinct(),
            broadcast_state,
        )
        lobs = Observation()
        live = (
            live.join(mv, live.src == F.col("mv"), "left_anti")
            .join(mv, live.dst == F.col("mv"), "left_anti")
            .observe(lobs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_live = lobs.get["n"]
    raise RuntimeError(
        f"greedy_matching: live edges remain after max_rounds={max_rounds};"
        " raise max_rounds (constant weights serialize priority chains —"
        " salt wu with a portable hash)"
    )
