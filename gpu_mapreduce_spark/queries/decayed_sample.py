"""Recency-decayed weighted sampling (r13 landing of the SCALE.md r14
decayed_sample_manifest draft, landed in-round) — the training-mixture
refresh sampler: newer events over-represented by a half-life decay
without dropping the tail, and the SELECTED ID SET itself goes through
the hash gate (no estimator tolerance anywhere).

Exact-integer two-stage PPS (the draft's design — Efraimidis–Spirakis
per-item keys u^(1/w) were considered and REJECTED: pow/ln are not
correctly-rounded across engines, so per-item exponential keys are not
gateable; bucket-quota apportionment gives the same mixture semantics
in exact integers):
  1. Age buckets: k = (t_max − ts) div H with H = 7 days, anchored at
     the corpus max timestamp (a table statistic at scale). Bucket
     weight 2^−k; raw share s_k = m_k · 2^(kmax−k) (shift-scaled so
     every weight is an exact integer). Quotas by the LARGEST-REMAINDER
     method: base_k = (K·s_k) div S, the L = K − Σ base_k leftover
     seats to the buckets with the largest remainders (ties broken by
     ascending k — the convention, written once here and replayed in
     SQL verbatim).
  2. Within bucket k, the quota_k rows with the smallest portable
     hash60('decay|' || event_id) (ties by event_id) — as a TWO-PHASE
     distributed top-n, because a window partitioned by k alone has
     only kmax+1 ~ 5 partitions and would funnel each bucket's whole
     row set through one task at scale: phase 1 keeps each (input
     partition, bucket)'s K smallest rows (a window over
     (spark_partition_id, k) — thousands of balanced partitions),
     phase 2 resolves the final quota_k per bucket over the
     <= K * n_partitions * buckets surviving candidate rows (tiny).
     Candidate completeness is structural: quota_k <= K, so a bucket's
     k-th smallest row is its partition's <= K-th smallest.

Output (sec, a, b): ('pick', event_id, k) — the sample itself —
plus ('alloc', k, quota) and ('mass', k, m_k), so the apportionment is
auditable in the same gated artifact.

Envelopes, GUARDED loudly (the anomaly/hllest discipline): quotas must
fit their buckets (quota_k <= m_k — binds only if K crowds a bucket;
raise tells the caller to lower K) and kmax <= 48 so the HUGEINT
products K·m·2^kmax in the oracle stay far under 2^127 (a longer time
axis re-derives H).

100 TB: stage 1 is one map-side-combinable bucket count (<= kmax+1
rows collected — the kmeans-centroid bounded-collect discipline; the
apportionment is driver-side O(buckets) exact-int arithmetic), stage 2
one partitioned window over the bucket-tagged scan. No global sort, no
per-item float weights, refresh cost ∝ one corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpu_mapreduce_spark.functions.portable import hash60
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

K = 128  # total sample size (fits every bucket at every fixture scale)
H_MS = 7 * 24 * 60 * 60 * 1000  # half-life: 7 days
_KMAX_ENVELOPE = 48


def apportion(masses: dict[int, int], k_total: int) -> dict[int, int]:
    """Largest-remainder apportionment of k_total seats over age
    buckets with weight m_k * 2^(kmax - k) — exact Python ints; THE
    convention the oracle replays (ties by remainder DESC, then k ASC).
    Raises loudly when a quota exceeds its bucket or the shift envelope
    is exceeded."""
    if not masses:
        raise ValueError("decayed_sample: empty corpus")
    kmax = max(masses)
    if kmax > _KMAX_ENVELOPE:
        raise ValueError(
            f"decayed_sample: kmax={kmax} exceeds the shift envelope"
            f" {_KMAX_ENVELOPE}; re-derive H for this time axis"
        )
    s = {k: m << (kmax - k) for k, m in masses.items()}
    tot = sum(s.values())
    base = {k: (k_total * sk) // tot for k, sk in s.items()}
    rem = {k: (k_total * sk) % tot for k, sk in s.items()}
    left = k_total - sum(base.values())
    for k in sorted(masses, key=lambda k: (-rem[k], k))[:left]:
        base[k] += 1
    over = {k: q for k, q in base.items() if q > masses[k]}
    if over:
        raise ValueError(
            f"decayed_sample: quotas exceed bucket masses {over};"
            f" lower K (= {k_total})"
        )
    return base


_H_SQL = (
    "('0x' || substr(md5('decay|' || CAST(event_id AS VARCHAR)), 1, 15))"
    "::BIGINT"
)


@register(
    "decayed_sample_manifest",
    bench=True,
    tags=("llm", "sampling", "events"),
    oracle=f"""
        WITH bounds AS MATERIALIZED (
            SELECT MAX(epoch_ms(ts)) AS tmax FROM events
        ),
        ages AS MATERIALIZED (
            SELECT event_id,
                   ((SELECT tmax FROM bounds) - epoch_ms(ts)) // {H_MS}
                       AS k
            FROM events
        ),
        mass AS MATERIALIZED (
            SELECT k, CAST(COUNT(*) AS BIGINT) AS m FROM ages GROUP BY k
        ),
        km AS (SELECT MAX(k) AS kmax FROM mass),
        wts AS MATERIALIZED (
            SELECT k, m,
                   m::HUGEINT * (1::HUGEINT << ((SELECT kmax FROM km) - k))
                       AS s
            FROM mass
        ),
        tot AS (SELECT SUM(s) AS st FROM wts),
        base AS MATERIALIZED (
            SELECT k, m,
                   ({K} * s) // (SELECT st FROM tot) AS b,
                   ({K} * s) % (SELECT st FROM tot) AS r
            FROM wts
        ),
        extra AS (
            SELECT k, row_number() OVER (ORDER BY r DESC, k) AS rn
            FROM base
        ),
        quota AS MATERIALIZED (
            SELECT b.k,
                   CAST(b.b + CASE WHEN e.rn <=
                       {K} - (SELECT SUM(b2.b) FROM base b2)
                       THEN 1 ELSE 0 END AS BIGINT) AS q
            FROM base b JOIN extra e ON e.k = b.k
        ),
        ranked AS (
            SELECT event_id, k,
                   row_number() OVER (PARTITION BY k
                       ORDER BY {_H_SQL}, event_id) AS rn
            FROM ages
        )
        SELECT sec, a, b FROM (
            SELECT 'pick' AS sec, r.event_id AS a, CAST(r.k AS BIGINT) AS b
            FROM ranked r JOIN quota q ON q.k = r.k AND r.rn <= q.q
            UNION ALL
            SELECT 'alloc', CAST(k AS BIGINT), q FROM quota
            UNION ALL
            SELECT 'mass', CAST(k AS BIGINT), m FROM mass
        ) ORDER BY sec, a, b
    """,
)
def decayed_sample_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-weighted sample of the events stream (K = {K}, H = 7
    days): exact-integer largest-remainder quotas per age bucket, then
    the smallest-hash rows per bucket — picks, allocation and masses
    all gate-hashed. See module docstring."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", F.unix_millis("ts").alias("ts_ms")
    )
    t_max = ev.agg(F.max("ts_ms")).collect()[0][0]  # scalar statistic
    ages = ev.select(
        "event_id",
        F.expr(f"CAST(({t_max} - ts_ms) div {H_MS} AS BIGINT)").alias("k"),
    )
    masses = {
        int(r.k): int(r.m)
        for r in ages.groupBy("k")
        .agg(F.count(F.lit(1)).alias("m"))
        .collect()  # bounded: <= kmax+1 rows
    }
    quotas = apportion(masses, K)
    qdf = spark.createDataFrame(
        sorted(quotas.items()), "k bigint, q bigint"
    )
    h = hash60(F.concat(F.lit("decay|"), F.col("event_id").cast("string")))
    # phase 1: per-(input partition, bucket) K smallest — balanced
    # parallelism regardless of how few buckets there are (see module
    # docstring); completeness: quota_k <= K by construction
    cand = (
        ages.withColumn("h", h)
        .withColumn("pid", F.spark_partition_id())
        .withColumn(
            "prn",
            F.row_number().over(
                Window.partitionBy("pid", "k").orderBy("h", "event_id")
            ),
        )
        .filter(F.col("prn") <= K)
        .drop("pid", "prn")
    )
    # phase 2: final quota per bucket over the tiny candidate set
    ranked = cand.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("k").orderBy("h", "event_id")
        ),
    )
    # bcast-audit: bounded (<= kmax+1 quota rows)
    picks = (
        ranked.join(F.broadcast(qdf), "k")
        .filter(F.col("rn") <= F.col("q"))
        .select(
            F.lit("pick").alias("sec"),
            F.col("event_id").alias("a"),
            F.col("k").cast("bigint").alias("b"),
        )
    )
    alloc = spark.createDataFrame(
        [("alloc", int(k), int(q)) for k, q in sorted(quotas.items())]
        + [("mass", int(k), int(m)) for k, m in sorted(masses.items())],
        "sec string, a bigint, b bigint",
    )
    return picks.unionByName(alloc).orderBy("sec", "a", "b")
