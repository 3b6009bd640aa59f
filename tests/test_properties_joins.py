"""Property-based cross-checks (hypothesis) for the join and sampling
operators — as-of join, banded range join, deterministic hash sampling —
against pure-Python models on arbitrary small inputs. The fixture-parity
suite pins these on the driver's corpora; these pin the semantics on
adversarial shapes the fixtures rarely produce: equal left/right
timestamps (the inclusive-vs-strict boundary), multiple right rows on one
(key, ts), keys with no match, zero-length and band-straddling intervals,
points exactly on interval endpoints."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators.joins import asof_join, range_join_points
from gpu_mapreduce_spark.operators.sampling import sample_uniform, stratified_sample

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_KEYS = ["k1", "k2", "k3"]

left_rows = st.lists(
    st.tuples(st.sampled_from(_KEYS), st.integers(0, 10)), min_size=1, max_size=10
)
right_rows = st.lists(
    st.tuples(st.sampled_from(_KEYS), st.integers(0, 10), st.integers(-9, 9)),
    min_size=0,
    max_size=10,
)


def _model_asof(lefts, rights, strict):
    # right reduced to one row per (key, ts): column-wise MAX of payload
    reduced: dict[tuple[str, int], int] = {}
    for k, t, v in rights:
        kk = (k, t)
        reduced[kk] = max(reduced.get(kk, v), v)
    out = {}
    for lid, (k, t) in enumerate(lefts):
        cands = [
            (rt, v)
            for (rk, rt), v in reduced.items()
            if rk == k and (rt < t if strict else rt <= t)
        ]
        out[lid] = max(cands) if cands else (None, None)
    return out


@given(lefts=left_rows, rights=right_rows, strict=st.booleans())
@settings(**_SETTINGS)
def test_asof_join_matches_model(spark, lefts, rights, strict):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], "k string, ts long, lid long"
    )
    rdf = spark.createDataFrame(
        rights or [("__none__", 0, 0)], "k string, ts long, v long"
    )
    if not rights:
        rdf = rdf.filter(F.lit(False))
    got = {
        r.lid: (r.r_ts, r.r_v)
        for r in asof_join(ldf, rdf, key="k", ts="ts", payload=["v"], strict=strict)
        .collect()
    }
    assert got == _model_asof(lefts, rights, strict)


intervals_st = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 25)),  # (start, length)
    min_size=0,
    max_size=8,
)
points_st = st.lists(st.integers(0, 70), min_size=0, max_size=12)


@given(intervals=intervals_st, points=points_st, band_ms=st.sampled_from([3, 7, 16]))
@settings(**_SETTINGS)
def test_range_join_points_matches_model(spark, intervals, points, band_ms):
    idf = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(intervals)] or [(0, 0, 0)],
        "iid long, s_ms long, e_ms long",
    )
    if not intervals:
        idf = idf.filter(F.lit(False))
    pdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)] or [(0, 0)], "pid long, p_ms long"
    )
    if not points:
        pdf = pdf.filter(F.lit(False))
    idf = idf.select(
        "iid",
        F.timestamp_millis(F.col("s_ms")).alias("start"),
        F.timestamp_millis(F.col("e_ms")).alias("end"),
    )
    pdf = pdf.select("pid", F.timestamp_millis(F.col("p_ms")).alias("pt"))
    got = {
        (r.iid, r.pid)
        for r in range_join_points(
            pdf, idf, pt="pt", start="start", end="end", band_ms=band_ms
        ).collect()
    }
    want = {
        (i, j)
        for i, (s, ln) in enumerate(intervals)
        for j, p in enumerate(points)
        if s <= p < s + ln
    }
    assert got == want


def _u01(s: str) -> float:
    h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    return (h >> 7) * 2.0**-53


ids_st = st.lists(st.integers(0, 10_000), min_size=1, max_size=30, unique=True)


@given(ids=ids_st, rate=st.sampled_from([0.0, 0.25, 0.5, 1.0]))
@settings(**_SETTINGS)
def test_sample_uniform_matches_model(spark, ids, rate):
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {r.id for r in sample_uniform(df, "id", rate, tag="t").collect()}
    want = {i for i in ids if _u01(f"t|{i}") < rate}
    assert got == want


strata_rows = st.lists(
    st.tuples(st.sampled_from(["en", "fr", "zz"]), st.integers(0, 10_000)),
    min_size=1,
    max_size=30,
)


@given(rows=strata_rows)
@settings(**_SETTINGS)
def test_stratified_sample_matches_model(spark, rows):
    rows = list({(s, i) for s, i in rows})  # unique (stratum, key)
    df = spark.createDataFrame(rows, "lang string, id long")
    rates = {"en": 0.5, "fr": 0.1}
    got = {
        (r.lang, r.id)
        for r in stratified_sample(
            df, "lang", "id", rates, default_rate=0.9, tag="t"
        ).collect()
    }
    want = {
        (s, i) for s, i in rows if _u01(f"t|{i}") < rates.get(s, 0.9)
    }
    assert got == want
