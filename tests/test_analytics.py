"""Unit tests for the advanced-analytics operators (operators/joins.py,
operators/sampling.py) against small in-memory frames and Python models —
the registered queries' oracle parity is covered by test_parity.py."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gpu_mapreduce_spark.operators import joins, sampling

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts(5), "a"),
            (2, 10, _ts(10), "b"),
            (3, 10, _ts(2), "c"),  # before any right row
            (4, 20, _ts(7), "d"),  # key with a single right row at same ts
            (5, 30, _ts(9), "e"),  # key with no right rows at all
        ],
        "id bigint, k bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (10, _ts(3), 100.0),
            (10, _ts(5), 200.0),  # ties left id=1 exactly
            (10, _ts(8), 300.0),
            (20, _ts(7), 400.0),
        ],
        "k bigint, ts timestamp, v double",
    )
    return left, right


def test_asof_inclusive(asof_frames):
    left, right = asof_frames
    out = {
        r.id: (r.r_v, r.r_ts)
        for r in joins.asof_join(left, right, "k", "ts", ["v"]).collect()
    }
    assert out[1] == (200.0, _ts(5))  # same-ts right row IS visible
    assert out[2] == (300.0, _ts(8))
    assert out[3] == (None, None)  # nothing at or before ts
    assert out[4] == (400.0, _ts(7))
    assert out[5] == (None, None)  # key absent from right
    assert len(out) == 5  # exactly one output row per left row


def test_asof_strict(asof_frames):
    left, right = asof_frames
    out = {
        r.id: r.r_v
        for r in joins.asof_join(
            left, right, "k", "ts", ["v"], strict=True
        ).collect()
    }
    assert out[1] == 100.0  # same-ts right row no longer visible
    assert out[4] is None  # its only right row was at the same instant


def test_asof_right_dedup_deterministic(spark):
    """Duplicate right rows at one (key, ts) reduce to the MAX payload."""
    left = spark.createDataFrame(
        [(1, 1, _ts(5))], "id bigint, k bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(4), 7.0), (1, _ts(4), 9.0), (1, _ts(4), 8.0)],
        "k bigint, ts timestamp, v double",
    )
    rows = joins.asof_join(left, right, "k", "ts", ["v"]).collect()
    assert [r.r_v for r in rows] == [9.0]


def _model_range_join(points, intervals):
    return sorted(
        (iid, p)
        for iid, s, e in intervals
        for p, _v in points
        if s <= p < e
    )


@pytest.mark.parametrize("band_min", [1, 3, 10, 60])
def test_range_join_band_width_invariant(spark, band_min):
    """Band width changes the plan, never the result (completeness + no
    duplicate pairs across bands)."""
    intervals = [
        (1, _ts(0), _ts(10)),
        (2, _ts(5), _ts(15)),  # overlapping intervals both match
        (3, _ts(40), _ts(41)),  # empty
    ]
    points = [(_ts(float(m)), float(m)) for m in (0, 4, 5, 9, 10, 14, 50)]
    idf = spark.createDataFrame(
        intervals, "iid bigint, start timestamp, end timestamp"
    )
    pdf = spark.createDataFrame(points, "pt timestamp, val double")
    got = sorted(
        (r.iid, r.pt)
        for r in joins.range_join_points(
            pdf, idf, "pt", "start", "end", band_ms=band_min * 60_000
        ).collect()
    )
    assert got == _model_range_join(
        [(p, v) for p, v in points], intervals
    )


def test_stratified_sample_rates_and_determinism(spark):
    n = 20000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 2 == 0).cast("string").alias("stratum"),
    )
    rates = {"true": 0.3, "false": 0.05}
    out1 = sampling.stratified_sample(df, "stratum", "k", rates).collect()
    out2 = sampling.stratified_sample(
        df.repartition(17), "stratum", "k", rates
    ).collect()
    # partitioning-independent: identical selected set
    assert sorted(r.k for r in out1) == sorted(r.k for r in out2)
    by = {"true": 0, "false": 0}
    for r in out1:
        by[r.stratum] += 1
    # md5 uniformity: observed rate within ~4 sigma of target
    for s, rate in rates.items():
        m = n / 2
        sigma = (m * rate * (1 - rate)) ** 0.5
        assert abs(by[s] - m * rate) < 4 * sigma, (s, by[s], m * rate)


def test_sample_tag_independence(spark):
    """Different tags draw different (near-independent) samples."""
    df = spark.range(5000).select(F.col("id").alias("k"))
    a = {r.k for r in sampling.sample_uniform(df, "k", 0.2, tag="a").collect()}
    b = {r.k for r in sampling.sample_uniform(df, "k", 0.2, tag="b").collect()}
    assert a != b
    # overlap ~ rate^2 * n = 200; allow generous slack either side
    assert 50 < len(a & b) < 500


def test_mixture_by_split_empty_corpus(spark, tmp_path):
    """ADVICE r09: mixture_by_split used to raise TypeError (int(None)) on
    a degenerate corpus whose train split is empty, while the DuckDB
    oracle returns an empty result set. Now it returns the empty frame
    with the output schema."""
    from gpu_mapreduce_spark.queries.manifest import mixture_by_split

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("source", pa.string()),
            ("lang", pa.string()),
            ("text", pa.string()),
        ]
    )
    pq.write_table(
        schema.empty_table(), str(tmp_path / "documents.parquet")
    )
    out = mixture_by_split(spark, str(tmp_path))
    assert out.columns == [
        "source",
        "n_train",
        "rate_bp",
        "n_kept",
        "kept_tokens",
    ]
    assert out.count() == 0
