"""theta_overlap_matrix checks beyond the hash gate: matrix coverage
(every source pair exactly once), estimator accuracy against the TRUE
pairwise distinct-shingle overlaps (the theta_ops accuracy discipline
at the matrix grain), and sketch-state consistency."""

from __future__ import annotations

import duckdb

from gpu_mapreduce_spark.queries import theta_matrix as tm
from gpu_mapreduce_spark.queries.theta_ops import _K, _SCALE
from tests.conftest import SF_DIR


def _true_overlaps(sf_dir: str) -> tuple[dict, dict]:
    """Exact per-source distinct-shingle sets' sizes and pairwise
    intersections, straight from the corpus."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{sf_dir}/documents.parquet')"
    )
    rows = con.execute(
        r"""
        WITH toksrc AS (
            SELECT source, list_filter(regexp_split_to_array(text, '\s+'),
                                       t -> t <> '') AS toks
            FROM documents
        ),
        grams AS (
            SELECT DISTINCT source AS src, unnest(list_distinct(
                CASE WHEN len(toks) >= 3
                     THEN list_transform(generate_series(1, len(toks) - 2),
                                         i -> array_to_string(toks[i:i+2], ' '))
                     ELSE [] END)) AS s
            FROM toksrc
        )
        SELECT a.src, b.src, CAST(COUNT(*) AS BIGINT)
        FROM grams a JOIN grams b ON a.s = b.s AND a.src <= b.src
        GROUP BY a.src, b.src
        """
    ).fetchall()
    con.close()
    sizes = {a: n for a, b, n in rows if a == b}
    inter = {(a, b): n for a, b, n in rows if a < b}
    return sizes, inter


def test_matrix_covers_all_pairs_and_estimates_track_truth(spark):
    out = tm.theta_overlap_matrix(spark, SF_DIR).collect()
    srcs = sorted({r.sa for r in out if r.sec == "sk"})
    n_pairs = len(srcs) * (len(srcs) - 1) // 2
    for sec in ("theta", "ninter", "inter"):
        assert sum(1 for r in out if r.sec == sec) == n_pairs, sec
    # full sketches: exactly k state rows per source
    from collections import Counter

    per = Counter(r.sa for r in out if r.sec == "sk")
    assert all(per[s] == _K for s in srcs), per
    sizes, inter = _true_overlaps(SF_DIR)
    # per-source estimates within the KMV band (~1/sqrt(k-1) ~ 13%;
    # assert 3 sigma) — the theta_ops accuracy discipline
    ests = {r.sa: r.v for r in out if r.sec == "est"}
    for s in srcs:
        est = ests[s] / _SCALE
        assert abs(est - sizes[s]) / sizes[s] < 0.39, (s, est, sizes[s])
    # intersection estimates: error relative to the UNION size (the
    # theta_ops test convention), 3-sigma band
    got_inter = {(r.sa, r.sb): r.v / _SCALE for r in out if r.sec == "inter"}
    for (a, b), est in got_inter.items():
        true = inter.get((a, b), 0)
        union = sizes[a] + sizes[b] - true
        assert abs(est - true) <= 0.39 * union, (a, b, est, true)


def test_small_source_guard_raises():
    import pytest

    from gpu_mapreduce_spark.queries.theta_ops import theta_ops

    with pytest.raises(ValueError, match="must be full"):
        theta_ops(list(range(10)), list(range(_K)))
