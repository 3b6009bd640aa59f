"""Count-min sketch heavy hitters (queries/sketches.py)."""

from tests.conftest import SF_DIR

from gpu_mapreduce_spark.queries.sketches import _TOPK, cms_heavy_hitters


def test_cms_one_sided_error_and_collisions(spark):
    """CMS invariants on the fixture: the estimate NEVER undercounts
    (est >= cnt for every heavy hitter — the structural guarantee), and
    with w below the vocabulary size both behaviors are visible:
    at least one token collides (overcount > 0) and at least one token's
    min-row bucket is clean (overcount == 0). Deterministic hashes make
    both assertions stable."""
    rows = cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) == _TOPK
    assert all(r.est >= r.cnt for r in rows), rows
    assert all(r.overcount == r.est - r.cnt for r in rows)
    assert any(r.overcount > 0 for r in rows)
    assert any(r.overcount == 0 for r in rows)
    # ranked by exact count desc, token asc
    keys = [(-r.cnt, r.tok) for r in rows]
    assert keys == sorted(keys)
