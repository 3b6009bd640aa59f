"""decayed_sample_manifest model checks: the largest-remainder
apportionment convention on hand cases, its envelopes (quota > mass,
kmax shift), and the decay law on the fixture (newer buckets get
super-proportional allocation)."""

from __future__ import annotations

import pytest

from gpu_mapreduce_spark.queries import decayed_sample as ds
from tests.conftest import SF_DIR


def test_apportion_hand_case_largest_remainder():
    """Buckets 0..2 with equal mass 100 and weights 4:2:1 (kmax=2):
    shares 400/700, 200/700, 100/700 of K=10 -> bases 5,2,1 with
    remainders 500,600,300 -> the 2 leftover seats go to k=1 (largest
    remainder) then k=0."""
    got = ds.apportion({0: 100, 1: 100, 2: 100}, 10)
    assert got == {0: 6, 1: 3, 2: 1}
    assert sum(got.values()) == 10


def test_apportion_tie_breaks_by_bucket_id():
    """Equal masses AND equal weights (single level repeated via equal
    shifts is impossible, so construct ties via masses that double per
    level): m_k = 2^k exactly cancels the 2^-k weight -> all shares
    equal, remainders all equal -> leftover seats go to the LOWEST k."""
    got = ds.apportion({0: 10, 1: 20, 2: 40}, 4)
    assert sum(got.values()) == 4
    # equal shares of 4 over 3 buckets: bases 1,1,1, one leftover -> k=0
    assert got == {0: 2, 1: 1, 2: 1}


def test_apportion_envelope_guards():
    with pytest.raises(ValueError, match="empty corpus"):
        ds.apportion({}, 8)
    with pytest.raises(ValueError, match="shift envelope"):
        ds.apportion({0: 10, ds._KMAX_ENVELOPE + 1: 10}, 8)
    # K larger than the dominant bucket's mass -> quota exceeds bucket
    with pytest.raises(ValueError, match="exceed bucket masses"):
        ds.apportion({0: 3, 5: 1000}, 64)


def test_fixture_allocation_decays_and_sums_to_k(spark):
    out = ds.decayed_sample_manifest(spark, SF_DIR).collect()
    alloc = {r.a: r.b for r in out if r.sec == "alloc"}
    mass = {r.a: r.b for r in out if r.sec == "mass"}
    picks = [r for r in out if r.sec == "pick"]
    assert sum(alloc.values()) == ds.K
    assert len(picks) == ds.K
    assert all(alloc[k] <= mass[k] for k in alloc)
    # the decay law: allocation per unit mass strictly decreases with
    # age wherever both buckets are non-trivially filled
    rates = {k: alloc[k] / mass[k] for k in sorted(alloc) if mass[k] > 0}
    ks = sorted(rates)
    assert all(
        rates[a] > rates[b] for a, b in zip(ks, ks[1:])
    ), rates
