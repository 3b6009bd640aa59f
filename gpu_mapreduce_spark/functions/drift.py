"""Exact-integer distribution-drift statistic — the convention STAGED
for the r14 `score_drift_monitor` registration (SCALE.md wave-4 draft;
the betweenness/hyperball/qsketch discipline: the risky core lands one
round early as a pure function with model tests, the Spark wiring and
oracle follow).

Chi-square-style two-sample statistic over fixed histogram bins, with
every step in exact integer arithmetic so both engines replay it
bit-for-bit (PSI's ln and the classic chi-square's float division are
not gateable — same rejection as Efraimidis-Spirakis keys):

    bins i with counts n_i (N = Σ n_i) and m_i (M = Σ m_i):
      diff_i  = n_i * M - m_i * N          (exact BIGINT; == 0 when the
                                            bin holds identical shares)
      contrib_i = diff_i^2 div (n_i * M + m_i * N)   [integer floor
                division; bins empty on BOTH sides contribute 0 by
                convention — the denominator would be 0]
      stat    = Σ contrib_i

    stat is invariant-scaled: diff_i is in N*M units, so contrib_i is
    ~ N*M * (share difference)^2 — comparable across snapshots of the
    same sizes; a registration pins its flag threshold in these exact
    units against measured same-distribution noise.

Envelope, GUARDED loudly (the anomaly/hllest discipline): diff_i^2
must stay below 2^63 for the engine-side BIGINT square —
|diff_i| <= max(n_i*M, m_i*N) <= N*M, so the guard is
N * M < 2^31.5 ~ 3.04e9; the Spark registration asserts it and larger
corpora downshift to per-mille bin shares first (documented there).
Python-side arithmetic is arbitrary-precision and never wraps — only
the engine replay binds.
"""

from __future__ import annotations

_NM_ENVELOPE = 3_037_000_499  # floor(sqrt(2^63 - 1)): N*M past this can
#   square past BIGINT in the engine replay


def drift_contrib(n_i: int, m_i: int, n_tot: int, m_tot: int) -> int:
    """One bin's exact contribution — the written-down convention."""
    if n_i == 0 and m_i == 0:
        return 0
    diff = n_i * m_tot - m_i * n_tot
    return (diff * diff) // (n_i * m_tot + m_i * n_tot)


def drift_stat(
    bins_a: dict[int, int], bins_b: dict[int, int]
) -> tuple[int, dict[int, int]]:
    """The statistic over two binned count maps: (stat, per-bin
    contributions). Raises loudly past the engine BIGINT envelope."""
    n_tot = sum(bins_a.values())
    m_tot = sum(bins_b.values())
    if n_tot * m_tot > _NM_ENVELOPE**2:
        raise ValueError(
            f"drift_stat: N*M = {n_tot * m_tot} exceeds the BIGINT"
            f" square envelope ({_NM_ENVELOPE}^2); rebin to shares"
        )
    contribs = {
        i: drift_contrib(bins_a.get(i, 0), bins_b.get(i, 0), n_tot, m_tot)
        for i in sorted({*bins_a, *bins_b})
    }
    return sum(contribs.values()), contribs
