"""Model checks for the staged deterministic quantile sketch
(functions/qsketch.py — the r13 quantile_sketch_merge core): exact
weight conservation, determinism, the empirical rank-error envelope
across data shapes AND merge orders, and state-size bounds."""

from __future__ import annotations

import hashlib

from gpu_mapreduce_spark.functions import qsketch


def _h(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)


def _datasets(n: int) -> dict[str, list[int]]:
    return {
        "uniform": [_h(i) % 1_000_000 for i in range(n)],
        "sorted": list(range(n)),
        "reverse": list(range(n, 0, -1)),
        "skewed": [(_h(i) % 100) ** 3 for i in range(n)],
        "heavy_dup": [_h(i) % 37 for i in range(n)],
    }


def _max_rank_err(sk: qsketch.QSketch, data: list[int]) -> int:
    data_sorted = sorted(data)
    err = 0
    for q in range(1, 20):
        idx = q * (len(data) - 1) // 20
        x = data_sorted[idx]
        true_rank = sum(1 for v in data if v <= x)
        err = max(err, abs(sk.rank(x) - true_rank))
    return err


def test_qsketch_weight_exact_and_error_envelope():
    n = 50_000
    for name, data in _datasets(n).items():
        sk = qsketch.build(data)
        assert sk.n == n, name
        err = _max_rank_err(sk, data)
        # c=64: empirical envelope across all shapes; 3% of n is ~4x the
        # worst observed, tight enough to catch a broken compaction rule
        assert err <= 0.03 * n, f"{name}: rank error {err}"
        # state stays c * O(log(n/c)) — loudly bound it
        rows = sum(len(lv) for lv in sk.levels)
        assert rows <= qsketch.CAPACITY * (len(sk.levels) + 1)


def test_qsketch_build_deterministic():
    data = _datasets(10_000)["uniform"]
    a, b = qsketch.build(data), qsketch.build(data)
    assert a.levels == b.levels and a.compactions == b.compactions


def test_qsketch_merge_weight_exact_and_error_holds():
    n = 40_000
    data = _datasets(n)["uniform"]
    chunks = [data[i::8] for i in range(8)]
    parts = [qsketch.build(c) for c in chunks]
    # canonical left fold
    merged = parts[0]
    for p in parts[1:]:
        merged = qsketch.merge(merged, p)
    assert merged.n == n
    assert _max_rank_err(merged, data) <= 0.03 * n
    # adversarial fold orders: states may differ (documented — the
    # registration pins a canonical order), but the ERROR envelope and
    # exact weight must hold for every order
    import itertools

    for perm in itertools.islice(itertools.permutations(parts), 0, 6):
        m = perm[0]
        for p in perm[1:]:
            m = qsketch.merge(m, p)
        assert m.n == n
        assert _max_rank_err(m, data) <= 0.03 * n


def test_qsketch_quantiles_land_near_truth():
    n = 30_000
    data = _datasets(n)["skewed"]
    sk = qsketch.build(data)
    data_sorted = sorted(data)
    for num, den in ((1, 2), (9, 10), (99, 100)):
        got = sk.quantile(num, den)
        true_rank = sum(1 for v in data if v <= got)
        assert abs(true_rank - n * num / den) <= 0.03 * n


def test_qsketch_small_inputs_exact():
    # below capacity nothing compacts: ranks are exact
    data = [5, 1, 9, 3, 3]
    sk = qsketch.build(data)
    assert sk.n == 5
    for x, want in ((0, 0), (1, 1), (3, 3), (5, 4), (9, 5)):
        assert sk.rank(x) == want
    assert sk.quantile(1, 2) == 3
