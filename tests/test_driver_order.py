"""Staleness ordering of the driver correctness window (registry.driver_order).

The round driver hash-checks only the first ~50 entries of
``__spark_entry__.queries()``; these tests pin the rotation contract:
never-green queries first, then ascending last-green round, ties by
registration order.
"""

import json

from gpu_mapreduce_spark.registry import _last_green_rounds, driver_order, load_all


def test_driver_order_is_permutation_of_registry():
    order = driver_order()
    assert sorted(order) == sorted(load_all())


def test_never_checked_queries_lead_the_window():
    """With the committed r01-r03 artifacts, every query with no green driver
    row yet must precede every query that was green in r03."""
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    last = _last_green_rounds(root)
    order = driver_order(root)
    ranks = {n: i for i, n in enumerate(order)}
    never = [n for n in order if last.get(n, 0) == 0]
    greens = [n for n in order if last.get(n, 0) > 0]
    if never and greens:
        assert max(ranks[n] for n in never) < min(ranks[n] for n in greens)


def test_last_green_rounds_semantics(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "a": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
        "b": {"rows_match": True, "schema_match": True, "hash_match": False, "err": None},
        "c": {"rows_match": True, "err": None},  # rows-only check still counts
        "d": {"rows_match": True, "schema_match": True, "hash_match": True,
              "err": "boom"},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "a": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
    }))
    (tmp_path / "CORRECTNESS_rBAD.json").write_text("not json")
    last = _last_green_rounds(tmp_path)
    assert last == {"a": 2, "c": 1}  # b: hash mismatch; d: errored


def test_staleness_sort(tmp_path):
    """A query green long ago sorts before one green recently; never-green
    sorts before both; ties fall back to registration order."""
    reg = list(load_all())
    stale, fresh = reg[5], reg[2]
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        stale: {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        fresh: {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
    }))
    order = driver_order(tmp_path)
    ranks = {n: i for i, n in enumerate(order)}
    # every other (never-green) query precedes both checked ones
    assert ranks[stale] == len(reg) - 2
    assert ranks[fresh] == len(reg) - 1
    # never-green block preserves registration order
    rest = [n for n in order if n not in (stale, fresh)]
    assert rest == [n for n in reg if n not in (stale, fresh)]


def test_entry_module_exposes_staleness_order():
    import __spark_entry__ as e

    names = list(e.queries())
    assert names == driver_order()
    osql = e.oracle_sql()
    assert list(osql) == [n for n in names if n in osql]
