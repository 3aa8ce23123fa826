"""Driver-sample rotation contract (queries/__init__._driver_order).

The correctness driver samples a prefix of the registry ordering
(observed: 50/round). The rotation policy — never-checked queries
first, then stalest green driver row, name tiebreak — is derived from
the committed CORRECTNESS_r*.json files. These tests pin that policy
so a refactor can't silently starve new queries of driver rows or
freeze stale ones out of the sample.
"""

from __future__ import annotations

from g_etl_spark.queries import _driver_order, _driver_row_ages, queries


def test_never_checked_sort_before_checked():
    ages = _driver_row_ages()
    order = _driver_order(queries().keys())
    seen_checked = False
    for name in order:
        if ages.get(name, 0) == 0:
            assert not seen_checked, f"{name} (never checked) after a checked query"
        else:
            seen_checked = True


def test_checked_queries_sorted_stalest_first():
    ages = _driver_row_ages()
    order = [n for n in _driver_order(queries().keys()) if ages.get(n, 0) > 0]
    rounds = [ages[n] for n in order]
    assert rounds == sorted(rounds), "stale driver rows must outrank fresh ones"


def test_ages_come_from_green_rows_only():
    ages = _driver_row_ages()
    # every recorded age is a positive round number for a known query
    qnames = set(queries().keys())
    for name, rnd in ages.items():
        assert rnd >= 1
        # rows for renamed/removed queries may linger in old files;
        # they must never crash the ordering
    assert qnames & set(ages), "at least some registry queries have driver rows"


def test_ordering_is_deterministic():
    names = list(queries().keys())
    assert _driver_order(names) == _driver_order(list(reversed(names)))
