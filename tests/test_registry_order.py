"""Pin the driver-budget iteration order (VERDICT r10 #5).

The per-round correctness driver iterates ``queries()`` in insertion
order and stops after a fixed budget (historically 50 rows). The
registry's ``_driver_order`` therefore IS the verification schedule:
_PRIORITY names first (new registrations needing their first driver
row), then never-verified names (cheap before _SLOW_TAIL), then the
verified tail ordered oldest-stamp-first so spare budget refreshes the
stalest rows. That math was previously only prose in the changelog —
these tests reconstruct the expected composition from the raw dicts so
a rotation regression is caught in-session, not one round later.
"""

from __future__ import annotations

from sales_agent_graphdb_spark.registry import (
    _PRIORITY,
    _REGISTRY,
    _SLOW_TAIL,
    _VERIFIED_ROUND,
    _driver_order,
    all_queries,
)

DRIVER_BUDGET = 50  # slots the per-round driver records (CORRECTNESS_r01..r10)


def _expected_order(names):
    prio = [n for n in _PRIORITY if n in names]
    rest = [n for n in names if n not in prio]
    unverified = [n for n in rest if n not in _VERIFIED_ROUND]
    cheap = [n for n in unverified if n not in _SLOW_TAIL]
    slow = [n for n in unverified if n in _SLOW_TAIL]
    verified = sorted(
        (n for n in rest if n in _VERIFIED_ROUND),
        key=lambda n: (_VERIFIED_ROUND[n], n),
    )
    return prio, cheap, slow, verified


def test_every_registered_name_is_scheduled_exactly_once():
    names = list(all_queries())
    assert sorted(names) == sorted(_REGISTRY)
    assert len(names) == len(set(names))


def test_driver_order_composition():
    """The full iteration order is priority → unverified(cheap→slow) →
    verified oldest-stamp-first, with ties broken by name (determinism
    across processes is load-bearing: the driver and this repo's tools
    must compute the SAME first-50 set)."""
    names = list(_REGISTRY)
    prio, cheap, slow, verified = _expected_order(names)
    assert _driver_order(names) == [*prio, *cheap, *slow, *verified]


def test_first_budget_slots_land_on_oldest_stamps():
    """The spare budget (slots not consumed by priority/unverified
    names) must land on the globally oldest stamps: every verified name
    INSIDE the first DRIVER_BUDGET slots has a stamp <= every verified
    name outside them. This is the property the stale-stamp rotation
    relies on (VERDICT r06 #3 through r10 #1)."""
    order = _driver_order(list(_REGISTRY))
    window, tail = order[:DRIVER_BUDGET], order[DRIVER_BUDGET:]
    in_stamps = [_VERIFIED_ROUND[n] for n in window if n in _VERIFIED_ROUND]
    out_stamps = [_VERIFIED_ROUND[n] for n in tail if n in _VERIFIED_ROUND]
    if in_stamps and out_stamps:
        assert max(in_stamps) <= min(out_stamps)
    # And the tail is itself monotone in stamp order.
    verified_seq = [_VERIFIED_ROUND[n] for n in order if n in _VERIFIED_ROUND]
    assert verified_seq == sorted(verified_seq)


def test_priority_names_exist_and_lead():
    """_PRIORITY may only contain registered names, and they occupy the
    first slots verbatim (a typo'd priority name would silently burn a
    rotation slot)."""
    order = _driver_order(list(_REGISTRY))
    assert all(n in _REGISTRY for n in _PRIORITY)
    assert order[: len(_PRIORITY)] == list(_PRIORITY)


def test_stamps_only_name_registered_queries():
    """A stamp for an unregistered (renamed/deleted) query means the
    rotation math double-counts a slot that can never be refreshed."""
    stale = set(_VERIFIED_ROUND) - set(_REGISTRY)
    assert not stale, f"stamps for unregistered queries: {sorted(stale)}"
