"""Driver-window management gates (round-2 ADVICE): the driver's
CORRECTNESS check covers only the first DRIVER_WINDOW registrations per
round, so the ordering must guarantee (a) anything changed this round is
re-verified, (b) never-checked entries get their first row, and (c) no
operator's newest row goes stale beyond the rotation bound."""

from __future__ import annotations

from ocr_spark.plans import registry

registry.load_all()


def _window():
    return list(registry.QUERIES)[: registry.DRIVER_WINDOW]


def test_changed_this_round_inside_window():
    win = set(_window())
    missing = [n for n in registry._CHANGED_THIS_ROUND if n not in win]
    assert not missing, (
        f"changed queries outside the driver window (stale rows would "
        f"stand): {missing}")


def test_never_checked_inside_window():
    newest = registry._check_history()
    win = set(_window())
    never = [n for n in registry.QUERIES if n not in newest]
    missing = [n for n in never if n not in win]
    assert not missing, f"never-checked queries outside window: {missing}"


def test_stalest_rows_inside_window():
    """Every operator whose newest row predates the newest recorded
    round must fit in the window — i.e. after the driver runs, no row is
    more than one round stale.  If the demand ever exceeds the window,
    this fails loudly instead of silently dropping coverage."""
    newest = registry._check_history()
    if not newest:  # no history files (fresh clone) — nothing to rotate
        return
    latest = max(newest.values())
    stale = [n for n in registry.QUERIES if newest.get(n, 0) < latest]
    demand = set(stale) | set(registry._CHANGED_THIS_ROUND)
    assert len(demand) <= registry.DRIVER_WINDOW, (
        f"window over-subscribed: {len(demand)} > {registry.DRIVER_WINDOW}")
    win = set(_window())
    missing = sorted(demand - win)
    assert not missing, f"stale-rowed queries outside window: {missing}"


def test_registered_names_unchanged_by_ordering():
    """Ordering must be a permutation — never drop or invent entries —
    and every oracle name must still be a registered query."""
    names = set(registry.QUERIES)
    assert set(registry.ORACLES) <= names
    assert len(names) == len(list(registry.QUERIES))
