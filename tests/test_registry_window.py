"""The verification-window contract must be honest: every name the
registry advertises to the driver's 50-slot window must actually be a
registered query. Round 5 shipped three phantom WINDOW_PRIORITY
entries that _ordered() silently dropped, so the driver certified
three arbitrary substitutes (VERDICT.md r5 'What's wrong' #1) — this
test makes that class of drift a loud CI failure."""

from __future__ import annotations

from meta_iterative_mapreduce_spark import registry


def test_every_window_priority_name_is_registered():
    registry._ensure_loaded()
    missing = [n for n in registry.WINDOW_PRIORITY if n not in registry.REGISTRY]
    assert not missing, (
        f"WINDOW_PRIORITY advertises unregistered queries: {missing} — "
        "implement and register them, or remove them from the list"
    )


def test_window_priority_has_no_duplicates():
    names = list(registry.WINDOW_PRIORITY)
    assert len(names) == len(set(names))


def test_window_priority_fills_the_50_slot_window():
    # The driver records the FIRST 50 queries in iteration order; a
    # priority list shorter than 50 silently cedes slots to arbitrary
    # registration order, longer than 50 silently drops its own tail.
    assert len(registry.WINDOW_PRIORITY) == 50


def test_ordered_yields_priority_first():
    ordered = list(registry._ordered())
    assert tuple(ordered[: len(registry.WINDOW_PRIORITY)]) == registry.WINDOW_PRIORITY
