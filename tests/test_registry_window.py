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


def test_never_driver_certified_queries_lead_the_window():
    """ADVICE r6: derive the never-stamped set from the driver's own
    CORRECTNESS_r*.json artifacts instead of trusting a hand-written
    comment — any registered query with no driver stamp in ANY prior
    round must occupy a leading window slot, so a registration added
    late in a round cannot silently miss its certification round
    (the r5/r6 drift class)."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stamped: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        stamped.update(json.load(open(path)))
    if not stamped:  # fresh clone without driver artifacts: vacuous
        return
    registry._ensure_loaded()
    unstamped = sorted(set(registry.REGISTRY) - stamped)
    head = set(registry.WINDOW_PRIORITY[: max(len(unstamped), 1)])
    missing = [q for q in unstamped if q not in registry.WINDOW_PRIORITY]
    assert not missing, (
        f"queries never driver-certified and absent from WINDOW_PRIORITY: "
        f"{missing} — they must lead the next verification window"
    )
    not_leading = [q for q in unstamped if q not in head]
    assert not not_leading, (
        f"never-certified queries must occupy the LEADING window slots "
        f"(found later in the list or crowded out): {not_leading}"
    )


def test_survey_registry_count_matches_registry():
    """VERDICT r6 item 5: SURVEY.md §2.2 is the blueprint the driver's
    t2 contract enumerates — its stated registry count must track the
    actual registry so the document can't silently under-describe new
    registrations."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(root, "SURVEY.md")).read()
    registry._ensure_loaded()
    n = len(registry.REGISTRY)
    stated = {int(m) for m in re.findall(r"\*\*(\d+)-query registry\*\*", text)}
    stated |= {int(m) for m in re.findall(r"\((\d+) total, \d+ DuckDB", text)}
    assert stated == {n}, (
        f"SURVEY.md states registry counts {sorted(stated)} but the "
        f"registry holds {n} queries — update §2.2"
    )
