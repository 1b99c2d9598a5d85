"""Driver-facing registry contract: the external driver verifies only the
FIRST 50 entries of ``queries()``, so the window composition is load-bearing
and guarded here (round-1 lesson: 41 queries silently fell outside it)."""

from __future__ import annotations

from dataframe_expressions_spark.operators.registry import (
    DRIVER_WINDOW_PRIORITY,
    load_all,
)

WINDOW = 50


def test_priority_window_is_exactly_50():
    assert len(DRIVER_WINDOW_PRIORITY) == WINDOW
    assert len(set(DRIVER_WINDOW_PRIORITY)) == WINDOW


def test_priority_ids_all_registered():
    registered = set(load_all())
    missing = [q for q in DRIVER_WINDOW_PRIORITY if q not in registered]
    assert not missing, f"priority ids not registered: {missing}"


def test_load_all_puts_priority_first():
    ids = list(load_all())
    assert tuple(ids[:WINDOW]) == DRIVER_WINDOW_PRIORITY
