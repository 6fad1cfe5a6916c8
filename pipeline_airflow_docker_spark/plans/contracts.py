"""Declared ingest contracts shared by the graded plans.

No qkey registrations happen here — this module exists so that plan
modules (streaming_q, dataops) can share contract constants without
importing each other (which would entangle registration side effects).
"""

from __future__ import annotations

# Event-time plausibility horizon declared by the graded fixtures: all
# base/jitter traffic is calendar 2024. Every event-time-STATEFUL qkey
# passes this to the operator layer (streaming/windows.py,
# streaming/joins.py — see ``plausible_event_time`` for why one
# corrupt far-future event otherwise silently drops all real traffic),
# and each DuckDB oracle applies the IDENTICAL bound.
HORIZON_2024 = ("2024-01-01 00:00:00", "2025-01-01 00:00:00")
