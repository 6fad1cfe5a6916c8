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

# Integer-literal gate for graded string->INT casts (round-8 numeric-
# string fuzz probes). Raw TRY_CAST semantics diverge across engines
# in at least five classes — DuckDB rounds decimal strings ('4.5' ->
# 5), hex-parses ('0x10' -> 16), and accepts underscore separators
# ('4_2' -> 42) where Spark's try_cast nulls all three; JSON-number
# truncation ('4.9') disagrees too. The graded contract is therefore
# "a value whose STRING RENDERING is an integer literal, cast to
# int": both engines apply THIS regex to the string form before
# casting, so the only values that reach the cast are plain
# optionally-signed digit runs (with the exact whitespace envelope
# both casts accept, including \x0B), where the engines agree —
# including overflow -> NULL. The same pattern text is valid in Java
# regex (Column.rlike) and RE2 (DuckDB regexp_matches).
INT_LITERAL_RE = r"^[\t\n\x0B\f\r ]*[+-]?[0-9]+[\t\n\x0B\f\r ]*$"

# Double-literal gate for the graded string->DOUBLE routes (q_fn_map's
# value_num split). Same posture as INT_LITERAL_RE one level up: both
# engines apply THIS whitelist to the string form before casting, so
# the numeric route only ever sees clean decimal/exponent literals
# (plus the exact-case NaN / [+-]Infinity spellings) — where IEEE
# nearest parsing agrees bit-for-bit, including overflow -> inf.
# Everything else (DuckDB-only underscore separators '4_2', hex
# '0x10', lowercase 'nan'/'inf', non-ASCII digits) takes the STRING
# route on both sides. Valid in Java regex and RE2.
DOUBLE_LITERAL_RE = (
    r"^[\t\n\x0B\f\r ]*([+-]?(([0-9]+\.?[0-9]*|\.[0-9]+)"
    r"([eE][+-]?[0-9]+)?|Infinity)|NaN)[\t\n\x0B\f\r ]*$"
)
