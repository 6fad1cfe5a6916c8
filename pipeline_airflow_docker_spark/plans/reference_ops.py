"""Reference-literal batch operators (SURVEY.md §2 Part A) as qkeys.

Populated in Phase 1.
"""
