"""Streaming qkeys (SURVEY.md §2 streaming closure).

Populated in Phase 3.
"""
