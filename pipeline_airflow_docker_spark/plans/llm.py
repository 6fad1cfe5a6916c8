"""LLM-data-pipeline operators (SURVEY.md §2 Part C) as qkeys.

Populated in Phase 4.
"""
