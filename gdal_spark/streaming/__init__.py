"""Incremental / streaming drive of the engine (SURVEY.md §2.9)."""
