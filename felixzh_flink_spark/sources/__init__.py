"""Batch + streaming source builders (SURVEY.md §2.1)."""
