"""Streaming/incremental semantics (SURVEY.md §2.8)."""
