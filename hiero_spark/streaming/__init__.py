"""Structured Streaming extension (SURVEY.md §2.9)."""
