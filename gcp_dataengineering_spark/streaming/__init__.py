"""Structured Streaming operators (beyond-reference upgrade path,
SURVEY.md §2.9)."""
