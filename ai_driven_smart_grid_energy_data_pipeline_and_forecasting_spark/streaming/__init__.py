"""Structured Streaming ingest — the incremental path (SURVEY.md §2.8)."""
