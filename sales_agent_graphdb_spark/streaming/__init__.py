"""Structured Streaming layer (SURVEY.md §2.12): event-time windowed
aggregation with watermarks, and custom stateful operators."""
