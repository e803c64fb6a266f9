"""Structured Streaming surface: landing-file ingestion with checkpointed
exactly-once routing, and event-time windowed/stateful aggregations."""
