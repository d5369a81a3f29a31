"""Structured Streaming ingestion for incremental crawls."""
