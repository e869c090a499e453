"""Structured Streaming ingest (optional batch-equivalent micro-batch path)."""
