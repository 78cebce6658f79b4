"""Structured Streaming extension (the reference is batch-only)."""
