"""Structured Streaming surface (extension layer — reference is batch-only)."""
