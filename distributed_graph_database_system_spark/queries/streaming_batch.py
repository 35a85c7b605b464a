"""Streaming batch-equivalents — populated in M4."""
